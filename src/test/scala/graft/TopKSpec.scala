package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.TopK

/** TopK.perGroup == the naive per-group window, row for row — on
  * skewed group sizes, groups smaller than k, desc/asc mixed orders,
  * and under any fanout. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def data() = {
    val rnd = new scala.util.Random(42)
    // group 0 holds ~70% of rows (the skewed browse shape), group 9
    // has a single row (< k)
    (0 until 3000).map { i =>
      val g = if (rnd.nextInt(10) < 7) 0L else 1L + rnd.nextInt(8)
      (g, i.toLong, rnd.nextInt(50).toDouble)
    } :+ ((9L, 999999L, 1.0))
  }.toDF("g", "id", "score")

  test("perGroup matches the naive single-window top-k exactly") {
    val df = data()
    val order = Seq(col("score").desc, col("id"))
    val naive = df
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("g")).orderBy(order: _*)))
      .filter(col("rnk") <= 7)
    for (fanout <- Seq(1, 4, 64)) {
      val got = TopK.perGroup(df, 7, Seq("g"), order, col("id"), "rnk",
        fanout = fanout)
      assert(got.select("g", "id", "score", "rnk").except(
        naive.select("g", "id", "score", "rnk")).isEmpty &&
        naive.select("g", "id", "score", "rnk").except(
          got.select("g", "id", "score", "rnk")).isEmpty,
        s"fanout=$fanout diverged from the naive window")
      assert(got.count() === naive.count())
    }
  }

  test("perGroup returns whole groups smaller than k") {
    val got = TopK.perGroup(data(), 7, Seq("g"),
      Seq(col("score"), col("id")), col("id"), "rnk")
    assert(got.filter(col("g") === 9L).count() === 1)
    assert(got.filter(col("g") === 9L).select("rnk").as[Int].head() === 1)
  }

  test("the global stage ranks only candidate rows (<= k x fanout per group)") {
    // the property that makes it scale: after the local cut, the
    // per-group frame entering the global window is bounded by the
    // query's constants. Count the survivors of stage 1 directly.
    val df = data()
    val k = 7; val fanout = 8
    val staged = df.withColumn("__salt", pmod(hash(col("id")), lit(fanout)))
      .withColumn("__lr", row_number().over(
        Window.partitionBy(col("g"), col("__salt"))
          .orderBy(col("score").desc, col("id"))))
      .filter(col("__lr") <= k)
    val worst = staged.groupBy("g").count().agg(max("count")).as[Long].head()
    assert(worst <= k.toLong * fanout,
      s"stage-1 survivors per group must be <= k*fanout, got $worst")
  }
}
