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

  test("perGroup is stable under forced AQE partition coalescing and |groups|=1") {
    // cluster-shaped determinism: the salt is a hash of a caller
    // column, NOT spark_partition_id, so AQE collapsing every
    // post-shuffle partition must not change the candidate sets. Force
    // the most aggressive coalescing AQE allows and re-check row-for-
    // row equality; then the degenerate single-group frame (the shape
    // where the naive window is fully serial and the salt does all
    // the spreading).
    val ss = spark.newSession()
    ss.conf.set("spark.sql.adaptive.enabled", "true")
    ss.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    ss.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256MB")
    ss.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1g")
    val df = ss.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(data().collect(): _*)),
      data().schema)
    val order = Seq(col("score").desc, col("id"))
    val naive = df.withColumn("rnk", row_number().over(
        Window.partitionBy(col("g")).orderBy(order: _*)))
      .filter(col("rnk") <= 7)
    val got = TopK.perGroup(df, 7, Seq("g"), order, col("id"), "rnk")
    assert(got.select("g", "id", "score", "rnk").except(
      naive.select("g", "id", "score", "rnk")).isEmpty &&
      naive.select("g", "id", "score", "rnk").except(
        got.select("g", "id", "score", "rnk")).isEmpty,
      "forced AQE coalescing changed perGroup's output")
    // |groups| = 1: every row in one group
    val one = df.withColumn("g", lit(0L))
    val naive1 = one.withColumn("rnk", row_number().over(
        Window.partitionBy(col("g")).orderBy(order: _*)))
      .filter(col("rnk") <= 7)
    val got1 = TopK.perGroup(one, 7, Seq("g"), order, col("id"), "rnk")
    assert(got1.select("g", "id", "score", "rnk").except(
      naive1.select("g", "id", "score", "rnk")).isEmpty &&
      naive1.select("g", "id", "score", "rnk").except(
        got1.select("g", "id", "score", "rnk")).isEmpty,
      "|groups|=1 diverged from the naive window")
    assert(got1.count() === 7)
  }

  test("perGroupWithCount equals perGroup + the aggregate/join population") {
    // r22: the population must ride the TopK windows — pin row-for-row
    // equality (rank rows AND the count column) against the naive
    // groupBy + broadcast-join composition it replaced in e15/e19/e20,
    // across fanouts, on skewed groups and a group smaller than k
    val df = data()
    val order = Seq(col("score").desc, col("id"))
    val counts = df.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val naive = TopK.perGroup(df, 7, Seq("g"), order, col("id"), "rnk")
      .join(broadcast(counts), "g")
      .select("g", "id", "score", "rnk", "n")
    for (fanout <- Seq(1, 4, 64)) {
      val got = TopK.perGroupWithCount(df, 7, Seq("g"), order, col("id"),
          "rnk", "n", fanout = fanout)
        .select("g", "id", "score", "rnk", "n")
      assert(got.except(naive).isEmpty && naive.except(got).isEmpty,
        s"fanout=$fanout diverged from the aggregate+join form")
      assert(got.count() === naive.count())
    }
    // the count column is the FULL group population, not the top-k size
    val g0 = df.filter(col("g") === 0L).count()
    val got = TopK.perGroupWithCount(df, 7, Seq("g"), order, col("id"),
      "rnk", "n")
    assert(got.filter(col("g") === 0L).select("n").distinct()
      .as[Long].head() === g0)
    // group 9 has one row: rank 1, population 1
    assert(got.filter(col("g") === 9L).select("rnk", "n")
      .as[(Int, Long)].head() === ((1, 1L)))
  }

  test("perGroup rejects intermediate-column collisions up front") {
    val df = data().withColumn("__salt", lit(1))
    intercept[IllegalArgumentException] {
      TopK.perGroup(df, 7, Seq("g"), Seq(col("score")), col("id"), "rnk")
    }
    intercept[IllegalArgumentException] {
      TopK.perGroup(data(), 7, Seq("g"), Seq(col("score")), col("id"), "id")
    }
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
