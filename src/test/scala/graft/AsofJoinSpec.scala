package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.AsofJoin

/** As-of join: inclusive-tie semantics, left-outer nulls, and
  * equivalence with the naive per-key argmax join on random data. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("latest right row at or before t; null when none") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), (2L, 7L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100L), (1L, 15L, 150L), (3L, 1L, 999L))
      .toDF("k", "t", "rv")
    val out = AsofJoin.asofJoin(left, right, "k", "t", Seq("rv"))
      .select("tag", "rv").as[(String, Option[Long])].collect().toMap
    assert(out("a") === Some(100L)) // tie at t=10 is inclusive
    assert(out("b") === Some(150L))
    assert(out("c") === None)       // earliest right row is later
    assert(out("d") === None)       // key has no right rows at all
  }

  test("null right keys/times never match; null left keys get null payload") {
    val left = Seq((Some(1L), Some(10L), "a"), (None, Some(10L), "b"),
      (Some(1L), None, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((Some(1L), Some(5L), 50L), (None, Some(1L), 666L),
      (Some(1L), None, 777L))
      .toDF("k", "t", "rv")
    val out = AsofJoin.asofJoin(left, right, "k", "t", Seq("rv"))
      .select("tag", "rv").as[(String, Option[Long])].collect().toMap
    assert(out("a") === Some(50L)) // the one valid right row
    assert(out("b") === None)      // null left key matches nothing
    assert(out("c") === None)      // null left time precedes everything
  }

  test("equals the naive argmax join on random data (incl. hot key)") {
    val rnd = new scala.util.Random(23)
    val left = Seq.fill(500) {
      val k = if (rnd.nextInt(4) == 0) 1L else rnd.nextInt(20).toLong
      (k, rnd.nextInt(1000).toLong, rnd.nextInt(100000).toLong)
    }.toDF("k", "t", "lid").dropDuplicates("k", "t")
    val right = Seq.fill(300) {
      val k = if (rnd.nextInt(4) == 0) 1L else rnd.nextInt(20).toLong
      (k, rnd.nextInt(1000).toLong, rnd.nextInt(100000).toLong)
    }.toDF("k", "t", "rv").dropDuplicates("k", "t")

    val fast = AsofJoin.asofJoin(left, right, "k", "t", Seq("rv"))
      .select("k", "t", "lid", "rv")
      .as[(Long, Long, Long, Option[Long])].collect().sorted.toList

    val r2 = right.select(col("k").as("rk"), col("t").as("rt"), col("rv"))
    val w = Window.partitionBy(col("k"), col("t"), col("lid"))
      .orderBy(col("rt").desc)
    val naive = left.join(r2, col("k") === col("rk") && col("rt") <= col("t"), "left")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("k", "t", "lid", "rv")
      .as[(Long, Long, Long, Option[Long])].collect().sorted.toList

    assert(fast === naive)
  }
}
