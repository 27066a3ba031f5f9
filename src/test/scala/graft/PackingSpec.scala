package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.Packing

/** Scalable two-phase prefix sum vs the naive global window, and the
  * chunk arithmetic of concat-and-chunk packing. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("withRunningOffset equals the single-partition global window") {
    val rnd = new scala.util.Random(31)
    val df = (1 to 5000).map(i => (i.toLong, 1L + rnd.nextInt(40)))
      .toDF("id", "v").repartition(13) // scrambled input partitioning
    val fast = Packing.withRunningOffset(df, "id", "v", "off")
      .select("id", "off").as[(Long, Long)].collect().sorted.toList
    val naive = df
      .withColumn("off", coalesce(sum($"v").over(
        Window.orderBy($"id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("id", "off").as[(Long, Long)].collect().sorted.toList
    assert(fast === naive)
    // the fast plan must not contain a partition-less (global) sort
    // window over the full input — its only global window is over the
    // P-row partial table
  }

  test("withRunningOffsetOrdered equals the global window under a " +
    "composite DESC order (e14's knn rank)") {
    val rnd = new scala.util.Random(59)
    // duplicated scores force the vec_id tie-break to matter
    val df = (1 to 4000).map(i => (i.toLong, rnd.nextInt(200).toDouble))
      .toDF("vec_id", "cos").repartition(11)
    val order = Seq($"cos".desc, $"vec_id")
    val fast = Packing.withRunningOffsetOrdered(
        df.withColumn("one", lit(1L)), order, "one", "rn")
      .select("vec_id", "rn").as[(Long, Long)].collect().sorted.toList
    val naive = df
      .withColumn("rn", coalesce(sum(lit(1L)).over(
        Window.orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("vec_id", "rn").as[(Long, Long)].collect().sorted.toList
    assert(fast === naive)
  }

  test("withRunningOffsets: two parallel cumsums from one exchange match " +
    "two independent single-column runs") {
    val rnd = new scala.util.Random(97)
    val df = (1 to 4000).map(i =>
      (i.toLong, 1L + rnd.nextInt(9), 1L + rnd.nextInt(5)))
      .toDF("id", "va", "vb").repartition(7)
    val multi = Packing.withRunningOffsets(df, "id",
        Seq("va", "vb"), Seq("offa", "offb"))
      .select("id", "offa", "offb").as[(Long, Long, Long)]
      .collect().sorted.toList
    val a = Packing.withRunningOffset(df.select("id", "va"), "id", "va", "offa")
      .select("id", "offa").as[(Long, Long)].collect().toMap
    val b = Packing.withRunningOffset(df.select("id", "vb"), "id", "vb", "offb")
      .select("id", "offb").as[(Long, Long)].collect().toMap
    assert(multi === multi.map { case (id, _, _) => (id, a(id), b(id)) })
  }

  test("branch consistency survives exchange-reuse OFF (the cache claim, " +
    "pinned cluster-shaped)") {
    // Packing.scala's cache rationale: the offset branch and the main
    // branch must observe the SAME range-partition assignment, and
    // exchange reuse — an optimizer courtesy, not a contract — is the
    // only thing that would align them without the materialization.
    // local[32] never shows the failure incidentally (reuse is on by
    // default), so pin it: with reuse disabled BOTH forms must still
    // equal the naive global window bit-for-bit, and the plan must
    // actually serve the shared subtree from the cache.
    val reuse = spark.conf.get("spark.sql.exchange.reuse", "true")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try {
      val rnd = new scala.util.Random(83)
      val df = (1 to 5000).map(i => (i.toLong, 1L + rnd.nextInt(40)))
        .toDF("id", "v").repartition(13)
      val fast = Packing.withRunningOffset(df, "id", "v", "off")
      val got = fast.select("id", "off").as[(Long, Long)].collect().sorted.toList
      val naive = df
        .withColumn("off", coalesce(sum($"v").over(
          Window.orderBy($"id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("id", "off").as[(Long, Long)].collect().sorted.toList
      assert(got === naive)
      // the cached pid-stamped subtree may sit inside AQE query stages
      // — check the post-execution plan rendering, which includes them
      assert(fast.queryExecution.executedPlan.toString
          .contains("InMemoryTableScan"),
        "the pid-stamped subtree is not served from the cache — " +
          "branch consistency would ride on exchange reuse alone")
      // the composite-order form (e14/e28's ordinal) under the same conf
      val df2 = (1 to 4000).map(i => (i.toLong, rnd.nextInt(200).toDouble))
        .toDF("vec_id", "cos").repartition(11)
      val order = Seq($"cos".desc, $"vec_id")
      val got2 = Packing.withRunningOffsetOrdered(
          df2.withColumn("one", lit(1L)), order, "one", "rn")
        .select("vec_id", "rn").as[(Long, Long)].collect().sorted.toList
      val naive2 = df2
        .withColumn("rn", coalesce(sum(lit(1L)).over(
          Window.orderBy(order: _*)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("vec_id", "rn").as[(Long, Long)].collect().sorted.toList
      assert(got2 === naive2)
    } finally spark.conf.set("spark.sql.exchange.reuse", reuse)
  }

  test("packChunks: offsets are exclusive cumsums, chunks cover each doc") {
    val docs = Seq(
      (1L, "a b c"),          // ntok 3, off 0
      (2L, "d e"),            // off 3
      (3L, ("x " * 9).trim)   // ntok 9, off 5 -> spans chunk 0..1 with len 8
    ).toDF("doc_id", "text")
    val out = Packing.packChunks(docs, chunkLen = 8)
      .select("doc_id", "ntok", "off", "chunk_first", "chunk_last")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toList
    assert(out === List(
      (1L, 3L, 0L, 0L, 0L),
      (2L, 2L, 3L, 0L, 0L),
      (3L, 9L, 5L, 0L, 1L)))
  }
}
