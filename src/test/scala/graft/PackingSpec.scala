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
