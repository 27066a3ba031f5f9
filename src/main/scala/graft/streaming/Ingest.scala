package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming ingest (SURVEY §2.9). The reference ingests in
  * batch with a job ledger for exactly-once per (video, pipeline)
  * (app/esper/scannerutil.py:136-146) and a celery download queue
  * (app/esper/download/tasks.py); the Spark-native form is a file-source
  * stream with watermarked dropDuplicates for the ledger and
  * session/tumbling windows for the event-time aggregations. */
object Ingest {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-arrival source: new parquet files under `dir` become stream
    * micro-batches (the download-queue analogue, S11). */
  def fileSource(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Exactly-once ledger: drop duplicate event_ids within the watermark
    * horizon — the ScannerJob "skip already-processed" semantics with
    * bounded state. */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming near-duplicate dedup: drop any document whose MinHash
    * band signature was already seen within the watermark horizon —
    * the streaming counterpart of the batch LSH dedup (t04). One band
    * of two minhashes: a pair at Jaccard J collides with probability
    * ~J^2, so the single-pass form trades recall for bounded state
    * (OR-construction recall = union several passes with independent
    * band families). Exact duplicates always collide (same shingle
    * set -> same minhashes); docs too short to shingle fall back to
    * the full-text hash (kept unless byte-identical). State is
    * bounded exactly like the exact-once ledger: the builtin
    * dropDuplicatesWithinWatermark keyed on the signature. */
  def nearDedupStream(docs: DataFrame, k: Int = 3,
                      watermark: String = "1 hour"): DataFrame =
    docs.withColumn("__sig",
        coalesce(graft.text.TextOps.minhashBandSig(col("text"), k),
          xxhash64(col("text"))))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("__sig")
      .drop("__sig")

  /** OR-construction streaming near-dedup: one watermarked dedup per
    * band family, cascaded — a doc is dropped if ANY band signature
    * was already seen, recovering the recall a single band loses
    * (collision prob per band ~J^2; miss prob across B independent
    * bands (1-J^2)^B). Each stage holds its own bounded state;
    * chained stateful operators are supported in append mode. Recall
    * caveat: stage b only sees earlier stages' survivors, so a
    * signature dropped upstream never enters stage b's state — the
    * standard cascade approximation. */
  def nearDedupStreamOr(docs: DataFrame, k: Int = 3, bands: Int = 2,
                        watermark: String = "1 hour"): DataFrame = {
    require(bands >= 1)
    (0 until bands).foldLeft(docs.withWatermark("ts", watermark)) { (df, b) =>
      df.withColumn(s"__sig$b",
          coalesce(graft.text.TextOps.minhashBandSig(col("text"), k, b),
            xxhash64(col("text"))))
        .dropDuplicatesWithinWatermark(s"__sig$b")
        .drop(s"__sig$b")
    }
  }

  /** Streaming probe against a PERSISTENT dedup index — the streaming
    * form of t44's incremental near-dup: each arriving doc's band
    * signatures (multi-band OR-construction, same family as
    * [[nearDedupStreamOr]]) left-anti-join the static index's
    * signature table, so anything colliding with the historical corpus
    * is dropped before it ever reaches state. Composable with
    * [[nearDedupStream]] downstream for intra-stream dups. Scale: a
    * stream-static join — Spark re-plans the static side per
    * micro-batch; a bounded signature index broadcasts, an unbounded
    * one stays a shuffle join on `__sig`, and the stream side carries
    * exactly one extra long column per band. */
  def dedupAgainstIndex(docs: DataFrame, index: DataFrame, k: Int = 3,
                        bands: Int = 2): DataFrame = {
    require(bands >= 1)
    // "drop if ANY band collides" as a CHAIN of per-band equi
    // anti-joins (survivors pass all stages) — an OR join condition
    // would force a nested-loop join; the chain keeps every stage
    // hash-joinable
    (0 until bands).foldLeft(docs) { (df, b) =>
      val idxB = indexSignatures(index, k, b)
      df.withColumn(s"__sig$b",
          coalesce(graft.text.TextOps.minhashBandSig(col("text"), k, b),
            xxhash64(col("text"))))
        .join(idxB, col(s"__sig$b") === idxB("__isig"), "left_anti")
        .drop(s"__sig$b")
    }
  }

  /** One band's signature set over the static corpus (build once per
    * band, persist as the index tables; at 100 TB these are the things
    * you bucket by `__isig`). */
  def indexSignatures(index: DataFrame, k: Int, band: Int): DataFrame =
    index.withColumn("__isig",
        coalesce(graft.text.TextOps.minhashBandSig(col("text"), k, band),
          xxhash64(col("text"))))
      .select("__isig").distinct()

  /** Tumbling event-time aggregation (counts + value sum per window and
    * type). */
  def tumblingCounts(events: DataFrame, every: String = "1 hour"): DataFrame =
    events.withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), every), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Watermarked stream-stream interval join — Spark's BUILT-IN
    * two-stream join (the attribution shape: each right event matches
    * left events of the same user within [l.ts, l.ts + within]). The
    * time-range condition plus both watermarks let the state store
    * evict rows once the watermark passes their match horizon, so
    * state stays bounded no matter how long the streams run — the
    * property that separates this from an unbounded cache join.
    * Contrast [[streamingAsof]], which needs custom state because
    * "latest right only" is not expressible as a join condition. */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
                       within: String = "10 minutes",
                       watermark: String = "1 hour"): DataFrame = {
    val l = left.select(col("user_id"), col("event_id").as("l_id"),
      col("ts").as("l_ts")).withWatermark("l_ts", watermark)
    val r = right.select(col("user_id").as("r_user"),
      col("event_id").as("r_id"), col("ts").as("r_ts"))
      .withWatermark("r_ts", watermark)
    l.join(r, expr(
      s"""user_id = r_user AND
         |r_ts >= l_ts AND
         |r_ts <= l_ts + interval $within""".stripMargin))
      .select(col("user_id"), col("l_id"), col("r_id"),
        col("l_ts"), col("r_ts"))
  }

  /** Session windows per user with an inactivity gap — the streaming
    * form of IntervalOps.coalesce(gap) (Rekall coalesce ~ session
    * window over event time). */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))

  /** Input row for [[streamingCoalesce]]: a keyed interval with the
    * event-time column that drives the watermark. */
  case class KeyedIv(user_id: Long, s: Long, e: Long, ts: java.sql.Timestamp)
  /** A closed (fully merged) interval island. */
  case class ClosedIv(user_id: Long, s: Long, e: Long)
  /** Custom state: the currently-open island per key. */
  case class OpenIsland(s: Long, e: Long)

  /** Streaming interval coalesce — the custom-state form of
    * IntervalOps.coalesce (R1) via `flatMapGroupsWithState`: per key,
    * state holds the open island; an arriving interval either extends
    * it (overlap/touch within `gap`) or closes it, emitting the
    * finished island downstream. The event-time timeout flushes an
    * idle island once the watermark passes it, so state is bounded.
    * Within a micro-batch, each group's rows are sorted by (s, e);
    * rows later than the watermark horizon follow the usual
    * late-data contract. */
  def streamingCoalesce(events: Dataset[KeyedIv], gap: Long,
                        watermark: String = "2 hours",
                        flushAfterMs: Long = 60 * 60 * 1000L): Dataset[ClosedIv] = {
    import events.sparkSession.implicits._
    def fn(key: Long, rows: Iterator[KeyedIv],
           state: GroupState[OpenIsland]): Iterator[ClosedIv] =
      if (state.hasTimedOut) {
        val out = state.getOption.map(o => ClosedIv(key, o.s, o.e)).iterator
        state.remove()
        out
      } else {
        val batch = rows.toSeq
        val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedIv]
        var cur = state.getOption
        batch.sortBy(r => (r.s, r.e)).foreach { r =>
          cur match {
            case Some(o) if r.s <= o.e + gap =>
              cur = Some(OpenIsland(o.s, math.max(o.e, r.e)))
            case Some(o) =>
              closed += ClosedIv(key, o.s, o.e)
              cur = Some(OpenIsland(r.s, r.e))
            case None =>
              cur = Some(OpenIsland(r.s, r.e))
          }
        }
        cur.foreach { o =>
          state.update(o)
          // anchor the flush to the island's own event time (the
          // watermark is 0 before the first batch completes; a
          // watermark-relative timeout would fire instantly)
          val maxTs = batch.map(_.ts.getTime).max
          state.setTimeoutTimestamp(
            math.max(maxTs, state.getCurrentWatermarkMs()) + flushAfterMs)
        }
        closed.iterator
      }
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)
  }

  /** One tagged input row for [[streamingAsof]]: both streams union'd,
    * `is_left` marks the probe side; `id` identifies left rows, `rv` is
    * the right payload. */
  case class AsofEvent(user_id: Long, ts: java.sql.Timestamp,
                       is_left: Boolean, id: Long, rv: Long)
  /** One emitted left row with its as-of match (None = no right row at
    * or before it). */
  case class AsofOut(user_id: Long, id: Long, t_ms: Long,
                     r_id: Option[Long], r_rv: Option[Long])
  /** Buffered (t_ms, id) lefts awaiting the watermark + retained
    * (t_ms, id, rv) rights. */
  case class AsofBuf(lefts: Seq[(Long, Long)], rights: Seq[(Long, Long, Long)])

  /** Streaming as-of join — the stream-stream form of
    * [[graft.operators.AsofJoin]] via `flatMapGroupsWithState`: each
    * left event is emitted with the latest right event at or before it,
    * once the watermark guarantees no earlier right event can still
    * arrive (a left at time t is held in state until watermark >= t).
    * State is bounded: of the right events at or before the watermark
    * only the latest survives (it dominates any future on-time left,
    * whose time must exceed the watermark); rights ahead of the
    * watermark are bounded by the watermark delay; and a quiet key's
    * retained right is evicted once the watermark is `rightTtl` past
    * its event time (a timeout always stays armed, so state for dead
    * keys is eventually removed — the bounded-staleness trade: a left
    * arriving more than the TTL after the key's last right activity
    * loses matches older than the TTL). Rows behind the watermark on
    * arrival are dropped by the framework before reaching the state
    * function — the standard streaming late-data contract. Ties: a
    * right at exactly t matches; equal right times break by max id. */
  def streamingAsof(events: Dataset[AsofEvent],
                    watermark: String = "2 hours",
                    rightTtlMs: Long = 24L * 3600 * 1000): Dataset[AsofOut] = {
    import events.sparkSession.implicits._
    def matchLeft(rights: Seq[(Long, Long, Long)], t: Long): Option[(Long, Long)] =
      rights.filter(_._1 <= t).sortBy(r => (r._1, r._2)).lastOption
        .map(r => (r._2, r._3))
    def fn(key: Long, rows: Iterator[AsofEvent],
           state: GroupState[AsofBuf]): Iterator[AsofOut] = {
      val wm = state.getCurrentWatermarkMs()
      val buf = state.getOption.getOrElse(AsofBuf(Nil, Nil))
      val batch = rows.toSeq
      val lefts = buf.lefts ++ batch.filter(_.is_left)
        .map(e => (e.ts.getTime, e.id))
      val rights = (buf.rights ++ batch.filter(!_.is_left)
        .map(e => (e.ts.getTime, e.id, e.rv))).sorted
      val (ready, pending) = lefts.partition(_._1 <= wm)
      val out = ready.sorted.map { case (t, id) =>
        val m = matchLeft(rights, t)
        AsofOut(key, id, t, m.map(_._1), m.map(_._2))
      }
      // retain: the single dominating right at/behind the watermark +
      // everything ahead of it — minus anything TTL-expired
      val keep = (rights.filter(_._1 > wm) ++ rights.filter(_._1 <= wm).lastOption)
        .filter(_._1 > wm - rightTtlMs)
      if (pending.isEmpty && keep.isEmpty) state.remove()
      else {
        state.update(AsofBuf(pending, keep))
        if (pending.nonEmpty)
          // fires once the watermark passes the earliest held left
          state.setTimeoutTimestamp(math.max(pending.map(_._1).min, wm + 1))
        else
          // rights only: re-arm so the retained right is eventually
          // expired and the key's state removed even if it goes quiet
          state.setTimeoutTimestamp(
            math.max(keep.map(_._1).max + rightTtlMs, wm + 1))
      }
      out.iterator
    }
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fn)
  }

  /** End-to-end ingest job: file source -> ledger dedup -> parquet sink
    * with checkpointing (append-only label writes, S7/S8). */
  def ingestJob(spark: SparkSession, inDir: String, outDir: String,
                checkpoint: String): StreamingQuery =
    dedupStream(fileSource(spark, inDir))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
