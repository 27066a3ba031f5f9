package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
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

  /** Tumbling event-time aggregation (counts + value sum per window and
    * type). */
  def tumblingCounts(events: DataFrame, every: String = "1 hour"): DataFrame =
    events.withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), every), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Session windows per user with an inactivity gap — the streaming
    * form of IntervalOps.coalesce(gap) (Rekall coalesce ~ session
    * window over event time). */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))

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
