package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.result.{CaptionExport, WidgetJson}

/** Streaming export sinks — the presentation tail (SURVEY §3.3;
  * reference app/esper/captions.py:106-119 get_vtt and
  * app/esper/widget.py result documents) produced incrementally from a
  * stream instead of a batch collect, so a long-running ingest can
  * publish results continuously. */
object ExportSink {

  /** Per-row VTT cue text — a pure (stateless, codegen'd) projection,
    * so it runs unchanged on a streaming DataFrame in append mode. */
  def cueRows(captions: DataFrame): DataFrame =
    captions.select(col("video_id"),
      CaptionExport.cue(col("s"), col("e"), col("text")).as("cue"))

  /** Streaming VTT export through the built-in text file sink:
    * exactly-once per cue via the sink's commit log, no driver-side
    * document assembly (a VTT body is cue concatenation, so consumers
    * assemble per-video documents from the cue files downstream — the
    * scalable export shape at corpus size). */
  def startVttSink(captions: DataFrame, outDir: String,
                   checkpoint: String): StreamingQuery =
    cueRows(captions).select(col("cue").as("value"))
      .writeStream.format("text")
      .option("path", outDir).option("checkpointLocation", checkpoint)
      .outputMode("append").start()

  /** Widget-JSON micro-batch sink: each trigger's track rows become one
    * track-kind widget document (batch-id-named). Whole-document
    * formats don't fit the row-oriented file sink, so foreachBatch is
    * the boundary: the row shaping/grouping stays distributed inside
    * [[WidgetJson.trackResult]]; only the finished document string
    * touches the driver, exactly as in the batch path. */
  def startWidgetSink(tracks: DataFrame, outDir: String, checkpoint: String,
                      resultType: String = "tracks"): StreamingQuery =
    startWidgetSinkAs(tracks, outDir, checkpoint, resultType,
      WidgetJson.trackResult)

  /** [[startWidgetSink]] for any of the four reference result kinds —
    * pass the matching formatter ([[WidgetJson.trackResult]] /
    * frameResult / bboxResult / videoResult); the input columns must
    * be that kind's contract. */
  def startWidgetSinkAs(rows: DataFrame, outDir: String, checkpoint: String,
                        resultType: String,
                        format: (DataFrame, String) => String): StreamingQuery = {
    Files.createDirectories(Paths.get(outDir))
    rows.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val doc = format(batch, resultType)
          Files.writeString(Paths.get(outDir, f"widget-$batchId%05d.json"), doc)
          ()
        }
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append").start()
  }
}
