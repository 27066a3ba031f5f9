package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.IntervalOps
import graft.operators.IntervalOps.Cols
import graft.queries.Q
import graft.result.WidgetJson

/** Sandbox-style pipelines producing the five widget JSON shapes from
  * the sf0.001 fixture — shared by the one-shot golden generator
  * ([[GenGolden]]) and the drift gate ([[WidgetGoldenSpec]]). Each
  * pipeline is a miniature of a reference sandbox query (user_id plays
  * video_id, event seconds play frame numbers), deterministic end to
  * end so the JSON strings are stable across runs and engines. */
object WidgetGoldenFixtures {
  private val sf = "/root/testdata/sf0.001"

  def shapes(s: SparkSession): Seq[(String, String)] = {
    val clicks = Q.evTyped(s, sf, "click")
      .filter(col("user_id") <= 3)
      .select("user_id", "s", "e")
    // Track shape: coalesced click islands as segments (the supercut/
    // interview-segment sandbox shape, widget.py:256-274)
    val tracks = IntervalOps.coalesce(clicks, Cols("user_id", "s", "e"))
      .select(col("user_id").as("video_id"), col("s").as("min_frame"),
        col("e").as("max_frame"), lit("click").as("label"))
    // Frame shape: sampled view instants (widget.py:153-163)
    val frames = Q.evTyped(s, sf, "view")
      .filter(col("user_id") <= 2)
      .select(col("user_id").as("video_id"), col("s").cast("int").as("frame_number"))
    // Bbox shape: one synthetic detection per purchase, coordinates
    // derived deterministically from the event id (widget.py:165-254)
    val boxes = Q.evTyped(s, sf, "purchase")
      .filter(col("user_id") <= 2)
      .select(col("user_id").as("video_id"),
        col("s").cast("int").as("frame_number"),
        col("event_id").as("obj_id"),
        (col("event_id") % 10).cast("double") / 10.0d)
      .toDF("video_id", "frame_number", "obj_id", "x1")
      .withColumn("bbox_x1", round(col("x1"), 1))
      .withColumn("bbox_x2", round(col("x1") / 2 + 0.5, 2))
      .withColumn("bbox_y1", lit(0.25))
      .withColumn("bbox_y2", lit(0.75))
      .drop("x1")
    // Video shape (widget.py:276-284)
    val vids = Q.evTyped(s, sf, "click")
      .filter(col("user_id") <= 5).select(col("user_id").as("video_id"))
    // group=True contiguous shape (widget.py:296-305): the frame rows
    // regrouped per video with a num_frames lookup
    val numFrames = frames.groupBy("video_id")
      .agg((max(col("frame_number")) + 1).as("num_frames"))

    Seq(
      "widget_track" -> WidgetJson.trackResult(tracks, "Segment"),
      "widget_frame" -> WidgetJson.frameResult(frames, "Frame"),
      "widget_bbox" -> WidgetJson.bboxResult(boxes, "Face"),
      "widget_video" -> WidgetJson.videoResult(vids, "Video"),
      "widget_grouped" -> WidgetJson.groupedResult(frames, numFrames, "Frame"))
  }
}
