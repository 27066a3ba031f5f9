package graft.result

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Presentation layer reproducing the reference UI's uniform result
  * JSON (SURVEY §3.1; app/esper/widget.py:104-307 `qs_to_result`):
  * `{result: [group{type, label, elements}], count, type}`, with the
  * four element shapes the reference dispatches on — Frame-like
  * (widget.py:153-163), bbox-like frame-major (widget.py:165-254),
  * Track (widget.py:256-274) and Video (widget.py:276-284) — built
  * with named structs + to_json so the shaping itself stays
  * distributed; only the final single-row JSON string reaches the
  * driver. */
object WidgetJson {

  /** Aggregate flat/labeled groups `g` (+ per-group count `n`) into the
    * envelope string. */
  private def finish(groups: DataFrame, resultType: String): String = {
    val row = groups.agg(
      to_json(struct(
        sort_array(collect_list(col("g"))).as("result"))).as("body"),
      sum(col("n")).as("count")).head()
    val body = row.getAs[String]("body")
    val total = row.getAs[Long]("count")
    // splice count/type into the envelope (stays a flat JSON object)
    body.dropRight(1) + s""","count":$total,"type":"$resultType"}"""
  }

  private def flatGroup(element: Column): Column =
    struct(lit("flat").as("type"), lit("").as("label"),
      array(element).as("elements"))

  /** Track-like rows (video_id, min_frame, max_frame, label) -> one
    * JSON string in the widget contract (widget.py:256-274), grouped
    * by label. */
  def trackResult(df: DataFrame, resultType: String): String = {
    val groups = df
      .groupBy(col("label"))
      .agg(
        sort_array(collect_list(struct(
          col("video_id").as("video"),
          col("min_frame"), col("max_frame")))).as("elements"),
        count(lit(1)).as("n")
      )
      .select(struct(lit(resultType).as("type"), col("label"),
        col("elements")).as("g"), col("n"))
    finish(groups, resultType)
  }

  /** Frame-like rows (video_id, frame_number) -> flat groups of
    * `{video, min_frame, objects: []}` (widget.py:153-163). */
  def frameResult(df: DataFrame, resultType: String): String = {
    val groups = df.select(
      flatGroup(struct(col("video_id").as("video"),
        col("frame_number").as("min_frame"),
        array().cast("array<string>").as("objects"))).as("g"),
      lit(1L).as("n"))
    finish(groups, resultType)
  }

  /** Bbox-like rows (video_id, frame_number, obj_id, bbox_x1, bbox_x2,
    * bbox_y1, bbox_y2) -> frame-major elements: all boxes of a frame in
    * one `{video, min_frame, objects: [bbox...]}` element
    * (widget.py:165-254 frame_major path; bbox dict widget.py:51-59).
    * count = number of boxes, as in the reference's result.count(). */
  def bboxResult(df: DataFrame, resultType: String): String = {
    val groups = df
      .groupBy(col("video_id"), col("frame_number"))
      .agg(sort_array(collect_list(struct(
          col("obj_id").as("id"), lit("bbox").as("type"),
          col("bbox_x1"), col("bbox_x2"),
          col("bbox_y1"), col("bbox_y2")))).as("objects"),
        count(lit(1)).as("n"))
      .select(
        flatGroup(struct(col("video_id").as("video"),
          col("frame_number").as("min_frame"), col("objects"))).as("g"),
        col("n"))
    finish(groups, resultType)
  }

  /** Video rows (video_id) -> flat groups of `{video, min_frame: 0}`
    * (widget.py:276-284). */
  def videoResult(df: DataFrame, resultType: String): String = {
    val groups = df.select(col("video_id")).distinct()
      .select(
        flatGroup(struct(col("video_id").as("video"),
          lit(0).as("min_frame"))).as("g"),
        lit(1L).as("n"))
    finish(groups, resultType)
  }

  /** group=True contiguous shape (widget.py:296-305): ONE group per
    * video — `{type:'contiguous', label: <video>, num_frames,
    * elements:[{video, segments:[frame dicts sorted by min_frame],
    * color}]}` — groups ordered by video id. `frames` carries
    * (video_id, frame_number); `videos` the (video_id, num_frames)
    * lookup the reference pulls from its Video table. The whole
    * grouping/sorting happens distributed; only the final JSON row is
    * driver-side, as with the other shapes. */
  def groupedResult(frames: DataFrame, videos: DataFrame,
                    resultType: String, color: String = "red"): String = {
    val segs = frames
      .groupBy(col("video_id"))
      .agg(sort_array(collect_list(struct(
          col("frame_number").as("min_frame")))).as("ord"),
        count(lit(1)).as("n"))
      .join(videos.select(col("video_id"), col("num_frames")), "video_id")
    val groups = segs.select(
      struct(lit("contiguous").as("type"),
        col("video_id").as("label"),
        col("num_frames"),
        array(struct(
          col("video_id").as("video"),
          transform(col("ord"), s => struct(
            col("video_id").as("video"),
            s.getField("min_frame").as("min_frame"),
            array().cast("array<string>").as("objects"))).as("segments"),
          lit(color).as("color"))).as("elements")).as("g"),
      col("n"))
    finish(groups, resultType)
  }
}
