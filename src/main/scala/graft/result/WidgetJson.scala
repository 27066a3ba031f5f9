package graft.result

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Presentation layer reproducing the reference UI's uniform result
  * JSON (SURVEY §3.1; app/esper/widget.py:104-307 `qs_to_result`):
  * `{result: [group{type, label, elements: [{video, min_frame,
  * max_frame}]}], count, type}` — built with named structs + to_json so
  * the shaping itself stays distributed; only the final single-row JSON
  * string reaches the driver. */
object WidgetJson {

  /** Track-like rows (video_id, min_frame, max_frame, label) -> one
    * JSON string in the widget contract. */
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
    val row = groups.agg(
      to_json(struct(
        sort_array(collect_list(col("g"))).as("result"))).as("body"),
      sum(col("n")).as("count")).head()
    val body = row.getAs[String]("body")
    val total = row.getAs[Long]("count")
    // splice count/type into the envelope (stays a flat JSON object)
    body.dropRight(1) + s""","count":$total,"type":"$resultType"}"""
  }
}
