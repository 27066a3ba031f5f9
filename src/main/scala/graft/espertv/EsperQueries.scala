package graft.espertv

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.IntervalOps
import graft.operators.IntervalOps.{Allen, Cols}
import graft.functions.Fns

/** The reference's flagship domain pipelines, re-expressed as
  * compositions of IntervalOps/Fns over Esper-shaped DataFrames
  * (SURVEY §3.2, §7.2). Inputs use the FIXTURES.md family-A schemas:
  *
  *  - shots-like interval tables: (video_id, s, e) in seconds
  *  - identity labels: (video_id, s, e, identity, probability)
  *  - captions: (video_id, s, e, text)
  *  - faces: (frame_id, video_id, bbox_x1..y2)
  *  - labeled ground truth: (video_id, s, e)
  *
  * Everything is per-video keyed -> partitions by video_id at scale;
  * no driver-side loops (contrast: reference's per-video Python lists,
  * app/esper/rekall.py:39-47).
  */
object EsperQueries {

  private val C = Cols("video_id", "s", "e")

  // ------------------------------------------------------------------
  /** "Interview with person X" (reference:
    * app/esper/queries/interview_with_person_x.py:5-68): spans where
    * the guest and host alternate/overlap with gaps <= maxGap, merged
    * and kept when the resulting segment is >= minTotal seconds. */
  def interviews(guestShots: DataFrame, hostShots: DataFrame,
                 maxGap: Long = 20, minTotal: Long = 45): DataFrame = {
    val g = IntervalOps.coalesce(guestShots.select("video_id", "s", "e"), C)
    val h = IntervalOps.coalesce(hostShots.select("video_id", "s", "e"), C)
    // guest segment adjacent to (or overlapping) a host segment
    val paired = IntervalOps.mergeSpans(g, h,
      Allen.orPred(Allen.before(maxGap), Allen.after(maxGap), Allen.overlapsPred _), C)
    val overlapped = IntervalOps.overlaps(g, h, C)
    val cand = IntervalOps.coalesce(IntervalOps.union(paired, overlapped), C)
    // close remaining alternation gaps then enforce minimum length
    val smoothed = IntervalOps.smooth(cand, maxGap / 2, C)
    IntervalOps.filterLength(smoothed, minTotal, Long.MaxValue, C)
      .orderBy("video_id", "s")
  }

  // ------------------------------------------------------------------
  /** Commercial detection (reference:
    * app/esper/commercial_detection_rekall.py:17-337): candidate blocks
    * from black-frame boundaries and lowercase-caption runs, merged with
    * the stack-fold bounded coalesce (cap at maxCommercial), minus
    * live-content markers ('>>' captions), kept in [minLen, maxCommercial]. */
  def commercials(blackFrames: DataFrame, captions: DataFrame,
                  minLen: Long = 10, maxCommercial: Long = 300): DataFrame = {
    val black = IntervalOps.coalesce(
      IntervalOps.dilate(blackFrames.select("video_id", "s", "e"), 2, C,
        clampAtZero = true), C)
    val lowercase = captions
      .filter(Fns.lowercaseRatio(col("text")) > 0.5)
      .select("video_id", "s", "e")
    val lcRuns = IntervalOps.smooth(
      IntervalOps.coalesce(lowercase, C, gap = 5), 2, C)
    val live = captions.filter(col("text").contains(">>"))
      .select("video_id", "s", "e")
    val liveRuns = IntervalOps.coalesce(live, C, gap = 5)
    val cand = IntervalOps.boundedCoalesce(
      IntervalOps.union(black, lcRuns), maxCommercial, C)
    val noLive = IntervalOps.minus(cand, liveRuns, C)
    IntervalOps.filterLength(noLive, minLen, maxCommercial, C)
      .orderBy("video_id", "s")
  }

  /** Precision/recall of detections vs hand labels with IoU matching
    * (reference: app/esper/validation.py:84-133). */
  def prf(detected: DataFrame, labeled: DataFrame, iouMin: Double = 0.5): DataFrame = {
    val d = detected.select(col("video_id"), col("s"), col("e"))
    val l = labeled.select(col("video_id").as("v2"), col("s").as("ls"), col("e").as("le"))
    val matched = d.join(l, col("video_id") === col("v2") &&
        col("ls") < col("e") && col("le") > col("s"))
      .withColumn("iou",
        (least(col("e"), col("le")) - greatest(col("s"), col("ls"))).cast("double") /
          (greatest(col("e"), col("le")) - least(col("s"), col("ls"))).cast("double"))
      .filter(col("iou") >= iouMin)
    // one Spark job: the three counts are single-row aggregates joined
    // by cross product (each side is one row), not driver-side count()s
    val tp = matched.select("video_id", "s", "e").distinct()
      .agg(count(lit(1)).as("tp"))
    val nd = d.agg(count(lit(1)).as("n_detected"))
    val nl = labeled.agg(count(lit(1)).as("n_labeled"))
    tp.crossJoin(nd).crossJoin(nl)
      .select(col("tp"), col("n_detected"), col("n_labeled"),
        when(col("n_detected") === 0, 0.0)
          .otherwise(col("tp").cast("double") / col("n_detected")).as("precision"),
        when(col("n_labeled") === 0, 0.0)
          .otherwise(col("tp").cast("double") / col("n_labeled")).as("recall"))
  }

  // ------------------------------------------------------------------
  /** Probabilistic screen time per identity (reference:
    * app/esper/spark_util.py:629-663, spark_identity.py:12-85):
    * E = sum(dur * p), Var = sum(p * (1-p) * dur^2). */
  def screenTime(identitySpans: DataFrame): DataFrame = {
    val dur = (col("e") - col("s")).cast("double")
    identitySpans.groupBy(col("identity"))
      .agg(sum(dur * col("probability")).as("expected_sec"),
        sum(col("probability") * (lit(1.0) - col("probability")) * dur * dur)
          .as("variance_sec2"),
        count(lit(1)).as("n_spans"))
  }

  // ------------------------------------------------------------------
  /** Panels: frames with exactly N same-row faces, left-to-right
    * (reference: app/esper/queries/panels_rekall.py:10-57 scene graph;
    * panels_sql.py:13-18 exact-count). Returns qualifying frame ids. */
  def panels(faces: DataFrame, n: Int = 3, minHeight: Double = 0.3,
             yEps: Double = 0.05): DataFrame = {
    val tall = faces.filter(col("bbox_y2") - col("bbox_y1") >= minHeight)
    val counted = tall.groupBy(col("video_id"), col("frame_id"))
      .agg(count(lit(1)).as("n_faces"),
        (max(col("bbox_y1")) - min(col("bbox_y1"))).as("y_spread"),
        sort_array(collect_list(struct(col("bbox_x1"), col("bbox_x2")))).as("xs"))
    counted.filter(col("n_faces") === n && col("y_spread") <= yEps)
      // left-to-right: each box starts after the previous box ends
      .withColumn("ordered", forall(
        zip_with(slice(col("xs"), 1, n - 1), slice(col("xs"), 2, n - 1),
          (a, b) => b.getField("bbox_x1") >= a.getField("bbox_x2")),
        x => x))
      .filter(col("ordered"))
      .select("video_id", "frame_id", "n_faces")
  }
}
