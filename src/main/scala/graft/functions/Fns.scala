package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function library (SURVEY §2.8): bbox geometry, time, string,
  * array and vector helpers. All pure `Column` expressions — they stay
  * inside whole-stage codegen; no UDFs. The reference implemented these
  * as Python lambdas / Django F-expressions (e.g. bbox height
  * app/query/base_models.py:225-230, IoU app/esper/validation.py:51-64,
  * lowercase ratio app/esper/commercial_detection_rekall.py:88-97). */
object Fns {

  // ---------------- bbox geometry (normalized [0,1] coords) ----------
  def bboxHeight(y1: Column, y2: Column): Column = y2 - y1
  def bboxWidth(x1: Column, x2: Column): Column = x2 - x1
  def bboxArea(x1: Column, x2: Column, y1: Column, y2: Column): Column =
    (x2 - x1) * (y2 - y1)

  /** Intersection-over-union of two boxes (validation.py:51-64). */
  def iou(ax1: Column, ax2: Column, ay1: Column, ay2: Column,
          bx1: Column, bx2: Column, by1: Column, by2: Column): Column = {
    val ix = greatest(least(ax2, bx2) - greatest(ax1, bx1), lit(0.0))
    val iy = greatest(least(ay2, by2) - greatest(ay1, by1), lit(0.0))
    val inter = ix * iy
    val union = bboxArea(ax1, ax2, ay1, ay2) + bboxArea(bx1, bx2, by1, by2) - inter
    inter / union
  }

  /** a entirely left of b (panels_rekall.py:48-51 left_of edge). */
  def leftOf(ax2: Column, bx1: Column): Column = ax2 <= bx1

  /** |a-b| <= eps (panels_rekall.py same_value edge). */
  def sameValue(a: Column, b: Column, eps: Double): Column = abs(a - b) <= eps

  // ---------------- time ---------------------------------------------
  /** frame number -> seconds given fps (commercial_detection_rekall.py:42-44). */
  def frameToSecond(frame: Column, fps: Column): Column = frame / fps
  def secondToFrame(sec: Column, fps: Column): Column = floor(sec * fps)

  /** epoch nanos (events.ts read with nanosAsLong) -> epoch seconds.
    * Exact integer division — `floor(ts/1e9)` would round through double
    * (nanos ~1.7e18 exceed 2^53) and can land on the wrong second.
    * Requires the nanos column to be literally named `ts`. */
  val tsNanosToSec: Column = expr("ts div 1000000000")

  // ---------------- strings ------------------------------------------
  /** Fraction of letters that are lowercase
    * (commercial_detection_rekall.py:88-97 caption-case heuristic).
    * Letter-free text scores 0.0 (the nullif guard avoids ANSI-mode
    * DIVIDE_BY_ZERO on payloads with no letters). */
  def lowercaseRatio(s: Column): Column =
    coalesce(
      length(regexp_replace(s, "[^a-z]", "")).cast("double") /
        nullif(length(regexp_replace(s, "[^A-Za-z]", "")), lit(0)),
      lit(0.0))

  // ---------------- vectors (array<float>) ----------------------------
  /** Dot product via zip_with + aggregate — stays in codegen. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def l2norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  def l2dist(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, x) => acc + x))
}
