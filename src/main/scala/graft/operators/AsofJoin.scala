package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join: for every left row (key, t), attach
  * the right row with the greatest t' <= t for the same key — the
  * point-in-time lookup behind "state as of this event" queries
  * (session attribution, last-annotation-before-frame, slowly-changing
  * dims). Left-outer semantics: unmatched left rows keep null right
  * columns.
  *
  * Spark-first formulation: NOT a per-key theta join (whose candidate
  * set is |L_k| x |R_k| per key and quadratic on hot keys), but the
  * merge form — union both sides, one window partitioned by key and
  * ordered by (t, side-tag), and carry the latest right payload forward
  * with last(ignoreNulls) over an O(1) running frame. One shuffle on
  * the key, linear state, same plan shape at any per-key cardinality.
  * Right rows sort before left rows at equal t, so a right row at
  * exactly t matches (t' <= t inclusive — DuckDB ASOF `>=` semantics,
  * which the x06 oracle exercises).
  *
  * Precondition: at most one right row per (key, t) — pre-aggregate
  * the right side otherwise (ambiguous "latest" is not deterministic).
  */
object AsofJoin {

  /** @param rightCols right-side payload columns to attach (each must
    *   exist in `right`; emitted under the same name — pre-alias on the
    *   right side to avoid clashes with left column names). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
               rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!rightCols.exists(leftCols.contains),
      s"right payload ${rightCols.mkString(",")} clashes with left columns")
    val reserved = Seq("__tag", "__r", "__m")
    require(!(leftCols ++ rightCols).exists(reserved.contains),
      s"columns ${reserved.mkString("/")} are reserved by asofJoin")
    val payload = struct(rightCols.map(col): _*)
    val payloadType = right.select(payload.as("__r")).schema.head.dataType
    // left rows carry a null payload slot; right rows carry null left
    // payload — last(__r, ignoreNulls) then propagates the most recent
    // right payload to every subsequent row in (t, tag) order
    val lu = left.select(
      leftCols.map(col) :+ lit(1).as("__tag") :+
        lit(null).cast(payloadType).as("__r"): _*)
    // join semantics for nulls: a right row with a null key or null
    // time can never satisfy `r.key = l.key AND r.t <= l.t`, but the
    // window form would happily group/order it (nulls-first) and leak
    // its payload into every later left row — drop such rows up front.
    // Null-key/time LEFT rows need no special case: their partition
    // then holds no right rows (or, for null t ordered first, no
    // preceding right rows), so they surface with a null payload —
    // exactly the left-outer result.
    val ru = right
      .filter(col(key).isNotNull && col(time).isNotNull)
      .select(
        leftCols.map { c =>
          if (c == key || c == time) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c)
        } :+ lit(0).as("__tag") :+ payload.as("__r"): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lu.unionByName(ru)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col("__m").getField(c).as(c)): _*)
  }
}
