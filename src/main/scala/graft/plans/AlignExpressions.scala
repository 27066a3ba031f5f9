package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word-level sequence alignment (SURVEY "what's missing" closure —
  * reference: app/esper/transcript_alignment.py, which delegates to
  * scannertools' TranscriptAligner to align caption words against ASR
  * transcript words per 60 s segment). The alignment core is token-
  * level Levenshtein distance: the minimum number of word inserts /
  * deletes / substitutions turning one token sequence into the other —
  * the quantity behind the aligner's word_missing / word_error stats.
  *
  * Expressed as a native Catalyst expression (a two-row DP in one
  * tight loop per row) rather than nested higher-order functions: the
  * HOF form would rebuild the DP row with an O(n) array append per
  * cell — O(n^2 m) interpreted work — where this is O(n m) primitive
  * ints inside whole-stage codegen. Scale shape: alignment runs
  * per-pair (embarrassingly parallel, no shuffle of its own); callers
  * bound the candidate pairs (near-dup pairs, or per-segment splits
  * exactly like the reference's SEG_LENGTH=60 windows) so the DP cost
  * per row stays bounded.
  */
case class TokenEditDistance(left: Expression, right: Expression)
  extends BinaryExpression {

  private def ok(dt: DataType) = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<string> arguments, got " +
        Seq(left.dataType, right.dataType).map(_.simpleString).mkString(", "))
  override def prettyName: String = "token_edit_distance"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(
      AlignDp.dist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.AlignDp.dist($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
}

/** The DP kernel, as a forwarder-friendly object so generated code can
  * call it statically. Null tokens compare equal only to null. */
object AlignDp {
  def dist(x: ArrayData, y: ArrayData): Long = {
    val n = x.numElements(); val m = y.numElements()
    if (n == 0) return m.toLong
    if (m == 0) return n.toLong
    val xs = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      xs(i) = if (x.isNullAt(i)) null else x.getUTF8String(i); i += 1
    }
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    i = 0
    while (i <= n) { prev(i) = i; i += 1 }
    var j = 1
    while (j <= m) {
      val bj = if (y.isNullAt(j - 1)) null else y.getUTF8String(j - 1)
      cur(0) = j
      var k = 1
      while (k <= n) {
        val ak = xs(k - 1)
        val cost =
          if (ak == null || bj == null) { if (ak == null && bj == null) 0 else 1 }
          else if (ak.equals(bj)) 0 else 1
        var best = prev(k) + 1
        if (cur(k - 1) + 1 < best) best = cur(k - 1) + 1
        if (prev(k - 1) + cost < best) best = prev(k - 1) + cost
        cur(k) = best
        k += 1
      }
      val t = prev; prev = cur; cur = t
      j += 1
    }
    prev(n).toLong
  }
}
