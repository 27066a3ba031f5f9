package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector expressions (SURVEY §7.3 tier b, round-2 roadmap
  * "more doGenCode"): the embedding hot path — dot product, L2 norm,
  * cosine — as codegen'd loops over packed float/double arrays. The
  * higher-order-function forms (`zip_with` + `aggregate`) evaluate an
  * interpreted lambda per element; these stay inside whole-stage
  * codegen and read primitives straight out of ArrayData. Reduction
  * order is identical to the left-fold the HOF form computes, so
  * results are bit-equal (NativeExprSpec proves it). Null elements
  * contribute 0 (embedding arrays carry no nulls; documented
  * deviation from zip_with's null-propagation).
  */
private[plans] object VecExprs {
  def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
  def jGet(dt: DataType, arr: String, i: String): String = dt match {
    case ArrayType(FloatType, _) => s"(double) $arr.getFloat($i)"
    case _ => s"$arr.getDouble($i)"
  }
  def sGet(dt: DataType, arr: ArrayData, i: Int): Double = dt match {
    case ArrayType(FloatType, _) => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }
  def check(name: String, dts: Seq[DataType]): TypeCheckResult =
    if (dts.forall(elemOk)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects array<float|double> arguments, got " +
        dts.map(_.simpleString).mkString(", "))
}

/** Sum of pairwise products over the common prefix of two vectors. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  import VecExprs._
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    check(prettyName, Seq(left.dataType, right.dataType))
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        s += sGet(left.dataType, x, i) * sGet(right.dataType, y, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
            $s += ${jGet(left.dataType, a, i)} * ${jGet(right.dataType, b, i)};
          }
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
}

/** sqrt of the sum of squares. */
case class VecNorm2(child: Expression) extends UnaryExpression {
  import VecExprs._
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    check(prettyName, Seq(child.dataType))
  override def prettyName: String = "vec_norm2"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0; var i = 0
    val n = x.numElements()
    while (i < n) {
      if (!x.isNullAt(i)) { val v = sGet(child.dataType, x, i); s += v * v }
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val v = ctx.freshName("v")
      s"""
        int $n = $a.numElements();
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i)) {
            double $v = ${jGet(child.dataType, a, i)};
            $s += $v * $v;
          }
        }
        ${ev.value} = Math.sqrt($s);
      """
    })

  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** Single-pass SQUARED L2 distance: sum((a_i - b_i)^2), no sqrt — the
  * integer-exact kernel of the quantized Lloyd plane (inputs are
  * integer-valued doubles on the int8 grid, so every term and the sum
  * are exact below 2^53). Pairs missing in either array (length
  * mismatch) contribute 0, matching zip_with's truncating semantics. */
case class VecL2Sq(left: Expression, right: Expression) extends BinaryExpression {
  import VecExprs._
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    check(prettyName, Seq(left.dataType, right.dataType))
  override def prettyName: String = "vec_l2sq"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val d = sGet(left.dataType, x, i) - sGet(right.dataType, y, i)
        s += d * d
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
            double $d = ${jGet(left.dataType, a, i)} - ${jGet(right.dataType, b, i)};
            $s += $d * $d;
          }
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
}

/** Single-pass cosine: dot and both norms in one loop —
  * dot / (sqrt(na) * sqrt(nb)), identical IEEE result to computing the
  * three folds separately. */
case class VecCosine(left: Expression, right: Expression) extends BinaryExpression {
  import VecExprs._
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    check(prettyName, Seq(left.dataType, right.dataType))
  override def prettyName: String = "vec_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    val n = math.min(nx, ny)
    var d = 0.0; var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        d += sGet(left.dataType, x, i) * sGet(right.dataType, y, i)
      i += 1
    }
    var na = 0.0; i = 0
    while (i < nx) {
      if (!x.isNullAt(i)) { val v = sGet(left.dataType, x, i); na += v * v }
      i += 1
    }
    var nb = 0.0; i = 0
    while (i < ny) {
      if (!y.isNullAt(i)) { val v = sGet(right.dataType, y, i); nb += v * v }
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val v = ctx.freshName("v")
      s"""
        int ${i}n = Math.min($a.numElements(), $b.numElements());
        double $d = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < ${i}n; $i++) {
          if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
            $d += ${jGet(left.dataType, a, i)} * ${jGet(right.dataType, b, i)};
          }
        }
        for (int $i = 0; $i < $a.numElements(); $i++) {
          if (!$a.isNullAt($i)) {
            double $v = ${jGet(left.dataType, a, i)};
            $na += $v * $v;
          }
        }
        for (int $i = 0; $i < $b.numElements(); $i++) {
          if (!$b.isNullAt($i)) {
            double $v = ${jGet(right.dataType, b, i)};
            $nb += $v * $v;
          }
        }
        ${ev.value} = $d / (Math.sqrt($na) * Math.sqrt($nb));
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
}
