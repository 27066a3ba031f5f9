package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for the `private[sql]` Column <-> Expression bridge
  * (Spark 4 wraps Column around ColumnNode; custom expressions need
  * this to surface as Columns). Lives under org.apache.spark.sql so the
  * package-private API is reachable — the standard pattern for
  * extension libraries shipping native expressions. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
