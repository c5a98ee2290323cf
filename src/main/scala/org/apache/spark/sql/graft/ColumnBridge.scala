package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved the Column↔catalyst-Expression bridge behind
  * `private[sql] org.apache.spark.sql.classic.ExpressionUtils`; this
  * shim (compiled into an `org.apache.spark.sql` subpackage for access)
  * is the single place the library touches it, needed to expose the
  * custom codegen expressions in [[graft.functions.Kernels]] as
  * user-facing `Column`s.
  */
object ColumnBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
