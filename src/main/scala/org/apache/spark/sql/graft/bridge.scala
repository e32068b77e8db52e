package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst Expression bridge.
  *
  * Spark 4 made `Column` a connect-compatible facade; the classic
  * conversions live behind `private[sql]` (`org.apache.spark.sql.classic.
  * ExpressionUtils`). This object sits inside the `org.apache.spark.sql`
  * package solely to re-export those two conversions to graft's custom
  * expressions — the standard extension-library technique.
  */
object bridge {
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
