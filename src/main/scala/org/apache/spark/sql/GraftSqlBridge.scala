package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the private[sql] Column ⇄ Expression converters —
  * the standard pattern for Spark extension libraries that define
  * native Catalyst expressions (Spark 4 moved Column to sql-api and
  * hid the classic constructors).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
