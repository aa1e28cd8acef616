package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal private[sql] bridge so graft's custom Catalyst expressions can
  * be exposed as user-facing Columns (the same technique Spark extension
  * libraries use: a tiny accessor compiled into the org.apache.spark.sql
  * package). Only pure conversions live here.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
