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

  /** The `RowLevelOperation` inside Spark's private[sql]
    * `RowLevelOperationTable` wrapper, if `t` is one — the handle
    * graft's merge-carryover patch needs to recognize its own
    * group-CoW rewrites. */
  def rowLevelOperationOf(t: org.apache.spark.sql.connector.catalog.Table)
      : Option[org.apache.spark.sql.connector.write.RowLevelOperation] =
    t match {
      case rt: org.apache.spark.sql.connector.write.RowLevelOperationTable =>
        Some(rt.operation)
      case _ => None
    }
}
