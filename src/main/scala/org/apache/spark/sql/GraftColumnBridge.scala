package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression conversion for graft's native expressions.
  *
  * Spark 4 moved these helpers behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so extension libraries
  * need one public bridge compiled into the `org.apache.spark.sql` package
  * — the standard pattern for out-of-tree Catalyst expressions. No Spark
  * internals are modified; this only re-exports the two converters.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
