package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ↔ Expression converters.
  *
  * Spark 4 made `Column` a ColumnNode wrapper; building a Column from a
  * custom Catalyst `Expression` (or reading one back) now goes through
  * `classic.ExpressionUtils`, which is `private[sql]`. This object lives
  * in `org.apache.spark.sql` solely to re-export those two converters to
  * graft's expression pack — no Spark internals are modified or copied.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
