package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{classic, Column}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ↔ catalyst Expression converters.
  *
  * Spark 4 wraps `Column` around a `ColumnNode` rather than an
  * `Expression`; the supported converters live in
  * `org.apache.spark.sql.classic.ExpressionUtils` (private[sql]). Library
  * code extending Catalyst needs exactly these two hops, so this object —
  * compiled inside the `org.apache.spark.sql` package namespace, the same
  * pattern used by public Spark extension libraries — re-exports them.
  */
object ColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
