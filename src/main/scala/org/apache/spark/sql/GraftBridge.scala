package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column ↔ Expression converters — the one
  * place this library reaches into Spark's package-private API (the
  * Column constructor taking a raw Expression is no longer public in
  * Spark 4's split Column-node API). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
