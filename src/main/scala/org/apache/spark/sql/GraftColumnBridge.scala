package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters — the
  * supported way to wrap a custom Catalyst [[Expression]] as a user
  * [[Column]] changed in Spark 4 (the public `new Column(expr)`
  * constructor is gone; `classic.ExpressionUtils` took its place but is
  * sql-package-private). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
