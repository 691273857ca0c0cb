package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ catalyst Expression bridge. Spark 4 removed the public
  * `new Column(expr)` constructor; the supported conversion lives in
  * `classic.ExpressionUtils`, which is `private[sql]` — so this one-file
  * shim sits inside the package, the same pattern Spark-extension
  * libraries use to surface custom Catalyst expressions as Columns.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
