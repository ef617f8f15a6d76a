package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's Column ⇄ Expression conversion, which is
  * `private[sql]` (`classic.ExpressionUtils`). Placed in the sql package —
  * the standard shim for libraries that define custom Catalyst expressions
  * against the classic SparkSession.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
