package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 decoupled `Column` from Catalyst `Expression` (Spark Connect);
  * the bridge (`classic.ExpressionUtils`) is `private[sql]`, so custom
  * native expressions need this one-hop accessor inside the sql package
  * hierarchy — the standard extension-point pattern for libraries shipping
  * their own Catalyst expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
