package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge. Spark 4 scopes these conversions
  * `private[sql]` (the Column API became backend-agnostic for Connect),
  * so third-party native expressions reach them from a package object
  * under `org.apache.spark.sql` — the standard extension-library trick.
  * This is the only file outside the `graft` namespace. */
object CatalystBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
