package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
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

  /** Register a function builder on an already-built session (the
    * extensions route in GraftExtensions needs the session to be built
    * with the config; this covers attaching at runtime). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
