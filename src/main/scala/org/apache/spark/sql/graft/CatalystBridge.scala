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

  /** Fully convert a Column to a catalyst Expression (no lazy
    * ColumnNodeExpression wrapper). `expression` above defers conversion
    * to the Dataset API boundary — fine for expressions routed back
    * through select/filter, wrong for expressions embedded in a custom
    * LogicalPlan, which the converter never visits. */
  def convertedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Register a function builder on an already-built session (the
    * extensions route in GraftExtensions needs the session to be built
    * with the config; this covers attaching at runtime). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Wrap a logical plan as a DataFrame (Dataset.ofRows is private[sql];
    * custom logical nodes need this to re-enter the public Dataset API). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Unload every loaded state-store provider (in-memory state maps).
    * A finished AvailableNow query's providers otherwise stay loaded for
    * the life of the executor — harmless for one query, but a run that
    * executes MANY bounded streaming queries in one JVM (Verify/Bench)
    * accumulates every query's state in memory. Next streaming query
    * reloads its providers from checkpoint on demand. */
  def unloadStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()
}
