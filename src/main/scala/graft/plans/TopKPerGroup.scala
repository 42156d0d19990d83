package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.CatalystBridge

/** Whole-operator extension (SURVEY.md §7.3, rung (c) of the escalation
  * ladder): top-k rows per group as a FIRST-CLASS physical operator —
  * custom `LogicalPlan` node + `SparkStrategy` + `SparkPlan`, the same
  * three pieces Spark's own operators are made of.
  *
  * Why not the window formulation (`row_number().over(...)  <= k`)?
  * The window operator must SORT every group's full row set (a
  * per-partition spillable sort of ALL rows) before it can rank. For
  * top-k the sort is wasted work: a bounded heap per group keeps at
  * most k rows at any moment — O(n log k) comparisons, O(groups·k)
  * memory, no spill files, no sort. At 100 TB with small k this is the
  * difference between a streaming pass and a multi-terabyte sort.
  *
  * The reference has no analog (its nodes are opaque Go functions); this
  * operator exists because Spark's planner lets a library add missing
  * relational algebra natively rather than via RDD escape hatches.
  */
final case class TopKPerGroup(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Physical bounded-heap top-k. `requiredChildDistribution` asks the
  * planner for hash-clustering on the group keys, so the operator slots
  * into Catalyst's exchange planning exactly like a native aggregate:
  * one shuffle if the child isn't already co-partitioned, zero if it is
  * (e.g. reading a table bucketed on the keys). */
final case class TopKPerGroupExec(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  // Empty keys = global top-k: every row must reach one partition
  // (AllTuples); ClusteredDistribution(Nil) is rejected by Spark.
  override def requiredChildDistribution: Seq[Distribution] =
    (if (keys.isEmpty) org.apache.spark.sql.catalyst.plans.physical.AllTuples
     else ClusteredDistribution(keys)) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keys, schema)
      // Codegen'd row comparator honoring the SortOrder directions:
      // compare(a, b) < 0  ⇔  a ranks ahead of b.
      val ord = GenerateOrdering.generate(order, schema)
      // Min-heap under the REVERSED ordering: the head is the worst row
      // currently kept, so each admit/evict is O(log k).
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](math.min(k, 16), worstFirst)
          heaps.put(key.copy(), heap) // projection buffer is reused — copy
        }
        if (heap.size < k) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values.asScala.iterator.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Planner strategy mapping the logical node to the physical operator —
  * injectable at session build time (`GraftExtensions`) or attached to a
  * live session via `spark.experimental.extraStrategies` ([[TopK.install]]). */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(k, keys, order, child) =>
      TopKPerGroupExec(k, keys, order, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** User-facing API. */
object TopK {

  /** Attach [[TopKStrategy]] to a live session (idempotent). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy

  /** Top-k rows per group of `keys`, ranked by `order` (use `.desc`/
    * `.asc` Columns; bare Columns rank ascending). Row set equals the
    * window formulation `row_number().over(partitionBy(keys).orderBy(
    * order)) <= k` — without its full per-group sort. */
  def topKPerGroup(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    install(df.sparkSession)
    val sortOrder = order.map(c => CatalystBridge.convertedExpression(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    CatalystBridge.ofRows(df.sparkSession,
      TopKPerGroup(k, keys.map(CatalystBridge.convertedExpression),
        sortOrder, df.queryExecution.analyzed))
  }
}
