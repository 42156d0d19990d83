package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util.{Map => JMap}

/** Minimal DataSourceV2 TableProvider: a deterministic row generator
  * with FILTER PUSHDOWN and COLUMN PRUNING — the "truly external
  * source" leg of SURVEY §2.1 F1 (a reference `StartFunc` that is not a
  * file, /root/reference/pipe/node.go:14; e.g. the integer generators in
  * /root/reference/pipe/node_test.go:20-27). The engine-facing contract
  * is what matters at 100 TB: the source advertises its capabilities,
  * Catalyst hands it `id` range predicates and the required column set,
  * and the source generates ONLY the surviving slice — scan work scales
  * with the query's selectivity, not the table's nominal size, exactly
  * like a parquet scan with PushedFilters/ReadSchema.
  *
  * Schema: id BIGINT (0 until `rows`), grp INT = id % 10,
  * val BIGINT = (id * 2654435761) % 1000000 — integer-exact closed
  * forms both engines reproduce (the DuckDB oracle runs the same
  * arithmetic over range()). Rows split into `partitions` contiguous
  * slices AFTER pushdown; each slice generates independently on its
  * executor (metadata-only planning, no driver materialization).
  *
  * Usage: spark.read.format("graft.sources.GenSource")
  *   .option("rows", n).option("partitions", p).load()
  */
class GenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenSource.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GenTable(
      properties.getOrDefault("rows", "100000").toLong,
      properties.getOrDefault("partitions", "8").toInt,
      properties.getOrDefault("rowsPerBatch", "0").toLong)
}

object GenSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("grp", IntegerType, nullable = false),
    StructField("val", LongType, nullable = false)))
  /** The generator's closed form — shared with the reader and the spec. */
  def valueOf(id: Long): Long = (id * 2654435761L) % 1000000L
}

final class GenTable(rows: Long, partitions: Int, rowsPerBatch: Long)
    extends Table with SupportsRead {
  override def name(): String = s"gen($rows)"
  override def schema(): StructType = GenSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(rows, partitions, rowsPerBatch)
}

/** Accepts `id` range predicates (narrowing [lo, hi) at plan time) and
  * the required column set; everything else is returned to Spark for
  * post-scan evaluation — the standard residual-filter contract. */
final class GenScanBuilder(rows: Long, partitions: Int, rowsPerBatch: Long = 0L)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = rows
  private var pushed = Array.empty[Filter]
  private var required: StructType = GenSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThan("id", v: Long)        => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
      case LessThan("id", v: Long)           => hi = math.min(hi, v); true
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, v + 1); true
      case EqualTo("id", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case _ => false
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new GenScan(lo, hi, partitions, required, rowsPerBatch)
}

final class GenScan(lo: Long, hi: Long, partitions: Int, required: StructType,
    rowsPerBatch: Long = 0L)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GenMicroBatchStream(lo, hi, partitions,
      if (rowsPerBatch <= 0) hi - lo else rowsPerBatch, required.fieldNames)
  // Surfaces the post-pushdown range in the plan string so a spec (and a
  // human reading .explain) can see the pushdown happened.
  override def description(): String =
    s"GenScan range=[$lo,$hi) cols=${required.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1L, math.min(partitions.toLong, math.max(0L, hi - lo)))
    val step = (hi - lo + n - 1) / math.max(n, 1L)
    (0L until n).map { i =>
      GenPartition(lo + i * step, math.min(hi, lo + (i + 1) * step))
    }.filter(p => p.lo < p.hi).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    GenReaderFactory(required.fieldNames)
}

final case class GenPartition(lo: Long, hi: Long) extends InputPartition

/** Offset = count of ids emitted so far (exclusive upper bound of the
  * last planned batch). */
final case class GenOffset(v: Long) extends Offset {
  override def json: String = v.toString
}

/** The streaming leg of the generator (SURVEY §2.1 F1 as a *stream*):
  * a Spark-4 `MicroBatchStream` with ADMISSION CONTROL — each trigger
  * admits at most `rowsPerBatch` ids, so one bounded source replays as
  * a deterministic sequence of micro-batches (the external-queue shape:
  * offsets are positions, batches are offset ranges, commit is a no-op
  * because the generator is replayable from any offset — the same
  * contract Kafka's DSv2 reader implements). `SupportsTriggerAvailableNow`
  * pins the end target, so `Trigger.AvailableNow` drains [lo, hi) in
  * ceil(span/rowsPerBatch) batches and stops; restart-from-checkpoint
  * resumes mid-stream via `deserializeOffset`.
  *
  * The batch cap is enforced in `latestOffset` for ANY read limit —
  * this source defines "available now" as one batch's worth, so batch
  * boundaries (and therefore per-batch outputs) are deterministic
  * regardless of trigger wrapping. */
final class GenMicroBatchStream(lo: Long, hi: Long, partitions: Int,
    rowsPerBatch: Long, cols: Array[String])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  override def prepareForTriggerAvailableNow(): Unit = ()
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)
  override def initialOffset(): Offset = GenOffset(lo)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: use latestOffset(start, limit)")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GenOffset].v
    val cap = limit match {
      case r: ReadMaxRows => math.min(rowsPerBatch, r.maxRows())
      case _              => rowsPerBatch
    }
    GenOffset(math.min(hi, s + math.max(1L, cap)))
  }
  override def reportLatestOffset(): Offset = GenOffset(hi)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[GenOffset].v, end.asInstanceOf[GenOffset].v)
    val n = math.max(1L, math.min(partitions.toLong, math.max(0L, e - s)))
    val step = (e - s + n - 1) / math.max(n, 1L)
    (0L until n).map { i =>
      GenPartition(s + i * step, math.min(e, s + (i + 1) * step))
    }.filter(p => p.lo < p.hi).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = GenReaderFactory(cols)
  override def deserializeOffset(json: String): Offset = GenOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class GenReaderFactory(cols: Array[String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GenPartition]
    new PartitionReader[InternalRow] {
      private var cur = gp.lo - 1
      override def next(): Boolean = { cur += 1; cur < gp.hi }
      override def get(): InternalRow =
        new GenericInternalRow(cols.map[Any] {
          case "id"  => cur
          case "grp" => (cur % 10L).toInt
          case "val" => GenSource.valueOf(cur)
        })
      override def close(): Unit = ()
    }
  }
}
