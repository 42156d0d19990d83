package graft.sources

import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicBoolean

/** Scratch-directory discipline for every on-disk artifact the library
  * stages under java.io.tmpdir (io-query round-trip dirs, streaming
  * sink-as-state dirs, staged gram/feed/index artifacts).
  *
  * Two rules, both learned the hard way:
  *
  *  1. **Every dir is scoped by (applicationId, fixture).** A fixed
  *     shared path (the old `graft_io10`) lets two concurrent processes
  *     interleave a static overwrite, a dynamic overwrite and the
  *     read-back into corrupt or cross-fixture results; the app id makes
  *     writers disjoint, the fixture slug keeps one JVM's runs at
  *     different scale factors disjoint.
  *
  *  2. **Stale dirs from dead runs are reaped at staging time.** Scoped
  *     dirs accumulate across JVMs (each run mints a new applicationId),
  *     so repeated bench/verify runs would grow /tmp without bound. The
  *     first staging call per JVM deletes `graft_*` entries that belong
  *     to a DIFFERENT application and have not been touched for an hour
  *     — old enough that a live concurrent process (whose artifacts are
  *     minutes old) is never raced.
  */
object Scratch {

  private val cleaned = new AtomicBoolean(false)
  private val StaleAfterMs = 60L * 60L * 1000L

  private def tmpRoot = new java.io.File(System.getProperty("java.io.tmpdir"))

  /** Recursive delete — THE shared file-tree removal helper (like
    * [[snapshotTree]], one definition for every staged-artifact
    * lifecycle: night staging, ledger compaction, cell swaps). */
  def deleteRec(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRec)
    f.delete(): Unit
  }

  /** Reap stale graft_* scratch dirs left by previous JVMs. Idempotent,
    * runs once per process; failures are non-fatal (a half-deleted
    * stale dir is still stale next run). */
  def cleanupStale(s: SparkSession): Unit =
    if (cleaned.compareAndSet(false, true)) {
      val appId = s.sparkContext.applicationId
      val cutoff = System.currentTimeMillis() - StaleAfterMs
      val entries = tmpRoot.listFiles()
      if (entries != null)
        entries.foreach { f =>
          if (f.getName.startsWith("graft_") && !f.getName.contains(appId) &&
              f.lastModified() < cutoff)
            try deleteRec(f)
            catch { case _: Exception => () }
        }
    }

  /** Scratch dir for `tag`, scoped by application and fixture. The
    * caller owns the lifecycle (overwrite / delete-then-append). */
  def dir(s: SparkSession, d: String, tag: String): String = {
    cleanupStale(s)
    new java.io.File(tmpRoot,
      s"graft_${tag}_" + s.sparkContext.applicationId + "_" +
        d.replaceAll("[^A-Za-z0-9]", "_")).getPath
  }

  /** Bucket width for KEY-PARTITIONED staged serving artifacts (funnel
    * drop set / canonical map, BPE dict / doc stats, doc text, quality):
    * every artifact a per-micro-batch consumer probes is laid out
    * partitioned by a key-derived bucket so the probe prunes to the
    * directories its keys touch (the IVF cell layout's discipline
    * applied to point lookups — the KV-store shape every real serving
    * path uses). 32 at fixture scale; production sizes this to
    * thousands so a trigger's probe reads a corpus FRACTION. */
  val ServeBuckets = 32

  /** Static bucket routing (st22's cell-routing discipline): restrict a
    * bucket-partitioned staged artifact to the buckets a BATCH-BOUNDED
    * probe touches. The collected bucket list is ≤ [[ServeBuckets]]
    * ints (the documented bounded-scalar class, like st22's cell list)
    * and becomes a static IN over the artifact's partition column —
    * planning-time directory pruning (PartitionFilters), so a trigger's
    * artifact read is O(touched buckets), never O(artifact). */
  /** File-tree snapshot for rewrite AUDITS (pl11's night audit, ss15's
    * delete compaction): relative path → (length, mtime) for every data
    * file under `root`, hidden files and _SUCCESS markers excluded.
    * (length, mtime) is a REWRITE DETECTOR, not a byte-identity proof —
    * a rewrite that produced identical bytes within the same mtime
    * granularity would pass — which is the right strength for "this
    * partition directory was not touched" audits. */
  def snapshotTree(root: java.io.File): Map[String, (Long, Long)] = {
    // "_"-prefixed entries are PROTOCOL state (markers, _staging,
    // _snapshots listings, the done-log, the writer lease), not
    // artifact content — the audits compare data files only (snapshot
    // GC legitimately retires old listings mid-run).
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten
          .filterNot(k => k.isDirectory && k.getName.startsWith("_"))
          .flatMap(walk)
      else Seq(f)
    walk(root)
      .filterNot(f => f.getName.startsWith(".") || f.getName.startsWith("_"))
      .map(f => f.getPath.stripPrefix(root.getPath) -> (f.length(), f.lastModified()))
      .toMap
  }

  def routeBuckets(artifact: org.apache.spark.sql.DataFrame, bktCol: String,
      probeBkts: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val bkts = probeBkts.distinct().collect().map(_.getInt(0)).toSeq
    if (bkts.isEmpty) artifact.filter(lit(false))
    else artifact.filter(col(bktCol).isin(bkts: _*))
  }
}
