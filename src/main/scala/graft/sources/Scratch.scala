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

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
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
            try deleteRecursively(f)
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
}
