package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** MANIFEST-PINNED SNAPSHOT READS — the Iceberg/Delta move applied to
  * the library's staged artifacts: a reader resolves an artifact's
  * file set from its last COMMITTED snapshot listing instead of a live
  * directory listing, so a publish that replaces partition directories
  * one rename at a time (Incremental.publishManifest — the round-10
  * verdict's tear window) can never hand a concurrent probe a mix of
  * pre- and post-night partitions.
  *
  * Protocol: after every publish (and after a write-once artifact's
  * initial build) the writer lists the artifact's data files and
  * commits them as `_snapshots/SNAP-<n>` via the tmp-write + atomic-
  * rename discipline the night manifest uses. A pinned reader takes
  * the highest committed SNAP and scans EXACTLY those files (with
  * `basePath` set so partition-directory columns and planning-time
  * partition pruning survive).
  *
  * The no-tear guarantee: a replace publishes by delete-then-rename,
  * and staged part-file names are fresh UUIDs — so a pinned reader
  * racing a publish either sees its full pinned file set (a consistent
  * PRE-night view) or hits a missing file and FAILS (the retry then
  * resolves the post-night SNAP — a consistent POST-night view). A
  * silently torn result is structurally impossible: an old path never
  * resolves to new data. Commit is idempotent by content: re-publishing
  * an already-applied manifest (crash recovery, at-least-once replays)
  * finds the listing unchanged and commits nothing, so recovery stays
  * a structural no-op.
  *
  * Scale note (100 TB): one flat listing file per artifact version is
  * the fixture-scale form; production shards the listing per partition
  * (Iceberg's manifest-list/manifest split) and writes it from the
  * same commit point. GC of superseded snapshots rides the retention
  * pass (the done-log housekeeping family).
  */
object Pinned {

  private val SnapDir = "_snapshots"
  private val SnapRe = "SNAP-(\\d{8})".r

  private def walk(f: java.io.File): Seq[java.io.File] =
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
    else Seq(f)

  /** The artifact's CURRENT data files, relative to `root` — hidden
    * files, markers, and the snapshot log itself excluded. */
  private def dataFiles(root: java.io.File): Seq[String] =
    Option(root.listFiles()).toSeq.flatten
      .filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
      .flatMap(walk)
      .filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
      .map(_.getPath.stripPrefix(root.getPath).stripPrefix("/"))
      .sorted

  /** The highest committed snapshot: (version, relative file paths). */
  def resolve(root: java.io.File): Option[(Int, Seq[String])] = {
    val snaps = Option(new java.io.File(root, SnapDir).listFiles())
      .toSeq.flatten
      .flatMap(f => f.getName match {
        case SnapRe(n) => Some((n.toInt, f))
        case _ => None
      })
    if (snaps.isEmpty) None
    else {
      val (v, f) = snaps.maxBy(_._1)
      val lines = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
        .split("\n").toSeq.filter(_.nonEmpty)
      Some((v, lines))
    }
  }

  /** Commit the artifact's current file listing as the next snapshot.
    * Content-idempotent: if the listing equals the latest committed
    * SNAP, nothing is written (recovery republishes and replays stay
    * structural no-ops). Caller must be the single writer (the night
    * lease); the rename is the only visibility point. RETENTION: only
    * the latest two snapshots are kept (the done-log discipline — a
    * census file per publish forever is the marker-file mistake
    * again). Older listings are stale by construction — the publish
    * that superseded them already deleted their replaced data files —
    * and a reader that resolved one holds its file list in memory, so
    * deleting the listing file cannot affect an in-flight scan; the
    * previous version is kept so a reader racing the commit can still
    * re-resolve one step back. */
  def commit(root: java.io.File): Int = {
    val files = dataFiles(root)
    resolve(root) match {
      case Some((v, listed)) if listed == files => v
      case prior =>
        val next = prior.map(_._1).getOrElse(0) + 1
        val dir = new java.io.File(root, SnapDir)
        dir.mkdirs()
        val tmp = new java.io.File(dir, f"SNAP-$next%08d.tmp")
        java.nio.file.Files.write(tmp.toPath,
          files.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        java.nio.file.Files.move(tmp.toPath,
          new java.io.File(dir, f"SNAP-$next%08d").toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        Option(dir.listFiles()).toSeq.flatten.foreach { f =>
          f.getName match {
            case SnapRe(n) if n.toInt < next - 1 => f.delete(): Unit
            case _ => ()
          }
        }
        next
    }
  }

  /** Pinned read: scan exactly the last committed snapshot's files.
    * `basePath` keeps partition-directory columns (and partition
    * pruning) identical to a directory read. An artifact without a
    * committed snapshot is a wiring bug — fail loud. */
  def read(s: SparkSession, root: java.io.File): DataFrame = {
    val (_, files) = resolve(root).getOrElse(
      throw new IllegalStateException(
        s"pinned read: no committed snapshot under $root — " +
          "the writer must Pinned.commit after publishing"))
    val paths = files.map(f => new java.io.File(root, f).getPath)
    if (paths.isEmpty)
      throw new IllegalStateException(
        s"pinned read: snapshot under $root lists no data files")
    s.read.option("basePath", root.getPath).parquet(paths: _*)
  }
}
