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

  /** Flat-vs-sharded listing split point. Above this file count the
    * committed listing is SHARDED per top-level partition directory
    * (Iceberg's manifest-list/manifest split): `SNAP-n` becomes a
    * small manifest-list of `S|<shard>|<listing-file>` lines and the
    * per-shard file lists live under `SNAP-n.d/`. At 100 TB partition
    * counts the flat listing is itself a big-data object; the split
    * keeps the pointer read O(shards) and lets [[resolvePartitions]]
    * read ONLY the touched shards' listings. */
  private[sources] val ShardSplit = 64

  /** The highest committed snapshot: (version, relative file paths). */
  def resolve(root: java.io.File): Option[(Int, Seq[String])] =
    resolveWith(root, _ => true)

  /** [[resolve]] restricted to the given top-level partition dirs —
    * for a SHARDED snapshot only their listing files are opened
    * (untouched shards' listings are never read); a flat snapshot
    * degrades to the full read filtered by shard. */
  def resolvePartitions(root: java.io.File,
      shards: Set[String]): Option[(Int, Seq[String])] =
    resolveWith(root, shards.contains)

  private def resolveWith(root: java.io.File,
      wantShard: String => Boolean): Option[(Int, Seq[String])] = {
    val dir = new java.io.File(root, SnapDir)
    val snaps = Option(dir.listFiles()).toSeq.flatten
      .flatMap(f => f.getName match {
        case SnapRe(n) if f.isFile => Some((n.toInt, f))
        case _ => None
      })
    if (snaps.isEmpty) None
    else {
      val (v, f) = snaps.maxBy(_._1)
      val lines = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
        .split("\n").toSeq.filter(_.nonEmpty)
      if (!lines.exists(_.startsWith("S|")))
        Some((v, lines.filter(l => wantShard(shardOf(l)))))
      else Some((v, lines.flatMap { l =>
        val Array(_, shard, rel) = l.split("\\|", 3)
        if (!wantShard(shard)) Seq.empty
        else new String(java.nio.file.Files.readAllBytes(
            new java.io.File(dir, rel).toPath),
          java.nio.charset.StandardCharsets.UTF_8)
          .split("\n").toSeq.filter(_.nonEmpty)
      }))
    }
  }

  /** A file path's top-level partition dir ("bkt=3/part-x" → "bkt=3");
    * root-level files shard to "" (never split). */
  private def shardOf(path: String): String = {
    val i = path.indexOf('/')
    if (i < 0) "" else path.substring(0, i)
  }

  /** The artifact's current on-disk data files (spec/publisher hook —
    * the copy-strategy publisher computes its post-night listing from
    * this minus the superseded files). */
  private[graft] def currentFiles(root: java.io.File): Seq[String] =
    dataFiles(root)

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
  def commit(root: java.io.File): Int = commitListing(root, dataFiles(root))

  /** [[commit]] with a CALLER-SUPPLIED listing — the visibility point
    * of the object-store (copy) publish strategy: new files are copied
    * in beside the old ones, and THIS pointer swap is what moves
    * pinned readers from the pre-night to the post-night file set (on
    * a real object store the SNAP rename is a conditional put — the
    * same single-key atomicity). The listing must name files that all
    * exist under `root` when readers resolve it. */
  def commitListing(root: java.io.File, files: Seq[String]): Int = {
    val sorted = files.sorted
    resolve(root) match {
      // ORDER-INSENSITIVE content compare: a sharded snapshot's
      // resolve() concatenates per-shard listings in SHARD-NAME order,
      // which diverges from the global path sort when one shard name
      // is a proper prefix of another whose next path char sorts below
      // '/' ("part=2026" vs "part=2026-01" — '-' < '/'). Comparing the
      // raw concatenation against the sorted candidate would then
      // never match, and every recovery re-publish would mint a new
      // snapshot version — breaking the "recovery mints no new
      // version" invariant the protocol specs pin.
      case Some((v, listed)) if listed.sorted == sorted => v
      case prior =>
        val next = prior.map(_._1).getOrElse(0) + 1
        val dir = new java.io.File(root, SnapDir)
        dir.mkdirs()
        // Sharded form above the split point (see [[ShardSplit]]):
        // per-shard listing files are written FIRST, then the pointer's
        // atomic rename makes the whole snapshot visible at once —
        // the same single-visibility-point discipline as the flat form.
        val body =
          if (sorted.size > ShardSplit && sorted.forall(_.contains("/"))) {
            val sub = new java.io.File(dir, f"SNAP-$next%08d.d")
            sub.mkdirs()
            sorted.groupBy(shardOf).toSeq.sortBy(_._1).zipWithIndex
              .map { case ((shard, fs), i) =>
                val mf = new java.io.File(sub, f"M-$i%05d")
                java.nio.file.Files.write(mf.toPath, fs.mkString("\n")
                  .getBytes(java.nio.charset.StandardCharsets.UTF_8))
                s"S|$shard|${sub.getName}/${mf.getName}"
              }.mkString("\n")
          } else sorted.mkString("\n")
        val tmp = new java.io.File(dir, f"SNAP-$next%08d.tmp")
        java.nio.file.Files.write(tmp.toPath,
          body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        java.nio.file.Files.move(tmp.toPath,
          new java.io.File(dir, f"SNAP-$next%08d").toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        Option(dir.listFiles()).toSeq.flatten.foreach { f =>
          val ver = f.getName match {
            case SnapRe(n)    => Some(n.toInt)
            case SnapDirRe(n) => Some(n.toInt)
            case _            => None
          }
          if (ver.exists(_ < next - 1)) {
            if (f.isDirectory) deleteRecLocal(f) else f.delete(): Unit
          }
          // A *.tmp here is a crashed commit's corpse (this commit's
          // own tmp was already renamed away) — reap it, else one
          // leaks per crash forever (the marker-file census mistake).
          if (f.isFile && f.getName.startsWith("SNAP-") &&
              f.getName.endsWith(".tmp")) f.delete(): Unit
        }
        next
    }
  }

  private val SnapDirRe = "SNAP-(\\d{8})\\.d".r
  private def deleteRecLocal(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).toSeq.flatten.foreach(deleteRecLocal)
    f.delete(): Unit
  }

  /** Pinned read: scan exactly the last committed snapshot's files.
    * `basePath` keeps partition-directory columns (and partition
    * pruning) identical to a directory read. An artifact without a
    * committed snapshot is a wiring bug — fail loud.
    *
    * The constructed DataFrame is MEMOIZED per (session, root,
    * snapshot version): building a relation over an explicit file list
    * runs the parallel partition-discovery listing JOB whenever the
    * list exceeds the discovery threshold (~2 s at fixture scale for
    * the 1000-file doc-serve artifact — measured as st28's entire
    * round-11 regression), and the result is identical for the same
    * committed snapshot. resolve() still runs on EVERY call (one tiny
    * file read), so a publish that bumps the snapshot is picked up by
    * the very next read — the memo never extends a snapshot's
    * lifetime, it only deduplicates planning work within one. */
  /** ONE memo for both read shapes, keyed (app, root, version,
    * shard-set) with "*" = the full read. Eviction mirrors the on-disk
    * SNAP retention in one place: everything for the root older than
    * v-1 goes, REGARDLESS of app id — a recycled SparkSession's
    * entries would otherwise never match a future eviction probe and
    * pin the stopped session's plans for the life of the process. */
  private val readCache = scala.collection.concurrent.TrieMap
    .empty[(String, String, Int, String), DataFrame]
  private def evictStale(root: String, v: Int): Unit =
    readCache.foreach { case (k @ (_, r, kv, _), df) =>
      // Two eviction triggers: (a) the root's snapshot advanced past
      // the entry's version (mirrors the on-disk SNAP retention);
      // (b) the entry's OWNING session has stopped — an artifact that
      // is never republished would otherwise pin stopped sessions'
      // plans for the life of a process that recycles SparkSessions
      // over static artifacts (an unbounded plan/session leak).
      if ((r == root && kv < v - 1) ||
          df.sparkSession.sparkContext.isStopped) readCache.remove(k): Unit
    }
  def read(s: SparkSession, root: java.io.File): DataFrame = {
    val (v, files) = resolve(root).getOrElse(
      throw new IllegalStateException(
        s"pinned read: no committed snapshot under $root — " +
          "the writer must Pinned.commit after publishing"))
    evictStale(root.getPath, v)
    readCache.getOrElseUpdate(
      (s.sparkContext.applicationId, root.getPath, v, "*"), {
        val paths = files.map(f => new java.io.File(root, f).getPath)
        if (paths.isEmpty)
          throw new IllegalStateException(
            s"pinned read: snapshot under $root lists no data files")
        s.read.option("basePath", root.getPath).parquet(paths: _*)
      })
  }

  /** Partition-PRUNED pinned read: resolve and scan only the named
    * top-level partition dirs ("bkt=3"-style). On a sharded snapshot
    * this opens ONLY those shards' listing files ([[resolvePartitions]])
    * — the serving-leg metadata path at 100 TB partition counts, where
    * even reading the full listing per stream start is a cost.
    * `basePath` keeps the partition column and the planner's
    * PartitionFilters identical to a directory read. An empty
    * resolution (no touched shard exists) returns None — the caller
    * supplies its empty-relation shape. */
  def readPartitions(s: SparkSession, root: java.io.File,
      shards: Set[String]): Option[DataFrame] = {
    val (v, files) = resolvePartitions(root, shards).getOrElse(
      throw new IllegalStateException(
        s"pinned read: no committed snapshot under $root — " +
          "the writer must Pinned.commit after publishing"))
    if (files.isEmpty) None
    else {
      evictStale(root.getPath, v)
      Some(readCache.getOrElseUpdate(
        (s.sparkContext.applicationId, root.getPath, v,
          shards.toSeq.sorted.mkString(",")), {
          val paths = files.map(f => new java.io.File(root, f).getPath)
          s.read.option("basePath", root.getPath).parquet(paths: _*)
        }))
    }
  }
}
