package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sharded snapshot listings (the Iceberg manifest-list/manifest
  * split): above [[Pinned.ShardSplit]] files the committed listing
  * splits per top-level partition dir, the pointer file stays
  * O(shards), and a partition-pruned resolve opens ONLY the touched
  * shards' listing files — at 100 TB partition counts the flat
  * listing is itself a big-data object, and the serving-leg metadata
  * pass must scale with the probe, not the artifact. */
class PinnedSpec extends SparkSpec {

  private def buildArtifact(nBkts: Int, filesPer: Int): java.io.File = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_pinned_shard").toFile
    spark.range(0, nBkts.toLong * filesPer * 10)
      .select(col("id"), pmod(col("id"), lit(nBkts.toLong)).cast("int").as("bkt"))
      .repartition(filesPer, col("id"))
      .write.mode("overwrite").partitionBy("bkt").parquet(root.getPath)
    root
  }

  test("large artifacts commit sharded listings; pruned resolve reads only touched shards") {
    val root = buildArtifact(nBkts = 12, filesPer = 8) // 96 files > split 64
    val v = Pinned.commit(root)
    val snap = new java.io.File(new java.io.File(root, "_snapshots"),
      f"SNAP-$v%08d")
    val pointer = new String(java.nio.file.Files.readAllBytes(snap.toPath),
      "UTF-8").split("\n").toSeq.filter(_.nonEmpty)
    assert(pointer.forall(_.startsWith("S|")),
      s"pointer is not a manifest-list: ${pointer.take(3)}")
    assert(pointer.size == 12, s"expected 12 shard lines, got ${pointer.size}")
    val subDir = new java.io.File(new java.io.File(root, "_snapshots"),
      f"SNAP-$v%08d.d")
    assert(subDir.isDirectory && subDir.listFiles().length == 12)
    // Full resolve sees everything; pruned resolve sees exactly the
    // touched shards' files.
    val (_, all) = Pinned.resolve(root).get
    assert(all.size > Pinned.ShardSplit)
    val (_, pruned) = Pinned.resolvePartitions(root,
      Set("bkt=3", "bkt=7")).get
    assert(pruned.nonEmpty &&
      pruned.forall(p => p.startsWith("bkt=3/") || p.startsWith("bkt=7/")))
    assert(pruned.toSet == all.filter(p =>
      p.startsWith("bkt=3/") || p.startsWith("bkt=7/")).toSet)
    // PROOF the untouched listings are never opened: remove another
    // shard's listing file — the pruned resolve still succeeds, while
    // the full resolve (which must read it) fails loud.
    val victim = pointer.find(_.contains("bkt=5")).map(_.split("\\|")(2)).get
    val vf = new java.io.File(new java.io.File(root, "_snapshots"), victim)
    val hidden = new java.io.File(vf.getPath + ".hidden")
    assert(vf.renameTo(hidden))
    try {
      assert(Pinned.resolvePartitions(root, Set("bkt=3", "bkt=7")).get
        ._2.toSet == pruned.toSet,
        "pruned resolve touched an untouched shard's listing")
      intercept[Exception](Pinned.resolve(root))
    } finally assert(hidden.renameTo(vf))
  }

  test("pruned pinned read: only touched files scanned, PartitionFilters survive") {
    val root = buildArtifact(nBkts = 12, filesPer = 8)
    Pinned.commit(root)
    val df = Pinned.readPartitions(spark, root, Set("bkt=3", "bkt=7")).get
    assert(df.columns.contains("bkt"), "partition column lost (basePath)")
    val files = df.inputFiles.toSeq
    assert(files.nonEmpty &&
      files.forall(f => f.contains("/bkt=3/") || f.contains("/bkt=7/")),
      s"pruned read scans untouched shards: ${files.take(3)}")
    // Row parity with the directory read restricted to the shards.
    val expect = spark.read.parquet(root.getPath)
      .filter(col("bkt").isin(3, 7)).count()
    assert(df.count() == expect)
    // A residual partition filter still lands in PartitionFilters
    // (planning-time), exactly as on a directory read.
    val p = df.filter(col("bkt") === 3).queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(pf.contains("bkt"), s"bkt not in PartitionFilters [$pf]")
    // No touched shard at all → None (caller supplies its empty shape).
    assert(Pinned.readPartitions(spark, root, Set("bkt=99")).isEmpty)
  }

  test("flat listings stay flat below the split; GC keeps latest two snapshots with their shard dirs") {
    val root = buildArtifact(nBkts = 4, filesPer = 2) // 8 files < split
    val v1 = Pinned.commit(root)
    val snapDir = new java.io.File(root, "_snapshots")
    val p1 = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(snapDir, f"SNAP-$v1%08d").toPath), "UTF-8")
    assert(!p1.contains("S|"), "small artifact committed a sharded listing")
    // resolvePartitions degrades to a filtered full read on flat form.
    val (_, pr) = Pinned.resolvePartitions(root, Set("bkt=1")).get
    assert(pr.nonEmpty && pr.forall(_.startsWith("bkt=1/")))
    // Grow past the split → sharded v2; change again → v3; v1 GC'd,
    // v2 kept (one step back for racing readers), v3 live.
    spark.range(10000, 20000)
      .select(col("id"), pmod(col("id"), lit(12L)).cast("int").as("bkt"))
      .repartition(8, col("id"))
      .write.mode("append").partitionBy("bkt").parquet(root.getPath)
    val v2 = Pinned.commit(root)
    assert(v2 == v1 + 1)
    spark.range(20000, 21000)
      .select(col("id"), lit(0).cast("int").as("bkt"))
      .write.mode("append").partitionBy("bkt").parquet(root.getPath)
    val v3 = Pinned.commit(root)
    assert(v3 == v2 + 1)
    // A crashed commit's leaked tmp must be reaped by the next commit
    // (one leaked file per crash forever is the marker-file mistake).
    java.nio.file.Files.write(
      new java.io.File(snapDir, "SNAP-00000002.tmp").toPath,
      "corpse".getBytes("UTF-8"))
    spark.range(21000, 21100)
      .select(col("id"), lit(1).cast("int").as("bkt"))
      .write.mode("append").partitionBy("bkt").parquet(root.getPath)
    val v4 = Pinned.commit(root)
    assert(v4 == v3 + 1)
    val names = snapDir.listFiles().map(_.getName).toSet
    assert(!names.exists(_.endsWith(".tmp")),
      s"leaked commit tmp not reaped: $names")
    assert(!names.contains(f"SNAP-$v1%08d") &&
      !names.contains(f"SNAP-$v2%08d"), s"old versions not GC'd: $names")
    assert(names.contains(f"SNAP-$v3%08d") && names.contains(f"SNAP-$v4%08d"))
    assert(names.contains(f"SNAP-$v3%08d.d") == (v2snapSharded(snapDir, v3)),
      "shard dir retention diverged from its pointer")
    // The live sharded resolve is exact.
    val (_, all) = Pinned.resolve(root).get
    assert(all.toSet == Pinned.currentFiles(root).toSet)
  }

  test("sharded recommit is content-idempotent even when a shard name prefixes another") {
    // "part=2026" is a proper prefix of "part=2026-01", and '-' sorts
    // below '/': the GLOBAL path sort puts part=2026-01/* before
    // part=2026/*, while the sharded listing concatenates in
    // SHARD-NAME order (part=2026 first). An order-sensitive
    // idempotency compare would never match, and every recovery
    // re-publish would mint a new snapshot version — breaking the
    // "recovery mints no new version" invariant.
    val root = java.nio.file.Files
      .createTempDirectory("graft_pinned_pfx").toFile
    for (shard <- Seq("part=2026", "part=2026-01"); i <- 0 until 40) {
      val f = new java.io.File(new java.io.File(root, shard), f"f-$i%03d.parquet")
      f.getParentFile.mkdirs()
      java.nio.file.Files.write(f.toPath, "x".getBytes("UTF-8")): Unit
    }
    val v1 = Pinned.commit(root) // 80 files > ShardSplit → sharded
    assert(v2snapSharded(new java.io.File(root, "_snapshots"), v1),
      "fixture did not cross the shard split")
    val v2 = Pinned.commit(root) // unchanged content — must NOT mint
    assert(v2 == v1,
      s"recommit of unchanged prefix-shard listing minted a new version: $v1 -> $v2")
    // And the resolve stays exact.
    assert(Pinned.resolve(root).get._2.toSet == Pinned.currentFiles(root).toSet)
  }

  private def v2snapSharded(snapDir: java.io.File, v: Int): Boolean =
    new String(java.nio.file.Files.readAllBytes(
      new java.io.File(snapDir, f"SNAP-$v%08d").toPath), "UTF-8")
      .contains("S|")
}
