package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** pl11's incremental-rewrite contract. Correctness (incremental ≡
  * full recompute after BOTH delta nights) is the oracle's job; what
  * the oracle CANNOT see is the incrementality itself — that each
  * delta night rewrote only the affected shard directories AND only
  * the touched buckets of the staged count/min artifacts, that the
  * append-only ledgers never rewrote a prior file, and that the
  * SECOND night ran correctly against side artifacts the first
  * night's rewrite refreshed. This spec pins all of it from the
  * build's per-night whole-tree file audits, plus the ghost-partition
  * hazard (an emptied shard must actually lose its ck/cm partitions)
  * on a crafted corpus where dynamic overwrite would diverge. */
class IncrementalSpec extends SparkSpec {

  private def sub(m: Map[String, (Long, Long)], prefix: String) =
    m.filter { case (rel, _) => rel.startsWith(prefix) }

  test("pl11 rewrites only affected shards/buckets per night; everything else byte-identical") {
    val audit = Incremental.pl11Run(spark, sfDir)
    assert(audit.nights.map(_.deltaPart) ==
      Seq(Incremental.Parts - 2, Incremental.Parts - 1))

    def shardOf(rel: String): Option[Int] =
      "part=(\\d+)".r.findFirstMatchIn(rel).map(_.group(1).toInt)
    def bktOf(rel: String): Option[Int] =
      "bhbkt=(\\d+)".r.findFirstMatchIn(rel).map(_.group(1).toInt)

    for (night <- audit.nights) {
      val loaded = (0 until Incremental.Parts)
        .filter(p => p <= night.deltaPart).toSet
      // The delta shard is always rewritten; the crossing-driven spill
      // into earlier shards must be a PROPER subset of what is loaded —
      // if every loaded shard is affected the night degenerated to a
      // full rewrite and this spec is vacuous.
      assert(night.affectedParts.contains(night.deltaPart),
        s"night ${night.deltaPart}: delta shard not in the rewrite set")
      assert(night.affectedParts.toSet.subsetOf(loaded),
        s"night ${night.deltaPart}: rewrote a shard that had not arrived: " +
          night.affectedParts.toString)
      assert(night.affectedParts.size < loaded.size,
        s"night ${night.deltaPart}: every shard rewritten — nothing incremental")
      // At least one EARLIER shard is affected (a block hash crossing
      // MinDf only once this delta lands), so the dependency tracking
      // is exercised beyond the trivial delta-only case.
      assert(night.affectedParts.exists(_ < night.deltaPart),
        s"night ${night.deltaPart}: no earlier shard affected — " +
          "crossing propagation untested")
      // The df-merge and the crossed-hash ledger read are both bucket-
      // bounded, and crossings are delta hashes by construction.
      assert(night.touchedDfBkts.nonEmpty &&
        night.touchedDfBkts.size < Incremental.BhBuckets,
        s"night ${night.deltaPart}: df merge touched every bucket — " +
          s"nothing pruned (${night.touchedDfBkts.size})")
      assert(night.crossedBhBkts.toSet.subsetOf(night.touchedDfBkts.toSet),
        s"night ${night.deltaPart}: crossed hashes outside the delta's buckets")

      def assertUnchanged(tag: String, prefix: String,
          keep: String => Boolean): Unit = {
        val pre = sub(night.preFiles, prefix).filter { case (k, _) => keep(k) }
        val post = sub(night.postFiles, prefix).filter { case (k, _) => keep(k) }
        assert(pre.nonEmpty,
          s"night ${night.deltaPart}: nothing untouched to compare in $tag")
        assert(post == pre,
          s"night ${night.deltaPart}: untouched $tag files changed: " +
            s"added=${(post.keySet diff pre.keySet).take(3)} " +
            s"removed=${(pre.keySet diff post.keySet).take(3)} " +
            s"modified=${pre.collect { case (k, v) if post.get(k).exists(_ != v) => k }.take(3)}")
      }

      // Output table: untouched shard dirs byte-identical; affected
      // earlier shards actually rewritten.
      val untouched = loaded -- night.affectedParts.toSet
      assertUnchanged("table", "/table", k => shardOf(k).exists(untouched))
      val affEarlier = night.affectedParts.toSet.filter(_ < night.deltaPart)
      assert(sub(night.postFiles, "/table").filter(k => shardOf(k._1).exists(affEarlier)) !=
        sub(night.preFiles, "/table").filter(k => shardOf(k._1).exists(affEarlier)),
        s"night ${night.deltaPart}: affected earlier shards not rewritten")

      // Append-only ledgers: every pre-existing docs/bh file survives
      // the night unmodified (the night only ADDS files there).
      for (ledger <- Seq("/docs", "/bh")) {
        val pre = sub(night.preFiles, ledger)
        val post = sub(night.postFiles, ledger)
        assert(pre.nonEmpty, s"night ${night.deltaPart}: empty pre state in $ledger")
        assert(pre.forall { case (k, v) => post.get(k).contains(v) },
          s"night ${night.deltaPart}: $ledger rewrote a prior file: " +
            pre.collect { case (k, v) if !post.get(k).contains(v) => k }.take(3))
      }

      // Staged df counts: only the delta's touched buckets rewritten —
      // the round-8 full-ledger re-aggregation is structurally gone.
      val touched = night.touchedDfBkts.toSet
      assertUnchanged("df", "/df", k => bktOf(k).exists(b => !touched(b)))

      // ck/cm partials: shards outside the affected set byte-identical.
      assertUnchanged("ck", "/ck", k => shardOf(k).exists(untouched))
      assertUnchanged("cm", "/cm", k => shardOf(k).exists(untouched))
    }
  }

  test("streamed nights are replay-idempotent behind the done-marker") {
    import spark.implicits._
    // foreachBatch is at-least-once and a night's appends are additive
    // (NOT self-collapsing): a replayed night must be a structural
    // no-op — same marker, byte-identical artifact tree.
    val docs = Seq(
      (2L, "en", "applepie2 bananaz2"),
      (3L, "en", "walnutt2 velvetty2 cinnamon2 gingerly2"),
      (7L, "en", "applepie2 bananaz2")
    ).toDF("doc_id", "lang", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft_pl11_replay").toString
    val d = Incremental.Dirs(root)
    Incremental.baseBuild(spark, d,
      docs.filter(col("doc_id") % Incremental.Parts =!= 7))
    val delta = docs.filter(col("doc_id") % Incremental.Parts === 7)
    assert(Incremental.nightIdempotent(spark, d, delta, 7),
      "first delivery did not run the night")
    def tree = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(root))
        .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
    }
    val after1 = tree
    assert(!Incremental.nightIdempotent(spark, d, delta, 7),
      "replayed night ran again past the done-marker")
    assert(tree == after1, "replayed night mutated the artifact tree")
  }

  test("pl12 purge rewrites only affected shards/buckets; purged ids physically gone") {
    val audit = Incremental.pl12Run(spark, sfDir).purge
    def shardOf(rel: String): Option[Int] =
      "part=(\\d+)".r.findFirstMatchIn(rel).map(_.group(1).toInt)
    def bktOf(rel: String): Option[Int] =
      "bhbkt=(\\d+)".r.findFirstMatchIn(rel).map(_.group(1).toInt)
    // The mod-16 predicate confines the purge to shard 5 (the crawl-
    // shard retention shape); the rewrite set must stay a PROPER subset
    // or the incrementality claim is vacuous.
    assert(audit.purgeParts == Seq(5), audit.purgeParts.toString)
    assert(audit.affectedParts.contains(5) &&
      audit.affectedParts.size < Incremental.Parts,
      s"purge degenerated to a full rewrite: ${audit.affectedParts}")
    assert(audit.touchedDfBkts.nonEmpty &&
      audit.touchedDfBkts.size < Incremental.BhBuckets,
      "negative df merge touched every bucket — nothing pruned")
    assert(audit.uncrossedBhBkts.toSet.subsetOf(audit.touchedDfBkts.toSet))
    // Physical removal from EVERY artifact.
    val d = Incremental.pl12Run(spark, sfDir).dirs
    for (a <- Seq(d.docs, d.bh, d.table, d.ck)) {
      assert(spark.read.parquet(a)
        .filter(col("doc_id") % Incremental.PurgeMod === Incremental.PurgeRem)
        .isEmpty, s"purged doc survived in $a")
    }
    // Byte audit: untouched shard/bucket dirs identical across the purge.
    def assertUnchanged(tag: String, prefix: String,
        keep: String => Boolean): Unit = {
      val pre = sub(audit.preFiles, prefix).filter { case (k, _) => keep(k) }
      val post = sub(audit.postFiles, prefix).filter { case (k, _) => keep(k) }
      assert(pre.nonEmpty, s"nothing untouched to compare in $tag")
      assert(post == pre, s"untouched $tag files changed across the purge")
    }
    val aff = audit.affectedParts.toSet
    assertUnchanged("table", "/table", k => shardOf(k).exists(p => !aff(p)))
    assertUnchanged("ck", "/ck", k => shardOf(k).exists(p => !aff(p)))
    assertUnchanged("cm", "/cm", k => shardOf(k).exists(p => !aff(p)))
    assertUnchanged("docs", "/docs",
      k => shardOf(k).exists(p => !audit.purgeParts.contains(p)))
    assertUnchanged("bh", "/bh",
      k => bktOf(k).exists(b => !audit.purgedBhBkts.contains(b)))
    assertUnchanged("df", "/df",
      k => bktOf(k).exists(b => !audit.touchedDfBkts.contains(b)))
  }

  test("purge night: canonical departs, df margin departs, emptied shards vanish") {
    import spark.implicits._
    // Crafted corpus (part = doc_id % 8), purge set {1, 13, 6}:
    //   A=1  (shard 1) "applepie9 bananaz9" — cleaned "applepie9
    //        bananaz9"; canonical of group {1, 10}. PURGED: doc 10 must
    //        re-canonicalize to itself (min DEPARTS — the non-additive
    //        case a global ck→min scalar could not recover).
    //   B=10 (shard 2) "applepie9 bananaz9 zebraxx9 zebraxx9" — second
    //        block boilerplate (df 2 with C, both survive) → cleaned
    //        equals A's → "duplicate" before, "kept" after.
    //   C=3  (shard 3) "zebraxx9 zebraxx9 cinnamon9 gingerly9" — shares
    //        only the still-df-2 block; shard 3 must stay byte-identical.
    //   D=4  (shard 4) "walnutt9 velvetty9 dcareone9 dcaretwo9" — first
    //        block shared ONLY with purged E (df 2 → 1): the DOWNWARD
    //        crossing; the paragraph must RESURFACE in D's cleaned text.
    //   E=13 (shard 5) "walnutt9 velvetty9 equalone9 equaltwo9" — PURGED
    //        (the df margin). Sole shard-5 doc → shard 5 fully empties.
    //   F=6  (shard 6) "figgy9 dates9" — PURGED; sole shard-6 doc.
    //   U=7  (shard 7) "untouched9 pristine9 stays9 same9" — untouched.
    val docs = Seq(
      (1L, "en", "applepie9 bananaz9"),
      (10L, "en", "applepie9 bananaz9 zebraxx9 zebraxx9"),
      (3L, "en", "zebraxx9 zebraxx9 cinnamon9 gingerly9"),
      (4L, "en", "walnutt9 velvetty9 dcareone9 dcaretwo9"),
      (13L, "en", "walnutt9 velvetty9 equalone9 equaltwo9"),
      (6L, "en", "figgy9 dates9"),
      (7L, "en", "untouched9 pristine9 stays9 same9")
    ).toDF("doc_id", "lang", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft_pl12_craft").toString
    val d = Incremental.Dirs(root)
    Incremental.baseBuild(spark, d, docs)
    def stages(r: String) = spark.read.parquet(Incremental.Dirs(r).table)
      .select("doc_id", "stage")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pre = stages(root)
    assert(pre(1L) == "kept" && pre(10L) == "duplicate",
      s"fixture broken: expected {1→kept, 10→duplicate}, got $pre")
    val ckOf = (id: Long) => spark.read.parquet(d.ck)
      .filter(col("doc_id") === id).select("ck")
      .collect().map(_.getString(0)).toSeq
    val ckD0 = ckOf(4L)
    assert(ckD0.size == 1)

    val audit = Incremental.purgeNightOf(spark, d,
      Seq(1L, 13L, 6L).toDF("doc_id"))
    assert(audit.purgeParts == Seq(1, 5, 6))
    // The df margin departed: at least one hash LEFT the drop set.
    assert(audit.uncrossedBhBkts.nonEmpty, "no downward crossing — " +
      "the purge fixture's df margin did not flip")
    // D contained the uncrossed hash → shard 4 rewritten; C/U untouched.
    assert(audit.affectedParts.toSet == Set(1, 2, 4, 5, 6),
      audit.affectedParts.toString)
    // Canonical departure: doc 10 re-canonicalizes to itself.
    val post = stages(root)
    assert(post(10L) == "kept",
      s"doc 10 still labeled against the departed canonical: $post")
    // Resurfacing: D's content key changed (its cleaned text grew back).
    val ckD1 = ckOf(4L)
    assert(ckD1.size == 1 && ckD1 != ckD0,
      "the dropped paragraph did not resurface in doc 4")
    // Fully-purged shards lose EVERY artifact partition — no ghosts.
    for (p <- Seq(5, 6); a <- Seq("/docs", "/table", "/ck", "/cm")) {
      assert(sub(audit.postFiles, s"$a/part=$p").isEmpty,
        s"ghost $a partition survived for emptied shard $p")
    }
    assert(sub(audit.preFiles, "/docs/part=5").nonEmpty &&
      sub(audit.preFiles, "/table/part=6").nonEmpty,
      "fixture broken: emptied shards had no base partitions")
    // Convergence: the purged world ≡ a from-scratch build over the
    // survivors (the property that catches any missed dependency).
    val fullRoot = java.nio.file.Files
      .createTempDirectory("graft_pl12_full").toString
    Incremental.baseBuild(spark, Incremental.Dirs(fullRoot),
      docs.filter(!col("doc_id").isin(1L, 13L, 6L)))
    def rows(r: String) = spark.read.parquet(Incremental.Dirs(r).table)
      .select("doc_id", "lang", "stage", "part")
      .collect().map(_.toSeq).toSet
    val inc = rows(root)
    val full = rows(fullRoot)
    assert(inc == full,
      s"purge diverged from the surviving-corpus recompute:\n" +
        s"  inc-only=${(inc diff full).take(4)}\n" +
        s"  full-only=${(full diff inc).take(4)}")
  }

  // ---- Night commit protocol: crash-injection fixtures --------------
  // The round-9 verdict's boundary: a crash between a night's artifact
  // writes used to strand a half-merged state. Under the staged commit
  // protocol a night is atomic at the manifest rename — these specs
  // kill it on BOTH sides of that point and prove convergence.

  private def liveTree(root: String) =
    graft.sources.Scratch.snapshotTree(new java.io.File(root))
      .filter { case (rel, _) => !rel.startsWith("/_") }

  private def tableRows(root: String) =
    spark.read.parquet(Incremental.Dirs(root).table)
      .select("doc_id", "lang", "stage", "part")
      .collect().map(_.toSeq).toSet

  test("a night killed before its manifest leaves the live tree untouched and reruns cleanly") {
    import spark.implicits._
    val docs = Seq(
      (2L, "en", "applepie3 bananaz3"),
      (5L, "en", "applepie3 bananaz3 zebraxx3 zebraxx3"),
      (3L, "en", "zebraxx3 zebraxx3 walnutt3 velvetty3"),
      (7L, "en", "applepie3 bananaz3")
    ).toDF("doc_id", "lang", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft_pl11_crash_pre").toString
    val d = Incremental.Dirs(root)
    Incremental.baseBuild(spark, d,
      docs.filter(col("doc_id") % Incremental.Parts =!= 7))
    val delta = docs.filter(col("doc_id") % Incremental.Parts === 7)
    val pre = liveTree(root)
    Incremental.failAt = Some((root, "pre-manifest"))
    try intercept[Incremental.InjectedNightCrash] {
      Incremental.nightIdempotent(spark, d, delta, 7)
    } finally Incremental.failAt = None
    // Nothing before the commit point may touch the live tree: the
    // crashed attempt is invisible outside _staging.
    assert(liveTree(root) == pre,
      "an uncommitted night mutated the live artifact tree")
    assert(!Incremental.nightDone(d, "night_7"))
    // Redelivery discards the uncommitted staging and reruns the night.
    assert(Incremental.nightIdempotent(spark, d, delta, 7),
      "redelivery after a pre-commit crash did not rerun the night")
    val fullRoot = java.nio.file.Files
      .createTempDirectory("graft_pl11_crash_pre_full").toString
    Incremental.runIncremental(spark, docs, fullRoot, Seq())
    assert(tableRows(root) == tableRows(fullRoot),
      "post-crash rerun diverged from the full recompute")
  }

  test("a night killed mid-publish is completed by recovery on redelivery") {
    import spark.implicits._
    val docs = Seq(
      (2L, "en", "applepie4 bananaz4"),
      (5L, "en", "applepie4 bananaz4 zebraxx4 zebraxx4"),
      (3L, "en", "zebraxx4 zebraxx4 walnutt4 velvetty4"),
      (7L, "en", "applepie4 bananaz4")
    ).toDF("doc_id", "lang", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft_pl11_crash_pub").toString
    val d = Incremental.Dirs(root)
    Incremental.baseBuild(spark, d,
      docs.filter(col("doc_id") % Incremental.Parts =!= 7))
    val delta = docs.filter(col("doc_id") % Incremental.Parts === 7)
    Incremental.failAt = Some((root, "mid-publish"))
    try intercept[Incremental.InjectedNightCrash] {
      Incremental.nightIdempotent(spark, d, delta, 7)
    } finally Incremental.failAt = None
    // Committed (manifest present) but only partially published — the
    // exact half-merged window the old in-place writes could strand.
    assert(new java.io.File(root, "_staging/night_7/MANIFEST").exists(),
      "mid-publish crash lost its committed manifest")
    assert(!Incremental.nightDone(d, "night_7"))
    // Redelivery (the foreachBatch at-least-once class) finishes the
    // publish instead of re-running — and then marks the night done.
    assert(Incremental.nightIdempotent(spark, d, delta, 7),
      "recovery did not complete the committed night")
    assert(Incremental.nightDone(d, "night_7"))
    assert(!new java.io.File(root, "_staging/night_7").exists(),
      "published staging not cleaned up")
    val fullRoot = java.nio.file.Files
      .createTempDirectory("graft_pl11_crash_pub_full").toString
    Incremental.runIncremental(spark, docs, fullRoot, Seq())
    assert(tableRows(root) == tableRows(fullRoot),
      "recovered night diverged from the full recompute")
    // A further replay is a structural no-op.
    val after = graft.sources.Scratch.snapshotTree(new java.io.File(root))
    assert(!Incremental.nightIdempotent(spark, d, delta, 7))
    assert(graft.sources.Scratch.snapshotTree(new java.io.File(root)) == after,
      "replay after recovery mutated the artifact tree")
  }

  test("a purge killed mid-publish is completed by recoverPending") {
    import spark.implicits._
    // df-margin pair (walnutt8-velvetty8 paragraph, df 2): purging 13
    // un-crosses the hash, so the rewrite spans shard 4 too — the
    // recovered publish must land BOTH the physical purge and the
    // resurfacing rewrite.
    val docs = Seq(
      (4L, "en", "walnutt8 velvetty8 dcareone8 dcaretwo8"),
      (13L, "en", "walnutt8 velvetty8 equalone8 equaltwo8"),
      (7L, "en", "untouched8 pristine8 stays8 same8")
    ).toDF("doc_id", "lang", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft_pl12_crash_pub").toString
    val d = Incremental.Dirs(root)
    Incremental.baseBuild(spark, d, docs)
    Incremental.failAt = Some((root, "mid-publish"))
    try intercept[Incremental.InjectedNightCrash] {
      Incremental.purgeNightOf(spark, d, Seq(13L).toDF("doc_id"))
    } finally Incremental.failAt = None
    assert(Incremental.recoverPending(d) == Seq("purge"),
      "recoverPending did not publish the committed purge")
    val fullRoot = java.nio.file.Files
      .createTempDirectory("graft_pl12_crash_pub_full").toString
    Incremental.baseBuild(spark, Incremental.Dirs(fullRoot),
      docs.filter(col("doc_id") =!= 13L))
    assert(tableRows(root) == tableRows(fullRoot),
      "recovered purge diverged from the surviving-corpus recompute")
    assert(spark.read.parquet(d.docs).filter(col("doc_id") === 13L).isEmpty,
      "purged doc survived the recovered publish")
    // Recovery is one-shot: nothing left pending.
    assert(Incremental.recoverPending(d).isEmpty)
  }

  test("manifest-pinned reads: a probe racing a publish sees pre- or post-night, never torn") {
    import spark.implicits._
    val docs = Seq(
      (2L, "en", "applepie0 bananaz0"),
      (5L, "en", "applepie0 bananaz0 zebraxx0 zebraxx0"),
      (3L, "en", "zebraxx0 zebraxx0 walnutt0 velvetty0"),
      (7L, "en", "applepie0 bananaz0")
    ).toDF("doc_id", "lang", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft_pinned_tear").toString
    val d = Incremental.Dirs(root)
    Incremental.baseBuild(spark, d,
      docs.filter(col("doc_id") % Incremental.Parts =!= 7))
    val dfDir = new java.io.File(d.df)
    // The probe resolves its snapshot BEFORE the night lands.
    val preRows = graft.sources.Pinned.read(spark, dfDir)
      .collect().map(_.toSeq).toSet
    assert(preRows == spark.read.parquet(d.df).collect().map(_.toSeq).toSet,
      "pinned read diverges from the directory read at rest")
    // A night crashes MID-PUBLISH: the first replace (a df bucket) has
    // been applied, the rest pend — the df DIRECTORY is now a torn mix
    // of pre- and post-night partitions.
    val delta = docs.filter(col("doc_id") % Incremental.Parts === 7)
    Incremental.failAt = Some((root, "mid-publish"))
    try intercept[Incremental.InjectedNightCrash] {
      Incremental.nightOf(spark, d, delta, 7)
    } finally Incremental.failAt = None
    // The DIRECTORY read serves the torn state (the hazard) ...
    val dirTorn = spark.read.parquet(d.df).collect().map(_.toSeq).toSet
    assert(dirTorn != preRows,
      "fixture broken: mid-publish crash did not change the df tree")
    // ... while the PINNED probe structurally cannot: its v1 listing
    // names files the applied replace deleted, so it fails loud (the
    // serving retry then resolves the committed post-night snapshot) —
    // or, had the race landed before any replace, returns the exact
    // pre-night set. Silently-torn is impossible: old paths never
    // resolve to new data (staged part files have fresh names).
    val probe =
      try Left(graft.sources.Pinned.read(spark, dfDir)
        .collect().map(_.toSeq).toSet)
      catch { case e: Exception => Right(e) }
    probe match {
      case Left(rows) => assert(rows == preRows,
        "pinned read returned a TORN result")
      case Right(_) => () // failed loud — the retry path
    }
    // Recovery completes the publish and commits the new snapshot;
    // the retried probe sees the consistent post-night view.
    assert(Incremental.recoverPending(d) == Seq("night_7"))
    val post = graft.sources.Pinned.read(spark, dfDir)
      .collect().map(_.toSeq).toSet
    assert(post == spark.read.parquet(d.df).collect().map(_.toSeq).toSet,
      "post-recovery pinned read diverges from the directory read")
    assert(post != preRows, "the night published nothing")
    // Snapshot commit is content-idempotent: a replayed recovery
    // publishes no-ops and mints no new snapshot version.
    val v = graft.sources.Pinned.resolve(dfDir).get._1
    assert(Incremental.recoverPending(d).isEmpty)
    graft.sources.Pinned.commit(dfDir)
    assert(graft.sources.Pinned.resolve(dfDir).get._1 == v,
      "an unchanged artifact minted a new snapshot version")
  }

  test("object-store copy publish: pointer-swap visibility, crash recovery, stale reap") {
    import spark.implicits._
    // The copy+manifest-pointer strategy — what the protocol runs where
    // renames are not atomic (S3/GCS have none): new files copy in
    // BESIDE the old, visibility moves at the committed snapshot
    // listing, superseded files are reaped last. Forced on for this
    // root (no second FileStore exists in the test environment).
    val docs = Seq(
      (2L, "en", "applepie8 bananaz8"),
      (5L, "en", "applepie8 bananaz8 zebraxx8 zebraxx8"),
      (3L, "en", "zebraxx8 zebraxx8 walnutt8 velvetty8"),
      (7L, "en", "applepie8 bananaz8"),
      (14L, "en", "zebraxx8 walnutt8 applepie8")
    ).toDF("doc_id", "lang", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft_pl11_copypub").toString
    Incremental.forceCopyPublish = Incremental.forceCopyPublish + root
    try {
      val d = Incremental.Dirs(root)
      Incremental.baseBuild(spark, d, docs.filter(
        col("doc_id") % Incremental.Parts =!= 7 &&
          col("doc_id") % Incremental.Parts =!= 6))
      val dfDir = new java.io.File(d.df)
      val preRows = graft.sources.Pinned.read(spark, dfDir)
        .collect().map(_.toSeq).toSet
      // NIGHT 1 crashes MID-PUBLISH (one replace's files copied in, no
      // pointer committed): the pinned probe still resolves the exact
      // pre-night set — under the copy strategy the old files outlive
      // the crash, so not even the fail-loud retry path is needed.
      val delta7 = docs.filter(col("doc_id") % Incremental.Parts === 7)
      Incremental.failAt = Some((root, "mid-publish"))
      try intercept[Incremental.InjectedNightCrash] {
        Incremental.nightIdempotent(spark, d, delta7, 7); ()
      } finally Incremental.failAt = None
      assert(graft.sources.Pinned.read(spark, dfDir)
        .collect().map(_.toSeq).toSet == preRows,
        "a mid-publish copy crash moved the pinned view before the pointer swap")
      // Recovery completes the publish: pinned == directory == post.
      assert(Incremental.nightIdempotent(spark, d, delta7, 7),
        "redelivery did not recover the committed copy publish")
      val post7 = graft.sources.Pinned.read(spark, dfDir)
        .collect().map(_.toSeq).toSet
      assert(post7 == spark.read.parquet(d.df).collect().map(_.toSeq).toSet,
        "post-recovery pinned read diverges from the directory read")
      assert(post7 != preRows, "night 1 published nothing")
      // NIGHT 2 crashes POST-POINTER (listings committed, stale files
      // unreaped): pinned readers are already post-night while the
      // DIRECTORY still holds the superseded files.
      val delta6 = docs.filter(col("doc_id") % Incremental.Parts === 6)
      Incremental.failAt = Some((root, "post-pointer"))
      try intercept[Incremental.InjectedNightCrash] {
        Incremental.nightIdempotent(spark, d, delta6, 6); ()
      } finally Incremental.failAt = None
      val vAtCrash = graft.sources.Pinned.resolve(dfDir).get._1
      val pinned6 = graft.sources.Pinned.read(spark, dfDir)
        .collect().map(_.toSeq).toSet
      assert(pinned6 != post7, "the pointer swap did not land before the crash")
      assert(spark.read.parquet(d.df).collect().map(_.toSeq).toSet != pinned6,
        "fixture: no stale files pending after the post-pointer crash")
      // Recovery reaps the stale files without minting a new snapshot
      // version (the pointer commit is content-idempotent).
      assert(Incremental.nightIdempotent(spark, d, delta6, 6),
        "redelivery did not recover the post-pointer crash")
      assert(graft.sources.Pinned.resolve(dfDir).get._1 == vAtCrash,
        "recovery re-publish minted a new snapshot version")
      assert(spark.read.parquet(d.df).collect().map(_.toSeq).toSet == pinned6,
        "stale files survived the recovered reap")
      // End state converges with the full recompute.
      val fullRoot = java.nio.file.Files
        .createTempDirectory("graft_pl11_copypub_full").toString
      Incremental.runIncremental(spark, docs, fullRoot, Seq())
      assert(tableRows(root) == tableRows(fullRoot),
        "copy-strategy nights diverged from the full recompute")
    } finally {
      Incremental.forceCopyPublish = Incremental.forceCopyPublish - root
      Incremental.failAt = None
    }
  }

  test("streamed purges are replay-idempotent behind content-derived markers") {
    import spark.implicits._
    // A purge night is not self-collapsing (a replayed NEGATIVE df
    // merge would decrement twice): the content-derived marker must
    // make redelivery a structural no-op — st37's at-least-once class.
    val docs = Seq(
      (4L, "en", "walnutt5 velvetty5 dcareone5 dcaretwo5"),
      (13L, "en", "walnutt5 velvetty5 equalone5 equaltwo5"),
      (7L, "en", "untouched5 pristine5 stays5 same5")
    ).toDF("doc_id", "lang", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft_st37_replay").toString
    val d = Incremental.Dirs(root)
    Incremental.baseBuild(spark, d, docs)
    val purge = Seq(13L).toDF("doc_id")
    assert(Incremental.purgeIdempotent(spark, d, purge, "purge_r13"),
      "first delivery did not run the purge")
    def tree = graft.sources.Scratch.snapshotTree(new java.io.File(root))
    val after1 = tree
    assert(!Incremental.purgeIdempotent(spark, d, purge, "purge_r13"),
      "replayed purge ran again past the done-marker")
    assert(tree == after1, "replayed purge mutated the artifact tree")
    assert(spark.read.parquet(d.docs).filter(col("doc_id") === 13L).isEmpty)
  }

  test("a night killed after publish but before staging cleanup does not rerun") {
    import spark.implicits._
    // The round-10 advice's residual window: the old primary path wrote
    // its done-marker only AFTER discarding the committed staging, so a
    // crash in between made a published night look unpublished and an
    // at-least-once redelivery reran it (double-appending the additive
    // ledgers). The done record now rides the manifest and is written
    // by publish itself — this failpoint lands exactly in the old
    // window and the redelivery must recover, not rerun.
    val docs = Seq(
      (2L, "en", "applepie6 bananaz6"),
      (5L, "en", "applepie6 bananaz6 zebraxx6 zebraxx6"),
      (3L, "en", "zebraxx6 zebraxx6 walnutt6 velvetty6"),
      (7L, "en", "applepie6 bananaz6")
    ).toDF("doc_id", "lang", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft_pl11_crash_post").toString
    val d = Incremental.Dirs(root)
    Incremental.baseBuild(spark, d,
      docs.filter(col("doc_id") % Incremental.Parts =!= 7))
    val delta = docs.filter(col("doc_id") % Incremental.Parts === 7)
    Incremental.failAt = Some((root, "post-publish"))
    try intercept[Incremental.InjectedNightCrash] {
      Incremental.nightIdempotent(spark, d, delta, 7)
    } finally Incremental.failAt = None
    // Published AND recorded — the committed staging merely lingers.
    assert(Incremental.nightDone(d, "night_7"),
      "publish did not record the done-log entry before cleanup")
    assert(new java.io.File(root, "_staging/night_7/MANIFEST").exists())
    val published = liveTree(root)
    // Redelivery: recovery re-applies no-op publishes and discards the
    // staging; the night must NOT rerun (no double-append).
    assert(Incremental.nightIdempotent(spark, d, delta, 7),
      "redelivery did not recover the lingering committed staging")
    assert(!new java.io.File(root, "_staging/night_7").exists())
    assert(liveTree(root) == published,
      "redelivery after a post-publish crash mutated the live tree — " +
        "the night reran")
    val fullRoot = java.nio.file.Files
      .createTempDirectory("graft_pl11_crash_post_full").toString
    Incremental.runIncremental(spark, docs, fullRoot, Seq())
    assert(tableRows(root) == tableRows(fullRoot))
    // A further replay is a plain done-log no-op.
    assert(!Incremental.nightIdempotent(spark, d, delta, 7))
  }

  test("two racing nights on one root: exactly one wins, the loser fails loud") {
    import spark.implicits._
    val docs = Seq(
      (2L, "en", "applepie7 bananaz7"),
      (5L, "en", "applepie7 bananaz7 zebraxx7 zebraxx7"),
      (3L, "en", "zebraxx7 zebraxx7 walnutt7 velvetty7"),
      (7L, "en", "applepie7 bananaz7")
    ).toDF("doc_id", "lang", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft_pl11_lease").toString
    val d = Incremental.Dirs(root)
    Incremental.baseBuild(spark, d,
      docs.filter(col("doc_id") % Incremental.Parts =!= 7))
    val delta = docs.filter(col("doc_id") % Incremental.Parts === 7)
    // Writer A holds the lease (as a night in progress would); writer B
    // — another thread, the in-JVM race — must fail loud immediately,
    // never block, never touch A's staging.
    Incremental.withWriterLock(d) {
      @volatile var caught: Throwable = null
      val b = new Thread(() =>
        try { Incremental.nightIdempotent(spark, d, delta, 7); () }
        catch { case e: Throwable => caught = e })
      b.start(); b.join(60000)
      assert(caught != null, "the racing writer did not fail")
      assert(caught.isInstanceOf[Incremental.ConcurrentNightWriter],
        s"racing writer failed with the wrong error: $caught")
    }
    // CROSS-PROCESS leg: a live lock FILE from another process (no
    // in-JVM entry) also excludes...
    val lock = new java.io.File(root, "_WRITER.lock")
    assert(lock.createNewFile())
    intercept[Incremental.ConcurrentNightWriter] {
      Incremental.nightIdempotent(spark, d, delta, 7)
    }
    // ...until it goes STALE (holder died): age-based takeover wins the
    // lease and the night runs to convergence.
    assert(lock.setLastModified(System.currentTimeMillis() - 11 * 60 * 1000L))
    assert(Incremental.nightIdempotent(spark, d, delta, 7),
      "stale-lease takeover did not run the night")
    assert(!lock.exists(), "the winning night did not release the lease")
    val fullRoot = java.nio.file.Files
      .createTempDirectory("graft_pl11_lease_full").toString
    Incremental.runIncremental(spark, docs, fullRoot, Seq())
    assert(tableRows(root) == tableRows(fullRoot))
  }

  test("legacy per-night marker files migrate into the done-log once") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_pl11_migrate").toString
    val d = Incremental.Dirs(root)
    new java.io.File(root).mkdirs()
    // A round-10 tree: marker files, no log.
    assert(new java.io.File(root, "_night_3.done").createNewFile())
    assert(new java.io.File(root, "_purge_r9.done").createNewFile())
    assert(Incremental.doneTags(d) == Set("night_3", "purge_r9"))
    // Bare reads are SIDE-EFFECT-FREE: the markers are unioned in but
    // never rewritten — the fold (log appends + marker deletes) may
    // only run under the writer lease, else two processes could append
    // to _nights.log outside the single-writer regime.
    assert(new java.io.File(root, "_night_3.done").exists(),
      "a bare doneTags read rewrote on-disk state")
    // A marker-managed replay of the migrated night is a no-op — and
    // its lease entry performs the one-time fold.
    val delta = Seq((3L, "en", "anything goes")).toDF("doc_id", "lang", "text")
    Incremental.baseBuild(spark, d,
      Seq((2L, "en", "base doc here")).toDF("doc_id", "lang", "text"))
    assert(!Incremental.nightIdempotent(spark, d, delta, 3),
      "a migrated done record did not suppress the replay")
    assert(!new java.io.File(root, "_night_3.done").exists(),
      "the lease entry did not fold the legacy markers")
    assert(Incremental.doneTags(d) == Set("night_3", "purge_r9"))
  }

  test("done-log self-heals a torn final line on the next record") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_pl11_torn").toString
    val d = Incremental.Dirs(root)
    // A crash mid-append left partial tags with no terminator: one
    // garbage fragment ("nigh") and one that EQUALS a shorter valid
    // tag ("night_1" torn out of "night_13" — the prefix hazard: a
    // pending night_1 must not look done). The next record must not
    // GLUE onto the tail fragment either ("nighnight_7" would hide
    // night_7 from doneTags and rerun a published night).
    java.nio.file.Files.write(
      new java.io.File(root, "_nights.log").toPath,
      "#v2\nnight_5|end\nnight_1".getBytes("UTF-8"))
    assert(new java.io.File(root, "_night_7.done").createNewFile())
    Incremental.withWriterLock(d)(()) // lease entry folds → recordDone
    val tags = Incremental.doneTags(d)
    assert(tags.contains("night_7"),
      s"recovered tag glued onto the torn line and was lost: $tags")
    assert(tags.contains("night_5"), s"intact prior record lost: $tags")
    assert(!tags.contains("night_1"),
      s"a torn prefix fragment counted as a done record: $tags")
    assert(!tags.exists(_.contains("nighnight")),
      s"torn fragment merged with the recovery append: $tags")
  }

  test("pre-sentinel done-logs migrate once under the lease; new torn fragments never bless") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_pl11_logmig").toString
    val d = Incremental.Dirs(root)
    // A HEADERLESS log is the pre-sentinel format: its plain lines are
    // complete legacy records and must survive the upgrade as done
    // tags — without the migration every published night would rerun
    // and double-append its additive ledgers.
    java.nio.file.Files.write(
      new java.io.File(root, "_nights.log").toPath,
      "night_1\nnight_13\n".getBytes("UTF-8"))
    assert(Incremental.doneTags(d).isEmpty,
      "unmigrated legacy lines were trusted outside the lease")
    Incremental.withWriterLock(d)(()) // lease entry migrates
    assert(Incremental.doneTags(d) == Set("night_1", "night_13"))
    val body = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(root, "_nights.log").toPath), "UTF-8")
    assert(body.startsWith("#v2\n"), s"migrated log lacks the header: $body")
    // Post-migration, a '|'-free line is a NEW-format torn fragment
    // and must never be blessed by a later lease entry.
    java.nio.file.Files.write(
      new java.io.File(root, "_nights.log").toPath,
      (body + "night_7").getBytes("UTF-8"))
    Incremental.withWriterLock(d)(())
    assert(!Incremental.doneTags(d).contains("night_7"),
      "a torn fragment in a v2 log was blessed by re-migration")
  }

  test("a corrupt done-log version header fails loud instead of re-migrating") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_pl11_hdr").toString
    val d = Incremental.Dirs(root)
    // A '#'-prefixed first line that is not exactly '#v2' is corrupt
    // state (the header write is tmp + atomic rename, so no writer
    // produces a partial one) — re-migrating would treat the log as
    // legacy and bless every '|'-free line, including torn fragments.
    java.nio.file.Files.write(
      new java.io.File(root, "_nights.log").toPath,
      "#v\nnight_5|end\nnight_1".getBytes("UTF-8"))
    val e = intercept[IllegalStateException] {
      Incremental.withWriterLock(d)(())
    }
    assert(e.getMessage.contains("corrupt"), e.getMessage)
    // And the refusal must not have blessed anything.
    assert(!Incremental.doneTags(d).contains("night_1"))
    // The failed entry must also have released its lease (fail loud,
    // not deadlock the root).
    assert(!new java.io.File(root, "_WRITER.lock").exists(),
      "corrupt-header refusal leaked the writer lease")
  }

  test("aged takeover-claim and release-tombstone corpses are reaped at lease entry") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_pl11_corpse").toString
    val d = Incremental.Dirs(root)
    new java.io.File(root).mkdirs()
    val old = System.currentTimeMillis() - 11 * 60 * 1000L
    val stale = new java.io.File(root, "_WRITER.lock.stale.dead-claimant")
    val tomb = new java.io.File(root, "_WRITER.lock.release.dead-holder")
    val fresh = new java.io.File(root, "_WRITER.lock.stale.live-claimant")
    for (f <- Seq(stale, tomb, fresh))
      java.nio.file.Files.write(f.toPath, f.getName.getBytes("UTF-8")): Unit
    assert(stale.setLastModified(old) && tomb.setLastModified(old))
    Incremental.withWriterLock(d)(())
    assert(!stale.exists() && !tomb.exists(),
      "aged lock corpses were not reaped at lease entry")
    assert(fresh.exists(),
      "a FRESH claim file (a live claimant mid-takeover) was reaped")
    assert(fresh.delete())
  }

  test("lease release verifies ownership: a superseded holder leaves the new lock alone") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_pl11_token").toString
    val d = Incremental.Dirs(root)
    val lock = new java.io.File(root, "_WRITER.lock")
    Incremental.withWriterLock(d) {
      // Simulate an age-based takeover by a second process mid-body:
      // the lock now carries the NEW holder's token.
      assert(lock.delete())
      java.nio.file.Files.write(lock.toPath, "new-holder".getBytes("UTF-8"))
    }
    // The superseded holder's exit must NOT delete the new holder's
    // lock (that would let a third writer in while the second runs).
    assert(lock.exists(), "superseded holder deleted the new holder's lock")
    assert(new String(java.nio.file.Files.readAllBytes(lock.toPath),
      "UTF-8") == "new-holder")
    assert(lock.delete())
  }

  private def forkProbe(root: String, mode: String, ms: String): Process = {
    val javaBin = new java.io.File(new java.io.File(
      System.getProperty("java.home"), "bin"), "java").getPath
    new ProcessBuilder(javaBin, "-cp", System.getProperty("java.class.path"),
      "graft.operators.LeaseProbe", root, mode, ms)
      .redirectErrorStream(true).start()
  }

  test("two-process writer race: heartbeat keeps a live lease, takeover after death, one re-race winner") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_lease_2proc").toString
    val d = Incremental.Dirs(root)
    // A SECOND JVM acquires and holds (staleMs=3000, heartbeat ~1 s — two missed beats of margin under co-tenant pauses).
    val holder = forkProbe(root, "hold", "60000")
    val out = new java.io.BufferedReader(
      new java.io.InputStreamReader(holder.getInputStream))
    assert(out.readLine() == "HELD", "holder process never acquired")
    // A live lock from another PROCESS excludes us, fail-loud...
    intercept[Incremental.ConcurrentNightWriter] {
      Incremental.withWriterLock(d, staleMs = 3000L)(())
    }
    // ...even after staleMs has elapsed: the holder's heartbeat keeps
    // the lease fresh, so age-based takeover must NOT fire on it.
    Thread.sleep(4000L)
    intercept[Incremental.ConcurrentNightWriter] {
      Incremental.withWriterLock(d, staleMs = 3000L)(())
    }
    // The holder DIES without releasing: heartbeat stops, the lease
    // goes stale, and this process takes it over (and releases it).
    holder.destroyForcibly(); holder.waitFor()
    Thread.sleep(3500L)
    var entered = false
    Incremental.withWriterLock(d, staleMs = 3000L) { entered = true }
    assert(entered, "stale takeover after holder death did not acquire")
    assert(!new java.io.File(root, "_WRITER.lock").exists())
    // EXACTLY-ONE-WINNER on a takeover re-race: four claimant JVMs
    // probe one stale corpse concurrently; the atomic-rename takeover
    // admits exactly one (delete+recreate could interleave into two
    // holders), and the winner holds long enough that every other
    // claimant overlaps it.
    val lock = new java.io.File(root, "_WRITER.lock")
    java.nio.file.Files.write(lock.toPath, "dead-holder".getBytes("UTF-8"))
    assert(lock.setLastModified(System.currentTimeMillis() - 10000L))
    val racers = (1 to 4).map(_ => forkProbe(root, "try", "5000"))
    val outcomes = racers.map { p =>
      assert(p.waitFor(60, java.util.concurrent.TimeUnit.SECONDS))
      scala.io.Source.fromInputStream(p.getInputStream).mkString.trim
    }
    assert(outcomes.count(_ == "WON") == 1,
      s"takeover re-race winners != 1: $outcomes")
    assert(outcomes.count(_ == "LOST") == 3,
      s"takeover re-race losers != 3: $outcomes")
  }

  test("pl13 composed takedown: both modality legs purge, neither leaks") {
    val (textDirs, vecLive) = Incremental.pl13Run(spark, sfDir)
    val purgedDoc = col("doc_id") % Incremental.PurgeMod === Incremental.PurgeRem
    val purgedVec = col("vec_id") % Incremental.PurgeMod === Incremental.PurgeRem
    // The text leg (pl12's purge, reused verbatim) left no purged doc in
    // any artifact, and the vector leg (ss15's delete, reused verbatim)
    // left no purged vector in the index.
    for (a <- Seq(textDirs.docs, textDirs.bh, textDirs.table, textDirs.ck))
      assert(spark.read.parquet(a).filter(purgedDoc).isEmpty,
        s"purged doc survived the composed takedown in $a")
    assert(spark.read.parquet(vecLive).filter(purgedVec).isEmpty,
      "purged vector survived the composed takedown")
    // The vector leg's audit (memoized — same staged run): the rewrite
    // was confined to the cells holding tombstones, and any untouched
    // cell directory is byte-identical across the delete.
    val audit = graft.operators.Similarity.ivfDeleteRun(spark, "e2e", sfDir,
      org.apache.spark.sql.functions.pmod(col("vec_id"),
        org.apache.spark.sql.functions.lit(Incremental.PurgeMod.toLong))
        === Incremental.PurgeRem)
    assert(audit.affected.nonEmpty, "vector delete audit is empty")
    def cellOf(rel: String): Option[Int] =
      "label=(\\d+)".r.findFirstMatchIn(rel).map(_.group(1).toInt)
    val untouchedPre = audit.preFiles.filter {
      case (k, _) => cellOf(k).exists(c => !audit.affected.contains(c))
    }
    val untouchedPost = audit.postFiles.filter {
      case (k, _) => cellOf(k).exists(c => !audit.affected.contains(c))
    }
    assert(untouchedPre == untouchedPost,
      "untouched vector cells changed across the composed delete")
    // Cross-modality contract: no surviving vector is orphaned relative
    // to the purged text corpus beyond what the source pairing allows
    // (the query's oracle pins the exact counts; here the residues).
    val row = graft.SparkEntry.queries("pl13_delete_e2e")(spark, sfDir)
      .collect()(0)
    assert(row.getAs[Long]("n_purged_docs_left") == 0L &&
      row.getAs[Long]("n_purged_vecs_left") == 0L)
  }

  test("pl15 estate purge: zero residue, touched-partition-only rewrites, labels converge") {
    val audit = Incremental.pl15Run(spark, sfDir)
    // Zero residue across every estate artifact (the audit rows double
    // as the query's own output; here we also pin vacuity guards the
    // hash-compare cannot express).
    val rows = Incremental.estateAuditRows(spark, audit.root).collect()
    assert(rows.length == 6)
    assert(rows.forall(_.getAs[Long]("n_purged_refs") == 0L),
      s"purged ids survive in: ${rows.filter(_.getAs[Long]("n_purged_refs") > 0).map(_.getString(0)).toSeq}")
    assert(rows.forall(_.getAs[Long]("n_rows") > 0L),
      "an estate artifact is empty — the audit is vacuous")
    // The purge actually pruned: every leg touched a PROPER subset of
    // its partitions (labels may legitimately touch none when no
    // purged doc is clustered at this SF).
    for ((art, must) <- Seq("docserve" -> true, "sets" -> true,
        "grams" -> true, "phash" -> true, "bands" -> true,
        "labels" -> false)) {
      val t = audit.touched(art)
      if (must) assert(t.nonEmpty, s"$art: purge touched nothing")
      // Doc-bucketed legs prune hard by construction: purged ids are
      // doc_id % 16 = 5, so their doc buckets are exactly {5, 21} of
      // 32. The band ledger's buckets hash the PROBE key — with
      // corpus-many purged docs every bucket can legitimately hold a
      // purged row (the documented full-scan-discovery class), so only
      // the doc-keyed legs get the proper-subset assertion.
      if (art != "bands")
        assert(t.size < graft.sources.Scratch.ServeBuckets,
          s"$art: every partition rewritten — nothing incremental")
      // Untouched partition dirs byte-identical across the purge.
      val re = "=(\\d+)/".r
      def bktOf(rel: String): Option[Int] =
        re.findFirstMatchIn(rel).map(_.group(1).toInt)
      val pre = audit.preFiles.filter { case (k, _) =>
        k.startsWith(s"/$art/") && bktOf(k).exists(b => !t.contains(b)) }
      val post = audit.postFiles.filter { case (k, _) =>
        k.startsWith(s"/$art/") && bktOf(k).exists(b => !t.contains(b)) }
      if (t.size < graft.sources.Scratch.ServeBuckets) {
        assert(pre.nonEmpty, s"$art: no untouched partitions to audit")
        assert(post == pre, s"$art: untouched partitions changed")
      }
    }
    // Labels artifact converges EXACTLY (not just by checksum) to the
    // builder re-run over the surviving corpus.
    val survivors = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % Incremental.PurgeMod =!= Incremental.PurgeRem)
      .select(col("doc_id"), col("text"))
    val expect = Dedup.componentsOf(Dedup.lshPairsOf(survivors))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = spark.read
      .parquet(new java.io.File(audit.root, "labels").getPath)
      .select("doc_id", "canonical_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect,
      s"labels diverged: extra=${(got diff expect).take(4)} missing=${(expect diff got).take(4)}")
  }

  test("pl15 cluster labels: canonical departure relabels, bridge purge splits") {
    import spark.implicits._
    // Crafted estate: an identical-text triangle {1, 9, 17} (complete
    // pair graph, canonical 1) and a similarity CHAIN 2–5–21 (Jaccard
    // 0.5 / 0.6, ends dissimilar at 0.2) where doc 5 is the CUT
    // VERTEX, plus an unclustered loner. Purging {1, 5} exercises the
    // two hard label cases at once: the minimum of a surviving
    // component departs (9, 17 must re-canonicalize to 9), and a
    // bridge departs (2 and 21 fall out of the pair graph entirely —
    // a stale estate would keep them labeled against the dead chain).
    val docs = Seq(
      (1L, "dupjx alpha bravo charlie delta echo"),
      (9L, "dupjx alpha bravo charlie delta echo"),
      (17L, "dupjx alpha bravo charlie delta echo"),
      (2L, "ta tb tc td te tf"),
      (5L, "ta tb tc td te tf tg th ti tj"),
      (21L, "tb tc td te tf tg th ti tj tk"),
      (3L, "lonely words that match nothing else here")
    ).toDF("doc_id", "text")
    // Fixture sanity: the chain's pairs actually materialize through
    // LSH candidate generation (bands are deterministic — if a salt
    // change ever breaks a collision this fails loudly, not silently).
    val pairs = Dedup.lshPairsOf(docs)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 9L), (1L, 17L), (9L, 17L), (2L, 5L), (5L, 21L)),
      s"crafted pair graph diverged: $pairs")
    val root = java.nio.file.Files
      .createTempDirectory("graft_pl15_craft").toString
    Incremental.estateBuild(spark, root, docs)
    val audit = Incremental.estatePurge(spark, root,
      Seq(1L, 5L).toDF("doc_id"))
    def labels = spark.read
      .parquet(new java.io.File(root, "labels").getPath)
      .select("doc_id", "canonical_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(labels == Set((9L, 9L), (17L, 9L)),
      s"post-purge labels wrong: $labels")
    // Purged text gone from every doc-keyed artifact.
    for (art <- Seq("docserve", "sets", "grams", "phash", "bands")) {
      assert(spark.read.parquet(new java.io.File(root, art).getPath)
        .filter(col("doc_id").isin(1L, 5L)).isEmpty,
        s"purged doc survived in $art")
    }
    assert(audit.touched("labels").nonEmpty)
    // Convergence: identical to the estate built from survivors only.
    val fullRoot = java.nio.file.Files
      .createTempDirectory("graft_pl15_craft_full").toString
    Incremental.estateBuild(spark, fullRoot,
      docs.filter(!col("doc_id").isin(1L, 5L)))
    for (art <- Seq("docserve", "sets", "grams", "phash", "bands", "labels")) {
      val a = spark.read.parquet(new java.io.File(root, art).getPath)
      val b = spark.read.parquet(new java.io.File(fullRoot, art).getPath)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$art diverged from the survivor rebuild")
    }
  }

  test("estate purge killed mid-publish recovers; replay idempotent; snapshots GC'd") {
    import spark.implicits._
    val docs = Seq(
      (1L, "dupkx alpha2 bravo2 charlie2 delta2 echo2"),
      (9L, "dupkx alpha2 bravo2 charlie2 delta2 echo2"),
      (17L, "dupkx alpha2 bravo2 charlie2 delta2 echo2"),
      (3L, "lonely2 words2 that2 match2 nothing2 else2 here2 now2")
    ).toDF("doc_id", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft_pl15_crash").toString
    Incremental.estateBuild(spark, root, docs)
    val d = Incremental.Dirs(root)
    // The estate purge runs under the same commit protocol as the
    // nights — kill it mid-publish and recovery must finish it.
    Incremental.failAt = Some((root, "mid-publish"))
    try intercept[Incremental.InjectedNightCrash] {
      Incremental.estatePurge(spark, root, Seq(1L).toDF("doc_id"))
    } finally Incremental.failAt = None
    assert(new java.io.File(root, "_staging/estate_purge/MANIFEST").exists())
    assert(Incremental.recoverPending(d) == Seq("estate_purge"),
      "recovery did not publish the committed estate purge")
    // Converges to the estate built from survivors only.
    val fullRoot = java.nio.file.Files
      .createTempDirectory("graft_pl15_crash_full").toString
    Incremental.estateBuild(spark, fullRoot, docs.filter(col("doc_id") =!= 1L))
    for (art <- Seq("docserve", "sets", "grams", "phash", "bands", "labels")) {
      val a = spark.read.parquet(new java.io.File(root, art).getPath)
      val b = spark.read.parquet(new java.io.File(fullRoot, art).getPath)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$art diverged from the survivor rebuild after recovery")
    }
    // An at-least-once REPLAY of the whole purge is naturally
    // idempotent — deletes self-collapse (the anti-joins remove
    // nothing, the labels leg finds no clustered purged doc) — and
    // converges to the same tree.
    Incremental.estatePurge(spark, root, Seq(1L).toDF("doc_id"))
    val again = spark.read
      .parquet(new java.io.File(root, "labels").getPath)
      .select("doc_id", "canonical_id")
      .collect().map(_.toSeq).toSet
    assert(again == spark.read
      .parquet(new java.io.File(fullRoot, "labels").getPath)
      .select("doc_id", "canonical_id")
      .collect().map(_.toSeq).toSet)
    // Snapshot retention: at most two listing VERSIONS per artifact,
    // ever — count pointer files only (a sharded listing adds a
    // SNAP-n.d dir per version, which is retention-paired, not a
    // third version).
    for (art <- Seq("docserve", "sets", "grams", "phash", "bands", "labels")) {
      val snaps = Option(new java.io.File(
        new java.io.File(root, art), "_snapshots").listFiles())
        .toSeq.flatten
        .filter(f => f.isFile && f.getName.matches("SNAP-\\d{8}"))
      assert(snaps.size <= 2, s"$art: ${snaps.size} snapshot listings retained")
    }
  }

  test("pl16 provenance: delete legs coherent, st38 ledger drained") {
    val rows = graft.SparkEntry.queries("pl16_provenance_vec")(spark, sfDir)
      .persist()
    try {
      // A tombstoned vector must be GONE from the post-compaction
      // index (the two flags come from different artifacts — ledger vs
      // live tree — so this is a real cross-artifact invariant, not a
      // tautology), and manifest membership implies text pairing.
      assert(rows.filter(col("tombstoned") && col("in_live_index")).isEmpty,
        "a tombstoned vector survived ss15's delete compaction")
      assert(rows.filter(col("takedown_member") && !col("has_doc")).isEmpty,
        "a doc-less vector claims mm12 takedown membership")
      assert(rows.filter(col("st38_deleted")).count() > 0 &&
        rows.filter(col("tombstoned")).count() > 0,
        "fixture produced no deletes — the provenance flags are vacuous")
      // st38's pending ledger is retired after its last compaction —
      // the drained state the 'st38_deleted = absent from live' flag
      // relies on.
      val (_, tombDir) =
        graft.streaming.Streams.st38StreamRun(spark, sfDir)
      assert(spark.read.parquet(tombDir).isEmpty,
        "st38 pending tombstone ledger not drained after the run")
    } finally { rows.unpersist(blocking = false); () }
  }

  test("emptied shard loses its ck/cm partitions (ghost-postings divergence fixture)") {
    import spark.implicits._
    // Crafted corpus (part = doc_id % 8):
    //   A=2  "applepie1 bananaz1"  — blocks {applepie1, bananaz1}
    //   B=5  "applepie1 bananaz1 zebraxx1 zebraxx1" — blocks
    //        {"applepie1 bananaz1", "zebraxx1 zebraxx1"}; the second is
    //        corpus-boilerplate (shared with C), so B's cleaned text
    //        equals A's → one ck group {A, B}, canon A.
    //   C=3  "zebraxx1 zebraxx1 walnutt1 velvetty"
    //   E=13 "mangoes1 nectars1"
    // Night 1 (shard 7): doc 7 repeats A's text → A's block hashes cross
    // MinDf → A and 7 lose everything (shard 2's ck partition EMPTIES;
    // A departs the {A, B} group while B survives). Night 2 (shard 6):
    // doc 14 repeats E's text → E's hashes cross → shard 5 (B, E) is
    // rewritten; B's canonical lookup now consults the staged partials.
    // A ghost part=2 row (A, ck) would canonicalize B to the departed A
    // and emit "duplicate"; the truth is B canonical → "kept".
    val docs = Seq(
      (2L, "en", "applepie1 bananaz1"),
      (5L, "en", "applepie1 bananaz1 zebraxx1 zebraxx1"),
      (3L, "en", "zebraxx1 zebraxx1 walnutt1 velvetty"),
      (13L, "en", "mangoes1 nectars1"),
      (7L, "en", "applepie1 bananaz1"),
      (14L, "en", "mangoes1 nectars1")
    ).toDF("doc_id", "lang", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft_pl11_ghost").toString
    val audit = Incremental.runIncremental(spark, docs, root, Seq(7, 6))

    // Night 1 emptied shard 2: its ck/cm partitions must be GONE.
    val night1 = audit.nights.head
    assert(sub(night1.preFiles, "/ck/part=2").nonEmpty,
      "fixture broken: shard 2 had no base ck partition to empty")
    assert(sub(night1.postFiles, "/ck/part=2").isEmpty,
      "ghost ck partition survived the emptying rewrite")
    assert(sub(night1.postFiles, "/cm/part=2").isEmpty,
      "ghost cm partition survived the emptying rewrite")

    // And the incremental table converges to the full recompute — with
    // the ghost, night 2 would mislabel B=5 as 'duplicate' of departed A.
    val fullRoot = java.nio.file.Files
      .createTempDirectory("graft_pl11_full").toString
    Incremental.runIncremental(spark, docs, fullRoot, Seq())
    def rows(r: String) = spark.read
      .parquet(Incremental.Dirs(r).table)
      .select("doc_id", "lang", "stage", "part")
      .collect().map(_.toSeq).toSet
    val inc = rows(root)
    val full = rows(fullRoot)
    assert(inc == full,
      s"incremental diverged from full recompute:\n  inc-only=${(inc diff full).take(4)}" +
        s"\n  full-only=${(full diff inc).take(4)}")
    assert(inc.exists(r => r(0) == 5L && r(2) == "kept"),
      "fixture broken: B=5 should be kept in the ground truth")
  }
}
