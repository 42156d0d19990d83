package graft.operators

import graft.SparkSpec

/** pl11's incremental-rewrite contract. Correctness (incremental ≡
  * full recompute after BOTH delta nights) is the oracle's job; what
  * the oracle CANNOT see is the incrementality itself — that each
  * delta night rewrote only the affected shard directories, and that
  * the SECOND night ran correctly against side artifacts the first
  * night's rewrite refreshed. This spec pins both, from the build's
  * per-night file-level audits. */
class IncrementalSpec extends SparkSpec {

  test("pl11 rewrites only affected shards per night; untouched shard files byte-identical") {
    val audit = Incremental.pl11Run(spark, sfDir)
    assert(audit.nights.map(_.deltaPart) ==
      Seq(Incremental.Parts - 2, Incremental.Parts - 1))

    def shardOf(rel: String): Option[Int] =
      "part=(\\d+)".r.findFirstMatchIn(rel).map(_.group(1).toInt)

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

      // File-level immutability: every file under an UNTOUCHED shard
      // directory is identical (path, length, mtime) across the night,
      // with nothing added or removed there.
      val untouched = loaded -- night.affectedParts.toSet
      def restrict(m: Map[String, (Long, Long)], parts: Set[Int]) =
        m.filter { case (rel, _) => shardOf(rel).exists(parts) }
      val pre = restrict(night.preFiles, untouched)
      val post = restrict(night.postFiles, untouched)
      assert(pre.nonEmpty, s"night ${night.deltaPart}: nothing untouched to compare")
      assert(post == pre,
        s"night ${night.deltaPart}: untouched shards changed: " +
          s"added=${(post.keySet diff pre.keySet).take(3)} " +
          s"removed=${(pre.keySet diff post.keySet).take(3)} " +
          s"modified=${pre.collect { case (k, v) if post.get(k).exists(_ != v) => k }.take(3)}")
      // And the affected EARLIER shards were actually rewritten.
      val affEarlier = night.affectedParts.toSet.filter(_ < night.deltaPart)
      assert(restrict(night.postFiles, affEarlier) !=
        restrict(night.preFiles, affEarlier),
        s"night ${night.deltaPart}: affected earlier shards not rewritten")
    }

  }
}
