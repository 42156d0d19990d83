package graft.operators

import graft.SparkSpec

/** pl11's incremental-rewrite contract. Correctness (incremental ≡
  * full recompute) is the oracle's job; what the oracle CANNOT see is
  * the incrementality itself — that the delta night rewrote only the
  * affected shard directories. This spec pins exactly that, from the
  * build's file-level audit. */
class IncrementalSpec extends SparkSpec {

  test("pl11 rewrites only affected shards; untouched shard files are byte-identical") {
    val audit = Incremental.pl11Run(spark, sfDir)
    val parts = 0 until Incremental.Parts

    // The delta shard is always rewritten; the crossing-driven spill
    // into base shards must be a PROPER subset — if every shard is
    // affected the incremental path degenerated to a full rewrite and
    // this spec is vacuous.
    assert(audit.affectedParts.contains(Incremental.Parts - 1),
      "delta shard not in the rewrite set")
    assert(audit.affectedParts.size < parts.size,
      s"every shard rewritten — nothing incremental: ${audit.affectedParts}")
    // The fixture has at least one base-shard crossing (a block hash
    // reaching MinDf only once the delta lands), so the dependency
    // tracking is exercised beyond the trivial delta-only case.
    assert(audit.affectedParts.exists(_ < Incremental.Parts - 1),
      "no base shard affected — crossing propagation untested")

    // File-level immutability: every file under an UNTOUCHED shard
    // directory must exist in the pre-incremental snapshot with the
    // same length and mtime, and no files were added or removed there.
    val untouched = parts.filterNot(audit.affectedParts.contains).toSet
    def shardOf(rel: String): Option[Int] =
      "part=(\\d+)".r.findFirstMatchIn(rel).map(_.group(1).toInt)
    val now = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      val root = new java.io.File(audit.table)
      walk(root)
        .filterNot(f => f.getName.startsWith(".") || f.getName == "_SUCCESS")
        .map(f => f.getPath.stripPrefix(root.getPath) -> (f.length(), f.lastModified()))
        .toMap
    }
    val preUntouched = audit.preFiles.filter { case (rel, _) => shardOf(rel).exists(untouched) }
    val nowUntouched = now.filter { case (rel, _) => shardOf(rel).exists(untouched) }
    assert(preUntouched.nonEmpty, "no untouched shard files to compare")
    assert(nowUntouched == preUntouched,
      s"untouched shards changed: added=${(nowUntouched.keySet diff preUntouched.keySet).take(3)} " +
        s"removed=${(preUntouched.keySet diff nowUntouched.keySet).take(3)} " +
        s"modified=${preUntouched.collect { case (k, v) if nowUntouched.get(k).exists(_ != v) => k }.take(3)}")

    // And the affected shards WERE rewritten (their files differ from
    // the base-build snapshot).
    val preAffected = audit.preFiles.filter { case (rel, _) =>
      shardOf(rel).exists(p => audit.affectedParts.contains(p) && p < Incremental.Parts - 1) }
    val nowAffected = now.filter { case (rel, _) =>
      shardOf(rel).exists(p => audit.affectedParts.contains(p) && p < Incremental.Parts - 1) }
    assert(nowAffected != preAffected, "affected base shards were not rewritten")
  }
}
