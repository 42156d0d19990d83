package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{Scratch, Tables}

/** pl11 — INCREMENTAL CORPUS-SNAPSHOT CURATION (SURVEY.md §2.5,
  * training-set construction family): the nightly production shape the
  * batch stack (pl05/pl08) deliberately does not have. pl05 recomputes
  * the world every run; at 100 TB the world is mostly UNCHANGED — the
  * right nightly job is "new crawl partition in, only affected output
  * partitions rewritten" (io10's dynamic partition overwrite + st19's
  * ledger-append, applied to the curation stack).
  *
  * Layout: documents are snapshotted into [[Parts]] crawl shards
  * (part = doc_id % Parts — production uses crawl day/shard). The
  * curated output is pl08's per-doc funnel attribution, written
  * PARTITIONED BY part. Two staged side artifacts make incrementality
  * possible, both partitioned by part so probes prune:
  *   - bh postings  (doc_id, bh)  — which docs contain which block hash
  *   - ck postings  (doc_id, ck)  — each PASSING doc's content key
  *
  * Night 0 builds base shards 0..Parts-3; then TWO delta nights land
  * shards Parts-2 and Parts-1 in sequence — the second night runs
  * against postings the first night's rewrite already refreshed, which
  * is exactly where incremental systems rot (stale side artifacts), so
  * it is exercised, not assumed. Each delta night rewrites ONLY the
  * shards whose rows can differ under the new global state:
  *   1. Drop-set delta: block-hash document frequencies only GROW in an
  *      append-only corpus, so the changed hashes are exactly those
  *      crossing the [[MinDf]] threshold — one aggregation over the
  *      appended postings ledger, no text rescan.
  *   2. Affected shard set: shards of docs containing a crossed hash
  *      (their cleaned text, quality and content key all change), plus
  *      shards of docs sharing a content-key GROUP with any such doc or
  *      any delta doc (their kept/duplicate flag depends on the group's
  *      canonical id), plus the delta shard itself. Collected as a
  *      ≤Parts-int driver scalar (st22's routing class).
  *   3. Rewrite: recompute attribution for the affected shards against
  *      the new global drop set and the new canonical map (derived from
  *      the updated ck postings — untouched shards' postings are REUSED,
  *      never recomputed), then dynamic-partition-overwrite exactly
  *      those shard directories. Untouched shard files are never
  *      rewritten — IncrementalSpec pins them byte-identical.
  *
  * The oracle is the FULL RECOMPUTE over the final corpus (pl08's
  * per-doc CTE chain at this operator's threshold): the incremental
  * path must converge to exactly the from-scratch answer, which is the
  * property that catches any missed dependency in step 2.
  *
  * MinDf = 2 here (the fixture's duplication density: its content
  * paragraphs top out at df 2, so C4's df ≥ 3 would make every night a
  * no-op); production runs the same code at ≥ 3.
  */
object Incremental {

  private[graft] val Parts = 8
  private[graft] val MinDf = 2

  private def partOf(c: org.apache.spark.sql.Column) =
    pmod(c, lit(Parts.toLong)).cast("int")

  /** Per-doc scored relation (doc_id, lang, n_kept, txt, q, ck) for any
    * documents-shaped input against an explicit drop set — pl08's
    * stages 1–3 with the drop relation injected instead of derived. */
  private def scoredOf(docs: DataFrame, dropSet: DataFrame): DataFrame = {
    val blocksDf = Curation.webBlocksOf(docs)
    val bh = Curation.bhOf(blocksDf)
    val kept = bh.hint("shuffle_hash")
      .join(dropSet.hint("shuffle_hash"), Seq("bh"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("idx"))).as("kept_idx"))
    Curation.cleanedScoredOf(blocksDf, kept)
      .withColumn("ck", md5(col("txt")))
  }

  /** Funnel attribution of a scored relation against a canonical map. */
  private def stagesOf(scored: DataFrame, canon: DataFrame): DataFrame =
    scored.hint("shuffle_hash")
      .join(canon.hint("shuffle_hash"), Seq("ck"), "left")
      .select(col("doc_id"), col("lang"),
        when(col("n_kept") === 0, "boilerplate_only")
          .when(col("q") < 0.5, "low_quality")
          .when(col("doc_id") =!= col("canon_id"), "duplicate")
          .otherwise("kept").as("stage"),
        partOf(col("doc_id")).as("part"))

  /** One delta night's audit: the arriving shard, which shards its
    * rewrite touched, the file snapshot taken BEFORE its rewrite and
    * the one taken AFTER — shards outside `affectedParts` must be
    * byte-identical between the two. */
  private[graft] final case class NightAudit(
    deltaPart: Int, affectedParts: Seq[Int],
    preFiles: Map[String, (Long, Long)], postFiles: Map[String, (Long, Long)])

  /** Build audit the spec consumes: the table dir + per-night audits. */
  private[graft] final case class Pl11Audit(table: String, nights: Seq[NightAudit])

  private val stagedRuns = TrieMap.empty[String, Pl11Audit]

  private def snapshotFiles(root: java.io.File): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(root)
      .filterNot(f => f.getName.startsWith(".") || f.getName == "_SUCCESS")
      .map(f => f.getPath.stripPrefix(root.getPath) -> (f.length(), f.lastModified()))
      .toMap
  }

  private[graft] def pl11Run(s: SparkSession, d: String): Pl11Audit = {
    val root = new java.io.File(Scratch.dir(s, d, "pl11"))
    stagedRuns.synchronized {
      stagedRuns.getOrElseUpdate(root.getPath, {
        val table = new java.io.File(root, "table")
        val bhDir = new java.io.File(root, "bh").getPath
        val ckDir = new java.io.File(root, "ck").getPath
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("text"))
        val base = docs.filter(partOf(col("doc_id")) < Parts - 2)

        // ---- Night 0: base build + staged postings -----------------
        Curation.bhOf(Curation.webBlocksOf(base))
          .select(col("doc_id"), col("bh"), partOf(col("doc_id")).as("part"))
          .write.mode("overwrite").partitionBy("part").parquet(bhDir)
        val dropBase =
          Curation.dropSetOf(s.read.parquet(bhDir), MinDf)
        val scoredBase = scoredOf(base, dropBase)
        scoredBase.filter(col("q") >= 0.5)
          .select(col("doc_id"), col("ck"), partOf(col("doc_id")).as("part"))
          .write.mode("overwrite").partitionBy("part").parquet(ckDir)
        val canonBase = s.read.parquet(ckDir)
          .groupBy(col("ck")).agg(min(col("doc_id")).as("canon_id"))
        stagesOf(scoredBase, canonBase)
          .write.mode("overwrite").partitionBy("part").parquet(table.getPath)

        // ---- One delta night: shard `p` arrives --------------------
        def night(p: Int): NightAudit = {
          val preFiles = snapshotFiles(table)
          val delta = docs.filter(partOf(col("doc_id")) === p)
          // Ledger append: only the delta's postings are computed; all
          // prior postings are REUSED from the staged artifact.
          Curation.bhOf(Curation.webBlocksOf(delta))
            .select(col("doc_id"), col("bh"), partOf(col("doc_id")).as("part"))
            .write.mode("append").partitionBy("part").parquet(bhDir)
          val allBh = s.read.parquet(bhDir)
          // Crossed hashes: total df reaches MinDf, pre-delta df did not
          // (df only grows — append-only corpus, no downward flips).
          val crossed = allBh.select(col("doc_id"), col("bh"), col("part")).distinct()
            .groupBy(col("bh"))
            .agg(count(lit(1)).as("n_all"),
              sum((col("part") =!= p).cast("long")).as("n_before"))
            .filter(col("n_all") >= MinDf && col("n_before") < MinDf)
            .select(col("bh"))
          val newDrop = Curation.dropSetOf(allBh, MinDf)
          // Affected docs, tier 1: contain a crossed hash (cleaned text
          // / quality / content key all change) — plus every delta doc.
          val aff1 = allBh.join(crossed.hint("shuffle_hash"), Seq("bh"))
            .select(col("doc_id")).distinct()
          val affDocs = aff1
            .unionByName(delta.select(col("doc_id")))
            .distinct()
          // Tier 2: content-key groups touched by tier-1/delta docs —
          // old keys from the staged postings, new keys recomputed for
          // the affected docs only (never a corpus rescan).
          val scoredAff = scoredOf(
            docs.join(affDocs.hint("shuffle_hash"), Seq("doc_id")), newDrop)
          val oldCks = s.read.parquet(ckDir)
            .join(affDocs.hint("shuffle_hash"), Seq("doc_id"))
            .select(col("ck"))
          val changedCks = oldCks
            .unionByName(scoredAff.filter(col("q") >= 0.5).select(col("ck")))
            .distinct()
          val aff2Parts = s.read.parquet(ckDir)
            .join(changedCks.hint("shuffle_hash"), Seq("ck"))
            .select(col("part"))
          // Affected shard set — a ≤Parts-int driver scalar (st22's
          // routing class), the rewrite and pruning unit.
          val affectedParts = affDocs.select(partOf(col("doc_id")).as("part"))
            .unionByName(aff2Parts)
            .distinct().collect().map(_.getInt(0)).toSeq.sorted
          // ---- Rewrite ONLY the affected shards --------------------
          val rewriteDocs = docs.filter(partOf(col("doc_id")).isin(affectedParts: _*))
          val scoredRw = scoredOf(rewriteDocs, newDrop)
          // Updated ck postings: untouched shards' rows reused verbatim,
          // affected shards' rows replaced — then the new canonical map.
          val ckKept = s.read.parquet(ckDir)
            .filter(!col("part").isin(affectedParts: _*))
            .select(col("doc_id"), col("ck"), col("part"))
          val ckNew = scoredRw.filter(col("q") >= 0.5)
            .select(col("doc_id"), col("ck"), partOf(col("doc_id")).as("part"))
          val canonAll = ckKept.unionByName(ckNew)
            .groupBy(col("ck")).agg(min(col("doc_id")).as("canon_id"))
          stagesOf(scoredRw, canonAll)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("part").parquet(table.getPath)
          ckNew.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("part").parquet(ckDir)
          NightAudit(p, affectedParts, preFiles, snapshotFiles(table))
        }
        Pl11Audit(table.getPath, Seq(night(Parts - 2), night(Parts - 1)))
      })
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pl11_incremental_snapshot" -> ((s, d) => {
      val audit = pl11Run(s, d)
      s.read.parquet(audit.table)
        .select(col("doc_id"), col("lang"), col("stage"), col("part"))
    }))

  def oracleSql: Map[String, String] = Map(
    // Full from-scratch recompute over the final corpus at this
    // operator's threshold — incremental must converge to it exactly.
    "pl11_incremental_snapshot" -> {
      val rows = Curation.funnelRowsSqlFor(MinDf)
      s"""SELECT doc_id, lang, stage, CAST(doc_id % $Parts AS INT) AS part
          FROM ($rows)"""
    })
}
