package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The end-to-end training-data curation pipeline, composed from the
  * library's own operators THROUGH their public registries — the
  * "whole job in one declarative plan" demonstration:
  *
  *   keep a document iff
  *     1. language-ID says en/mixed           (ta02)
  *     2. quality score ≥ 0.5                 (ta03)
  *     3. not contaminated by the benchmark   (dd08)
  *     4. canonical in its near-dup cluster   (dd09: not in any cluster,
  *        or the cluster's min-id survivor)
  *
  * Each stage is itself oracle-verified; this composition is verified
  * end-to-end against a DuckDB oracle built by composing the same
  * stages' SQL. Catalyst sees ONE plan — stage boundaries dissolve
  * into shared scans, pushed filters, and broadcastable semi/anti
  * joins, which is the point of being declarative.
  */
object Curation {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pl01_curation" -> ((s, d) => {
      val lang = TextAnalysis.queries("ta02_lang_id")(s, d)
        .select(col("doc_id"), col("pred_lang"))
      val qual = TextAnalysis.queries("ta03_quality_score")(s, d)
        .select(col("doc_id"), col("quality"))
      val contaminated = Dedup.queries("dd08_contamination")(s, d)
        .select(col("doc_id"))
      // Probe the staged cluster artifact (write-once nightly relation);
      // re-running dd09's propagation loop per consumer is the
      // anti-pattern the gram index already retired.
      val clusters = Dedup.stagedClusters(s, d)
      Tables.documents(s, d).select(col("doc_id"))
        .join(lang, "doc_id")
        .join(qual, "doc_id")
        .filter(col("pred_lang").isin("en", "mixed") && col("quality") >= 0.5)
        // Decontamination: anti join on the (small) contaminated set.
        .join(contaminated, Seq("doc_id"), "left_anti")
        // Dedup survivorship: docs outside any cluster pass; inside a
        // cluster only the canonical (min doc_id) survives.
        .join(clusters, Seq("doc_id"), "left")
        .filter(col("canonical_id").isNull || col("canonical_id") === col("doc_id"))
        .select(col("doc_id"), col("pred_lang"), col("quality"))
    }),

    // -- Train-ready EMISSION — the step after pl01's filtering: quality
    //    gate, then KEEP-BEST dedup survivorship (dd16's longest-text
    //    representative, not pl01's min-id rule — the two canonical
    //    policies a curation stack offers), then ta08's deterministic
    //    hash split, rolled up to the per-(split, lang) shard manifest
    //    (doc + token counts) a training launcher consumes. One Catalyst
    //    plan. The cluster-membership and kept relations are CORPUS
    //    FRACTIONS at real web-dup rates (30-60% of docs sit in near-dup
    //    clusters), so they must never be broadcast — shuffle-hash join
    //    on doc_id, dd18/ta21's discipline.
    "pl03_train_emission" -> ((s, d) => {
      val qual = TextAnalysis.queries("ta03_quality_score")(s, d)
        .select(col("doc_id"), col("quality"))
      val toks = TextAnalysis.queries("ta01_token_stats")(s, d)
        .select(col("doc_id"), col("n_tokens"))
      val clusters = Dedup.stagedClusters(s, d)
        .select(col("doc_id"))
      val kept = Dedup.queries("dd16_keep_best")(s, d)
        .select(col("kept_doc_id").as("doc_id"))
      val bucket = expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint) % 100")
      // qual and toks are PER-DOCUMENT relations — corpus-sized, same
      // no-broadcast rule as the cluster/kept sets. All four joins key
      // on doc_id, so the shuffle-hash exchanges line up and AQE can
      // reuse the partitioning across them.
      Tables.documents(s, d).select(col("doc_id"), col("lang"))
        .join(qual.hint("shuffle_hash"), "doc_id").filter(col("quality") >= 0.5)
        .join(toks.hint("shuffle_hash"), "doc_id")
        .join(clusters.withColumn("clustered", lit(1)).hint("shuffle_hash"),
              Seq("doc_id"), "left")
        .join(kept.withColumn("is_kept", lit(1)).hint("shuffle_hash"),
              Seq("doc_id"), "left")
        .filter(col("clustered").isNull || col("is_kept") === 1)
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_tokens").cast("long")).as("n_tokens"))
    }),

    // -- The embedding-side curation pipeline: near-dup pairs from dd07
    //    (cosine ≥ 0.4 inside IVF label blocks), greedy min-id
    //    survivorship (a vector is dropped iff it is the LARGER id of
    //    some near-dup pair — the one-pass policy; transitive-closure
    //    canonicalization is dd09's job on the text side), then
    //    per-label audit counts. Outputs are exact integers only —
    //    a mean-of-norms here would be an order-dependent float sum,
    //    which is exactly what the repo's determinism rules forbid.
    "pl02_embedding_curation" -> ((s, d) => {
      // The dropped-id set is a corpus fraction under heavy duplication
      // — shuffle-hash join on vec_id, never a broadcast (ta21/dd18).
      val dupIds = Dedup.queries("dd07_embedding_neardup")(s, d)
        .select(col("vec_b").as("vec_id")).distinct()
      Tables.embeddings(s, d).select(col("vec_id"), col("label"))
        .join(dupIds.withColumn("is_dup", lit(1)).hint("shuffle_hash"),
              Seq("vec_id"), "left")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_total"),
             sum(coalesce(col("is_dup"), lit(0)).cast("long")).as("n_dups_dropped"))
        .select(col("label"), col("n_total"), col("n_dups_dropped"),
          (col("n_total") - col("n_dups_dropped")).as("n_kept"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    // Composed from the same stages' oracle SQL (public maps) — outer
    // CTE names are pl_-prefixed to avoid capture of the sub-oracles'
    // inner CTE names.
    "pl01_curation" -> {
      val lang = TextAnalysis.oracleSql("ta02_lang_id")
      val qual = TextAnalysis.oracleSql("ta03_quality_score")
      val cont = Dedup.oracleSql("dd08_contamination")
      val canon = Dedup.oracleSql("dd09_dedup_clusters")
      s"""WITH pl_lang AS (SELECT doc_id, pred_lang FROM ($lang)),
          pl_qual AS (SELECT doc_id, quality FROM ($qual)),
          pl_cont AS (SELECT doc_id FROM ($cont)),
          pl_canon AS (SELECT doc_id, canonical_id FROM ($canon))
          SELECT d.doc_id, pl_lang.pred_lang, pl_qual.quality
          FROM documents d
          JOIN pl_lang ON pl_lang.doc_id = d.doc_id
          JOIN pl_qual ON pl_qual.doc_id = d.doc_id
          WHERE pl_lang.pred_lang IN ('en', 'mixed') AND pl_qual.quality >= 0.5
            AND d.doc_id NOT IN (SELECT doc_id FROM pl_cont)
            AND (d.doc_id NOT IN (SELECT doc_id FROM pl_canon)
                 OR EXISTS (SELECT 1 FROM pl_canon pc
                            WHERE pc.doc_id = d.doc_id
                              AND pc.canonical_id = d.doc_id))"""
    },
    "pl03_train_emission" -> {
      val qual = TextAnalysis.oracleSql("ta03_quality_score")
      val toks = TextAnalysis.oracleSql("ta01_token_stats")
      val canon = Dedup.oracleSql("dd09_dedup_clusters")
      val kept = Dedup.oracleSql("dd16_keep_best")
      s"""WITH pl3_qual AS (SELECT doc_id, quality FROM ($qual)),
          pl3_tok AS (SELECT doc_id, n_tokens FROM ($toks)),
          pl3_canon AS (SELECT doc_id FROM ($canon)),
          pl3_kept AS (SELECT kept_doc_id AS doc_id FROM ($kept)),
          pl3_base AS (
            SELECT d.doc_id, d.lang, t.n_tokens,
              CASE WHEN d.b < 80 THEN 'train'
                   WHEN d.b < 90 THEN 'val' ELSE 'test' END AS split
            FROM (SELECT doc_id, lang,
                    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                      AS BIGINT) % 100 AS b
                  FROM documents) d
            JOIN pl3_tok t ON t.doc_id = d.doc_id
            JOIN pl3_qual q ON q.doc_id = d.doc_id
            WHERE q.quality >= 0.5
              AND (d.doc_id NOT IN (SELECT doc_id FROM pl3_canon)
                   OR d.doc_id IN (SELECT doc_id FROM pl3_kept)))
          SELECT split, lang, count(*) AS n_docs,
            CAST(sum(n_tokens) AS BIGINT) AS n_tokens
          FROM pl3_base GROUP BY 1, 2"""
    },
    "pl02_embedding_curation" -> {
      val pairs = Dedup.oracleSql("dd07_embedding_neardup")
      s"""WITH pl2_pairs AS ($pairs),
          pl2_dups AS (SELECT DISTINCT vec_b AS vec_id FROM pl2_pairs)
          SELECT label, count(*) AS n_total,
            CAST(sum(CASE WHEN du.vec_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_dups_dropped,
            CAST(count(*) - sum(CASE WHEN du.vec_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_kept
          FROM embeddings e LEFT JOIN pl2_dups du ON e.vec_id = du.vec_id
          GROUP BY label"""
    }
  )
}
