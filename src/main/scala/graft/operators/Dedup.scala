package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deduplication operators (SURVEY.md §2.5) over `documents`/`embeddings`.
  *
  * The reference's stateful-MiddleFunc pattern (SURVEY.md §2.3 — dedup
  * caches held in node locals, /root/reference/pipe/node.go:19) only works
  * single-process; these are the distributed re-designs a 100 TB corpus
  * needs:
  *
  *   - exact dedup        → hash groupBy (one shuffle, map-side combine)
  *   - MinHash + LSH      → signature → band buckets → candidate join →
  *                          exact verify. Candidates are bounded by the
  *                          banding, never O(n²).
  *   - SimHash            → 32-bit fingerprint; byte-banding makes the
  *                          hamming≤3 pair search exact (pigeonhole: 3 bit
  *                          flips cannot touch all 4 bytes), one shuffle.
  *   - blocked n-gram Jaccard → pairwise only *within* small blocks.
  *   - embedding near-dup → cosine over same-label cells (IVF-style
  *                          coarse blocking), avoiding the all-pairs join.
  *
  * Cross-engine determinism: hashes are md5 hex *strings* (min over
  * strings is engine-neutral, unlike numeric murmur variants); numeric
  * hash values derive from md5 hex prefixes via base-16 conversion, which
  * DuckDB reproduces with `CAST(concat('0x', …) AS BIGINT)`. Cosines use
  * one fixed formula `dot/sqrt(na*nb)` with sequential folds on both
  * engines and are rounded to 6 decimals before any filter.
  */
object Dedup {

  /** Non-empty whitespace tokens / word 3-gram shingle set, as SQL
    * expression strings (composable inside larger expressions). */
  private val toks = "filter(split(text, ' '), x -> x <> '')"
  private val shingles =
    s"array_distinct(transform(sequence(0, size($toks) - 3), " +
    s"i -> concat(element_at($toks, i + 1), ' ', element_at($toks, i + 2), ' ', element_at($toks, i + 3))))"

  /** doc_id + distinct 3-gram shingle set (docs with ≥3 tokens). */
  private def shingleSets(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(expr(s"size($toks) >= 3"))
      .select(col("doc_id"), expr(shingles).as("sh"))

  /** MinHash signature, long format: k md5-string minima over shingles.
    * The explode is k rows per shingle but the shuffle is only k rows per
    * doc thanks to partial (map-side) min. */
  private def minhashSig(s: SparkSession, d: String, k: Int): DataFrame =
    shingleSets(s, d)
      .select(col("doc_id"), explode(col("sh")).as("g"))
      .select(col("doc_id"), explode(expr(s"sequence(0, ${k - 1})")).as("hid"), col("g"))
      .groupBy(col("doc_id"), col("hid"))
      .agg(min(md5(concat(col("hid"), lit(":"), col("g")))).as("minhash"))

  /** 32-bit SimHash over tf-weighted shingles: bit j is the majority of
    * hash-bit j across all shingle occurrences. One explode + one hash
    * agg carrying 32 conditional bit-sums (no 32× row blowup). */
  private def simhash(s: SparkSession, d: String): DataFrame = {
    val h = shingleSets(s, d)
      .select(col("doc_id"), explode(col("sh")).as("g"))
      .select(col("doc_id"),
        expr("cast(conv(substring(md5(g), 1, 8), 16, 10) as bigint)").as("hv"))
    val bitSums = (0 until 32).map(j => sum(expr(s"shiftright(hv, $j) & 1")).as(s"b$j"))
    val agged = h.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), bitSums: _*)
    val fingerprint = (0 until 32)
      .map(j => expr(s"if(2 * b$j > n, shiftleft(cast(1 as bigint), $j), cast(0 as bigint))"))
      .reduce(_ + _)
    agged.select(col("doc_id"), fingerprint.as("simhash"))
  }

  /** Jaccard of two shingle-set columns, rounded for engine parity. */
  private def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    round(inter / (size(a) + size(b) - size(array_intersect(a, b))), 6)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- Exact dedup: group by normalized content, keep the smallest
    //    doc_id as canonical. Single shuffle; at 100 TB group instead by
    //    md5(text) so the shuffle key is 32 bytes, not the document.
    "dd01_exact_dedup" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(md5(lower(trim(col("text")))).as("content_key"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .select(col("doc_id"), col("n_copies"))
    }),

    // -- MinHash signatures (k=8), long format.
    "dd02_minhash_sig" -> ((s, d) =>
      minhashSig(s, d, 8)),

    // -- MinHash-LSH near-dup pairs: 4 bands × 2 rows → band-key buckets
    //    → candidate pairs → exact shingle-Jaccard verify (≥ 0.5). The
    //    only joins are bucket-equality self-join + two id-equality set
    //    lookups; candidate count is governed by banding, never O(n²).
    "dd03_minhash_lsh_pairs" -> ((s, d) => {
      val sig = minhashSig(s, d, 8)
      val bands = sig
        .groupBy(col("doc_id"), expr("cast(hid / 2 as int)").as("band"))
        .agg(min(when(col("hid") % 2 === 0, col("minhash"))).as("m0"),
             min(when(col("hid") % 2 === 1, col("minhash"))).as("m1"))
        .select(col("doc_id"),
          md5(concat(col("band"), lit("|"), col("m0"), lit("|"), col("m1"))).as("bk"))
      val cand = bands.as("a")
        .join(bands.as("b"), col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val sets = shingleSets(s, d)
      cand
        .join(sets.as("x"), col("doc_a") === col("x.doc_id"))
        .join(sets.as("y"), col("doc_b") === col("y.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          jaccard(col("x.sh"), col("y.sh")).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
    }),

    // -- Blocked n-gram Jaccard: pairwise comparison only *within*
    //    (lang, source) blocks — the classic blocking design; block size,
    //    not corpus size, bounds the quadratic term.
    "dd04_ngram_jaccard" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .filter(expr(s"size($toks) >= 3"))
        .select(col("doc_id"), col("lang"), col("source"), expr(shingles).as("sh"))
      docs.as("a")
        .join(docs.as("b"),
          col("a.lang") === col("b.lang") && col("a.source") === col("b.source") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          jaccard(col("a.sh"), col("b.sh")).as("jaccard"))
        .filter(col("jaccard") >= 0.3)
    }),

    // -- SimHash fingerprints (32-bit, tf-weighted shingle features).
    "dd05_simhash" -> ((s, d) =>
      simhash(s, d)),

    // -- SimHash near-dup pairs at hamming ≤ 3 via exact byte-banding:
    //    a pair differing in ≤3 bits must agree on ≥1 of the 4 bytes, so
    //    the 4-way band join has 100% recall (no probabilistic miss).
    "dd06_simhash_pairs" -> ((s, d) => {
      val sh = simhash(s, d)
      val banded = sh.select(col("doc_id"), col("simhash"),
          explode(expr("sequence(0, 3)")).as("band"))
        .withColumn("bv", expr("(simhash >> (band * 8)) & 255"))
      banded.as("a")
        .join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
    }),

    // -- Embedding-cosine near-dup: IVF-style coarse blocking on `label`
    //    (the fixture's cluster id) keeps the pair join within cells.
    //    Cosine = dot/sqrt(na*nb) with sequential folds; rounded before
    //    the threshold so both engines make the same keep/drop decision.
    "dd07_embedding_neardup" -> ((s, d) => {
      val v = Tables.embeddings(s, d).select(
        col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x as double))").as("e"))
      val dotAB = expr("aggregate(zip_with(a.e, b.e, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)")
      val nA = expr("aggregate(transform(a.e, x -> x * x), cast(0 as double), (acc, x) -> acc + x)")
      val nB = expr("aggregate(transform(b.e, x -> x * x), cast(0 as double), (acc, x) -> acc + x)")
      v.as("a")
        .join(v.as("b"), col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          round(dotAB / sqrt(nA * nB), 6).as("cos"))
        .filter(col("cos") >= 0.4)
    })
  )

  private val dtoks = "list_filter(string_split(text, ' '), x -> x <> '')"
  private val dsh =
    s"list_distinct(list_transform(range(len($dtoks) - 2), " +
    s"i -> $dtoks[i+1] || ' ' || $dtoks[i+2] || ' ' || $dtoks[i+3]))"
  private val dSets =
    s"SELECT doc_id, $dsh AS sh FROM documents WHERE len($dtoks) >= 3"
  private val dSig =
    s"""WITH sets AS ($dSets),
        e AS (SELECT doc_id, unnest(sh) AS g FROM sets)
        SELECT doc_id, CAST(t.hid AS INT) AS hid,
               min(md5(concat(t.hid, ':', g))) AS minhash
        FROM e, range(8) t(hid) GROUP BY 1, 2"""
  private val dSimhash =
    s"""WITH sets AS ($dSets),
        e AS (SELECT doc_id, unnest(sh) AS g FROM sets),
        h AS (SELECT doc_id,
                CAST(concat('0x', substr(md5(g), 1, 8)) AS BIGINT) AS hv FROM e),
        bits AS (SELECT doc_id, j, sum((hv >> CAST(j AS INT)) & 1) AS sc, count(*) AS n
                 FROM h, range(32) t(j) GROUP BY 1, 2)
        SELECT doc_id,
               sum(CASE WHEN 2 * sc > n
                   THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS simhash
        FROM bits GROUP BY 1"""

  def oracleSql: Map[String, String] = Map(
    "dd01_exact_dedup" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
         FROM documents GROUP BY md5(lower(trim(text)))""",
    "dd02_minhash_sig" -> dSig,
    "dd03_minhash_lsh_pairs" ->
      s"""WITH sig AS ($dSig),
          band AS (SELECT doc_id, hid // 2 AS band,
                     min(CASE WHEN hid % 2 = 0 THEN minhash END) AS m0,
                     min(CASE WHEN hid % 2 = 1 THEN minhash END) AS m1
                   FROM sig GROUP BY 1, 2),
          bk AS (SELECT doc_id, md5(concat(band, '|', m0, '|', m1)) AS k FROM band),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM bk a JOIN bk b ON a.k = b.k AND a.doc_id < b.doc_id),
          sets AS ($dSets)
          SELECT doc_a, doc_b, jaccard FROM (
            SELECT doc_a, doc_b,
              round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))), 6) AS jaccard
            FROM cand JOIN sets x ON doc_a = x.doc_id
                      JOIN sets y ON doc_b = y.doc_id)
          WHERE jaccard >= 0.5""",
    "dd04_ngram_jaccard" ->
      s"""WITH docs AS (SELECT doc_id, lang, source, $dsh AS sh
                        FROM documents WHERE len($dtoks) >= 3)
          SELECT doc_a, doc_b, jaccard FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
            FROM docs a JOIN docs b
              ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id)
          WHERE jaccard >= 0.3""",
    "dd05_simhash" -> dSimhash,
    "dd06_simhash_pairs" ->
      s"""WITH sh AS ($dSimhash),
          banded AS (SELECT doc_id, simhash, CAST(t.band AS INT) AS band,
                       (simhash >> (CAST(t.band AS INT) * 8)) & 255 AS bv
                     FROM sh, range(4) t(band))
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""",
    "dd07_embedding_neardup" ->
      """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
         SELECT vec_a, vec_b, cos FROM (
           SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             round(list_dot_product(a.e, b.e)
               / sqrt(list_dot_product(a.e, a.e) * list_dot_product(b.e, b.e)), 6) AS cos
           FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id)
         WHERE cos >= 0.4"""
  )
}
