package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Decoded-media metadata row produced by the fake decoder (mm02). */
final case class DecodedMeta(
  doc_id: Long, width: Int, height: Int, format: String, n_pixels: Long)

/** Parsed container header produced by the real-bytes decoder (mm06). */
final case class BinHeader(
  doc_id: Long, magic_ok: Boolean, version: Int,
  width: Long, height: Long, payload_md5: String)

/** Per-blob embedding summary produced by the batched extractor (mm07). */
final case class BatchEmbed(doc_id: Long, dim: Int, emb_sum: Long, emb_nrm2: Long)

/** Resize plan emitted by mm08 (all integer arithmetic). */
final case class ResizedMeta(
  doc_id: Long, width: Int, height: Int,
  new_w: Int, new_h: Int, n_pixels_out: Long)

/** Perceptual hash row emitted by mm09's decode+hash pass. */
final case class PHashRow(doc_id: Long, phash: Long)

/** Multimodal-column operators (SURVEY.md §2.5).
  *
  * Media are opaque `binary` columns with typed metadata — the
  * pointer-style layout that survives 100 TB (wide blobs stay in object
  * storage; rows carry bytes or (path, offset, length) pointers). The
  * fixture has no real media files, so each doc carries an in-engine
  * GRF-v2 container blob ([[grf2Blobs]]) and the decode is a REAL
  * byte parser ([[decodeGrf2]] — magic sniff, format tag, big-endian
  * dims); only the pixel-level resampling itself stays out of scope
  * (no media libraries in this environment). Everything Spark-side is
  * real and tested: binary columns through parquet, schema,
  * per-partition batch processing via typed `mapPartitions`,
  * frame-index expansion, and byte-range chunking.
  *
  *   - mm01: blob ingestion — byte length, magic prefix, content hash.
  *   - mm02: the decode pattern: `Dataset[(id, bytes)].mapPartitions`
  *     streaming a real header parse over the iterator — the Scala
  *     analog of the `mapInPandas` batch-UDF shape; the oracle
  *     recomputes the header fields in closed form.
  *   - mm03: frame sampling — one row per sampled frame index.
  *   - mm04: byte-range chunk index — (offset, length, chunk hash).
  *
  * A real deployment swaps [[decodeGrf2]] for an image library's
  * decoder; partitioning, schema and batch shape stay identical.
  */
object Multimodal {

  /** The GRF-v2 container blob mm02/mm08 decode — 25 bytes built
    * IN-ENGINE per doc (mm06's construction discipline, extended with a
    * real format tag): bytes 0-2 magic \x89 'G' 'R' (0x89 forces a
    * non-UTF8 first byte), byte 3 a format TAG byte 'J'|'P'|'W' (the
    * way real decoders sniff jpeg/png/webp from magic bytes), byte 4
    * version 0x02, two big-endian uint16 dimensions (16 + closed-form
    * residues, always ≥ 16 so resize math never divides by zero), then
    * the raw 16-byte md5 digest of the text as payload. */
  private def grf2Blobs(s: SparkSession, d: String): DataFrame =
    grf2BlobsOf(Tables.documents(s, d))

  /** The container wrap over any documents-shaped relation — row-pure,
    * so the streaming decode leg (st33) builds each micro-batch's blobs
    * the same way. */
  private def grf2BlobsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        unhex(concat(
          lit("894752"), // \x89 'G' 'R'
          expr("element_at(array('4A', '50', '57'), cast(doc_id % 3 as int) + 1)"),
          lit("02"),
          lpad(hex(pmod(col("doc_id") * 7919 + 13, lit(4080)) + 16), 4, "0"),
          lpad(hex(pmod(col("doc_id") * 104729 + 7, lit(4080)) + 16), 4, "0"),
          md5(col("text")))).as("blob"))

  /** REAL decoder for [[grf2Blobs]]: a ByteBuffer header parse — magic
    * check, format sniffed from the tag byte, big-endian uint16 dims —
    * nothing derived from hashes. This replaced the round-5 md5 "fake
    * decode": the decode→resize→batch-infer path now parses actual
    * bytes end-to-end; a production deployment swaps this parser for an
    * image library's, with partitioning, schema and batch shape
    * unchanged. Malformed blobs surface loudly (format "invalid",
    * -1 dims) instead of poisoning downstream arithmetic. */
  private[graft] def decodeGrf2(id: Long, blob: Array[Byte]): DecodedMeta = {
    val bb = java.nio.ByteBuffer.wrap(blob)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    val magicOk = blob.length == 25 &&
      (bb.get() & 0xff) == 0x89 && bb.get() == 'G' && bb.get() == 'R'
    val fmt = if (!magicOk) "invalid" else (bb.get().toChar match {
      case 'J' => "jpeg"; case 'P' => "png"; case 'W' => "webp"
      case _ => "invalid"
    })
    // Version byte must be 0x02 (GRF-v2): any other value fails loudly
    // to the sentinel row, matching the magic/format-tag handling.
    if (fmt == "invalid" || bb.get() != 0x02) DecodedMeta(id, -1, -1, "invalid", 0L)
    else {
      val w = bb.getShort.toInt & 0xffff
      val h = bb.getShort.toInt & 0xffff
      DecodedMeta(id, w, h, fmt, w.toLong * h)
    }
  }

  /** mm02's decode over any documents-shaped relation: wrap → typed
    * mapPartitions byte parse → DecodedMeta rows. Shared by the batch
    * query and st33's per-micro-batch streaming leg (decode is row-pure,
    * so union over batches ≡ the batch decode). */
  private[graft] def decodePartial(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    grf2BlobsOf(docs)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) => decodeGrf2(id, blob) })
      .toDF()
  }

  /** mm09's decode+hash pass: parse the GRF-v2 container, then compute a
    * 27-bit GRADIENT perceptual hash over the decoded 16-byte payload —
    * the dHash design (public literature: compare adjacent "pixel"
    * intensities; robust to uniform brightness/contrast shifts because
    * only the SIGN of each local gradient is kept). Payload bytes are
    * read as a 4×4 grid: 15 sequential-order bits (byte i < byte i+1,
    * the row-major horizontal gradients wrapped at row ends) + 12
    * vertical bits (byte i < byte i+4). Deterministic integer
    * arithmetic end-to-end — a media library's luminance grid drops
    * into the same slot with the hash, banding and join shape
    * unchanged. Typed mapPartitions like mm02: constant memory, scales
    * with partition count. */
  private[graft] def phashOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    grf2BlobsOf(docs)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val p = blob.slice(9, 25).map(_ & 0xff)
        var h = 0L
        var i = 0
        while (i < 15) { if (p(i) < p(i + 1)) h |= 1L << i; i += 1 }
        i = 0
        while (i < 12) { if (p(i) < p(i + 4)) h |= 1L << (15 + i); i += 1 }
        PHashRow(id, h)
      })
      .toDF()
  }

  /** GRF-v3: the PRODUCTION-SHAPED container variant — same magic/tag
    * envelope as v2, version byte 0x03, and a 66-byte LUMINANCE GRID
    * ([[WideGridRows]] × [[WideGridCols]]) as payload instead of v2's
    * 16-byte digest: the grid is the document's leading 66 bytes
    * (space-padded/truncated), the in-engine stand-in for a decoded
    * thumbnail raster. The distinction matters for hashing: local edits
    * perturb FEW grid cells — exactly the locality a perceptual hash
    * exploits — while v2's digest payload has none (flipping one source
    * byte rerolls all 16 payload bytes), which capped its usable hash
    * at the 27 bits the fixture payload could supply. */
  private def grf3BlobsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        unhex(concat(
          lit("894752"), // \x89 'G' 'R'
          expr("element_at(array('4A', '50', '57'), cast(doc_id % 3 as int) + 1)"),
          lit("03"),
          lpad(hex(pmod(col("doc_id") * 7919 + 13, lit(4080)) + 16), 4, "0"),
          lpad(hex(pmod(col("doc_id") * 104729 + 7, lit(4080)) + 16), 4, "0"),
          hex(rpad(col("text"), WideGridRows * WideGridCols, " ")))).as("blob"))

  private[graft] val WideGridRows = 6
  private[graft] val WideGridCols = 11
  /** 60-bit dHash off the v3 grid: [[WideGridCols]]-1 horizontal
    * gradients per row × [[WideGridRows]] rows — 60 bits, the repo's
    * standard wide-hash width (dd05's SimHash class), sign-safe as a
    * long in both engines. */
  private[graft] val WideHashBits = WideGridRows * (WideGridCols - 1)

  /** mm12's takedown-seed predicate (doc_id % mod = rem) — chosen so
    * the seed set intersects the fixture's perceptual pair graph at
    * every SF (verified against the brute pair oracle: ≥3 paired seeds
    * at sf0.001 and sf0.01), making the cluster EXPANSION non-vacuous;
    * deterministic and SQL-twin-able like pl12's purge predicate. */
  private[graft] val TakedownSeedMod = 13
  private[graft] val TakedownSeedRem = 4

  /** The resolved perceptual-cluster labels (doc_id, canonical_id),
    * STAGED write-once per (app, fixture) — Dedup.stagedClusters'
    * discipline applied to the phash pair graph: mm11 (survivorship)
    * and mm12 (takedown propagation) both consume the same component
    * resolution, so the iterative componentsOf loop runs ONCE per
    * fixture and each consumer probes the parquet. */
  private val stagedPhashClusterDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private[graft] def stagedPhashClusters(
      s: SparkSession, d: String): DataFrame = {
    graft.sources.Scratch.cleanupStale(s)
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_phashclusters_" + s.sparkContext.applicationId + "_" +
        d.replaceAll("[^A-Za-z0-9]", "_"))
    stagedPhashClusterDirs.synchronized {
      stagedPhashClusterDirs.getOrElseUpdate(dir.getPath, {
        if (!new java.io.File(dir, "_SUCCESS").exists())
          Dedup.componentsOf(queries("mm09_phash_neardup")(s, d)
              .select(col("doc_a"), col("doc_b")))
            .write.mode("overwrite").parquet(dir.getPath)
        dir.getPath
      })
    }
    s.read.parquet(dir.getPath)
  }

  /** mm10's wide 60-bit gradient phash per doc as DuckDB SQL
    * (doc_id, phash), source-parameterized — the pl15 band-ledger
    * rebuild derives (band, bv) from it with the same 3×20-bit
    * pigeonhole layout [[bandLayout]] computes for (60, radius 2). */
  private[operators] def dWidePhashFor(src: String): String =
    s"""WITH pb AS (
          SELECT doc_id, list_transform(range(66),
            i -> ord(substr(rpad(text, 66, ' '), CAST(i AS INT)+1, 1))) AS p
          FROM $src)
        SELECT doc_id,
          CAST(list_sum(list_transform(range(60),
            b -> CASE WHEN p[(b//10)*11 + (b%10) + 1]
                       < p[(b//10)*11 + (b%10) + 2]
                 THEN (1::BIGINT << CAST(b AS INT)) ELSE 0 END)) AS BIGINT)
            AS phash
        FROM pb"""

  /** mm09's brute-force pair set as DuckDB SQL (doc_a, doc_b) — the
    * shared oracle building block for the cluster consumers (mm11
    * survivorship, mm12 takedown propagation). */
  private[operators] val mm9BrutePairsSql = """WITH pb AS (
           SELECT doc_id, list_transform(range(16),
             i -> CAST(concat('0x', substr(md5(text), CAST(i AS INT)*2+1, 2))
                    AS BIGINT)) AS p
           FROM documents),
         ph AS (
           SELECT doc_id,
             CAST(list_sum(list_transform(range(15),
               i -> CASE WHEN p[CAST(i AS INT)+1] < p[CAST(i AS INT)+2]
                    THEN (1::BIGINT << CAST(i AS INT)) ELSE 0 END)) AS BIGINT)
             + CAST(list_sum(list_transform(range(12),
               i -> CASE WHEN p[CAST(i AS INT)+1] < p[CAST(i AS INT)+5]
                    THEN (1::BIGINT << (15 + CAST(i AS INT))) ELSE 0 END))
               AS BIGINT) AS phash
           FROM pb)
         SELECT doc_a, doc_b FROM (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             bit_count(xor(a.phash, b.phash)) AS hamming
           FROM ph a JOIN ph b ON a.doc_id < b.doc_id)
         WHERE hamming <= 2"""

  /** mm10's decode+hash pass: parse the GRF-v3 container and compute
    * the [[WideHashBits]]-bit gradient dHash over the decoded raster.
    * Same typed-mapPartitions shape as [[phashOf]]; a media library's
    * thumbnail raster drops into the same slot. */
  private[graft] def phashWideOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val cols = WideGridCols
    val bits = WideHashBits
    grf3BlobsOf(docs)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, blob) =>
        val ok = blob.length == 9 + WideGridRows * cols &&
          (blob(0) & 0xff) == 0x89 && blob(1) == 'G' && blob(2) == 'R' &&
          blob(4) == 0x03
        if (!ok) PHashRow(id, -1L) // loud sentinel, mm02's discipline
        else {
          val p = blob.drop(9).map(_ & 0xff)
          var h = 0L
          var b = 0
          while (b < bits) {
            val r = b / (cols - 1)
            val c = b % (cols - 1)
            if (p(r * cols + c) < p(r * cols + c + 1)) h |= 1L << b
            b += 1
          }
          PHashRow(id, h)
        }
      })
      .toDF()
  }

  /** Pigeonhole band layout for a `hashBits`-wide hash at hamming
    * radius `radius`: radius+1 bands (a pair differing in ≤ radius bits
    * must agree on ≥ 1 band — 100% recall, no probabilistic miss), band
    * width DERIVED from the hash width (the last band absorbs the
    * remainder), never hard-coded. The SimHash occupancy discipline
    * (Dedup: buckets per band must stay ≥ 2^minBandBits or band buckets
    * go quadratic at corpus scale) is ASSERTED, not assumed — a config
    * whose derived width falls under the floor refuses to build instead
    * of silently planning an O(n²) band join. */
  private[graft] def bandLayout(
      hashBits: Int, radius: Int, minBandBits: Int): Seq[(Int, Int)] = {
    val bands = radius + 1
    val w = hashBits / bands
    require(w >= minBandBits,
      s"bandLayout: $hashBits-bit hash / $bands bands = $w-bit bands " +
        s"(< 2^$minBandBits buckets/band) — occupancy floor violated; " +
        "widen the hash (decode a larger payload grid) before banding")
    (0 until bands).map(b =>
      (b * w, if (b == bands - 1) hashBits - b * w else w))
  }

  /** The banded (doc_id, phash, band, bv) relation for a (doc_id,
    * phash) input under [[bandLayout]]'s derived layout — the per-row
    * reshape shared by the batch pair join below and the streaming
    * ledger leg (st36 appends exactly these rows as its ledger). */
  private[graft] def phashBands(ph: DataFrame, hashBits: Int,
      radius: Int, minBandBits: Int): DataFrame = {
    val bandStructs = bandLayout(hashBits, radius, minBandBits)
      .zipWithIndex.map { case ((shift, width), i) =>
        struct(lit(i).as("band"),
          expr(s"(phash >> $shift) & ${(1L << width) - 1}").as("bv"))
      }
    // Decode-failure sentinels (phash = -1, mm02's loud-sentinel
    // discipline) are EXCLUDED from banding: all malformed blobs share
    // the sentinel, so left in they would pair with each other at
    // hamming 0 and masquerade as exact duplicates downstream (mm11
    // would even cluster them). Legitimate hashes are < 2^hashBits and
    // never negative, so the filter cannot drop a real row.
    ph.filter(col("phash") =!= lit(-1L))
      .select(col("doc_id"), col("phash"),
        explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("phash"),
        col("bb.band").as("band"), col("bb.bv").as("bv"))
  }

  /** Exact banded near-dup pairs at hamming ≤ `radius` over a (doc_id,
    * phash) relation — dd06's discipline with the band layout derived
    * from the hash width by [[bandLayout]]. Both self-join sides are
    * the corpus → shuffle on the band key, never broadcast. */
  private[graft] def bandedPhashPairs(ph: DataFrame, hashBits: Int,
      radius: Int, minBandBits: Int): DataFrame = {
    val banded = phashBands(ph, hashBits, radius, minBandBits)
    banded.as("a").hint("shuffle_hash")
      .join(banded.as("b").hint("shuffle_hash"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.phash ^ b.phash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= radius)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- Blob ingestion metadata: narrow, codegen'd; the binary column
    //    never leaves the executor.
    "mm01_blob_meta" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("blob", col("text").cast("binary"))
        .select(
          col("doc_id"),
          length(col("blob")).as("n_bytes"),
          upper(hex(expr("substring(blob, 1, 4)"))).as("magic_hex"),
          md5(col("blob")).as("content_md5"))
    }),

    // -- Typed mapPartitions decode over REAL container bytes: each doc
    //    carries a GRF-v2 blob ([[grf2Blobs]]) and [[decodeGrf2]] parses
    //    magic / format tag / big-endian dims out of the bytes — the
    //    actual decode shape, not an md5 stand-in. Streamed over the
    //    iterator: constant memory, no collect, scales with partition
    //    count. The oracle recomputes the header fields in closed form.
    "mm02_decode_meta" -> ((s, d) =>
      decodePartial(Tables.documents(s, d))),

    // -- Frame sampling: every 25th frame index of a pretend video whose
    //    frame count is the byte length. Explode is the scalable form —
    //    rows stay narrow, no driver loops.
    "mm03_frame_sample" -> ((s, d) => {
      Tables.documents(s, d)
        // Empty docs: sequence(0, -1, 25) throws in Spark, while DuckDB's
        // range(0, 0, 25) yields zero rows — filter keeps both at zero.
        .filter(length(col("text")) > 0)
        .select(col("doc_id"),
          explode(expr("sequence(0, length(text) - 1, 25)")).as("frame_idx"))
        .select(col("doc_id"), col("frame_idx"),
          md5(concat(col("doc_id"), lit(":"), col("frame_idx"))).as("frame_key"))
    }),

    // -- Overlapping-window segmentation (the audio shape: 25 ms frames
    //    at a 10 ms hop, scaled to fixture-size "samples"): windows of
    //    40 bytes every 16, each hashed — the framing pass before any
    //    feature extractor. Same index-explode discipline as mm03 (never
    //    explode a constructed array).
    "mm05_audio_windows" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(length(col("text")) >= 40)
        .select(col("doc_id"), col("text"),
          explode(expr("sequence(0, length(text) - 40, 16)")).as("win_off"))
        .select(col("doc_id"), col("win_off"),
          md5(expr("substring(text, win_off + 1, 40)")).as("win_md5"))
    }),

    // -- Real NON-TEXT bytes through the binary column path: every other
    //    mm query casts ASCII text to binary, so high-bit bytes never
    //    flow through Spark's BinaryType. Here each doc gets a 25-byte
    //    container blob built in-engine — PNG-style magic \x89 G R F
    //    (0x89 forces a non-UTF8 first byte), 1-byte version, two
    //    big-endian uint16 header fields, then the raw 16-byte md5
    //    digest of the text as payload (arbitrary bytes incl. NUL) —
    //    and a ByteBuffer header parser (a REAL binary decoder, not the
    //    md5 fake of mm02) runs per partition and re-emits the fields.
    //    Round-trip through parquet BINARY + the typed Dataset boundary
    //    proves the blob plumbing carries arbitrary bytes unmangled.
    "mm06_binary_header" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"),
          unhex(concat(
            lit("89475246"), // \x89 'G' 'R' 'F'
            lit("01"),
            lpad(hex(pmod(col("doc_id") * 7919 + 13, lit(4096))), 4, "0"),
            lpad(hex(pmod(col("doc_id") * 104729 + 7, lit(4096))), 4, "0"),
            md5(col("text")))).as("blob"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, blob) =>
            val bb = java.nio.ByteBuffer.wrap(blob)
              .order(java.nio.ByteOrder.BIG_ENDIAN)
            val magicOk = blob.length == 25 &&
              (bb.get() & 0xff) == 0x89 && bb.get() == 'G' &&
              bb.get() == 'R' && bb.get() == 'F'
            val ver = if (magicOk) bb.get().toInt else -1
            val w   = if (magicOk) (bb.getShort.toInt & 0xffff).toLong else -1L
            val h   = if (magicOk) (bb.getShort.toInt & 0xffff).toLong else -1L
            val payload = new Array[Byte](16)
            if (magicOk) bb.get(payload)
            val hexStr = payload.map(b => f"${b & 0xff}%02x").mkString
            BinHeader(id, magicOk, ver, w, h, hexStr)
          }
        }
        .toDF()
    }),

    // -- Byte-range chunk index: pointer-style (offset, length, hash)
    //    rows for 100-byte chunks — the layout for large-blob processing
    //    without materializing wide rows.
    "mm04_chunk_index" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(length(col("text")) > 0) // see mm03: empty-doc sequence guard
        .select(col("doc_id"), col("text"),
          explode(expr("sequence(0, length(text) - 1, 100)")).as("chunk_off"))
        .select(col("doc_id"), col("chunk_off"),
          least(lit(100), length(col("text")) - col("chunk_off")).as("chunk_len"),
          md5(expr("substring(text, chunk_off + 1, 100)")).as("chunk_md5"))
        .drop("text")
    }),

    // -- RESIZE planning — the aspect-preserving downscale pass before
    //    any vision model (fit into a 64×64 box). The decode is mm02's
    //    REAL header parse ([[decodeGrf2]]); the resize arithmetic is
    //    ALL-INTEGER (truncating division agrees between the JVM and
    //    DuckDB on positive ints, short side clamped to ≥ 1 like every
    //    real fit-into-box resampler), so the plan is deterministic and
    //    oracle-checkable while only the pixel RESAMPLING itself stays
    //    out of scope (no media libs here). In production the emitted
    //    (new_w, new_h) drive the resampler inside the same
    //    mapPartitions; schema and partitioning hold.
    "mm08_resize" -> ((s, d) => {
      import s.implicits._
      grf2Blobs(s, d)
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, blob) =>
          val m = decodeGrf2(id, blob)
          val (nw, nh) =
            if (m.width >= m.height) (64, math.max(1, m.height * 64 / m.width))
            else (math.max(1, m.width * 64 / m.height), 64)
          ResizedMeta(id, m.width, m.height, nw, nh, nw.toLong * nh)
        })
        .toDF()
    }),

    // -- PERCEPTUAL-HASH NEAR-DUP for media blobs — dd05/dd06's banding
    //    discipline applied to the multimodal column: decode every
    //    GRF-v2 blob ([[phashOf]] — real byte parse + 27-bit gradient
    //    dHash over the payload), then find all pairs at hamming ≤ 2
    //    via [[bandLayout]]'s pigeonhole banding (3 × 9-bit bands —
    //    100% recall at hamming ≤ 2, no probabilistic miss). Both
    //    self-join sides are the corpus → shuffle on the band key,
    //    never broadcast (dd06's rule). 9-bit bands sit BELOW the
    //    corpus-scale occupancy floor — the 16-byte v2 digest payload
    //    only supplies 27 gradient bits — so this stays the SMALL-CASE
    //    tier (minBandBits relaxed, documented); the production-shaped
    //    path is mm10's wide-grid 60-bit hash with ≥ 2^15-bucket bands.
    //    The oracle recomputes hash + brute-force pairs in closed form
    //    from the payload's md5 derivation; MultimodalSpec pins banded
    //    ≡ brute-force on the fixture.
    "mm09_phash_neardup" -> ((s, d) =>
      bandedPhashPairs(phashOf(Tables.documents(s, d)),
        hashBits = 27, radius = 2, minBandBits = 9)),

    // -- The PRODUCTION-SHAPED perceptual near-dup tier: GRF-v3 blobs
    //    carry a real 6×11 raster payload ([[grf3BlobsOf]]), the decode
    //    reads it as a luminance grid, and the dHash widens WITH the
    //    payload to 60 bits ([[phashWideOf]]) — so [[bandLayout]]
    //    derives 3 × 20-bit bands (2^20 buckets/band, above the 2^15
    //    occupancy floor the SimHash design note mandates; the floor is
    //    ASSERTED at plan build, not assumed). Exact at hamming ≤ 2 by
    //    pigeonhole; oracle recomputes grid, hash and brute-force pairs
    //    in closed form; MultimodalSpec pins banded ≡ brute-force and
    //    the occupancy guard itself.
    "mm10_phash_wide_neardup" -> ((s, d) =>
      bandedPhashPairs(phashWideOf(Tables.documents(s, d)),
        hashBits = WideHashBits, radius = 2, minBandBits = 15)),

    // -- PERCEPTUAL SURVIVORSHIP — mm09's pairs feeding the SAME dedup
    //    machinery the text side uses (the round-8 verdict's missing
    //    wire): connected components over the phash pair graph
    //    (dd09's componentsOf, verbatim), then keep-best representative
    //    selection (dd16's keepBestOf, verbatim) ranked by decoded
    //    n_pixels — the highest-resolution member of each blob cluster
    //    survives, the image-dedup convention. Oracle: recursive-CTE
    //    reachability over the brute-force pair set + the same ranked
    //    window — a wholly different CC algorithm, same answer.
    "mm11_phash_survivorship" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pixels = decodePartial(docs)
        .select(col("doc_id"), col("n_pixels").as("m"))
      Dedup.keepBestOf(stagedPhashClusters(s, d), pixels)
        .select(col("canonical_id"), col("n_members"),
          col("total_m").as("total_pixels"), col("kept_doc_id"),
          col("kept_m").as("kept_pixels"))
    }),

    // -- PERCEPTUAL TAKEDOWN PROPAGATION — the blob-side expansion a
    //    real takedown needs (an image's takedown must reach its crops
    //    and re-encodes, not just the reported blob): a deterministic
    //    SEED set expands to EVERY member of every perceptual cluster
    //    (mm09's pairs → dd09's componentsOf) containing a seed, and
    //    the emitted manifest — (doc_id, seed|neardup) — is exactly
    //    what pl12/st37's purge nights consume as purgeIds. Seeds with
    //    no near-dups purge alone (they have no pair-graph row — the
    //    union covers them); cluster members' shuffles are id-only and
    //    the seed-canonical relation is a corpus fraction → both joins
    //    shuffle-hash, never broadcast.
    "mm12_takedown_propagation" -> ((s, d) => {
      val seedPred = pmod(col("doc_id"), lit(TakedownSeedMod.toLong)) ===
        TakedownSeedRem
      val seeds = Tables.documents(s, d).select(col("doc_id"))
        .filter(seedPred)
      val labels = stagedPhashClusters(s, d)
      val seedCanon = labels.hint("shuffle_hash")
        .join(seeds.hint("shuffle_hash"), Seq("doc_id"))
        .select(col("canonical_id")).distinct()
      val members = labels.hint("shuffle_hash")
        .join(seedCanon.hint("shuffle_hash"), Seq("canonical_id"))
        .select(col("doc_id"))
      members.unionByName(seeds).distinct()
        .select(col("doc_id"),
          when(seedPred, "seed").otherwise("neardup").as("reason"))
    }),

    // -- BATCHED feature extraction — the GPU-inference deployment
    //    shape (`mapInPandas` batch-UDF analog in typed Scala): one
    //    expensive model handle per PARTITION (here the digest stands
    //    in for a loaded encoder), inputs grouped into fixed-size
    //    micro-batches of 32 (a real model wants a full device batch
    //    per forward pass, not one row), outputs streamed — constant
    //    memory, no collect, scales with partition count. The fake
    //    "embedding" is an 8-dim int vector from the blob md5, so
    //    results are per-item deterministic: batch boundaries and
    //    partitioning provably cannot change the output (spec), which
    //    is the invariance a real inference pipeline must also hold.
    //    Swap the body of the inner map for `model.encodeBatch(batch)`
    //    in production; schema, batching and partitioning stay as-is.
    "mm07_batch_infer" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("blob"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          it.grouped(32).flatMap { batch =>
            batch.iterator.map { case (id, blob) =>
              md.reset()
              val h = md.digest(blob)
              val emb = (0 until 8).map(i => ((h(i) & 0xff) - 128).toLong)
              BatchEmbed(id, 8, emb.sum, emb.map(x => x * x).sum)
            }
          }
        }
        .toDF()
    })
  )

  def oracleSql: Map[String, String] = Map(
    // Text is ASCII, so string ops on `text` see the same bytes the
    // Spark side hashes through the binary cast.
    "mm01_blob_meta" ->
      """SELECT doc_id,
         CAST(octet_length(encode(text)) AS INT) AS n_bytes,
         upper(hex(substr(text, 1, 4))) AS magic_hex,
         md5(text) AS content_md5
         FROM documents""",
    // The header fields the Spark side PARSES out of the GRF-v2 bytes,
    // recomputed in closed form (mm06's oracle discipline).
    "mm02_decode_meta" ->
      """SELECT doc_id,
         CAST(16 + (doc_id*7919+13) % 4080 AS INT) AS width,
         CAST(16 + (doc_id*104729+7) % 4080 AS INT) AS height,
         CASE doc_id % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
           ELSE 'webp' END AS format,
         CAST((16 + (doc_id*7919+13) % 4080)
            * (16 + (doc_id*104729+7) % 4080) AS BIGINT) AS n_pixels
         FROM documents""",
    "mm03_frame_sample" ->
      """SELECT doc_id, frame_idx, md5(concat(doc_id, ':', frame_idx)) AS frame_key FROM (
           SELECT doc_id, CAST(unnest(range(0, CAST(length(text) AS BIGINT), 25)) AS INT) AS frame_idx
           FROM documents)""",
    "mm05_audio_windows" ->
      """SELECT doc_id, win_off,
         md5(substr(text, win_off + 1, 40)) AS win_md5
         FROM (SELECT doc_id, text,
                 CAST(unnest(range(0, CAST(length(text) AS BIGINT) - 39, 16)) AS INT) AS win_off
               FROM documents WHERE length(text) >= 40)""",
    // Constructs the same 25-byte blob (from_hex → real BLOB) and parses
    // it back via its hex image (DuckDB substr doesn't take BLOB).
    "mm06_binary_header" ->
      """WITH blobs AS (
           SELECT doc_id, from_hex(concat('89475246', '01',
             lpad(hex((doc_id*7919+13)%4096), 4, '0'),
             lpad(hex((doc_id*104729+7)%4096), 4, '0'),
             md5(text))) AS blob
           FROM documents),
         hx AS (SELECT doc_id, hex(blob) AS h FROM blobs)
         SELECT doc_id,
           substr(h, 1, 8) = '89475246' AS magic_ok,
           CAST(concat('0x', substr(h, 9, 2)) AS INT) AS version,
           CAST(concat('0x', substr(h, 11, 4)) AS BIGINT) AS width,
           CAST(concat('0x', substr(h, 15, 4)) AS BIGINT) AS height,
           lower(substr(h, 19, 32)) AS payload_md5
         FROM hx""",
    "mm04_chunk_index" ->
      """SELECT doc_id, chunk_off,
         CAST(least(100, length(text) - chunk_off) AS INT) AS chunk_len,
         md5(substr(text, chunk_off + 1, 100)) AS chunk_md5
         FROM (SELECT doc_id, text,
                 CAST(unnest(range(0, CAST(length(text) AS BIGINT), 100)) AS INT) AS chunk_off
               FROM documents)""",
    // mm02's header closed form + the same truncating integer scale
    // math (short side clamped to ≥ 1, as in the Spark-side parser).
    "mm08_resize" ->
      """WITH m AS (
           SELECT doc_id,
             16 + (doc_id*7919+13) % 4080 AS width,
             16 + (doc_id*104729+7) % 4080 AS height
           FROM documents),
         r AS (
           SELECT doc_id, width, height,
             CASE WHEN width >= height THEN 64
                  ELSE greatest(1, width * 64 // height) END AS new_w,
             CASE WHEN width >= height THEN greatest(1, height * 64 // width)
                  ELSE 64 END AS new_h
           FROM m)
         SELECT doc_id, CAST(width AS INT) AS width, CAST(height AS INT) AS height,
           CAST(new_w AS INT) AS new_w, CAST(new_h AS INT) AS new_h,
           CAST(new_w * new_h AS BIGINT) AS n_pixels_out
         FROM r""",
    // mm09: payload byte i of the GRF-v2 container is digest byte i of
    // md5(text) (hex chars [2i+1, 2i+2]); the 27-bit gradient hash and
    // the BRUTE-FORCE all-pairs hamming join recompute the banded
    // result in closed form — banding is exact for hamming ≤ 2, so the
    // two pair sets must be identical.
    "mm09_phash_neardup" ->
      """WITH pb AS (
           SELECT doc_id, list_transform(range(16),
             i -> CAST(concat('0x', substr(md5(text), CAST(i AS INT)*2+1, 2))
                    AS BIGINT)) AS p
           FROM documents),
         ph AS (
           SELECT doc_id,
             CAST(list_sum(list_transform(range(15),
               i -> CASE WHEN p[CAST(i AS INT)+1] < p[CAST(i AS INT)+2]
                    THEN (1::BIGINT << CAST(i AS INT)) ELSE 0 END)) AS BIGINT)
             + CAST(list_sum(list_transform(range(12),
               i -> CASE WHEN p[CAST(i AS INT)+1] < p[CAST(i AS INT)+5]
                    THEN (1::BIGINT << (15 + CAST(i AS INT))) ELSE 0 END))
               AS BIGINT) AS phash
           FROM pb)
         SELECT doc_a, doc_b, hamming FROM (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
           FROM ph a JOIN ph b ON a.doc_id < b.doc_id)
         WHERE hamming <= 2""",
    // mm10: the v3 payload grid is the document's leading 66 bytes
    // (space-padded — text is ASCII, so ord() sees the same bytes the
    // Spark parser reads); the 60-bit gradient hash (10 horizontal
    // gradients per 11-wide row) and the BRUTE-FORCE all-pairs hamming
    // join recompute the banded result in closed form — banding is
    // exact for hamming ≤ 2, so the two pair sets must be identical.
    "mm10_phash_wide_neardup" ->
      """WITH pb AS (
           SELECT doc_id, list_transform(range(66),
             i -> ord(substr(rpad(text, 66, ' '), CAST(i AS INT)+1, 1))) AS p
           FROM documents),
         ph AS (
           SELECT doc_id,
             CAST(list_sum(list_transform(range(60),
               b -> CASE WHEN p[(b//10)*11 + (b%10) + 1]
                          < p[(b//10)*11 + (b%10) + 2]
                    THEN (1::BIGINT << CAST(b AS INT)) ELSE 0 END)) AS BIGINT)
               AS phash
           FROM pb)
         SELECT doc_a, doc_b, hamming FROM (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
           FROM ph a JOIN ph b ON a.doc_id < b.doc_id)
         WHERE hamming <= 2""",
    // mm11/mm12: exact recursive-CTE reachability over mm09's
    // brute-force pair set (dd09's oracle discipline); mm11 then ranks
    // keep-best by the closed-form decoded pixel count (mm02's header
    // arithmetic), mm12 restricts to seed-containing components.
    "mm11_phash_survivorship" ->
      s"""WITH RECURSIVE mmpairs AS ($mm9BrutePairsSql),
          mmedges AS (SELECT doc_a AS src, doc_b AS dst FROM mmpairs
                      UNION ALL
                      SELECT doc_b, doc_a FROM mmpairs),
          mmverts AS (SELECT DISTINCT src AS id FROM mmedges),
          mmreach(id, r) AS (
            SELECT id, id FROM mmverts
            UNION
            SELECT mmedges.src, mmreach.r
            FROM mmedges JOIN mmreach ON mmreach.id = mmedges.dst),
          mmlbl AS (SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS canonical_id
                    FROM mmreach GROUP BY id),
          mmpx AS (SELECT doc_id,
              CAST((16 + (doc_id*7919+13) % 4080)
                 * (16 + (doc_id*104729+7) % 4080) AS BIGINT) AS n_pixels
            FROM documents),
          mmrk AS (
            SELECT l.canonical_id, l.doc_id, x.n_pixels,
              row_number() OVER (PARTITION BY l.canonical_id
                ORDER BY x.n_pixels DESC, l.doc_id ASC) AS rn
            FROM mmlbl l JOIN mmpx x ON l.doc_id = x.doc_id)
          SELECT canonical_id, count(*) AS n_members,
            CAST(sum(n_pixels) AS BIGINT) AS total_pixels,
            min(CASE WHEN rn = 1 THEN doc_id END) AS kept_doc_id,
            min(CASE WHEN rn = 1 THEN n_pixels END) AS kept_pixels
          FROM mmrk GROUP BY canonical_id""",

    // mm12: the same recursive reachability, restricted to components
    // containing a SEED — the takedown manifest's oracle. The manifest
    // unions the seeds themselves (a seed with no near-dups purges
    // alone; it has no mmlbl row — the pair graph only knows paired
    // docs). The final DISTINCT is LOAD-BEARING: inside WITH RECURSIVE,
    // DuckDB evaluates a non-self-referencing CTE's UNION as UNION ALL
    // (verified: `WITH RECURSIVE r(..) .., a AS (SELECT 1 UNION
    // SELECT 1) SELECT count(*) FROM a` returns 2), so mmman's union
    // does NOT dedup the seed∩member overlap.
    "mm12_takedown_propagation" ->
      s"""WITH RECURSIVE mmpairs AS ($mm9BrutePairsSql),
          mmedges AS (SELECT doc_a AS src, doc_b AS dst FROM mmpairs
                      UNION ALL
                      SELECT doc_b, doc_a FROM mmpairs),
          mmverts AS (SELECT DISTINCT src AS id FROM mmedges),
          mmreach(id, r) AS (
            SELECT id, id FROM mmverts
            UNION
            SELECT mmedges.src, mmreach.r
            FROM mmedges JOIN mmreach ON mmreach.id = mmedges.dst),
          mmlbl AS (SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS canonical_id
                    FROM mmreach GROUP BY id),
          mmseeds AS (SELECT doc_id FROM documents
                      WHERE doc_id % $TakedownSeedMod = $TakedownSeedRem),
          mmsc AS (SELECT DISTINCT l.canonical_id
                   FROM mmlbl l JOIN mmseeds s ON l.doc_id = s.doc_id),
          mmman AS (
            SELECT l.doc_id FROM mmlbl l
            JOIN mmsc c ON l.canonical_id = c.canonical_id
            UNION
            SELECT doc_id FROM mmseeds)
          SELECT DISTINCT doc_id,
            CASE WHEN doc_id % $TakedownSeedMod = $TakedownSeedRem
                 THEN 'seed' ELSE 'neardup' END AS reason
          FROM mmman""",
    // Recomputes the md5-derived fake embedding per byte: byte i of the
    // digest is hex chars [2i+1, 2i+2], offset to [-128, 127].
    "mm07_batch_infer" ->
      """SELECT doc_id, CAST(8 AS INT) AS dim,
           CAST(list_sum(list_transform(range(8), i ->
             CAST(concat('0x', substr(md5(text), CAST(i AS INT)*2+1, 2)) AS BIGINT) - 128))
             AS BIGINT) AS emb_sum,
           CAST(list_sum(list_transform(range(8), i ->
             (CAST(concat('0x', substr(md5(text), CAST(i AS INT)*2+1, 2)) AS BIGINT) - 128)
             * (CAST(concat('0x', substr(md5(text), CAST(i AS INT)*2+1, 2)) AS BIGINT) - 128)))
             AS BIGINT) AS emb_nrm2
         FROM documents"""
  )
}
