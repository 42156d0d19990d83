package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** ta26's driver-recompute gate: an independent reference
  * implementation of batched BPE (the word-frequency formulation —
  * Sennrich et al. 2016 — with per-round non-interfering merge batches)
  * recomputes the trained dictionary on the fixture corpus and must
  * agree symbol-for-symbol with the distributed training loop. The
  * oracle SQL re-runs the same algorithm in DuckDB; this spec is the
  * third, engine-free vote. The reference applies each round's batch
  * ONE MERGE AT A TIME in rank order, while the distributed loop
  * applies the whole batch in one simultaneous fold — agreement is
  * itself evidence of the batched≡sequential equivalence the
  * non-interference rule guarantees (pinned adversarially below). */
class BpeSpec extends SparkSpec {

  /** Greedy left-to-right merge of (a, b) in a symbol list — the spec's
    * recursive twin of the distributed fold. */
  private def applyMerge(syms: List[String], a: String, b: String): List[String] =
    syms match {
      case x :: y :: rest if x == a && y == b => (a + b) :: applyMerge(rest, a, b)
      case x :: rest => x :: applyMerge(rest, a, b)
      case Nil => Nil
    }

  /** One round's batch under the conflict rule: local maxima of the
    * conflict graph (shared symbol, or created-string collision with a
    * symbol of the other pair), ranked (cnt desc, a, b), capped. */
  private def refSelect(counts: Map[(String, String), Long],
      cap: Int = Bpe.BatchCap): List[(String, String)] = {
    def syms(p: (String, String)) = Set(p._1, p._2)
    def created(p: (String, String)) = p._1 + p._2
    def key(p: (String, String)) = (-counts(p), p._1, p._2)
    val ord = implicitly[Ordering[(Long, String, String)]]
    def conflicts(p: (String, String), q: (String, String)) =
      p != q && (syms(p).intersect(syms(q)).nonEmpty ||
        syms(q).contains(created(p)) || syms(p).contains(created(q)))
    counts.keys.toList
      .filter(p => !counts.keys.exists(q => conflicts(p, q) && ord.lt(key(q), key(p))))
      .sortBy(key)
      .take(cap)
  }

  /** Batched reference training, target-driven like the distributed
    * loop: stop at `target` merges (the last batch truncated to the
    * remaining budget), at saturation (empty batch), or at the
    * `maxRounds` guard. Returns (merges in global rank order, final
    * word → symbols dictionary). */
  /** The byte-level base alphabet: UTF-8 bytes as uppercase hex pairs
    * (the distributed loop's symbol universe). */
  private def byteSyms(w: String): List[String] =
    w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => f"${b & 0xff}%02X").toList

  private def refTrain(freqs: Map[String, Long], maxRounds: Int,
      target: Int = Bpe.MergeTarget)
      : (List[(String, String)], Map[String, List[String]]) = {
    var dict = freqs.map { case (w, _) => w -> byteSyms(w) }
    var merges = List.empty[(String, String)]
    var round = 0
    var saturated = false
    while (merges.size < target && round < maxRounds && !saturated) {
      round += 1
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- dict; pair <- syms.zip(syms.tail))
        counts(pair) = counts.getOrElse(pair, 0L) + freqs(w)
      val batch = refSelect(counts.toMap,
        math.min(Bpe.BatchCap, target - merges.size))
      if (batch.isEmpty) saturated = true
      merges :++= batch
      // Sequential application in rank order — the equivalence target
      // for the distributed loop's simultaneous fold.
      for ((a, b) <- batch)
        dict = dict.map { case (w, syms) => w -> applyMerge(syms, a, b) }
    }
    (merges, dict)
  }

  private def fixtureFreqs: Map[String, Long] = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, sfDir)
      .select(explode(expr("filter(split(text, ' '), x -> x <> '')")).as("w"))
      .groupBy("w").count()
      .as[(String, Long)].collect().toMap
  }

  test("distributed BPE training matches the sequential reference on the fixture") {
    val freqs = fixtureFreqs
    val (_, refDict) = refTrain(freqs, Bpe.Rounds)
    val got = Bpe.bpeDict(spark, sfDir)
      .select(col("word"), col("s")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.keySet == refDict.keySet,
      s"vocab mismatch: ${(got.keySet diff refDict.keySet).take(5)} / " +
        s"${(refDict.keySet diff got.keySet).take(5)}")
    val bad = refDict.collect {
      case (w, syms) if got(w) != syms.mkString("|", "|", "") =>
        (w, syms.mkString("|", "|", ""), got(w))
    }
    assert(bad.isEmpty, s"encoding mismatch (first 5): ${bad.take(5)}")
  }

  test("ta29 merge table equals the sequential reference's merges in rank order") {
    val (refMerges, _) = refTrain(fixtureFreqs, Bpe.Rounds)
    val got = graft.SparkEntry.queries("ta29_bpe_merges")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).map(t => (t._2, t._3)).toList
    assert(got == refMerges, s"got $got\nexpected $refMerges")
  }

  test("training actually merges: dictionary contains multi-byte symbols") {
    val dict = Bpe.bpeDict(spark, sfDir)
    // A base symbol is one hex pair (length 2); any merge yields >= 4.
    val merged = dict
      .filter(expr("exists(slice(split(s, '[|]'), 2, size(split(s, '[|]')) - 1), x -> length(x) >= 4)"))
      .count()
    assert(merged > 0, "no word gained a merged symbol after training")
  }

  test("encoding checksum is consistent with per-word dictionary states") {
    // Spot-check one doc: recompute its subword count from the
    // sequential dictionary.
    val freqs = fixtureFreqs
    val (_, refDict) = refTrain(freqs, Bpe.Rounds)
    import spark.implicits._
    val doc0 = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") === 0).select(col("text")).as[String].head()
    val words = doc0.split(" ").filter(w => w.nonEmpty && !w.contains("|"))
    val expectSubwords = words.map(w => refDict(w).size.toLong).sum
    val got = Bpe.docSubwords(spark, sfDir)
      .filter(col("doc_id") === 0).select(col("n_subwords")).head().getLong(0)
    assert(got == expectSubwords, s"doc 0: got $got, expected $expectSubwords")
  }

  test("ta30 vocab equals the sequential reference's weighted symbol counts") {
    val freqs = fixtureFreqs
    val (_, refDict) = refTrain(freqs, Bpe.Rounds)
    val refVocab = refDict.toSeq
      .flatMap { case (w, syms) => syms.map(_ -> freqs(w)) }
      .groupMapReduce(_._1)(_._2)(_ + _)
    val got = graft.SparkEntry.queries("ta30_bpe_vocab")(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val gotMap = got.map(t => t._2 -> t._3).toMap
    // Symbols with corpus mass = exactly the reference's weighted
    // counts; the COMPLETE 256-byte base ships alongside (zero-freq
    // bytes included — every possible input byte has a token id).
    assert(gotMap.filter(_._2 > 0) == refVocab, "symbol frequencies differ")
    val allBytes = (0 until 256).map(i => f"$i%02X").toSet
    assert(gotMap.keySet == allBytes ++ refVocab.keySet,
      "vocab is not byte-base ∪ corpus symbols")
    // Ids are 1..N in (freq desc, symbol asc) order — the embedding-
    // matrix contract.
    val sorted = got.sortBy(_._1)
    assert(sorted.map(_._1).toList == (1 to got.length).toList)
    assert(sorted.sliding(2).forall {
      case Array((_, s1, f1), (_, s2, f2)) => f1 > f2 || (f1 == f2 && s1 < s2)
      case _ => true
    }, "token ids not in (freq desc, symbol asc) order")
    // Total vocab mass equals the encoded corpus's subword count (ta26).
    val totalSubwords = Bpe.docSubwords(spark, sfDir)
      .agg(sum(col("n_subwords"))).head().getLong(0)
    assert(got.map(_._3).sum == totalSubwords)
  }

  test("ta33 round-trip audit passes on the healthy dict and flags a corrupted one") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val dict = Bpe.bpeDict(spark, sfDir).select(col("word"), col("s"))
    // Healthy artifact: every doc decodes losslessly.
    val ok = Bpe.roundtripAudit(docs, dict)
    assert(ok.filter(col("n_mismatch") =!= 0 || !col("roundtrip_ok")).count() == 0,
      "healthy dict failed the round-trip audit")
    // Corrupt ONE dictionary entry (drop its first byte symbol "|XY" —
    // the decoded word loses a byte): every doc containing that word
    // must flag, and no other doc may.
    import spark.implicits._
    val victim = dict.orderBy(col("word")).select(col("word")).as[String].head()
    val corrupted = dict.withColumn("s",
      when(col("word") === victim, expr("substring(s, 4)")).otherwise(col("s")))
    val flagged = Bpe.roundtripAudit(docs, corrupted)
      .filter(col("n_mismatch") > 0 && !col("roundtrip_ok"))
      .select(col("doc_id")).as[Long].collect().toSet
    val expected = docs
      .select(col("doc_id"),
        array_contains(expr("filter(split(text, ' '), x -> x <> '')"), victim)
          .as("has"))
      .filter(col("has")).select(col("doc_id")).as[Long].collect().toSet
    assert(expected.nonEmpty, s"fixture has no doc containing '$victim'")
    assert(flagged == expected,
      s"corruption detection mismatch: extra=${(flagged diff expected).take(5)} " +
        s"missed=${(expected diff flagged).take(5)}")
  }

  test("ta34 fertility is >= 1 per language and conserves corpus totals") {
    val rows = graft.SparkEntry.queries("ta34_tokenizer_fertility")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // A word is at least one subword, so fertility >= 1.0 (1e6 ppm)
    // wherever the language has any words at all.
    assert(rows.filter(_._3 > 0).forall(_._5 >= 1000000L),
      s"fertility < 1 somewhere: ${rows.filter(t => t._3 > 0 && t._5 < 1000000L)}")
    // Language groups partition the corpus: doc/word/subword totals
    // must equal ta26's.
    val stats = Bpe.docSubwords(spark, sfDir)
      .agg(count(col("doc_id")), sum(col("n_words")), sum(col("n_subwords")))
      .head()
    assert(rows.map(_._2).sum == stats.getLong(0))
    assert(rows.map(_._3).sum == stats.getLong(1))
    assert(rows.map(_._4).sum == stats.getLong(2))
  }

  test("training stops exactly at the merge target (vocab-target contract)") {
    // The fixture's natural depth exceeds the target (73 merges at the
    // Rounds guard vs target 64), so the stop must BIND: exactly
    // MergeTarget merges ship, the final round truncated by the
    // remaining budget, and the reference's target-driven run agrees
    // merge-for-merge (already pinned order-wise by the ta29 test).
    assert(Bpe.bpeMerges(spark, sfDir).count() == Bpe.MergeTarget,
      "merge table size != MergeTarget — the vocab-target stop did not bind")
    val (refMerges, _) = refTrain(fixtureFreqs, Bpe.Rounds)
    assert(refMerges.size == Bpe.MergeTarget)
    // Mid-round truncation at the primitive level: a 3-candidate
    // independent set under a 2-merge budget takes the top 2 by
    // (cnt desc, a, b) and nothing else.
    import spark.implicits._
    val disjoint = Seq(("a", "b", 10L), ("c", "d", 9L), ("e", "f", 8L))
      .toDF("a", "b", "cnt")
    assert(Bpe.batchSelect(disjoint, cap = 2) == Seq(("a", "b"), ("c", "d")))
    // And a target-driven reference run on a corpus that saturates
    // UNDER the target stops at saturation, not the guard: "abab"
    // (bytes 61 62 61 62) yields merges (61,62) then (6162,6162),
    // then nothing.
    val (m2, d2) = refTrain(Map("abab" -> 2L), maxRounds = 10, target = 64)
    assert(m2 == List(("61", "62"), ("6162", "6162")))
    assert(d2("abab") == List("61626162"))
  }

  test("exhausted training is stable (degenerate corpus, empty batches)") {
    // All single-byte words: no round finds any pair, every batch is
    // empty, and the dictionary must come through unchanged.
    val counts = Map("a" -> 3L, "b" -> 2L, "c" -> 1L)
    val (merges, dict) = refTrain(counts, 3)
    assert(merges.isEmpty)
    assert(dict == Map("a" -> List("61"), "b" -> List("62"), "c" -> List("63")))
  }

  test("batch selection excludes interfering pairs (chains + created-symbol collisions)") {
    import spark.implicits._
    // Adversarial pair counts: a chain a-b-c-d (shared symbols), a
    // disjoint pair (x,y), and (ab,z) whose SOURCE symbol 'ab' collides
    // with (a,b)'s CREATED string — applying (ab,z) before or after
    // (a,b) gives different results, so it must be excluded even though
    // it shares no symbol with anything.
    val pairs = Seq(
      ("a", "b", 10L), ("b", "c", 9L), ("c", "d", 8L),
      ("x", "y", 8L), ("ab", "z", 7L)).toDF("a", "b", "cnt")
    assert(Bpe.batchSelect(pairs) == Seq(("a", "b"), ("x", "y")))
    // (c,d) is excluded only because its neighbor (b,c) outranks it —
    // local maxima, not maximal independent set: remove (b,c) and (c,d)
    // re-enters.
    val without = Seq(("a", "b", 10L), ("c", "d", 8L), ("x", "y", 8L))
      .toDF("a", "b", "cnt")
    assert(Bpe.batchSelect(without) == Seq(("a", "b"), ("c", "d"), ("x", "y")))
  }

  test("ta38 token-id resolution is total: count parity with ta26") {
    // ta38 resolves every emitted symbol through an INNER vocab join —
    // a missing id would silently drop a token. Parity of per-doc
    // token counts with ta26's subword counts proves nothing dropped
    // (the byte base makes the lookup total by construction).
    val ids = graft.SparkEntry.queries("ta38_token_ids")(spark, sfDir)
      .select(col("doc_id"), col("n_tokens"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val subs = Bpe.docSubwords(spark, sfDir)
      .select(col("doc_id"), col("n_subwords"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ids == subs, "a token dropped at id resolution")
  }

  test("byte-level base: any script encodes with zero UNKs and round-trips losslessly") {
    import spark.implicits._
    // Scripts the old char-level base had no trained symbols for — CJK,
    // Arabic, Cyrillic, emoji (4-byte UTF-8), accented Latin — plus a
    // delimiter-bearing token (the retired exclusion class) and ASCII.
    val docs = Seq(
      (1L, "zh", "你好 世界"),
      (2L, "ar", "مرحبا بالعالم"),
      (3L, "ru", "привет мир"),
      (4L, "emoji", "🚀 rocket 🚀"),
      (5L, "mix", "café a|b naïve"),
      (6L, "en", "plain ascii text")
    ).toDF("doc_id", "lang", "text")
    val emptyDict = Seq.empty[(String, String)].toDF("word", "s")
    // Encode with NO trained merges: every word falls back to its byte
    // decomposition — n_subwords = exact UTF-8 byte count, nothing
    // opaque, no UNK class at all.
    val stats = Bpe.subwordsPartial(docs, emptyDict)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expected = Seq(
      (1L, "你好 世界"), (2L, "مرحبا بالعالم"), (3L, "привет мир"),
      (4L, "🚀 rocket 🚀"), (5L, "café a|b naïve"), (6L, "plain ascii text")
    ).map { case (id, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      id -> (ws.length.toLong, ws.map(byteSyms(_).size.toLong).sum)
    }.toMap
    assert(stats == expected,
      s"byte-fallback subword counts diverge: $stats vs $expected")
    // Round-trip through the byte fallback alone is lossless on every
    // script, and stays lossless when the words are OOV against the
    // TRAINED fixture dict (the fallback path a multilingual crawl
    // actually hits).
    for (dict <- Seq(emptyDict,
        Bpe.bpeDict(spark, sfDir).select(col("word"), col("s")))) {
      val bad = Bpe.roundtripAudit(docs, dict)
        .filter(col("n_mismatch") =!= 0 || !col("roundtrip_ok")).count()
      assert(bad == 0, "non-Latin text failed the byte-level round-trip")
    }
  }

  test("ta39 training tensor: conservation, window bounds, padding only at shard tails") {
    val W = Bpe.TensorW
    val win = SparkEntry.queries("ta39_training_tensor")(spark, sfDir)
      .select("shard", "win", "n_real", "n_sep", "n_pad").persist()
    try {
      // Every window holds exactly W slots: real + separator + pad.
      assert(win.filter(col("n_real") + col("n_sep") + col("n_pad")
        =!= W.toLong).isEmpty, s"a window does not hold exactly $W slots")
      // Conservation: every non-separator id appears exactly per its
      // ta35 copy count — Σ n_real ≡ Σ over copies of the doc's ta38
      // token count — and one separator lands per copy.
      val copies = SparkEntry.queries("ta35_epoch_upsample")(spark, sfDir)
        .select("doc_id")
      val perDoc = SparkEntry.queries("ta38_token_ids")(spark, sfDir)
        .select("doc_id", "n_tokens")
      val expected = copies.join(perDoc, "doc_id")
        .agg(sum(col("n_tokens")), count(lit(1)))
        .collect()(0)
      val got = win.agg(sum(col("n_real")), sum(col("n_sep"))).collect()(0)
      assert(got.getLong(0) == expected.getLong(0),
        s"token conservation broken: tensor holds ${got.getLong(0)} real " +
          s"ids, the upsampled corpus encodes ${expected.getLong(0)}")
      assert(got.getLong(1) == expected.getLong(1),
        "separator count != copy count")
      // The cut BINDS at fixture scale (docs straddle windows) and
      // padding appears ONLY in each shard's final window.
      assert(win.count() > 8, "fixture degenerated to one window per shard")
      val lastWin = win.groupBy(col("shard"))
        .agg(max(col("win")).as("last_win"))
      assert(win.join(lastWin, "shard")
        .filter(col("n_pad") > 0 && col("win") =!= col("last_win")).isEmpty,
        "padding appeared before a shard's final window")
    } finally { win.unpersist(blocking = false); () }
  }

  // ---- ta39 flake-proofing: an INDEPENDENT local packer (plain Scala
  // md5/sort/chunk — no Spark expressions, no DuckDB) recomputes the
  // expected tensor, and the compare repeats within one session so a
  // rare nondeterminism in the distributed packing would surface here
  // rather than as a once-a-round oracle-hash flake.

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
  private def h8(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(8), 16)

  /** Local re-derivation of ta39's expected rows: per-doc id sequences
    * from the resolved token stream, copies from ta35's arithmetic,
    * shard/order keys and the per-shard prefix-sum packing recomputed
    * in plain Scala. */
  private def ta39Expected(dir: String)
      : Seq[(Long, Long, Long, Long, Long, String, String)] = {
    val W = Bpe.TensorW
    val idsPerDoc: Map[Long, Seq[Long]] =
      Bpe.tokenIdStream(spark, dir).select("doc_id", "pos", "k", "token_id")
        .collect().toSeq.groupBy(_.getLong(0))
        .map { case (d, rows) =>
          d -> rows.sortBy(r => (r.getInt(1), r.getInt(2)))
            .map(_.getInt(3).toLong)
        }
    val copies = graft.operators.TextAnalysis
      .epochCopies(graft.sources.Tables.documents(spark, dir))
      .select("doc_id", "copy_idx").collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1)))
    copies
      .map { case (doc, ci) => (h8(s"sh$doc:$ci") % 8, h8(s"$doc:$ci"), doc, ci) }
      .groupBy(_._1).toSeq
      .flatMap { case (shard, cps) =>
        val stream = cps.sortBy { case (_, ord, doc, ci) => (ord, doc, ci) }
          .flatMap { case (_, _, doc, _) =>
            idsPerDoc.getOrElse(doc, Seq.empty) :+ 0L }
        stream.grouped(W).zipWithIndex.map { case (chunk, win) =>
          val nPad = W - chunk.size
          val ids = (chunk.map(_.toString) ++ Seq.fill(nPad)("-1")).mkString(" ")
          val mask = (chunk.map(t => if (t == 0L) "0" else "1") ++
            Seq.fill(nPad)("0")).mkString(" ")
          (shard, win.toLong, chunk.count(_ != 0L).toLong,
            chunk.count(_ == 0L).toLong, nPad.toLong, md5hex(ids), md5hex(mask))
        }
      }.sortBy(t => (t._1, t._2))
  }

  private def ta39Got(dir: String)
      : Seq[(Long, Long, Long, Long, Long, String, String)] =
    SparkEntry.queries("ta39_training_tensor")(spark, dir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getString(6)))
      .sortBy(t => (t._1, t._2))

  test("ta39 stress: bit-exact vs the independent packer, repeated in one session") {
    val exp = ta39Expected(sfDir)
    assert(exp.nonEmpty)
    (1 to 3).foreach { i =>
      val got = ta39Got(sfDir)
      assert(got == exp,
        s"run $i diverged from the independent local packer " +
          s"(${got.size} vs ${exp.size} windows)")
    }
  }

  test("ta39/ta38 zero-token docs: separators land, slots never shift") {
    // Synthetic corpus with the edge the driver fixtures lack: an
    // empty-text doc and a whitespace-only doc that STILL draw epoch
    // copies (sources chosen so md5-derived centi = 250), plus a
    // zero-copy doc that must vanish from the stream entirely.
    val dir = java.nio.file.Files.createTempDirectory("graft_ta39_zero")
      .toFile.getPath
    val docs = Seq(
      (900L, "", "wiki"),            // zero tokens, 2 copies
      (901L, "   ", "wiki"),         // whitespace-only → zero tokens, 3 copies
      (902L, "the cat sat on the mat", "news"),
      (903L, "never copied doc", "arxiv"), // n_copies = 0 → absent
      (904L, "to be or not to be", "web"),
      (905L, "the quick brown fox jumps over the lazy dog", "forum"))
    import spark.implicits._
    docs.toDF("doc_id", "text", "source")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        col("source"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // Copy-count preconditions (the fixture really exercises the edge).
    val cp = graft.operators.TextAnalysis
      .epochCopies(graft.sources.Tables.documents(spark, dir))
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cp.getOrElse(900L, 0L) == 2L, s"doc 900 copies: $cp")
    assert(cp.getOrElse(901L, 0L) == 3L, s"doc 901 copies: $cp")
    assert(!cp.contains(903L), "zero-copy doc leaked into the stream")
    // The tensor matches the independent packer WITH the zero-token
    // copies present — each contributes exactly its separator slot.
    val got = ta39Got(dir)
    val exp = ta39Expected(dir)
    assert(got == exp, "tensor diverged on the zero-token corpus")
    assert(got.map(_._4).sum == cp.values.sum,
      "separator count != total copy count (zero-token copies dropped?)")
    // ta38's completion join: zero-token docs report zeros, not absence.
    val t38 = SparkEntry.queries("ta38_token_ids")(spark, dir)
      .filter(col("doc_id").isin(900L, 901L))
      .select("doc_id", "n_tokens", "ids_md5").collect()
    assert(t38.length == 2)
    t38.foreach { r =>
      assert(r.getLong(1) == 0L, s"doc ${r.getLong(0)} has phantom tokens")
      assert(r.getString(2) == md5hex(""), "empty-doc md5 is not md5('')")
    }
  }

  test("ta40: the injected zero-token doc emits exactly its copies' separators") {
    // 3 copies (source 'wiki' → centi 250; md5 bucket 39 < 50) landing
    // in shards 2, 1, 3 — each must add exactly one separator slot and
    // shift that shard's later slots; totals pin the arithmetic.
    val s39 = ta39Got(sfDir).map(_._4).sum
    val s40 = SparkEntry.queries("ta40_tensor_empty_doc")(spark, sfDir)
      .agg(sum(col("n_sep"))).collect()(0).getLong(0)
    assert(s40 == s39 + 3,
      s"injected zero-token copies' separators: $s39 -> $s40 (want +3)")
  }

  test("tokenizer takedown: retrain over survivors leaves no purged-word residue") {
    import spark.implicits._
    // The estate-taxonomy decision (Incremental.scala, tokenizer-
    // artifact note): a BPE dict is keyed by RAW corpus words and its
    // vocab can merge them into shipped symbols — the PII retention
    // vector — and merge ranks are global frequency argmaxes, so the
    // only sound takedown is a REBUILD over the surviving corpus. This
    // pins the residue claim end-to-end.
    def writeDocs(rows: Seq[(Long, String)], tag: String): String = {
      val dir = java.nio.file.Files.createTempDirectory(tag).toFile.getPath
      rows.toDF("doc_id", "text")
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          lit("wiki").as("source"),
          length(col("text")).cast("long").as("n_chars"))
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      dir
    }
    def hexDecode(sym: String): String = new String(
      sym.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray, "UTF-8")
    val pii = "zq" + ("xj" * 6) // distinctive, heavily repeated → merges
    val survivors = Seq(
      (1L, "the cat sat on the mat and the dog sat too"),
      (2L, "to be or not to be that is the question"),
      (3L, "the quick brown fox jumps over the lazy dog"))
    val fullDir = writeDocs(
      survivors :+ (99L, (s"$pii " * 40) + "common words here"),
      "graft_tok_full")
    val survDir = writeDocs(survivors, "graft_tok_surv")
    // The full training retains the purged doc's raw word as a dict
    // key and merges it into shipped vocab symbols (the hazard).
    val fullDict = Bpe.bpeDict(spark, fullDir)
      .select("word").as[String].collect().toSet
    assert(fullDict.contains(pii), "fixture: PII word missing from the dict")
    val fullSyms = SparkEntry.queries("ta30_bpe_vocab")(spark, fullDir)
      .filter(col("freq") > 0 && length(col("symbol")) > 2)
      .select("symbol").as[String].collect().toSeq.map(hexDecode)
    assert(fullSyms.exists(s => s.length >= 2 && pii.contains(s)),
      "fixture: the PII word never reached the trained vocab")
    // The rebuild over survivors — the takedown — has zero residue:
    // the word is not a dict key, and every shipped (freq > 0) merged
    // symbol decodes to a substring of some SURVIVING word.
    val survWords = survivors.flatMap(_._2.split(" ").filter(_.nonEmpty)).toSet
    val survDict = Bpe.bpeDict(spark, survDir)
      .select("word").as[String].collect().toSet
    assert(survDict == survWords,
      s"rebuilt dict keys != surviving corpus words: $survDict")
    SparkEntry.queries("ta30_bpe_vocab")(spark, survDir)
      .filter(col("freq") > 0 && length(col("symbol")) > 2)
      .select("symbol").as[String].collect().toSeq.map(hexDecode)
      .foreach { s =>
        assert(survWords.exists(_.contains(s)),
          s"rebuilt vocab symbol '$s' decodes outside the surviving corpus")
      }
  }

  test("simultaneous batch fold equals one-at-a-time application in every order") {
    import spark.implicits._
    // Adversarial states: repeats ("a a a"), interleavings, the created
    // symbol 'ab' pre-existing as a SINGLE symbol (must not trigger
    // (a,b)'s closure check), and symbols untouched by the batch.
    val states = Seq(
      "|a|b|c|d", "|a|a|a", "|a|b|x|a|b", "|c|d|c|d", "|x|y|x",
      "|ab|c|d", "|q|a|b|q", "|b|a|d|c", "|a", "|y|x|y")
    val batch = Seq(("a", "b"), ("c", "d"), ("x", "y"))
    val df = states.toDF("s")
    val simultaneous = df.select(Bpe.batchMergeCol(batch).as("r"))
      .as[String].collect().toSeq
    for (perm <- batch.permutations) {
      val sequential = perm.foldLeft(df) { case (acc, (a, b)) =>
        acc.select(col("s"), lit(a).as("a"), lit(b).as("b"))
          .select(Bpe.applyMergeCol.as("s"))
      }.as[String].collect().toSeq
      assert(sequential == simultaneous,
        s"order ${perm.mkString(",")} diverges: $sequential vs $simultaneous")
    }
  }
}
