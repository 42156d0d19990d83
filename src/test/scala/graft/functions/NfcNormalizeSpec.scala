package graft.functions

import graft.SparkSpec
import graft.functions.NfcNormalize.nfc
import org.apache.spark.sql.functions._

/** The native NfcNormalize expression (ta25): unicode canonical
  * composition with the exact cases an ingest pipeline meets, plus the
  * algebraic properties (idempotence, codegen/interpreted parity) the
  * fixture — augmented or not — cannot exercise exhaustively. All
  * non-ASCII codepoints are \u-escaped: a literal decomposed sequence
  * in source would be one editor-normalization away from silently
  * testing the composed case twice. */
class NfcNormalizeSpec extends SparkSpec {

  private def norm(rows: Seq[String]) = {
    import spark.implicits._
    rows.toDF("s").select(nfc(col("s")).as("n")).collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0))
  }

  test("composes decomposed sequences and leaves composed/ASCII alone") {
    val got = norm(Seq(
      "plain ascii",
      "e\u0301",                   // e + COMBINING ACUTE -> U+00E9
      "\u00e9",                    // already-composed e-acute: unchanged
      "A\u030angstro\u0308m",      // A+RING, o+DIAERESIS -> composed forms
      "\ufb01",                    // fi ligature: NFC-invariant (NFKC splits)
      ""))
    assert(got.toSeq == Seq(
      "plain ascii", "\u00e9", "\u00e9", "\u00c5ngstr\u00f6m", "\ufb01", ""))
  }

  test("idempotent, null-preserving, and codepoint count never grows") {
    import spark.implicits._
    // x + COMBINING MACRON has no composed form: NFC keeps it decomposed
    // (the count-equal case); the leading e+acute still composes.
    val df = Seq(Some("e\u0301x\u0304y"), Some("abc"), None).toDF("s")
    val out = df.select(col("s"), nfc(col("s")).as("n1"),
        nfc(nfc(col("s"))).as("n2")).collect()
    assert(out.exists(r => !r.isNullAt(0) && r.getString(1) == "\u00e9x\u0304y"))
    out.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1) && r.isNullAt(2))
      else {
        assert(r.getString(1) == r.getString(2), "not idempotent")
        assert(r.getString(1).codePointCount(0, r.getString(1).length) <=
          r.getString(0).codePointCount(0, r.getString(0).length))
      }
    }
  }

  test("nfc_normalize is callable from SQL after registration") {
    NfcNormalize.register(spark)
    val got = spark.sql(
      "SELECT nfc_normalize(cast(unhex('65CC81') as string)) AS n")
      .collect()(0).getString(0)
    assert(got == "\u00e9")
  }

  test("codegen and interpreted eval agree over the documents fixture") {
    // Whole-stage codegen path (projection over the scan)…
    val aug = concat(col("text"), expr("cast(unhex('65CC81') as string)"))
    val viaCodegen = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), md5(nfc(aug)).as("m")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // …vs driver-side interpreted reference through java.text.Normalizer
    // (65 CC 81 is the UTF-8 of e + U+0301, which NFC composes to \u00e9).
    val viaRef = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).collect().map { r =>
        val s = java.text.Normalizer.normalize(
          r.getString(1) + "e\u0301", java.text.Normalizer.Form.NFC)
        val dig = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8"))
        r.getLong(0) -> dig.map(b => f"${b & 0xff}%02x").mkString
      }.toMap
    assert(viaCodegen == viaRef)
  }
}
