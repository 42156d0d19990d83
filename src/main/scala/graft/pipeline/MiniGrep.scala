package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The reference tutorial's whole program, Spark-first (SURVEY.md §3.3).
  *
  * minigrep (/root/reference/tutorial/minigrep/minigrep.go:117-144) wires
  * FileFinder → FileScanner → MatchFilter → Printer as four goroutine
  * nodes. Here the same dataflow is one declarative plan: scan → regex
  * filter → project. Pattern validation happens at build time (the
  * reference's provider-error semantics,
  * /root/reference/tutorial/minigrep/minigrep.go:91-105).
  */
object MiniGrep {
  def run(spark: SparkSession, dir: String, pattern: String): DataFrame = {
    // Build-time validation ≈ MatchFilterProvider returning an error.
    java.util.regex.Pattern.compile(pattern)
    Tables.documents(spark, dir)
      .filter(col("text").rlike(pattern))
      .select(col("doc_id"), col("source"), col("text"))
  }

  /** File-based variant with the reference FileFinder's permissive source
    * semantics (/root/reference/tutorial/minigrep/minigrep.go:47-61): an
    * unreadable input is skipped — Spark logs it, the reference printed
    * to stderr — and every readable file's matches still arrive.
    * `ignoreCorruptFiles`/`ignoreMissingFiles` are the Spark analogs of
    * open-error-keep-going. */
  def runFiles(spark: SparkSession, dir: String, pattern: String): DataFrame = {
    java.util.regex.Pattern.compile(pattern)
    spark.read
      .option("ignoreCorruptFiles", "true")
      .option("ignoreMissingFiles", "true")
      .parquet(dir)
      .filter(col("text").rlike(pattern))
      .select(col("doc_id"), col("source"), col("text"))
  }
}
