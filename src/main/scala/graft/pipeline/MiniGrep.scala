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
}
