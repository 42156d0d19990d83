package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text-analysis operators (SURVEY.md §2.5) — filled in incrementally. */
object TextAnalysis {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
