package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Similarity-search operators (SURVEY.md §2.5) — filled in incrementally. */
object Similarity {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
