package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deduplication operators (SURVEY.md §2.5) — filled in incrementally. */
object Dedup {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
