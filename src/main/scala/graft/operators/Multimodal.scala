package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal-column operators (SURVEY.md §2.5) — filled in incrementally. */
object Multimodal {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
