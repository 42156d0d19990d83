package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Registered queries driven through the Layer-1 Pipes DSL — the
  * reference's flagship DIAMOND deployment shape
  * (/root/reference/pipe/node_test.go:47-77): one start, a shared middle
  * whose output fans out to two independent branches, each draining into
  * its own sink, all launched concurrently by one Runner.
  *
  * PipesSpec proves the DSL mechanics (fan-out fidelity, lifecycle);
  * this registers the deployment shape itself as an oracle-checked query:
  * the shared subtree is persisted ONCE (the F4 broadcast-fidelity rule),
  * both sinks are real parquet writers running concurrently via
  * Runner.start()/done(), and the query's result is the union of what the
  * two sinks actually WROTE — so the driver's hash gate checks the whole
  * pipeline end to end, not a DataFrame that merely resembles it.
  *
  * Scale: the fan-out persist is MEMORY_AND_DISK on the cleaned
  * projection (columns the branches need, not full text); each branch is
  * an independent partial-aggregated groupBy; the sinks write
  * distributed. Nothing here is fixture-shaped.
  */
object PipelineQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pp01_fanout_diamond" -> ((s, d) => {
      val tmp = System.getProperty("java.io.tmpdir")
      val outA = s"$tmp/graft_pp01_by_source"
      val outB = s"$tmp/graft_pp01_by_lang"
      Seq(outA, outB).foreach { dir =>
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
      val b = new PipelineBuilder(s)
      val start = b.addStart[Row]("docs",
        sp => graft.sources.Tables.documents(sp, d).asInstanceOf[org.apache.spark.sql.Dataset[Row]])
      // Shared middle: 2 downstream consumers → build() persists it once.
      val clean = b.addMiddle[Row, Row]("clean", ds =>
        ds.toDF().filter(length(trim(col("text"))) > 0)
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
          .asInstanceOf[org.apache.spark.sql.Dataset[Row]])
      val bySource = b.addMiddle[Row, Row]("by_source", ds =>
        ds.toDF().groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
          .select(lit("by_source").as("metric"), col("source").as("k"),
            col("n_docs"), col("sum_chars"))
          .asInstanceOf[org.apache.spark.sql.Dataset[Row]])
      val byLang = b.addMiddle[Row, Row]("by_lang", ds =>
        ds.toDF().groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
          .select(lit("by_lang").as("metric"), col("lang").as("k"),
            col("n_docs"), col("sum_chars"))
          .asInstanceOf[org.apache.spark.sql.Dataset[Row]])
      val sinkA = b.addFinal[Row]("sink_a",
        ds => ds.toDF().write.mode("overwrite").parquet(outA))
      val sinkB = b.addFinal[Row]("sink_b",
        ds => ds.toDF().write.mode("overwrite").parquet(outB))
      b.sendTo(start, clean)
      b.sendTo(clean, bySource, byLang) // the fan-out edge (F4)
      b.sendTo(bySource, sinkA)
      b.sendTo(byLang, sinkB)
      val runner = b.build().fold(e => throw e, identity)
      runner.run() // start() both sinks concurrently, done() blocks
      s.read.parquet(outA).unionByName(s.read.parquet(outB))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "pp01_fanout_diamond" ->
      """SELECT 'by_source' AS metric, source AS k, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM documents WHERE len(trim(text)) > 0 GROUP BY source
         UNION ALL
         SELECT 'by_lang' AS metric, lang AS k, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM documents WHERE len(trim(text)) > 0 GROUP BY lang"""
  )
}
