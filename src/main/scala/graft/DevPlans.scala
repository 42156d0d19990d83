package graft
import org.apache.spark.sql.SparkSession

/** Dev-only plan dumper (NOT part of the driver contract): writes
  * `.explain("formatted")` for registered queries to an out dir, one
  * file per query — the before/after plan evidence the optimization
  * rounds commit under plans/rNN/.
  *
  * Streaming-harness queries (st*, pp02, pl04) EXECUTE their stream when
  * the registry function is invoked and return a memory-sink read-back,
  * so their "plan" here is just that scan; their per-trigger evidence is
  * DevProfileQ listener metrics instead. They are skipped unless named
  * explicitly.
  *
  * Usage: runMain graft.DevPlans <sfDir> <outDir> <prefixes|all> [suffix]
  */
object DevPlans {
  def main(args: Array[String]): Unit = {
    val d = args(0); val outDir = new java.io.File(args(1))
    val prefixes = args(2).split(",").toSeq
    val suffix = if (args.length > 3) args(3) else ""
    outDir.mkdirs()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val streamingNames =
      graft.streaming.Streams.queries.keySet + "pp02_stream_diamond"
    // Stage pre-clock artifacts exactly as the bench does, so plans show
    // the steady-state (staged-index probe) shape, not the build.
    try graft.streaming.Streams.prepareFeeds(s, d) catch { case _: Throwable => }
    try graft.operators.Similarity.prepareQuant(s, d) catch { case _: Throwable => }
    try { graft.operators.Bpe.stagedDocStats(s, d); () } catch { case _: Throwable => }
    try {
      graft.operators.Curation.stagedDropSet(s, d)
      graft.operators.Curation.stagedCanon(s, d)
      graft.operators.Curation.stagedDocServe(s, d)
    } catch { case _: Throwable => }
    try { graft.operators.Incremental.pl11Run(s, d); () } catch { case _: Throwable => }
    try { graft.operators.Incremental.pl13Run(s, d); () } catch { case _: Throwable => }
    try { graft.operators.Incremental.pl15Run(s, d); () } catch { case _: Throwable => }
    try graft.streaming.Streams.prepareIncrementalStream(s, d) catch { case _: Throwable => }
    try graft.operators.TextAnalysis.trainClassifier(s, d) catch { case _: Throwable => }
    try { graft.operators.TextAnalysis.stagedQuality(s, d); () } catch { case _: Throwable => }
    Seq("q42_bucketed_join", "ss07_lsh_index_probe",
        "ss02_ivf_topk", "ss12_ivf_refresh", "ss15_ivf_delete_compact",
        "ss09_pq_topk", "ss06_sq8_topk",
        "dd08_contamination", "ta10_boilerplate",
        "dd16_keep_best", "io09_dynamic_pruning", "io13_aqe_skew_join",
        "dd18_substring_spans", "ta26_bpe_tokenize", "ta27_line_dedup",
        "mm11_phash_survivorship").foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        try fn(s, d).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => }
      }
    }
    val sel = SparkEntry.queries.toSeq
      .filter { case (n, _) =>
        (prefixes == Seq("all") || prefixes.exists(n.startsWith)) &&
          (!streamingNames.contains(n) || prefixes.contains(n))
      }.sortBy(_._1)
    sel.foreach { case (name, fn) =>
      try {
        val txt = fn(s, d).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          new java.io.File(outDir, s"$name$suffix.txt").toPath,
          txt.getBytes("UTF-8"))
        println(s"[plans] wrote $name$suffix")
      } catch { case e: Throwable =>
        println(s"[plans] $name FAILED: ${e.getMessage}")
      }
    }
    s.stop()
  }
}
