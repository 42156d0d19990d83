package graft
import org.apache.spark.sql.SparkSession

/** Dev-only perf probe (not part of the driver contract).
  *
  * Times registered queries back-to-back inside ONE JVM and reports
  * per-query min/median over N reps. The host suffers unpredictable
  * co-tenant contention (bench totals vary up to 5× across runs), so
  * only same-JVM relative numbers are trustworthy — min-of-reps
  * approximates the uncontended cost.
  *
  *   runMain graft.Probe <sfDir> <reps> <name-prefix>[,<prefix>...]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val prefixes = args(2).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sel = SparkEntry.queries.toSeq
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
      .sortBy(_._1)
    // Warm shared init paths (parquet footer cache, codegen compiler).
    sel.foreach { case (_, fn) => fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
    sel.foreach { case (name, fn) =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[probe] $name%-28s min=${ts.head}%7.2fs med=${ts(ts.size / 2)}%7.2fs reps=$reps")
    }
    spark.stop()
  }
}
