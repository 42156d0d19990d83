package graft
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** Throwaway dev profiler (listener-metric breakdown per query rep) —
  * NOT part of the driver contract; deleted once the adjudication
  * lands. Usage: runMain graft.DevProfileQ <sfDir> <reps> <prefixes> */
object DevProfileQ {
  def main(args: Array[String]): Unit = {
    val d = args(0); val reps = args(1).toInt
    val prefixes = args(2).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // Experiment knob: SPARK_GRAFT_CONF="k=v;k=v" extra session confs.
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.split("=", 2))
      .collect { case Array(k, v) => (k, v) }
      .foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val run = new AtomicLong; val gc = new AtomicLong
    val deser = new AtomicLong; val rser = new AtomicLong
    val cpu = new AtomicLong; val tasks = new AtomicLong
    val shufW = new AtomicLong; val shufR = new AtomicLong
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          run.addAndGet(m.executorRunTime); gc.addAndGet(m.jvmGCTime)
          deser.addAndGet(m.executorDeserializeTime)
          rser.addAndGet(m.resultSerializationTime)
          cpu.addAndGet(m.executorCpuTime / 1000000L)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          tasks.incrementAndGet(); ()
        }
      }
    })
    // stage pre-clock as the bench does
    try graft.streaming.Streams.prepareFeeds(s, d) catch { case _: Throwable => }
    try { graft.operators.Curation.stagedDocServe(s, d); () } catch { case _: Throwable => }
    try { graft.operators.TextAnalysis.stagedQuality(s, d); () } catch { case _: Throwable => }
    try { graft.operators.Incremental.pl13Run(s, d); () } catch { case _: Throwable => }
    Seq("mm11_phash_survivorship", "dd16_keep_best").foreach { n =>
      try SparkEntry.queries(n)(s, d).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    val sel = SparkEntry.queries.toSeq
      .filter { case (n, _) => prefixes.exists(n.startsWith) }.sortBy(_._1)
    sel.foreach { case (_, fn) =>
      try fn(s, d).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[prof] warm failed: ${e.getMessage}") }
    }
    sel.foreach { case (name, fn) =>
      (1 to reps).foreach { i =>
        // Listener events are async: let stragglers from the previous
        // rep drain before resetting, else reps bleed into each other.
        Thread.sleep(500L)
        Seq(run, gc, deser, rser, cpu, tasks, shufW, shufR).foreach(_.set(0L))
        val t0 = System.nanoTime()
        fn(s, d).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9 // before the drain sleep
        Thread.sleep(500L) // drain this rep's listener tail before reading
        println(f"[prof] $name%-24s rep$i wall=$wall%6.2fs taskRun=${run.get / 1e3}%7.1fs cpu=${cpu.get / 1e3}%7.1fs gc=${gc.get / 1e3}%5.1fs deser=${deser.get / 1e3}%5.1fs tasks=${tasks.get}%5d shufW=${shufW.get / 1048576}%5dMB shufR=${shufR.get / 1048576}%5dMB")
      }
    }
    s.stop()
  }
}
