package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only perf probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }

    val raw = spark.read.parquet(s"$d/documents.parquet")
    val rep = raw.repartition(8, col("doc_id"))
    val toks = "filter(split(text, ' '), x -> x <> '')"
    def shingleFrom(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), expr(toks).as("tk"))
      .filter(expr("size(tk) >= 3"))
      .select(col("doc_id"), expr(
        "array_distinct(transform(sequence(0, size(tk) - 3), " +
        "i -> concat(element_at(tk, i + 1), ' ', element_at(tk, i + 2), ' ', element_at(tk, i + 3))))"
      ).as("sh"))
    def sigFrom(sets: org.apache.spark.sql.DataFrame) = {
      val P = 2147483647L
      val h = sets.select(col("doc_id"), explode(col("sh")).as("g"))
        .select(col("doc_id"),
          (expr("cast(conv(substring(md5(g), 1, 15), 16, 10) as bigint)") % P).as("h31"))
      val minima = (0 until 8).map(i => min((col("h31") * (1299721L + i * 13L) + i) % P).as(s"mh$i"))
      h.groupBy(col("doc_id")).agg(minima.head, minima.tail: _*)
    }
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("warmup")                { run(shingleFrom(raw).limit(10)) }
    time("shingles raw (1 task)") { run(shingleFrom(raw)) }
    time("shingles repartitioned"){ run(shingleFrom(rep)) }
    time("sig raw")               { run(sigFrom(shingleFrom(raw))) }
    time("sig repartitioned")     { run(sigFrom(shingleFrom(rep))) }
    time("explode+md5 only rep")  { run(shingleFrom(rep).select(explode(col("sh")).as("g")).select(md5(col("g")))) }
    time("explode only rep")      { run(shingleFrom(rep).select(explode(col("sh")).as("g"))) }
    time("explode after sortWP")   { run(shingleFrom(rep).sortWithinPartitions("doc_id").select(explode(col("sh")).as("g"))) }
    time("explode after reshuffle"){ run(shingleFrom(rep).repartition(8, col("doc_id")).select(explode(col("sh")).as("g"))) }
    time("sig after sortWP")       { run(sigFrom(shingleFrom(rep).sortWithinPartitions("doc_id"))) }
    time("explode int 1M")         { run(spark.range(5000).select(explode(expr("sequence(1, 200)")).as("g"))) }
    time("explode str const 1M")   { run(spark.range(5000).select(explode(expr("transform(sequence(1, 200), i -> concat('tok_', i))")).as("g"))) }
    time("count shingle elems")    { println(shingleFrom(rep).select(explode(col("sh")).as("g")).count()) }
    val tokonly = rep.select(col("doc_id"), expr("filter(split(text, ' '), x -> x <> '')").as("tk"))
    time("explode tokens only")    { run(tokonly.select(explode(col("tk")).as("g"))) }
    val shNoDistinct = tokonly.filter(expr("size(tk) >= 3")).select(col("doc_id"), expr(
      "transform(sequence(0, size(tk) - 3), i -> concat(element_at(tk, i + 1), ' ', element_at(tk, i + 2), ' ', element_at(tk, i + 3)))").as("sh"))
    time("explode sh no-distinct") { run(shNoDistinct.select(explode(col("sh")).as("g"))) }
    val shSlice = tokonly.filter(expr("size(tk) >= 3")).select(col("doc_id"), expr(
      "transform(sequence(0, size(tk) - 3), i -> element_at(tk, i + 1))").as("sh"))
    time("explode sh slice-only")  { run(shSlice.select(explode(col("sh")).as("g"))) }
    val shConcat2 = tokonly.filter(expr("size(tk) >= 3")).select(col("doc_id"), expr(
      "transform(sequence(0, size(tk) - 3), i -> concat(element_at(tk, i + 1), element_at(tk, i + 2)))").as("sh"))
    time("explode sh concat2")     { run(shConcat2.select(explode(col("sh")).as("g"))) }
    time("reshuffle arrays only")  { run(shNoDistinct.repartition(8, col("doc_id"))) }
    spark.stop()
  }
}
