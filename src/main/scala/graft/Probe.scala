package graft
import org.apache.spark.sql.SparkSession

/** Dev-only perf probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Recursive CTE support probe: UNION (distinct) recursion over a cycle.
    val df = spark.sql(
      """WITH RECURSIVE r(n) AS (
           SELECT 1
           UNION
           SELECT CASE WHEN n = 3 THEN 1 ELSE n + 1 END FROM r WHERE n <= 3)
         SELECT sum(n) AS s FROM r""")
    df.show()
    spark.stop()
  }
}
