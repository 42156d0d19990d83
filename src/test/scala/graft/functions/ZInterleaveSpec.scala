package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZInterleaveSpec extends SparkSpec {
  import ZInterleave.zInterleave

  /** Bit-by-bit reference: x bits at odd positions, y at even. */
  private def refInterleave(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i))
    }

  test("interleave matches the bit-by-bit reference on edge and random points") {
    val pts = Seq((0L, 0L), (0xffffL, 0xffffL), (0xffffL, 0L), (0L, 0xffffL),
      (1L, 2L), (0xaaaaL, 0x5555L)) ++
      (1 to 200).map(i => ((i * 7919L) % 65536, (i * 104729L) % 65536))
    pts.foreach { case (x, y) =>
      assert(ZInterleave.interleave16(x, y) === refInterleave(x, y), s"($x,$y)")
    }
    // adjacency property: z of (x,y) and (x,y+1) with y even differ in bit 0
    assert((ZInterleave.interleave16(7, 4) ^ ZInterleave.interleave16(7, 5)) === 1L)
  }

  test("expression path equals the scala path and is codegen'd") {
    // spark.range, not a local Seq: ConvertToLocalRelation would fold a
    // LocalRelation projection at plan time and leave no codegen to pin.
    val df = spark.range(512)
      .select((col("id") % 256).as("x"), ((col("id") * 31) % 256).as("y"))
      .withColumn("z", zInterleave(col("x"), col("y")))
    df.collect().foreach { r =>
      assert(r.getLong(2) === ZInterleave.interleave16(r.getLong(0), r.getLong(1)))
    }
    // `*(1)` is the WholeStageCodegen marker: the projection carrying
    // z_interleave must sit INSIDE a codegen stage, not fall back.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("z_interleave") && l.trim.startsWith("*(")),
      "z_interleave fell out of whole-stage codegen:\n" + plan.take(1500))
  }

  test("z-clustered layout prunes tiles for a box query") {
    import graft.sources.Tables
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_zorder_spec"
    val pts = Tables.part(spark, sfDir)
      .select(col("p_partkey"),
        (col("p_partkey") % 256).as("x"),
        (graft.Exprs.cents(col("p_retailprice")) % 256).as("y"))
      .withColumn("tile", shiftright(zInterleave(col("x"), col("y")), 12))
    pts.write.mode("overwrite").partitionBy("tile").parquet(dir)
    // box y < 16: the z-range cover is the tiles whose prefix has both
    // y-bits clear — computed the way an engine covers a box with
    // z-ranges (enumerate prefixes, keep intersecting ones).
    val cover = (0 to 15).filter(t => (t & 1) == 0 && (t & 4) == 0)
    assert(cover.size === 4)
    val pruned = spark.read.parquet(dir)
      .filter(col("tile").isin(cover.map(_.toLong): _*) && col("y") < 16)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "tile filter did not prune:\n" + plan.take(1500))
    val full = spark.read.parquet(dir).filter(col("y") < 16)
    assert(pruned.agg(count(lit(1)), sum(col("p_partkey"))).collect().toSeq ===
           full.agg(count(lit(1)), sum(col("p_partkey"))).collect().toSeq,
      "tile cover lost rows — the cover is not a superset of the box")
  }
}
