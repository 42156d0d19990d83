package graft.functions

import graft.SparkSpec
import graft.functions.MinHashPerms.minhashPerms
import org.apache.spark.sql.functions._

/** The native MinHashPerms expression must be bit-identical to the HOF
  * formulation (same `((h % p)·a + b) % p` per permutation, min over
  * the array), null-propagate the same way, and survive with codegen
  * fallback disabled (the non-vacuous codegen check, ta25's rule). */
class MinHashPermsSpec extends SparkSpec {

  private val P = 2147483647L
  private val A = Seq(1299721L, 15485863L, 32452843L)
  private val B = Seq(12345L, 1012328L, 2012311L)

  private def hofCol = {
    val perms = A.zip(B).map { case (a, b) =>
      s"named_struct('a', ${a}L, 'b', ${b}L)" }.mkString(", ")
    expr(s"transform(array($perms), " +
      s"p -> array_min(transform(hs, h -> (h % $P * p.a + p.b) % $P)))")
  }

  private def fixtureHs = {
    val toks = "filter(split(text, ' '), x -> x <> '')"
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), expr(toks).as("tk"))
      .filter(expr("size(tk) >= 3"))
      .select(col("doc_id"), expr(
        "transform(transform(sequence(0, size(tk) - 3), " +
        "i -> concat(element_at(tk, i + 1), ' ', element_at(tk, i + 2), ' ', element_at(tk, i + 3))), " +
        "g -> cast(conv(substring(md5(g), 1, 15), 16, 10) as bigint))").as("hs"))
  }

  test("native minima == HOF minima on the fixture, bit-exact") {
    val both = fixtureHs.select(
      minhashPerms(col("hs"), A, B, P).as("native"), hofCol.as("hof"))
    assert(both.count() > 0)
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("native minima survive with codegen fallback disabled") {
    withSQLConf("spark.sql.codegen.fallback" -> "false") {
      val rows = fixtureHs
        .select(minhashPerms(col("hs"), A, B, P).as("m")).limit(5).collect()
      assert(rows.nonEmpty && rows.forall(!_.isNullAt(0)))
    }
  }

  test("null array, null element and empty array all null out") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Long](7L, 11L)),
      (2L, Seq[java.lang.Long](7L, null)),
      (3L, Seq.empty[java.lang.Long]),
      (4L, null.asInstanceOf[Seq[java.lang.Long]])
    ).toDF("id", "hs")
      .select(col("id"), col("hs").cast("array<bigint>").as("hs"))
    val got = df.select(col("id"),
        minhashPerms(col("hs"), A, B, P).as("m"), hofCol.as("hof"))
      .orderBy("id").collect()
    assert(!got(0).isNullAt(1) &&
      got(0).getSeq[Long](1) == got(0).getSeq[Long](2))
    assert(got(1).isNullAt(1), "null element must null the result")
    assert(got(2).isNullAt(1), "empty array must null the result")
    assert(got(3).isNullAt(1), "null array must null the result")
  }

  // minhashWideOf references the ms array k times; CollapseProject must
  // NOT duplicate the non-cheap native expression into each reference
  // (SPARK-36718) — the optimized plan carries exactly one minhash_perms.
  test("wide-signature plan evaluates minhash_perms exactly once per row") {
    val plan = graft.SparkEntry.queries("dd02_minhash_sig")(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    val n = "minhash_perms".r.findAllIn(plan).length
    assert(n == 1, s"expected 1 minhash_perms in the plan, found $n:\n" +
      plan.take(2000))
  }

  private def withSQLConf(kv: (String, String))(f: => Unit): Unit = {
    val (k, v) = kv
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try f finally prev match {
      case Some(p) => spark.conf.set(k, p)
      case None => spark.conf.unset(k)
    }
  }
}
