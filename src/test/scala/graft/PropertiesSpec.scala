package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** ScalaCheck property tests on operator algebra (SURVEY.md §5 — an
  * upgrade over the reference's example-based tests): laws that must
  * hold for ANY input, checked on generated datasets. */
class PropertiesSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val smallLists = Gen.listOfN(20, Gen.chooseNum(-100L, 100L))

  /** Deterministic sampler (the scalatest-scalacheck bridge artifact is
    * not in the offline cache; raw Gen + fixed seed does the job). */
  private def forAll[A](g: Gen[A], n: Int = 15)(f: A => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(42L)
    val params = Gen.Parameters.default
    (1 to n).foreach { _ =>
      g.apply(params, seed).foreach(f)
      seed = seed.next
    }
  }

  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(g1, g2))(t => f(t._1, t._2))

  test("filter composition: filter(p).filter(q) == filter(p && q)") {
    forAll(smallLists) { xs =>
      val ds = spark.createDataset(xs)
      val a = ds.filter(_ % 2 == 0).filter(_ > 0).collect().sorted.toSeq
      val b = ds.filter(x => x % 2 == 0 && x > 0).collect().sorted.toSeq
      assert(a === b)
    }
  }

  test("union is commutative up to multiset equality") {
    forAll(smallLists, smallLists) { (xs, ys) =>
      val (a, b) = (spark.createDataset(xs), spark.createDataset(ys))
      val u1 = a.union(b).collect().sorted.toSeq
      val u2 = b.union(a).collect().sorted.toSeq
      assert(u1 === u2)
    }
  }

  test("distinct is idempotent and order-insensitive") {
    forAll(smallLists) { xs =>
      val ds = spark.createDataset(xs)
      val once = ds.distinct().collect().sorted.toSeq
      val twice = ds.distinct().distinct().collect().sorted.toSeq
      assert(once === twice)
      assert(once === xs.distinct.sorted)
    }
  }

  test("map fusion: map(f).map(g) == map(g compose f)") {
    forAll(smallLists) { xs =>
      val ds = spark.createDataset(xs)
      val f = (x: Long) => x + 7
      val g = (x: Long) => x * 3
      val a = ds.map(f).map(g).collect().sorted.toSeq
      val b = ds.map(g compose f).collect().sorted.toSeq
      assert(a === b)
    }
  }

  test("groupBy sum equals scala groupBy sum (exact integer agg)") {
    forAll(smallLists) { xs =>
      val ds = spark.createDataset(xs).toDF("v")
      val got = ds.groupBy(($"v" % 5).as("k")).sum("v").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = xs.groupBy(_ % 5).view.mapValues(_.sum).toMap
      assert(got === want)
    }
  }

  test("TopKPerGroup equals scala per-group sortBy.take for any input and k") {
    import org.apache.spark.sql.functions.col
    val rows = Gen.listOfN(40,
      Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(-50L, 50L), Gen.chooseNum(0L, 1000L)))
    forAll(Gen.zip(rows, Gen.chooseNum(1, 6)), n = 10) { case (xs, k) =>
      // Unique id as tiebreaker so the top-k SET is well-defined.
      val data = xs.zipWithIndex.map { case ((g, v, _), i) => (g, v, i.toLong) }
      val df = spark.createDataset(data).toDF("g", "v", "id")
      val got = graft.plans.TopK.topKPerGroup(df,
        Seq(col("g")), Seq(col("v").desc, col("id").asc), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = data.groupBy(_._1).values.flatMap(
        _.sortBy(t => (-t._2, t._3)).take(k)).toSet
      assert(got === want)
    }
  }

  test("dd18 span merge equals a reference merge for any position set") {
    import org.apache.spark.sql.functions.col
    // Random (doc_id, i) duplicated-gram start sets, including adjacent,
    // overlapping, exactly-n-apart and far-apart gaps.
    val rows = Gen.listOfN(30,
      Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(0, 60)))
    forAll(Gen.zip(rows, Gen.chooseNum(2, 9)), n = 10) { case (xs, w) =>
      val data = xs.distinct
      val df = spark.createDataset(data).toDF("doc_id", "i")
      val got = graft.operators.Dedup.substringSpans(df, w)
        .select(col("doc_id"), col("s"), col("e"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      val want = data.groupBy(_._1).flatMap { case (doc, ps) =>
        val sorted = ps.map(_._2).sorted
        val spans = sorted.foldLeft(List.empty[(Int, Int)]) {
          case ((s0, last) :: rest, i) if i - last <= w => (s0, i) :: rest
          case (acc, i) => (i, i) :: acc
        }
        spans.map { case (s0, last) => (doc, s0, last + w - 1) }
      }.toSet
      assert(got === want, s"w=$w data=$data")
    }
  }

  test("BPE fold merge equals sequential greedy merge for any symbol sequence") {
    // Adversarial alphabet: single- and multi-char symbols whose
    // concatenations collide ("ab" vs a·b), plus self-overlapping
    // pairs like (a, a) on runs "a a a a" — the cases where a naive
    // string replace diverges from greedy left-to-right BPE.
    def ref(syms: List[String], a: String, b: String): List[String] =
      syms match {
        case x :: y :: rest if x == a && y == b => (a + b) :: ref(rest, a, b)
        case x :: rest => x :: ref(rest, a, b)
        case Nil => Nil
      }
    val symGen = Gen.listOfN(12, Gen.oneOf("a", "b", "ab", "ba", "aa"))
    val pairGen = Gen.oneOf(("a", "a"), ("a", "b"), ("b", "a"),
      ("ab", "a"), ("a", "ab"), ("aa", "aa"), ("b", "ba"))
    forAll(Gen.zip(symGen, pairGen), n = 12) { case (xs, (a, b)) =>
      val df = spark.createDataset(Seq((xs.mkString("|", "|", ""), a, b)))
        .toDF("s", "a", "b")
      val got = df.select(graft.operators.Bpe.applyMergeCol.as("r"))
        .head().getString(0)
      val want = ref(xs, a, b).mkString("|", "|", "")
      assert(got == want, s"syms=$xs pair=($a,$b)")
    }
  }
}
