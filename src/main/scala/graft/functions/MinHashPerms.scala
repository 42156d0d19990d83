package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: all K MinHash permutation minima of a
  * hashed-shingle array in ONE pass.
  *
  * The HOF formulation (`transform(array(perms), p -> array_min(
  * transform(hs, h -> (h%P*a+b)%P)))`) walks the shingle array once per
  * permutation through interpreted lambda trees with boxed elements —
  * K×n tree-walks per row. This expression is the §7.3(b) escalation:
  * a primitive nested loop (outer: shingles, inner: K unrolled
  * register-resident minima) inside whole-stage codegen — one traversal
  * of the array, no boxing, cache-friendly.
  *
  * Arithmetic is EXACTLY the library's shared MinHash formula
  * `((h % p) * a_k + b_k) % p` on nonnegative 60-bit base hashes with
  * a_k < p, so products stay < 2^62 — bit-identical to the HOF path and
  * the DuckDB oracle (MinHashPermsSpec pins both). Null array → null;
  * empty array → null (array_min of empty). Null ELEMENT → null,
  * deliberately STRICTER than the HOF form (array_min would skip the
  * null): a null shingle hash means corrupt upstream input, and a
  * sketch silently computed over a subset is the failure mode the
  * mm02/dq-family "fail loudly" rule exists for. No caller produces
  * null elements (md5 over non-null grams).
  */
case class MinHashPerms(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
  extends UnaryExpression {

  require(a.length == b.length && a.nonEmpty, "a/b constant tables must align")

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"minhash_perms requires array<bigint> input, got $t")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_perms"

  private val k = a.length

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (hs.isNullAt(i)) return null
      val h = hs.getLong(i) % p
      var j = 0
      while (j < k) {
        val v = (h * a(j) + b(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val aRef = ctx.addReferenceObj("mhpA", a.toArray, "long[]")
      val bRef = ctx.addReferenceObj("mhpB", b.toArray, "long[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $hs.numElements();
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($hs.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $h = $hs.getLong($i) % ${p}L;
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = ($h * $aRef[$j] + $bRef[$j]) % ${p}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} =
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashPerms =
    copy(child = newChild)
}

object MinHashPerms {
  /** Column-API entry point (see [[MinHashPerms]]). */
  def minhashPerms(hs: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    CatalystBridge.column(
      MinHashPerms(CatalystBridge.expression(hs), a, b, p))
}
