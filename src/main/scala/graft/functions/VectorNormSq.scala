package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Squared L2 norm of an `array<float>` — the specialized form of
  * `vec_dot(x, x)`: one array traversal, one null check, half the
  * getFloat calls. Produced by [[RewriteSelfDot]]; same widen-and-
  * accumulate arithmetic as [[VectorDot]], so results are bit-identical.
  */
case class VectorNormSq(child: Expression) extends UnaryExpression {

  // Nullable even over non-null input: a null *element* nulls the sum,
  // matching VectorDot (which this replaces via RewriteSelfDot).
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"vec_norm_sq requires array<float>, got $t")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm_sq"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var sum = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getFloat(i).toDouble; sum += v * v; i += 1
    }
    sum
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val sum = ctx.freshName("sum"); val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $v = (double) $a.getFloat($i);
         |  $sum += $v * $v;
         |}
         |if (!${ev.isNull}) { ${ev.value} = $sum; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VectorNormSq =
    copy(child = newChild)
}

/** Optimizer rule: `vec_dot(x, x)` → `vec_norm_sq(x)` when both sides
  * are the same deterministic expression. The §7.3 escalation ladder's
  * next rung after a custom Expression: a `Rule[LogicalPlan]` injected
  * through `SparkSessionExtensions` (see [[graft.GraftExtensions]]),
  * exactly how Catalyst's own peephole rewrites work. */
object RewriteSelfDot extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case VectorDot(a, b) if a.deterministic && a.semanticEquals(b) =>
        VectorNormSq(a)
    }
}
