package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two `array<float>` columns.
  *
  * This is the §7.3 escalation path (SURVEY.md): built-ins first, and a
  * custom `Expression` with `doGenCode` only where the built-in
  * formulation leaves real performance behind. The higher-order-function
  * dot product (`aggregate(zip_with(...))`) is a CodegenFallback chain —
  * every element hop walks an interpreted expression tree with boxed
  * lambda variables. This expression compiles to a tight primitive loop
  * inside whole-stage codegen: no boxing, no virtual calls, no
  * per-element tree walks.
  *
  * Semantics match the library's HOF formulation exactly: each float is
  * widened to double, products accumulate left-to-right in a double —
  * so results are bit-identical to the `cast(x as double)` HOF path and
  * to the DuckDB oracle. A null element yields a null result (the HOF
  * `aggregate` null-propagates the same way); length mismatch takes the
  * shorter prefix.
  */
case class VectorDot(left: Expression, right: Expression)
  extends BinaryExpression {

  // Nullable even over non-null inputs: a null *element* nulls the sum.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"vec_dot requires two array<float> inputs, got $l and $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      sum += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    sum
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $sum += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |if (!${ev.isNull}) { ${ev.value} = $sum; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points for the native vector expressions. */
object VectorFunctions {
  /** Codegen'd float-vector dot product (see [[VectorDot]]). */
  def vecDot(a: Column, b: Column): Column =
    CatalystBridge.column(VectorDot(
      CatalystBridge.expression(a), CatalystBridge.expression(b)))

  /** Make `vec_dot` callable from SQL text on an existing session (for
    * session-build-time wiring use `graft.GraftExtensions`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    CatalystBridge.registerFunction(spark, "vec_dot", { children =>
      require(children.length == 2,
        s"vec_dot requires exactly 2 arguments, got ${children.length}")
      VectorDot(children(0), children(1))
    })
}
