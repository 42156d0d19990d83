package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: Morton (Z-order) bit interleave of two
  * long columns' low 16 bits — `z = x15 y15 x14 y14 … x0 y0` (x at the
  * odd/high positions).
  *
  * The multi-dimensional clustering key behind Delta/Iceberg OPTIMIZE
  * ZORDER: sorting by z keeps rows close in BOTH dimensions close on
  * disk, so per-file min/max stats prune boxes in either dimension —
  * where a linear (x-major) sort clusters only x. Used by q58, whose
  * layout comparison quantifies exactly that.
  *
  * §7.3 escalation rationale: the built-in formulation is 32 shift/mask
  * terms per row (or a HOF fold with boxed lambda variables); this
  * compiles to one static call of the branchless shift-OR ladder inside
  * whole-stage codegen. Interpreted eval and codegen share
  * [[ZInterleave.interleave16]], so both paths are bit-identical.
  */
case class ZInterleave(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"z_interleave requires two bigint inputs, got $l and $r")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "z_interleave"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZInterleave.interleave16(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZInterleave.interleave16($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZInterleave =
    copy(left = newLeft, right = newRight)
}

object ZInterleave {
  /** Spread the low 16 bits of v to the even positions of a 32-bit
    * word (the classic parallel-prefix "Part1By1" bit trick). */
  @inline def part1by1(v: Long): Long = {
    var x = v & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** z with x's bits at the odd (higher) positions. */
  def interleave16(x: Long, y: Long): Long =
    (part1by1(x) << 1) | part1by1(y)

  /** Column-API entry point. */
  def zInterleave(a: Column, b: Column): Column =
    CatalystBridge.column(ZInterleave(
      CatalystBridge.expression(a), CatalystBridge.expression(b)))
}
