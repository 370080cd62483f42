package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** EWMA left-fold kernel (a14 hot path; guide §1.2 step 2 / §4 "no
  * interpreted expressions in the hot path").
  *
  * Replaces `aggregate(slice(arr, 2, lookback), arr[0],
  * (acc, x) -> acc * (1-α) + x * α)` — catalyst higher-order functions are
  * CodegenFallback, so that fold ran INTERPRETED per window frame (per
  * row), allocating a lambda evaluation per element. This kernel runs the
  * IDENTICAL IEEE-754 sequence — same seed, same element order, same
  * `acc * (1-α) + x * α` two-op update with the same pre-computed
  * `1-α` constant — inside whole-stage codegen: bit-for-bit the same
  * doubles, ~zero allocation.
  */
object EwmaFold {
  /** Mirrors `aggregate(slice(arr, 2, lookback), arr[0], fold)` exactly:
    * seed = arr[0], fold over elements 2..min(n, 1+lookback) (1-based),
    * i.e. indices 1 until min(n, lookback+1).
    */
  def fold(arr: ArrayData, alpha: Double, oneMinusAlpha: Double, lookback: Int): Double = {
    val n = arr.numElements()
    var acc = arr.getDouble(0)
    val end = math.min(n, lookback + 1)
    var i = 1
    while (i < end) {
      acc = acc * oneMinusAlpha + arr.getDouble(i) * alpha
      i += 1
    }
    acc
  }

  def ewmaFold(arr: Column, alpha: Double, lookback: Int): Column =
    ColumnBridge.column(EwmaFoldExpr(ColumnBridge.expression(arr), alpha, lookback))
}

/** `ewma_fold(array<double>, α, lookback)`: see [[EwmaFold.fold]]. NULL on
  * NULL input; input arrays are non-empty, null-element-free by
  * construction (collect_list over a frame that always contains the
  * current row, fed by a `v IS NOT NULL` filter).
  */
case class EwmaFoldExpr(child: Expression, alpha: Double, lookback: Int)
    extends UnaryExpression {
  require(alpha > 0.0 && alpha <= 1.0, s"ewma_fold: alpha must be in (0, 1], got $alpha")
  require(lookback >= 1, s"ewma_fold: lookback must be >= 1, got $lookback")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got $other")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ewma_fold"

  // the SAME pre-computed constant in eval and codegen: `1-α` is rounded
  // once here, exactly like the `lit(1.0 - alpha)` it replaces
  private val oneMinusAlpha: Double = 1.0 - alpha

  override def nullSafeEval(a: Any): Any =
    EwmaFold.fold(a.asInstanceOf[ArrayData], alpha, oneMinusAlpha, lookback)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.EwmaFold.fold($a, ${alpha}D, ${oneMinusAlpha}D, $lookback)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
