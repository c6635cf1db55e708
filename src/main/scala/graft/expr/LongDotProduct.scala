package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Integer dot product of two `array<bigint>` columns as a native Catalyst
  * expression — the hot kernel of every ANN scoring join.
  *
  * The SQL formulation (`aggregate(zip_with(a, b, (x, y) -> x * y), 0L,
  * (acc, v) -> acc + v)`) is a higher-order-function tree: HOFs do not
  * support whole-stage codegen, so every candidate pair pays interpreted
  * lambda evaluation plus an intermediate product array. This expression
  * compiles to a direct static-kernel call inside the surrounding stage's
  * generated code — one tight primitive loop over the unsafe array data, no
  * allocation — and `nullSafeEval` keeps the interpreted fallback correct.
  *
  * Semantics match the HOF version for the engine's vectors (equal-length,
  * non-null elements, exact integer arithmetic — order-independent, so the
  * value is bit-identical and oracle determinism is unaffected). Lengths are
  * clamped to the shorter input defensively.
  */
case class LongDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"qdot_long requires (array<bigint>, array<bigint>), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = LongType
  override def prettyName: String = "qdot_long"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    LongDotProduct.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.LongDotProduct.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LongDotProduct {

  /** Column wrapper. Resolves through the session function registry, so the
    * session must install [[graft.GraftExtensions]] (all engine entry points do). */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("qdot_long", a, b)

  /** Called from generated code — keep the (ArrayData, ArrayData) => long
    * signature. Elements must be non-null (quantized vectors are). */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }
}
