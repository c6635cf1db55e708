package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** |a ∩ b| of two SORTED `array<bigint>` columns as a native Catalyst
  * expression — the per-edge kernel of the edge-iterator triangle count
  * ([[graft.graph.Analytics.triangleCount]]) and of any set-overlap scoring
  * over pre-sorted id lists (shingle overlap, posting-list intersection).
  *
  * The built-in `size(array_intersect(a, b))` allocates an OpenHashSet AND
  * a result array per row — pure overhead when only the cardinality is
  * needed and both inputs are already sorted (ours come from
  * `sort_array(collect_list(..))`). This compiles to a two-pointer merge
  * inside the surrounding stage's generated code: no allocation, no
  * hashing, O(|a| + |b|).
  *
  * Inputs MUST be sorted ascending with distinct non-null elements (the
  * adjacency-list contract); duplicate elements would each count once per
  * matching pair rank, and unsorted input undercounts — the caller owns the
  * invariant, mirroring `array_sort` preconditions elsewhere.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  // containsNull must be FALSE: count() reads elements with getLong unguarded,
  // so a nullable-element array would silently miscount through the public SQL
  // surface — reject it at analysis time (internal callers all build arrays
  // from collect_list/typedLit, which are containsNull = false)
  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, false) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count requires (array<bigint>, array<bigint>) with non-null " +
        s"elements, got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    SortedIntersectCount.count(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.SortedIntersectCount.count($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** Column wrapper; resolves through the session function registry
    * ([[graft.GraftExtensions]] must be installed). */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("sorted_intersect_count", a, b)

  /** Called from generated code — keep the (ArrayData, ArrayData) => int
    * signature. Elements must be non-null. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}
