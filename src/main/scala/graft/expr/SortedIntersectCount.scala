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
  * Inputs MUST be sorted ascending with distinct elements (the
  * adjacency-list contract); duplicate elements would each count once per
  * matching pair rank, and unsorted input undercounts — the caller owns the
  * invariant, mirroring `array_sort` preconditions elsewhere. Null elements
  * are tolerated and never match (skipped by the merge).
  *
  * NULL-semantics divergence from the built-in: `array_intersect` treats a
  * NULL present in BOTH arrays as a common element (one NULL appears in its
  * result), so `size(array_intersect(a, b))` counts it where this expression
  * does not. On null-bearing arrays the two are off by one — this is NOT a
  * drop-in replacement there; it is deliberate (an id list's null carries no
  * identity) and pinned by SortedIntersectCountSpec.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  // Nullable elements are ACCEPTED and skipped by count(): the r13 analysis-
  // time rejection of containsNull = true broke every source that reports
  // nullable elements without ever holding a null (parquet written by other
  // engines, CAST to array<bigint>, split/transform results). A null element
  // never intersects anything (SQL: null = x is never true), so skipping is
  // the only consistent semantics, and sorted inputs keep their non-null run
  // sorted whether the sort put nulls first or last.
  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count requires (array<bigint>, array<bigint>), " +
        s"got (${left.dataType}, ${right.dataType})")

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
    * signature. Null elements never match and are skipped. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val x = a.getLong(i)
        val y = b.getLong(j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    }
    c
  }
}
