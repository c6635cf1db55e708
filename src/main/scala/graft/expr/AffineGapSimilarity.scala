package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Affine-gap string similarity as a native Catalyst expression.
  *
  * The reference's pair scorer uses dedupe's affine-gap string distance as its
  * core comparator (reference: examples/graph/resolution/mapper/messy.py:368 —
  * `data_model.distances`, which dedupe computes with its affinegap C module).
  * Plain Levenshtein (Spark built-in) charges every gap character equally;
  * affine alignment charges opening a gap more than extending it, which is what
  * makes "numpy" vs "numpy >= 1.2, <2" score as the same entity.
  *
  * Implemented as a `BinaryExpression` with `doGenCode` (not a Scala UDF): the
  * generated code calls the static kernel directly inside whole-stage codegen —
  * no encoder round-trip, null handling folded into the surrounding stage.
  *
  * Scoring: Gotoh O(n·m) dynamic programming with match +1, mismatch -0.5,
  * gap open -0.5, gap extend -0.125, normalized to [0, 1] by the SHORTER
  * input's length — so a qualifier suffix ("numpy" vs "numpy >= 1.2") stays a
  * strong match while substitutions degrade quickly.
  */
case class AffineGapSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"affine_gap_sim requires (string, string), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "affine_gap_sim"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    AffineGapSimilarity.similarity(
      l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expr.AffineGapSimilarity.similarity($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object AffineGapSimilarity {

  private val MatchScore = 1.0
  private val MismatchScore = -0.5
  private val GapOpen = -0.5
  private val GapExtend = -0.125

  /** Column wrapper. Resolves through the session function registry, so the
    * session must install [[graft.GraftExtensions]] (all engine entry points do). */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("affine_gap_sim", a, b)

  /** Gotoh affine-gap alignment, normalized to [0,1]. Called from generated
    * code — keep the signature (String, String) => double. */
  def similarity(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val n = a.length
    val m = b.length
    val NegInf = Double.NegativeInfinity
    // rolling rows: M = align, X = gap in b (consume a), Y = gap in a (consume b)
    var prevM = new Array[Double](m + 1)
    var prevX = new Array[Double](m + 1)
    var prevY = new Array[Double](m + 1)
    var curM = new Array[Double](m + 1)
    var curX = new Array[Double](m + 1)
    var curY = new Array[Double](m + 1)
    prevM(0) = 0.0
    prevX(0) = NegInf
    prevY(0) = NegInf
    var j = 1
    while (j <= m) {
      prevM(j) = NegInf
      prevX(j) = NegInf
      prevY(j) = GapOpen + GapExtend * (j - 1)
      j += 1
    }
    var i = 1
    while (i <= n) {
      curM(0) = NegInf
      curX(0) = GapOpen + GapExtend * (i - 1)
      curY(0) = NegInf
      j = 1
      while (j <= m) {
        val s = if (a.charAt(i - 1) == b.charAt(j - 1)) MatchScore else MismatchScore
        val bestPrev = math.max(prevM(j - 1), math.max(prevX(j - 1), prevY(j - 1)))
        curM(j) = bestPrev + s
        curX(j) = math.max(prevM(j) + GapOpen, prevX(j) + GapExtend)
        curY(j) = math.max(curM(j - 1) + GapOpen, curY(j - 1) + GapExtend)
        j += 1
      }
      val tm = prevM; prevM = curM; curM = tm
      val tx = prevX; prevX = curX; curX = tx
      val ty = prevY; prevY = curY; curY = ty
      i += 1
    }
    val best = math.max(prevM(m), math.max(prevX(m), prevY(m)))
    // best <= min(n,m) * MatchScore, so this lands in [0, 1]
    math.max(0.0, best) / math.min(n, m)
  }
}
