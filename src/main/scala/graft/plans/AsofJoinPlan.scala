package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Ascending, Attribute, BindReferences, Descending, Expression,
  GenericInternalRow, JoinedRow, NamedExpression, RowOrdering, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.GraftSql

/** The as-of join as a WHOLE-OPERATOR Catalyst extension: a custom logical
  * node, a planner strategy, and a sort-merge physical operator — the
  * engine's demonstration of the full custom-plan tier, used when composing
  * built-in operators cannot express the execution shape we want.
  *
  * [[graft.ops.AsofJoin.asofLeft]] already gets as-of semantics from a
  * union-window (one shuffle over left+right combined, a window sort, a
  * struct carried through every row). This operator keeps the same contract
  * but executes the textbook merge instead: each side is hash-partitioned on
  * the keys and sorted by (keys, ts) — requirements DECLARED to the planner
  * via `requiredChildDistribution` / `requiredChildOrdering`, so
  * EnsureRequirements plans the exchanges and sorts and AQE still manages
  * them — then a single forward pass per partition pairs each left row with
  * the latest eligible right row, holding exactly ONE buffered match at a
  * time. Compared to the union-window: the window's full-row carry struct,
  * the unioned null-padding columns, and the window buffer all disappear;
  * right rows stream through instead of riding every left row.
  *
  * Semantics (identical to [[graft.ops.AsofJoin.asofLeft]], spec-enforced):
  * backward mode matches the LATEST right row with `right.ts <= left.ts`
  * per key, forward mode the EARLIEST with `right.ts >= left.ts`, both
  * inclusive; ties on (keys, ts) resolve to the LARGEST `tieBreak` value;
  * unmatched left rows keep nulls. NULL value columns of the matched row
  * stay NULL (row-consistent, true ASOF semantics).
  *
  * Scale: one shuffle per unsorted side, linear merge, O(1) state per
  * partition. AQE's skew-join splitting does not know this operator (it
  * targets SMJ/SHJ); for pathological key skew prefer the union-window
  * form or salt upstream.
  */
case class AsofJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightVals: Seq[NamedExpression],
    tieBreak: Option[Expression],
    forward: Boolean) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(_.toAttribute.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Column pruning THROUGH the custom node: Catalyst's ColumnPruning rule
  * only knows built-in operators, so without help a `select` above an
  * [[AsofJoinNode]] would leave the left scan reading every column. This
  * rule (registered by [[graft.GraftExtensions]] via `injectOptimizerRule`)
  * restores the cooperation: a Project above the node pushes a left-side
  * Project keeping only (referenced left columns + the node's own keys/ts
  * references), and drops carried value columns the Project never reads.
  * The right side needs no help — the builder pre-prunes it to
  * keys + ts + values. */
object AsofJoinPruning extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, a: AsofJoinNode) =>
      val needed = p.references ++ a.references
      val neededLeft = a.left.output.filter(needed.contains)
      val neededVals = a.rightVals.filter(v => p.references.contains(v.toAttribute))
      val pruneLeft = neededLeft.length < a.left.output.length
      val pruneVals = neededVals.length < a.rightVals.length
      if (pruneLeft || pruneVals) {
        val newLeft = if (pruneLeft) Project(neededLeft, a.left) else a.left
        p.copy(child = a.copy(left = newLeft, rightVals = neededVals))
      } else p
  }
}

/** Planner strategy mapping [[AsofJoinNode]] to [[AsofJoinExec]].
  * Registered by [[graft.GraftExtensions]] via `injectPlannerStrategy`. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lts, rts, vals, tie, fwd) =>
      AsofJoinExec(lk, rk, lts, rts, vals, tie, fwd, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join. Children arrive co-partitioned on the keys and
  * sorted by (keys, scan-ordered ts [, tieBreak asc]) — `scan order` is ts
  * ascending for backward as-of, descending for forward, so in BOTH modes
  * the merge walks eligible right rows first and the last one consumed is
  * the match (latest-at-or-before, or earliest-at-or-after with max
  * tie-break, exactly as the union-window orders them). */
case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightVals: Seq[NamedExpression],
    tieBreak: Option[Expression],
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(_.toAttribute.withNullability(true))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def tsDirection = if (forward) Descending else Ascending

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, tsDirection),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (SortOrder(rightTs, tsDirection) +:
        tieBreak.map(SortOrder(_, Ascending)).toSeq))

  // rows stream out in left-child order, one partition to one partition
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val outRows = longMetric("numOutputRows")
    val matched = longMetric("numMatched")
    val fwd = forward
    val nValCols = rightVals.length
    // capture what closures need; SparkPlan itself must not be serialized
    val (lOut, rOut) = (left.output, right.output)
    val (lKeyExprs, rKeyExprs) = (leftKeys, rightKeys)
    val (lTsExpr, rTsExpr) = (leftTs, rightTs)
    val valExprs = rightVals
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val valProj = UnsafeProjection.create(valExprs, rOut)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val lTsBound = BindReferences.bindReference(lTsExpr, lOut)
      val rTsBound = BindReferences.bindReference(rTsExpr, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = TypeUtils.getInterpretedOrdering(tsType)
      // position of a ts value in the child sort: backward sorts asc
      // NullsFirst, forward desc NullsLast — in scan order a null is
      // smallest backward and greatest forward. A right row is eligible
      // iff its ts does not come after the left row's in scan order
      // (covers rts <= lts backward / rts >= lts forward, inclusive).
      def scanCmp(a: Any, b: Any): Int =
        if (a == null && b == null) 0
        else if (a == null) { if (fwd) 1 else -1 }
        else if (b == null) { if (fwd) -1 else 1 }
        else { val c = tsOrd.compare(a, b); if (fwd) -c else c }

      val rBuf = rIter.buffered
      val nullVals = new GenericInternalRow(nValCols)
      val joined = new JoinedRow
      var matchKey: UnsafeRow = null
      var matchVals: UnsafeRow = null
      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTs = lTsBound.eval(lRow)
        var scanning = true
        while (scanning && rBuf.hasNext) {
          val rRow = rBuf.head
          val kc = keyOrd.compare(rKeyProj(rRow), lKey)
          if (kc < 0) { rBuf.next(); () } // right side behind on key: discard
          else if (kc == 0 && scanCmp(rTsBound.eval(rRow), lTs) <= 0) {
            // eligible: remember it and keep scanning — the LAST eligible
            // row in scan order is the as-of match (ties resolved by the
            // tieBreak component of the child ordering)
            matchKey = rKeyProj(rRow).copy()
            matchVals = valProj(rRow).copy()
            rBuf.next(); ()
          } else scanning = false // right row is for a later key or later ts
        }
        val vals =
          if (matchKey != null && keyOrd.compare(matchKey, lKey) == 0) {
            matched += 1; matchVals
          } else nullVals
        outRows += 1
        resultProj(joined(lRow, vals))
      }
    }
  }
}

object AsofJoinExec {

  /** DataFrame API over the native operator — same contract and argument
    * shape as [[graft.ops.AsofJoin.asofLeft]] (tieBreak is a right-side
    * COLUMN NAME here; it also joins the carried value columns).
    *
    * The right side is pruned and re-aliased before the node is built:
    * pruning keeps column pruning working below a node the optimizer does
    * not know (the scan reads only keys + ts + values), and the aliases
    * mint fresh attribute ids so self-as-of (left and right derived from
    * the same plan) never produces ambiguous references. */
  def asofLeft(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, valCols: Seq[String],
               tieBreak: Option[String] = None,
               forward: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "asof exec needs at least one key column")
    require(valCols.nonEmpty, "asof exec needs at least one value column")
    val leftOnly = left.columns.filterNot(c => keys.contains(c) || c == tsCol)
    require(leftOnly.intersect(valCols).isEmpty,
      s"left already has columns ${leftOnly.intersect(valCols).mkString(", ")}")

    val rCols = (keys ++ Seq(tsCol) ++ valCols ++ tieBreak.toSeq).distinct
    val rightPruned = right.select(rCols.map(c => col(c).as(c)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rightPruned.queryExecution.analyzed

    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        sys.error(s"column $name not found among ${plan.output.map(_.name).mkString(", ")}"))

    val node = AsofJoinNode(
      left = lPlan, right = rPlan,
      leftKeys = keys.map(attr(lPlan, _)), rightKeys = keys.map(attr(rPlan, _)),
      leftTs = attr(lPlan, tsCol), rightTs = attr(rPlan, tsCol),
      rightVals = valCols.map(attr(rPlan, _)),
      tieBreak = tieBreak.map(attr(rPlan, _)),
      forward = forward)
    GraftSql.ofRows(left.sparkSession, node)
  }
}
