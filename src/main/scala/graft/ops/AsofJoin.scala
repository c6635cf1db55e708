package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join: each left row picks up the value columns of the LATEST right
  * row with `right.ts <= left.ts` within the same key — the canonical
  * time-series enrichment operator (market data, feature stores, session
  * attribution) that Spark has no native operator for.
  *
  * Implementation is a UNION-WINDOW, not a join: tag both sides, union them,
  * and carry the matched right row forward with `last(_, ignoreNulls) OVER
  * (PARTITION BY keys ORDER BY ts, side ROWS UNBOUNDED PRECEDING..CURRENT)`,
  * then keep only left rows. Right rows sort BEFORE left rows at the same
  * timestamp (side 0 < 1), so `ts <= ts` matches inclusively.
  *
  * All value columns ride ONE struct through the window, so they always come
  * from the SAME matched right row, and a legitimate NULL in a value column
  * of the matched row stays NULL on the output (true ASOF semantics — a
  * per-column `last(ignoreNulls)` would instead skip back to an older
  * non-null value and could mix columns from different right rows).
  *
  * Scale shape: ONE shuffle on the key columns and a linear window scan —
  * no range-condition join, which Spark would plan as a broadcast-nested-
  * loop (quadratic per key) or reject outright. Skewed keys cost what the
  * window sort costs; there is no candidate-pair blowup by construction.
  *
  * Determinism contract: if the right side can hold several rows with the
  * same (keys, ts), pass `tieBreak` (a right-side column) — the row with the
  * LARGEST tie-break value wins (max-by), deterministic whenever
  * (keys, ts, tieBreak) is unique. Without it, the caller must pre-aggregate
  * equal-timestamp right rows. Left rows with no prior right row get nulls
  * (left semantics).
  */
object AsofJoin {

  private val SideCol = "__side"
  private val ValsCol = "__asof_vals"
  private val TieCol = "__asof_tie"

  /** @param left     rows to enrich (all columns preserved)
    * @param right    timestamped source of `valCols`
    * @param keys     equi-join key columns (present on both sides)
    * @param tsCol    timestamp column name (present on both sides, orderable)
    * @param valCols  right columns to carry onto each left row
    * @param tieBreak optional right-side expression ordering rows that tie on
    *                 (keys, ts): the row with the max value wins
    * @param forward  false (default): match the LATEST right row with
    *                 `right.ts <= left.ts` (backward as-of). true: match the
    *                 EARLIEST right row with `right.ts >= left.ts` (forward
    *                 as-of — next-event enrichment). Same plan, the window
    *                 just scans time in the other direction; both are
    *                 inclusive at equality. */
  def asofLeft(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, valCols: Seq[String],
               tieBreak: Option[Column] = None,
               forward: Boolean = false): DataFrame = {
    val leftOnly = left.columns.filterNot(c => keys.contains(c) || c == tsCol)
    require(leftOnly.intersect(valCols).isEmpty,
      s"left already has columns ${leftOnly.intersect(valCols).mkString(", ")}")
    val reserved = Seq(SideCol, ValsCol, TieCol)
    val clash = (left.columns ++ right.columns).distinct.intersect(reserved)
    require(clash.isEmpty,
      s"inputs must not contain reserved working columns: ${clash.mkString(", ")}")

    val valsType = StructType(valCols.map(v => right.schema(v)))
    val tieType = tieBreak.map(tb => right.select(tb).schema.head.dataType)
      .getOrElse(org.apache.spark.sql.types.LongType)
    val lSide = left.select(
      (keys :+ tsCol).map(col) ++
        leftOnly.map(col) :+
        lit(null).cast(valsType).as(ValsCol) :+
        lit(null).cast(tieType).as(TieCol) :+
        lit(1).as(SideCol): _*)
    val rSide = right.select(
      (keys :+ tsCol).map(col) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(valCols.map(col): _*).as(ValsCol) :+
        tieBreak.getOrElse(lit(null).cast(tieType)).as(TieCol) :+
        lit(0).as(SideCol): _*)

    // __tie orders only right rows that share (keys, ts) — sides never tie
    // with each other because __side differs; asc + last() = max-by wins.
    // Forward mode scans time descending, so "last preceding" becomes
    // "nearest following"; __side stays asc so right rows still sort before
    // left rows at equal ts (inclusive match either way).
    val tsOrder = if (forward) col(tsCol).desc else col(tsCol).asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col(SideCol).asc, col(TieCol).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lSide.unionByName(rSide)
      .withColumn(ValsCol, last(col(ValsCol), ignoreNulls = true).over(w))
      .filter(col(SideCol) === 1)
      // restore the caller's column order: left columns first, then values
      .select(left.columns.map(col) ++
        valCols.map(v => col(ValsCol).getField(v).as(v)): _*)
  }
}
