package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: each left row picks up the value columns of the LATEST right
  * row with `right.ts <= left.ts` within the same key — the canonical
  * time-series enrichment operator (market data, feature stores, session
  * attribution) that Spark has no native operator for.
  *
  * Implementation is a UNION-WINDOW, not a join: tag both sides, union them,
  * and carry each right value forward with `last(_, ignoreNulls) OVER
  * (PARTITION BY keys ORDER BY ts, side ROWS UNBOUNDED PRECEDING..CURRENT)`,
  * then keep only left rows. Right rows sort BEFORE left rows at the same
  * timestamp (side 0 < 1), so `ts <= ts` matches inclusively.
  *
  * Scale shape: ONE shuffle on the key columns and a linear window scan —
  * no range-condition join, which Spark would plan as a broadcast-nested-
  * loop (quadratic per key) or reject outright. Skewed keys cost what the
  * window sort costs; there is no candidate-pair blowup by construction.
  *
  * Determinism contract: if the right side can hold several rows with the
  * same (keys, ts), the caller must pre-aggregate them (e.g. keep max value)
  * — `last()` among equal sort keys would otherwise be partition-order
  * dependent. Left rows with no prior right row get nulls (left semantics).
  */
object AsofJoin {

  /** @param left     rows to enrich (all columns preserved)
    * @param right    timestamped source of `valCols`
    * @param keys     equi-join key columns (present on both sides)
    * @param tsCol    timestamp column name (present on both sides, orderable)
    * @param valCols  right columns to carry onto each left row */
  def asofLeft(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, valCols: Seq[String]): DataFrame = {
    val leftOnly = left.columns.filterNot(c => keys.contains(c) || c == tsCol)
    require(leftOnly.intersect(valCols).isEmpty,
      s"left already has columns ${leftOnly.intersect(valCols).mkString(", ")}")

    val lSide = left.select(
      (keys :+ tsCol).map(col) ++
        leftOnly.map(col) ++
        valCols.map(v => lit(null).cast(right.schema(v).dataType).as(v)) :+
        lit(1).as("__side"): _*)
    val rSide = right.select(
      (keys :+ tsCol).map(col) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valCols.map(col) :+
        lit(0).as("__side"): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried: Seq[Column] = valCols.map(v => last(col(v), ignoreNulls = true).over(w).as(v))

    lSide.unionByName(rSide)
      .select((keys :+ tsCol).map(col) ++ leftOnly.map(col) ++ carried :+ col("__side"): _*)
      .filter(col("__side") === 1)
      .drop("__side")
      // restore the caller's column order: left columns first, then values
      .select(left.columns.map(col) ++ valCols.map(col): _*)
  }
}
