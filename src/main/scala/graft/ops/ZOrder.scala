package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for the write path: interleave the bits
  * of several columns into one sort key so that range-partitioning + sorting
  * by that key co-locates rows that are close in EVERY clustered dimension,
  * not just the leading one of a lexicographic sort.
  *
  * Why this matters at 100 TB: parquet scan pruning works off per-file and
  * per-row-group min/max statistics. A table sorted by `a` prunes filters on
  * `a` perfectly and filters on `b` not at all; a z-ordered layout over
  * (a, b) gives every file a tight min/max envelope on BOTH columns, so
  * selective filters on either (or both) skip most of the data. This is the
  * standard layout technique of large lakehouse tables (cf. the reference's
  * single-node engine, which needs no layout step because every query scans
  * a local file: batch_framework has no counterpart — this is a
  * Spark-at-scale component).
  *
  * The interleave itself is pure integer arithmetic over Spark's codegen'd
  * bitwise builtins — no UDF, stays inside whole-stage codegen.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of each column: column `j`
    * contributes its bit `i` at output position `i * n + j` (column 0 owns
    * the lowest bit). Inputs must already be non-negative and < 2^bits —
    * see [[scaled]] for normalizing arbitrary longs. Total width must fit a
    * signed long: `bits * cols.size <= 63`. */
  def zkey(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zkey needs at least one column")
    require(bits > 0 && bits * cols.size <= 63,
      s"zkey: $bits bits x ${cols.size} cols exceeds a signed long")
    val n = cols.size
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Scale a long column from `[min, max]` into `[0, 2^bits)` (equal-width
    * buckets). The double detour is safe: bucket indexes are small, only the
    * RATIO needs precision, and a one-ulp bucket wobble moves a row one cell
    * along the curve — locality, not correctness. */
  def scaled(c: Column, min: Long, max: Long, bits: Int): Column = {
    val buckets = 1L << bits
    // subtract in double space: (max - min) overflows a long when the two
    // ends straddle more than half the long range (e.g. min = Long.MinValue)
    val range = math.max(1.0, max.toDouble - min.toDouble + 1.0)
    least(lit(buckets - 1),
      floor((c.cast("long") - lit(min)).cast("double") / lit(range) * lit(buckets.toDouble)).cast("long"))
  }

  /** Equi-DEPTH scaling for skewed columns: bucket boundaries from one
    * sample-based `approxQuantile` pass (all columns at once), bucket index
    * = count of boundaries at or below the value. [[scaled]] gives
    * equal-WIDTH cells — on a power-law column (view counts, node degrees,
    * file sizes) that collapses ~all rows into cell 0 and the curve
    * degenerates to a plain sort on the other dimension; equal-population
    * cells keep every clustered dimension informative regardless of
    * distribution. The per-row cost is one pass over the 2^bits−1 boundary
    * array (a codegen'd HOF) — keep `bits` modest (default 8 = 255
    * comparisons/row). */
  def quantileScaled(df: DataFrame, cols: Seq[String], bits: Int,
                     relErr: Double = 0.001): Seq[Column] = {
    val buckets = 1 << bits
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bnds = df.stat.approxQuantile(cols.toArray, probs, relErr)
    cols.zip(bnds).map { case (c, b) =>
      size(filter(typedlit(b.toSeq), x => x <= col(c).cast("double"))).cast("long")
    }
  }

  /** Write `df` to `path` z-order-clustered on `cols`: one statistics job
    * (per-column min/max), then scale + interleave + `repartitionByRange` on
    * the z-key + an in-partition sort, so each output file covers one
    * contiguous stretch of the curve — a tight min/max envelope on every
    * clustered column.
    *
    * Scale notes: the stats pass is a single map-combinable agg; the layout
    * pass is ONE range shuffle (same cost as any global sort-write). Skewed
    * value distributions degrade bucket balance, not correctness —
    * `repartitionByRange` samples the z-key, so file sizes stay even. */
  def clusteredWrite(df: DataFrame, cols: Seq[String], path: String,
                     numFiles: Int, bits: Int = 12): Unit = {
    val zc = "__zorder"
    require(!df.columns.contains(zc), s"column name '$zc' is reserved")
    val stats = df.agg(
      cols.flatMap(c => Seq(min(col(c)).cast("long"), max(col(c)).cast("long"))).head,
      cols.flatMap(c => Seq(min(col(c)).cast("long"), max(col(c)).cast("long"))).tail: _*
    ).collect()(0)
    // min/max are null when df is empty or a clustered column is all-NULL —
    // there is no meaningful curve to lay out, but the write itself is still
    // well-defined: fall back to a plain (unclustered) write
    if ((0 until 2 * cols.length).exists(stats.isNullAt)) {
      df.write.mode("overwrite").parquet(path)
    } else {
      val scaledCols = cols.zipWithIndex.map { case (c, j) =>
        scaled(col(c), stats.getLong(2 * j), stats.getLong(2 * j + 1), bits)
      }
      df.withColumn(zc, zkey(scaledCols, bits))
        .repartitionByRange(numFiles, col(zc))
        .sortWithinPartitions(zc)
        .drop(zc)
        .write.mode("overwrite").parquet(path)
    }
  }

  /** [[clusteredWrite]] with equi-depth ([[quantileScaled]]) cells — the
    * variant to use when a clustered column is heavy-tailed. Same layout
    * machinery: one stats pass, one range shuffle. */
  def clusteredWriteEquiDepth(df: DataFrame, cols: Seq[String], path: String,
                              numFiles: Int, bits: Int = 8): Unit = {
    val zc = "__zorder"
    require(!df.columns.contains(zc), s"column name '$zc' is reserved")
    df.withColumn(zc, zkey(quantileScaled(df, cols, bits), bits))
      .repartitionByRange(numFiles, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
      .write.mode("overwrite").parquet(path)
  }
}
