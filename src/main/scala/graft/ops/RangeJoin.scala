package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: points matched to the `[start, end]`
  * intervals containing them — sensor readings to maintenance windows,
  * clicks to attribution windows, positions to genomic regions. Spark plans
  * a raw `p BETWEEN start AND end` join condition as a broadcast-nested-loop
  * (every point × every range), so the scale path BUCKETIZES: each interval
  * explodes into the fixed-width bins it covers, points hash to their single
  * bin, and the join becomes an equi-join on (keys, bin) with an exact
  * containment post-filter. A (point, interval) pair meets in exactly ONE
  * bin — the point's — so no dedup step exists.
  *
  * Cost model: interval expansion is ceil(len / binWidth) + 1 rows per
  * interval; candidate volume per bin is |points in bin| × |intervals
  * overlapping bin|. Pick `binWidth` near the typical interval length —
  * much smaller multiplies the expansion, much larger multiplies false
  * candidates. Both failure modes degrade linearly, not quadratically.
  *
  * Inverted intervals (start > end) match nothing, like SQL BETWEEN. */
object RangeJoin {

  /** Sign-correct floor division. `c - pmod(c, w)` is an exact multiple of
    * `w`, so the quotient is exact — but Spark's `/` on integers is DOUBLE
    * division, which mis-bins beyond 2^53 (nanosecond timestamps live
    * there); the decimal detour keeps every step exact at any long. */
  private def floorDiv(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))).cast("decimal(38,0)") / lit(w)).cast("long")

  /** @param points   point rows (all columns preserved)
    * @param ranges   interval rows (all columns preserved); column names must
    *                 not collide with `points` outside of `keys`
    * @param keys     additional equi-join key columns on both sides
    * @param ptCol    point column (integral)
    * @param startCol,endCol inclusive interval bounds on `ranges`
    * @param binWidth bucket width in point units
    * @param maxBins  per-interval expansion cap: an interval spanning more
    *                 bins than this fails with a domain error instead of an
    *                 opaque array-size blowup — an open-ended sentinel end
    *                 (e.g. Long.MaxValue) would otherwise explode billions of
    *                 rows; pick a binWidth near the real interval length
    *                 (see the cost model above) or raise the cap knowingly */
  def pointInRange(points: DataFrame, ranges: DataFrame, keys: Seq[String],
                   ptCol: String, startCol: String, endCol: String,
                   binWidth: Long, maxBins: Long = 1000000L): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(maxBins > 0, s"maxBins must be positive, got $maxBins")
    val overlap = points.columns.toSet.intersect(ranges.columns.toSet) -- keys
    require(overlap.isEmpty, s"column collision outside keys: ${overlap.mkString(", ")}")
    val clash = (points.columns ++ ranges.columns).distinct.filter(_ == "__bin")
    require(clash.isEmpty, "inputs must not contain the reserved working column __bin")

    val p = points.withColumn("__bin", floorDiv(col(ptCol), binWidth).cast("long"))
    val binStart = floorDiv(col(startCol), binWidth).cast("long")
    val binEnd = floorDiv(col(endCol), binWidth).cast("long")
    // span compared in doubles: a long subtraction wraps negative past 2^63
    // (open sentinel bounds) and would skip the guard; double precision at
    // that magnitude is ±ulp — irrelevant against a ~1e6 cap
    val guarded = when(binEnd.cast("double") - binStart.cast("double") >= lit(maxBins.toDouble),
      raise_error(concat(
        lit(s"RangeJoin: interval spans more than $maxBins bins of width $binWidth ["),
        col(startCol).cast("string"), lit(", "), col(endCol).cast("string"),
        lit("] — widen binWidth or raise maxBins"))).cast("long"))
      .otherwise(binEnd)
    val r = ranges.filter(col(startCol) <= col(endCol))
      .withColumn("__bin", explode(sequence(binStart, guarded)))
    p.join(r, keys :+ "__bin")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bin")
  }
}
