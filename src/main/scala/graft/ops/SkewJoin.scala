package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the explicit hot-key defense this engine's docs point
  * at wherever a key's row count is unbounded (ER blocking caps, LSH bucket
  * caps, the range join's cost model). AQE's skew-join splitting handles
  * moderate skew at runtime; salting is the static, guaranteed version for
  * keys known to be pathological (a null-ish default key, a bot user, a
  * stop-token): the hot key's rows spread over `salt` sub-keys instead of
  * one task.
  *
  * Mechanics: every left row gets a deterministic salt in [0, salt) hashed
  * from `saltBy`; the right side replicates `salt`× (one copy per salt
  * value) and the join key becomes (keys..., __salt). Row-for-row the
  * result equals the plain equi-join — each left row meets exactly the one
  * right copy carrying its salt. Cost: right side scales by `salt`, so use
  * it when the right side is the small/dimension side (the usual hot-key
  * join shape: big skewed facts × modest dimension).
  */
object SkewJoin {

  /** @param left     the large, skewed side (salted, never replicated)
    * @param right    the smaller side (replicated `salt`×)
    * @param keys     equi-join key columns present on both sides
    * @param saltBy   left-side expression whose hash spreads the hot key's
    *                 rows — pick something with per-row variety (an id
    *                 column); a constant would put the hot key back in one
    *                 task
    * @param salt     sub-keys per key (the hot key's parallelism)
    * @param joinType "inner" or "left" (left-outer keeps unmatched left
    *                 rows, exactly as the plain join would) */
  def salted(left: DataFrame, right: DataFrame, keys: Seq[String],
             saltBy: Column, salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"joinType must be inner or left, got $joinType")
    val clash = (left.columns ++ right.columns).distinct.filter(_ == "__salt")
    require(clash.isEmpty, "inputs must not contain the reserved working column __salt")

    val l = left.withColumn("__salt", pmod(xxhash64(saltBy), lit(salt.toLong)))
    val r = right.select(col("*"),
      explode(sequence(lit(0L), lit(salt.toLong - 1L))).as("__salt"))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }
}
