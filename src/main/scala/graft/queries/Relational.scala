package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.DistinctOn

/** Relational operator surface (SURVEY §2.3-2.8), one oracle-checked query per
  * operator family, all over the driver's TPC-H-ish testdata.
  *
  * Determinism rules for the DuckDB-oracle hash compare:
  *  - every aggregate/computed column is aliased identically on both sides;
  *  - double sums accumulate in DECIMAL(18,2) (exact) and cast back to DOUBLE,
  *    so Spark's and DuckDB's addition order cannot change the value;
  *  - any "arbitrary row per key" (DISTINCT ON) query projects keys only or uses
  *    an explicit total order (SURVEY §7.4).
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  /** Exact sum of a double column: decimal accumulation, double result. */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1: group-agg (TPC-H Q1 shape)
    "q_agg_pricing" -> ((s, dir) => {
      Tables.readSpread(s, dir, "lineitem", "l_orderkey")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("cnt"))
    }),

    // A1 variant: ROLLUP hierarchy (group + subtotal + grand total in one
    // pass — Spark expands the grouping sets inside a single aggregate)
    "q_agg_rollup" -> ((s, dir) => {
      Tables.readSpread(s, dir, "lineitem", "l_orderkey")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
    }),

    // A1 variant: CUBE — every grouping-set combination in one aggregate
    "q_agg_cube" -> ((s, dir) => {
      Tables.readSpread(s, dir, "lineitem", "l_orderkey")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
    }),

    // KMV distinct-count sketch (custom bounded-memory aggregate): per
    // priority, estimate distinct customers from the 64 smallest value
    // digests — deterministic given the hash, so even the ESTIMATE is
    // oracle-checked bit-exactly
    "q_distinct_sketch" -> ((s, dir) => {
      import graft.expr.KmvMinHashes
      Tables.readSpread(s, dir, "orders", "o_orderkey")
        .select(col("o_orderpriority"), col("o_custkey").cast("string").as("ck"))
        .groupBy("o_orderpriority")
        .agg(KmvMinHashes(col("ck"), 64).as("sketch"))
        .select(col("o_orderpriority"),
          KmvMinHashes.estimate(col("sketch"), 64).as("est_distinct"))
    }),

    // pivot with an explicit value list (one wide aggregate, no second pass
    // to discover values — the scale-correct pivot; open-ended pivot needs a
    // distinct scan first)
    "q_pivot" -> ((s, dir) => {
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority", prios)
        .agg(count(lit(1)))
        .na.fill(0L, prios)
    }),

    // A1 flagship shape: license-node extraction (reference examples/meta.py:102-119)
    // CTE count -> sentinel filters -> count>=2 gate
    "q_license_freq" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("license"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("license").isNotNull && col("license") =!= "" &&
          col("license") =!= "UNKNOWN" && col("cnt") >= 2)
    }),

    // A2: DISTINCT ON, keys-only projection (reference meta.py:60 etc.)
    "q_distinct_on" -> ((s, dir) => {
      DistinctOn.distinctOn(
        t(s, dir, "lineitem").select("l_returnflag", "l_linestatus"),
        Seq("l_returnflag", "l_linestatus"))
    }),

    // A3: best-row-per-key via ordered window (reference canon.py:160-164)
    "q_top1_per_group" -> ((s, dir) => {
      DistinctOn.distinctOnOrdered(
        t(s, dir, "orders"),
        keys = Seq(col("o_custkey")),
        order = Seq(col("o_totalprice").desc, col("o_orderkey").asc))
        .select("o_custkey", "o_orderkey", "o_totalprice")
    }),

    // A3 at scale: top-k rows per key via the bounded-heap TopK aggregate
    // (graft.expr.TopK) — shuffles groups x k partial states instead of
    // every row; the oracle is the row_number window formulation
    "q_topk_agg" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(graft.expr.TopK(
          struct(col("o_totalprice"), col("o_orderkey")), 3).as("top"))
        .select(col("o_custkey"), explode(col("top")).as("t"))
        .select(col("o_custkey"), col("t.o_orderkey"), col("t.o_totalprice"))
    }),

    // A1 variant: exact per-group quantiles (Spark's percentile is the
    // exact linear-interpolation estimator, same definition as DuckDB's
    // quantile_cont; both sides round to 6dp to absorb the engines'
    // algebraically-equal-but-ulp-different interpolation formulas)
    "q_group_quantiles" -> ((s, dir) => {
      Tables.readSpread(s, dir, "lineitem", "l_orderkey")
        .groupBy("l_returnflag")
        .agg(percentile(col("l_quantity"),
          array(lit(0.25), lit(0.5), lit(0.75), lit(0.95))).as("q"))
        .select(col("l_returnflag"),
          round(element_at(col("q"), 1), 6).as("q25"),
          round(element_at(col("q"), 2), 6).as("q50"),
          round(element_at(col("q"), 3), 6).as("q75"),
          round(element_at(col("q"), 4), 6).as("q95"))
    }),

    // J1: single-key LEFT join (reference group/meta.py:10-24)
    "q_join_left" -> ((s, dir) => {
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"), "left")
        .select("o_orderkey", "o_custkey", "c_name", "c_mktsegment")
    }),

    // J1: N-way chained LEFT joins (dimension chain; broadcast-able dims)
    "q_join_nway" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"), "left")
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"), "left")
        .select("c_custkey", "c_name", "n_name", "r_name")
    }),

    // J2: composite-key LEFT join (reference group/meta.py:40-55 from_id+to_id)
    "q_join_composite" -> ((s, dir) => {
      // Deliberate join strategy (guide §3.1): the merge hint keeps the
      // planner from broadcasting the ~|lineitem|-group aggregate — a giant
      // single-threaded hash-relation build here (measured 1.8s → 0.9s
      // warm at sf0.1), an impossible broadcast at 100 TB. The shared
      // repartition lets column pruning split the scan into two narrow
      // per-side exchanges (the optimizer prunes each branch separately,
      // so ReuseExchange doesn't fire — the pruned exchanges move fewer
      // bytes than one wide shared one would). Same relation, same values —
      // only the physical shape changes.
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .repartition(col("l_orderkey"), col("l_linenumber"))
      val agg = li.groupBy("l_orderkey", "l_linenumber")
        .agg(dsum(col("l_extendedprice")).as("max_price"))
      li.select("l_orderkey", "l_linenumber", "l_quantity")
        .join(agg.hint("merge"), Seq("l_orderkey", "l_linenumber"), "left")
    }),

    // J3: LEFT join + COALESCE id-remap (reference convertor.py:105-115)
    "q_join_coalesce" -> ((s, dir) => {
      val mapping = t(s, dir, "nation")
        .filter(col("n_nationkey") % 2 === 0)
        .select(col("n_nationkey").as("old_id"), col("n_regionkey").as("new_id"))
      t(s, dir, "customer")
        .join(broadcast(mapping), col("c_nationkey") === col("old_id"), "left")
        .select(col("c_custkey"), coalesce(col("new_id"), col("c_nationkey")).as("mapped_id"))
    }),

    // J5: semi-join / EXISTS (reference meta.py:207-215)
    "q_semi_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    }),

    // J6: anti-join / NOT EXISTS (reference resolution/main.py:161-174)
    "q_anti_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // O2: UNION (distinct) of id projections (reference group/meta.py:27-37)
    "q_union" -> ((s, dir) => {
      t(s, dir, "orders").select(col("o_custkey").as("id"))
        .union(t(s, dir, "customer").select(col("c_custkey").as("id")))
        .distinct()
    }),

    // O3: UNION ALL (reference resolution/main.py:231-244)
    "q_union_all" -> ((s, dir) => {
      t(s, dir, "orders").select(col("o_custkey").as("id"))
        .unionByName(t(s, dir, "customer").select(col("c_custkey").as("id")))
    }),

    // W1 + F4: row_number + modulo partition key (reference parallize.py:127-142),
    // made deterministic with an explicit total order
    "q_window_rownum" -> ((s, dir) => {
      graft.engine.Partitioned.addPartitionKey(
        t(s, dir, "orders").select("o_orderkey"), col("o_orderkey"), 8)
        .select(col("o_orderkey"), col("row_id").cast("long").as("row_id"),
          col("partition").cast("long").as("partition"))
    }),

    // P3: filters (null / empty / sentinel / range conjunction)
    "q_filters" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderpriority").isNotNull && col("o_orderpriority") =!= "" &&
          col("o_orderpriority") =!= "UNKNOWN" && col("o_totalprice") > 1000.0)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
    }),

    // P5: ordered limit
    "q_limit" -> ((s, dir) => {
      t(s, dir, "orders").orderBy("o_orderkey").limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }),

    // F2: concat-with-pipe composite key (reference meta.py:83,94)
    "q_concat_key" -> ((s, dir) => {
      t(s, dir, "customer")
        .select(col("c_custkey"), concat_ws("|", col("c_name"), col("c_mktsegment")).as("key"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q_agg_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    // mirror of the KMV estimator: k'th smallest digest per group via a
    // window, first 13 nibbles as an exact-in-double 52-bit integer
    "q_distinct_sketch" ->
      """WITH h AS (
        |  SELECT DISTINCT o_orderpriority, md5(CAST(o_custkey AS VARCHAR)) AS d FROM orders),
        |r AS (
        |  SELECT o_orderpriority, d,
        |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY d) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM h)
        |SELECT o_orderpriority,
        |  CASE WHEN n < 64 THEN CAST(n AS DOUBLE)
        |       ELSE 63.0 / (list_sum(list_transform(generate_series(1, 13),
        |              i -> (strpos('0123456789abcdef', substr(d, i, 1)) - 1) * (16.0 ** (13 - i))))
        |            / 4503599627370496.0)
        |  END AS est_distinct
        |FROM r WHERE rn = LEAST(n, 64)""".stripMargin,

    "q_pivot" ->
      """SELECT o_orderstatus,
        |  count(*) FILTER (o_orderpriority = '1-URGENT') AS "1-URGENT",
        |  count(*) FILTER (o_orderpriority = '2-HIGH') AS "2-HIGH",
        |  count(*) FILTER (o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
        |  count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
        |  count(*) FILTER (o_orderpriority = '5-LOW') AS "5-LOW"
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q_license_freq" ->
      """WITH c AS (
        |  SELECT o_orderpriority AS license, count(*) AS cnt FROM orders GROUP BY 1
        |) SELECT license, cnt FROM c
        |WHERE license IS NOT NULL AND license <> '' AND license <> 'UNKNOWN' AND cnt >= 2""".stripMargin,

    "q_distinct_on" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",

    "q_top1_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin,

    "q_group_quantiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 6) AS q25,
        |  round(quantile_cont(l_quantity, 0.50), 6) AS q50,
        |  round(quantile_cont(l_quantity, 0.75), 6) AS q75,
        |  round(quantile_cont(l_quantity, 0.95), 6) AS q95
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    // struct(o_totalprice, o_orderkey) descending = price desc, key desc
    "q_topk_agg" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,

    "q_join_left" ->
      """SELECT o_orderkey, o_custkey, c_name, c_mktsegment
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey""".stripMargin,

    "q_join_nway" ->
      """SELECT c_custkey, c_name, n_name, r_name
        |FROM customer
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey""".stripMargin,

    "q_join_composite" ->
      """SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, a.max_price
        |FROM lineitem l LEFT JOIN (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
        |  FROM lineitem GROUP BY 1, 2) a
        |ON l.l_orderkey = a.l_orderkey AND l.l_linenumber = a.l_linenumber""".stripMargin,

    "q_join_coalesce" ->
      """SELECT c_custkey, COALESCE(m.new_id, c_nationkey) AS mapped_id
        |FROM customer LEFT JOIN (
        |  SELECT n_nationkey AS old_id, n_regionkey AS new_id FROM nation WHERE n_nationkey % 2 = 0) m
        |ON c_nationkey = m.old_id""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q_union" ->
      "SELECT o_custkey AS id FROM orders UNION SELECT c_custkey AS id FROM customer",

    "q_union_all" ->
      "SELECT o_custkey AS id FROM orders UNION ALL SELECT c_custkey AS id FROM customer",

    "q_window_rownum" ->
      """SELECT o_orderkey,
        |  CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS row_id,
        |  CAST(row_number() OVER (ORDER BY o_orderkey) % 8 AS BIGINT) AS partition
        |FROM orders""".stripMargin,

    "q_filters" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        |WHERE o_orderpriority IS NOT NULL AND o_orderpriority <> ''
        |  AND o_orderpriority <> 'UNKNOWN' AND o_totalprice > 1000.0""".stripMargin,

    "q_limit" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 10",

    "q_concat_key" ->
      "SELECT c_custkey, concat_ws('|', c_name, c_mktsegment) AS key FROM customer"
  )
}
