package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Ids, Incremental, JsonFlatten, PortableHash}

/** JSON flatten coverage (F7-F10), verifiable hash partitioning (W1/F4 scale
  * variant), F1 hash-id consistency, and the incremental cache-merge pattern. */
object MiscQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F7+F8: parse JSON string column, flatten struct field (tabularize.py:44-71).
    // events.ts is a nanosecond timestamp Spark's vectorized reader rejects —
    // an explicit read schema prunes it at the source (and skips schema
    // inference, the right default at scale anyway).
    "q_json_struct" -> ((s, dir) => {
      val events = s.read.schema("event_id LONG, props STRING")
        .parquet(s"$dir/events.parquet")
      JsonFlatten.flattenStruct(
        events, "props",
        StructType(Seq(StructField("k", LongType))), Seq("k"))
        .select(col("event_id"), col("k"))
    }),

    // F9: JSON array explode; null/missing array -> zero rows (tabularize.py:73-93)
    "q_json_array" -> ((s, dir) => {
      val withArr = t(s, dir, "documents")
        .withColumn("arr",
          concat(lit("[\""), regexp_replace(col("text"), " ", "\",\""), lit("\"]")))
      JsonFlatten.explodeJsonArray(withArr, "arr", "word")
        .select(col("doc_id"), col("word"))
    }),

    // F10: JSON map explode to (key, value) rows, null values dropped (tabularize.py:95-115)
    "q_json_map" -> ((s, dir) => {
      val withMap = t(s, dir, "documents")
        .withColumn("m", concat(lit("{\"lang\":\""), col("lang"),
          lit("\",\"source\":\""), col("source"), lit("\"}")))
      JsonFlatten.explodeJsonMap(withMap, "m", "prop", "value")
        .select(col("doc_id"), col("prop"), col("value"))
    }),

    // W1 scale variant: hash-mod partition key — no global sort, fully parallel,
    // verified value-for-value via the portable MD5 hash
    "q_partition_hash" -> ((s, dir) => {
      graft.engine.Partitioned.partitionKeyByHash(
        t(s, dir, "orders").select("o_orderkey"), col("o_orderkey"), 16,
        hashFn = _ => PortableHash.md5Bits16("cast(o_orderkey AS string)"))
        .select(col("o_orderkey"), col("partition").cast("long").as("partition"))
    }),

    // F1: hash-id consistency — each engine joins on its OWN hash (xxhash64 vs
    // DuckDB hash()); equal natural-key results prove the id mechanism without
    // comparing hash bit patterns (SURVEY §7.4)
    "q_hash_ids" -> ((s, dir) => {
      val nodes = t(s, dir, "orders")
        .select(Ids.hash64(col("o_orderpriority")).as("node_id"),
          col("o_orderpriority").as("license")).distinct()
      val refs = t(s, dir, "orders")
        .select(Ids.hash64(col("o_orderpriority")).as("ref_id"))
      refs.join(nodes, refs("ref_id") === nodes("node_id"))
        .groupBy("license").agg(count(lit(1)).as("cnt"))
    }),

    // incremental cache merge: new run wins per key, cache fills the rest
    // (crawl.py:117-153 keep-first pattern as a query)
    "q_cache_merge" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val newRun = orders.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), col("o_totalprice"), lit("new").as("src"))
      val cached = orders.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_totalprice"), lit("cached").as("src"))
      Incremental.mergeKeepFirst(newRun, cached, Seq("o_orderkey"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_json_struct" ->
      """SELECT event_id, CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
        |FROM events""".stripMargin,

    "q_json_array" ->
      """SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents""".stripMargin,

    "q_json_map" ->
      """SELECT doc_id, 'lang' AS prop, lang AS value FROM documents
        |UNION ALL
        |SELECT doc_id, 'source' AS prop, source AS value FROM documents""".stripMargin,

    "q_partition_hash" -> {
      def nib(i: Int) = s"(strpos('0123456789abcdef', substr(md5(CAST(o_orderkey AS VARCHAR)), $i, 1)) - 1)"
      s"""SELECT o_orderkey,
         |  CAST((${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)}) % 16 AS BIGINT) AS partition
         |FROM orders""".stripMargin
    },

    "q_hash_ids" ->
      """WITH nodes AS (
        |  SELECT DISTINCT hash(o_orderpriority) AS node_id, o_orderpriority AS license FROM orders),
        |refs AS (SELECT hash(o_orderpriority) AS ref_id FROM orders)
        |SELECT license, count(*) AS cnt
        |FROM refs JOIN nodes ON ref_id = node_id GROUP BY license""".stripMargin,

    "q_cache_merge" ->
      """SELECT o_orderkey, o_totalprice, src FROM (
        |  SELECT u.*, row_number() OVER (PARTITION BY o_orderkey ORDER BY pref) AS rn FROM (
        |    SELECT o_orderkey, o_totalprice, 'new' AS src, 0 AS pref FROM orders WHERE o_orderkey % 3 = 0
        |    UNION ALL
        |    SELECT o_orderkey, o_totalprice, 'cached' AS src, 1 AS pref FROM orders WHERE o_orderkey % 2 = 0) u) r
        |WHERE rn = 1""".stripMargin
  )
}
