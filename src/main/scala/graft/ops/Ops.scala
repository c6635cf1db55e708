package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DISTINCT ON helpers.
  *
  * The reference leans on DuckDB's `DISTINCT ON (keys)` in every node/link SQL
  * (reference: examples/meta.py:60,74,83,... and group/meta.py:31,62,141,154) — keep
  * one *arbitrary* row per key (no ORDER BY). Its Python twin sorts by score first to
  * keep the *best* row (canon.py:160-164, messy.py:333-334).
  */
object DistinctOn {

  /** Arbitrary row per key — same semantics as un-ordered DISTINCT ON (A2).
    * Implemented as `dropDuplicates`: a partial (map-side) + final hash aggregate,
    * one shuffle on the keys, no sort. */
  def distinctOn(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Best row per key by explicit ordering (A3). One shuffle on the keys; ties must
    * be broken by the caller's ordering for deterministic output. */
  def distinctOnOrdered(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame =
    topK(df, keys, order, 1)

  /** Top-k rows per key by explicit ordering — the rank generalization of
    * [[distinctOnOrdered]]. One shuffle on the keys. */
  def topK(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }
}

/** 64-bit id synthesis.
  *
  * The reference uses DuckDB `HASH(expr)` for node ids (examples/meta.py:61,75,83,94)
  * and `ctypes.c_size_t(hash(...))` on the Python side (mapper/messy.py:445-448).
  * Bit-pattern parity is neither possible nor required (SURVEY §7.4) — ids only need
  * internal consistency, so this engine standardizes on `xxhash64` (codegen'd,
  * LongType; may be negative — an opaque id).
  */
object Ids {

  /** `HASH(col)` equivalent (F1). */
  def hash64(cols: Column*): Column = xxhash64(cols: _*)

  /** `HASH(CONCAT(a,'|',b))` composite-key id (F1+F2, meta.py:83,94). */
  def hashKey(cols: Column*): Column = xxhash64(concat_ws("|", cols: _*))

  /** Stable cluster-id (reference messy.py:445-448: hash of 'cluster*id*v1*{i}'). */
  def clusterId(c: Column): Column = xxhash64(concat(lit("cluster*id*v1*"), c.cast("string")))
}

/** Cross-engine-reproducible hash: MD5 is bit-identical in every engine, so a
  * partition/bucket derived from it can be oracle-verified value-for-value —
  * unlike xxhash64 (Spark) vs hash() (DuckDB), whose bit patterns differ
  * (SURVEY §7.4). Production partitioning uses [[Ids.hash64]]; this exists for
  * verifiable hashing and cross-system handoffs. */
object PortableHash {

  /** First 16 bits of md5(expr) as an int in [0, 65536): four hex nibbles
    * decoded by position arithmetic (expressible identically in any SQL). */
  def md5Bits16(sqlExpr: String): Column = {
    def nib(i: Int) = s"(instr('0123456789abcdef', substring(md5($sqlExpr), $i, 1)) - 1)"
    expr(s"${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)}")
  }

  /** Hash-mod bucket in [0, n). */
  def md5Mod(sqlExpr: String, n: Int): Column = pmod(md5Bits16(sqlExpr), lit(n))
}

/** Incremental batch merge (the reference's cache-merge pattern,
  * crawl.py:117-153 / canon.py:159-166): concat the preferred table first,
  * then keep-first per key — pure batch, no streaming state (SURVEY §2.11). */
object Incremental {

  /** Rows of `first` win on key collision; `second` fills the rest. Inputs
    * must be key-unique for deterministic output (as in the reference, where
    * both sides are already deduped snapshots). */
  def mergeKeepFirst(first: DataFrame, second: DataFrame, keys: Seq[String]): DataFrame = {
    val tagged = first.withColumn("__src", lit(0))
      .unionByName(second.withColumn("__src", lit(1)))
    DistinctOn.distinctOnOrdered(tagged, keys.map(col), Seq(col("__src").asc))
      .drop("__src")
  }
}

/** JSON flatten/explode helpers over a JSON-string column.
  *
  * The reference keeps nested records as JSON strings (`latest`, crawl.py:54) and
  * flattens struct / array / map fields with per-row Python (tabularize.py:44-115).
  * Spark-native: `from_json` + `explode`, all codegen-friendly Catalyst generators.
  */
object JsonFlatten {
  import org.apache.spark.sql.types._

  /** Flatten struct fields of a parsed JSON column: one output column per path (F8). */
  def flattenStruct(df: DataFrame, jsonCol: String, schema: StructType, fields: Seq[String]): DataFrame = {
    val parsed = df.withColumn("__j", from_json(col(jsonCol), schema))
    fields.foldLeft(parsed)((d, f) => d.withColumn(f, col(s"__j.$f"))).drop("__j")
  }

  /** Explode a JSON string array to one row per element; null/missing array -> zero
    * rows, matching the reference's `[]` guard (tabularize.py:73-93) (F9). */
  def explodeJsonArray(df: DataFrame, jsonCol: String, out: String): DataFrame =
    df.withColumn(out, explode(from_json(col(jsonCol), ArrayType(StringType))))

  /** Explode a JSON object (map) to (key, value) rows, dropping null values,
    * matching tabularize.py:95-115 (F10). */
  def explodeJsonMap(df: DataFrame, jsonCol: String, keyOut: String, valOut: String): DataFrame =
    df.select(col("*"), explode(from_json(col(jsonCol), MapType(StringType, StringType))).as(Seq(keyOut, valOut)))
      .filter(col(valOut).isNotNull)

  /** Serialize columns to a JSON-string column — the write half of F7
    * (reference `json.dumps`, crawl.py:54). */
  def toJson(cols: Column*): Column = to_json(struct(cols: _*))

  /** JSON object key count (F12, reference `len(releases)`, crawl.py:30-34). */
  def jsonCardinality(jsonCol: Column): Column =
    size(map_keys(from_json(jsonCol, MapType(StringType, StringType))))
}

/** Text cleanup used as ER preprocessing (reference dedupe_example.py:30-47):
  * strip punctuation marks, collapse whitespace, lowercase, strip quotes. */
object TextNorm {
  def normalize(c: Column): Column = {
    val stripped = regexp_replace(c, """[\n\-/'",:]""", " ")
    trim(regexp_replace(lower(stripped), """\s+""", " "))
  }
}
