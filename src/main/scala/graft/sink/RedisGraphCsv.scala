package graft.sink

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** RedisGraph bulk-load CSV sink (S7/P4) — reproduces the reference's export
  * contract (reference: examples/graph/group/redisgraph.py:11-94):
  *
  *  - node files: `node_id` column renamed to `:ID(label)`, every property
  *    column renamed to `name:TYPE`;
  *  - link files: `from_id` -> `:START_ID(srcLabel)`, `to_id` ->
  *    `:END_ID(dstLabel)`, properties renamed likewise;
  *  - TYPE from the Spark dtype (string->STRING, float/double->FLOAT,
  *    integral->INTEGER — the reference's pandas map covers only
  *    object/float64 because its ids are the only integers and stay untyped);
  *  - QUOTE_NONNUMERIC + backslash escape: string fields are always quoted
  *    (with `\` escaping of quotes/backslashes), numeric fields never.
  *
  * Spark's CSV writer cannot express quote-nonnumeric, so fields are rendered
  * explicitly and written with quoting disabled — the rendering is a plain
  * projection, fully distributed. `coalesce(1)` only merges the final written
  * files (RedisGraph's loader also accepts multi-part input; pass
  * singleFile=false at scale to keep the write parallel).
  */
object RedisGraphCsv {

  private def sqlType(dt: DataType): String = dt match {
    case StringType => "STRING"
    case FloatType | DoubleType => "FLOAT"
    case ByteType | ShortType | IntegerType | LongType => "INTEGER"
    case other => throw new IllegalArgumentException(s"unsupported RedisGraph CSV type: $other")
  }

  /** Typed-header renames for a node table (redisgraph.py:40-47). */
  def nodeHeader(df: DataFrame, label: String): DataFrame = {
    require(df.columns.contains("node_id"), "node table must have node_id")
    val renamed = df.schema.fields.map {
      case f if f.name == "node_id" => col("node_id").as(s":ID($label)")
      case f => col(s"`${f.name}`").as(s"${f.name}:${sqlType(f.dataType)}")
    }
    df.select(renamed: _*)
  }

  /** Typed-header renames for a link table (redisgraph.py:79-90). */
  def linkHeader(df: DataFrame, fromNode: String, toNode: String): DataFrame = {
    require(df.columns.contains("from_id") && df.columns.contains("to_id"),
      "link table must have from_id/to_id")
    val renamed = df.schema.fields.map {
      case f if f.name == "from_id" => col("from_id").as(s":START_ID($fromNode)")
      case f if f.name == "to_id" => col("to_id").as(s":END_ID($toNode)")
      case f => col(s"`${f.name}`").as(s"${f.name}:${sqlType(f.dataType)}")
    }
    df.select(renamed: _*)
  }

  /** Render one field per QUOTE_NONNUMERIC + escapechar='\': strings quoted
    * with embedded `\` and `"` escaped; numerics bare; null -> empty. */
  private def render(f: StructField): Column = f.dataType match {
    case StringType =>
      val escaped = regexp_replace(regexp_replace(col(s"`${f.name}`"), "\\\\", "\\\\\\\\"), "\"", "\\\\\"")
      when(col(s"`${f.name}`").isNull, lit("")).otherwise(concat(lit("\""), escaped, lit("\"")))
    case _ => when(col(s"`${f.name}`").isNull, lit("")).otherwise(col(s"`${f.name}`").cast("string"))
  }

  /** Write a typed-header DataFrame as RedisGraph CSV text. The header line is
    * prepended to EVERY partition (not union'd ahead of the body, whose
    * placement would depend on partition ordering), so each produced part
    * file leads with the header — valid for the loader in both the
    * single-file and parallel multi-file layouts. */
  def write(df: DataFrame, path: String, singleFile: Boolean = true): Unit = {
    val header = df.columns.map(c => "\"" + c + "\"").mkString(",")
    val body = df.select(concat_ws(",", df.schema.fields.map(render).toIndexedSeq: _*).as("line"))
      .as(org.apache.spark.sql.Encoders.STRING)
    val out = if (singleFile) body.coalesce(1) else body
    out.mapPartitions(it => Iterator(header) ++ it)(org.apache.spark.sql.Encoders.STRING)
      .write.mode("overwrite").text(path)
  }

  /** Node-table export: rename + write (FormatNode, redisgraph.py:17-50). */
  def writeNodes(df: DataFrame, label: String, path: String): Unit =
    write(nodeHeader(df, label), path)

  /** Link-table export: rename + write (FormatLink, redisgraph.py:53-94). */
  def writeLinks(df: DataFrame, fromNode: String, toNode: String, path: String): Unit =
    write(linkHeader(df, fromNode, toNode), path)
}
