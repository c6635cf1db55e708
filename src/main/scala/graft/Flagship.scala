package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Flagship entry: the reference's most representative query shape — license-node
  * extraction (reference: examples/meta.py:102-120) — run end-to-end *through the
  * engine* (Catalog + SqlNode), exactly as the reference runs it through
  * SQLExecutor + storage: read parquet inputs, register views, run SQL, materialize
  * parquet output, read it back.
  */
object Flagship {

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val work = java.nio.file.Files.createTempDirectory("graft_flagship").toString
    val cat = new graft.engine.Catalog(spark, work)

    // stage inputs into the catalog namespace (id -> parquet)
    cat.write(spark.read.parquet(s"$sfDir/orders.parquet"), "orders")

    val node = new graft.engine.SqlNode(
      "license_node_extraction",
      inputIds = Seq("orders"),
      sqls = Map(
        "license_node" ->
          """WITH c AS (
            |  SELECT o_orderpriority AS license, count(*) AS cnt FROM orders GROUP BY 1
            |) SELECT xxhash64(license) AS node_id, license, cnt FROM c
            |WHERE license IS NOT NULL AND license <> '' AND license <> 'UNKNOWN' AND cnt >= 2""".stripMargin))

    node.execute(cat)
    cat.read("license_node").orderBy(col("license"))
  }
}
