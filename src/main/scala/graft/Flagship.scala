package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Catalog, DfNode, EtlGroup, SqlNode}

/** Flagship entry: a miniature of the reference's whole pipeline
  * (reference: examples/run_whole.py — tabularize → node/link extraction →
  * validation), run end-to-end *through the engine*: Catalog + SqlNode/DfNode
  * composed in an EtlGroup, executed concurrently with intermediates dropped,
  * exactly as the reference runs GraphConstructor().execute(max_active_run=16).
  *
  * Inputs are staged with Catalog.link (no copy); the work dir is removed on JVM
  * exit so repeated runs do not leak parquet temp dirs.
  */
object Flagship {

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val work = java.nio.file.Files.createTempDirectory("graft_flagship")
    sys.addShutdownHook {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles()).foreach(_.foreach(rm)); p.delete(); ()
      }
      rm(work.toFile)
    }
    val cat = new Catalog(spark, work.toString)

    // stage inputs by reference, not by copy (id -> external parquet)
    cat.link("orders", s"$sfDir/orders.parquet")
    cat.link("customer", s"$sfDir/customer.parquet")

    // license-node extraction (reference examples/meta.py:102-120 shape)
    val licenseNodes = new SqlNode(
      "license_node_extraction",
      inputIds = Seq("orders"),
      sqls = Map(
        "license_node" ->
          """WITH c AS (
            |  SELECT o_orderpriority AS license, count(*) AS cnt FROM orders GROUP BY 1
            |) SELECT xxhash64(license) AS node_id, license, cnt FROM c
            |WHERE license IS NOT NULL AND license <> '' AND license <> 'UNKNOWN' AND cnt >= 2""".stripMargin))

    // customer-node extraction (reference examples/meta.py:55-70 shape)
    val customerNodes = new SqlNode(
      "customer_node_extraction",
      inputIds = Seq("customer"),
      sqls = Map(
        "customer_node" ->
          "SELECT DISTINCT xxhash64(c_name) AS node_id, c_name AS name FROM customer WHERE c_name IS NOT NULL"))

    // customer -[ordered_with]-> license links (reference examples/meta.py:121-160 shape)
    val links = new SqlNode(
      "order_license_links",
      inputIds = Seq("orders", "customer", "license_node"),
      sqls = Map(
        "order_license_link" ->
          """SELECT DISTINCT xxhash64(c.c_name) AS from_id, xxhash64(o.o_orderpriority) AS to_id
            |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            |WHERE EXISTS (SELECT 1 FROM license_node n WHERE n.license = o.o_orderpriority)""".stripMargin))

    // LinkIDValidator (reference examples/graph/validate.py:8-43): endpoint ids ⊆ node ids
    val validate = new DfNode(
      "link_id_validator",
      inputIds = Seq("order_license_link", "license_node", "customer_node"),
      outputIds = Seq("flagship_graph"),
      fn = { case Seq(link, licNode, custNode) =>
        val badFrom = link.join(custNode, link("from_id") === custNode("node_id"), "left_anti").count()
        val badTo = link.join(licNode, link("to_id") === licNode("node_id"), "left_anti").count()
        require(badFrom == 0 && badTo == 0,
          s"link id validation failed: $badFrom bad from_ids, $badTo bad to_ids")
        Seq(link.join(licNode, link("to_id") === licNode("node_id"))
          .select(col("from_id"), col("to_id"), col("license"), col("cnt")))
      })

    // --- ER branch (reference resolution pipeline, messy.py/convertor.py) ---
    cat.link("part", s"$sfDir/part.parquet")

    val erFeatures = new SqlNode(
      "er_feature_engineering",
      inputIds = Seq("part"),
      sqls = Map(
        "er_features" ->
          """SELECT min(p_partkey) AS node_id, p_name AS full_name,
            |  substring_index(p_name, ' ', 1) AS first_token,
            |  element_at(split(p_name, ' '), 2) AS last_token
            |FROM part GROUP BY p_name""".stripMargin))

    val erFields = Seq(
      graft.er.DedupeField("full_name", graft.er.DedupeField.StringDist, 0.5),
      graft.er.DedupeField("first_token", graft.er.DedupeField.Exact, 0.25),
      graft.er.DedupeField("last_token", graft.er.DedupeField.Exact, 0.25))

    val erScore = new DfNode(
      "er_block_pair_score",
      inputIds = Seq("er_features"),
      outputIds = Seq("er_matches"),
      fn = { case Seq(feats) =>
        val blocks = graft.er.Blocking.blockTable(feats, "node_id",
          Seq(col("first_token"), col("last_token")))
        val pairs = graft.er.Pairing.candidatePairs(blocks)
        val entityMap = graft.er.Pairing.withFeatures(pairs, feats, "node_id", erFields.map(_.name))
        Seq(graft.er.Scoring.selectPairs(entityMap, erFields, threshold = 0.6))
      })

    val erClusters = new DfNode(
      "er_connected_components",
      inputIds = Seq("er_matches"),
      outputIds = Seq("er_clusters"),
      fn = { case Seq(matches) =>
        Seq(graft.er.ConnectedComponents.clusterMapping(matches.select("from", "to")))
      })

    // rewrite part keys to canonical entity ids (IDConvertor, convertor.py:105-115)
    val erRewrite = new DfNode(
      "er_id_rewrite",
      inputIds = Seq("part", "er_features", "er_clusters"),
      outputIds = Seq("part_q"),
      fn = { case Seq(part, feats, clusters) =>
        val entityOf = part.join(feats, part("p_name") === feats("full_name"))
          .select(col("p_partkey").as("messy_id"), col("node_id").as("new_id"))
        val canonical = graft.er.IdConvert.convert(
          part.select("p_partkey", "p_name"), entityOf, "p_partkey")
        val clustered = graft.er.IdConvert.convert(
          canonical, clusters.select(col("messy_id"), col("cluster_id").as("new_id")), "p_partkey")
        Seq(clustered)
      })

    val group = new EtlGroup(
      "flagship_pipeline",
      Seq(licenseNodes, customerNodes, links, validate,
        erFeatures, erScore, erClusters, erRewrite),
      dropIntermediates = false)
    group.execute(cat, maxActiveRun = 4)

    require(cat.read("part_q").count() > 0, "ER branch produced no rewritten rows")
    cat.read("flagship_graph").orderBy(col("license"), col("from_id"))
  }
}
