package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Catalog, DfNode, EtlGroup, EtlNode, SqlNode}
import graft.er.{Blocking, ConnectedComponents, DedupeField, ErMeta, Pairing, Scoring}
import graft.graph.MetaGraph

/** Flagship entry: the reference's whole pipeline as ONE declarative run
  * (reference: examples/run_whole.py:51-56 — tabularize → GraphDataPlatform
  * with a MetaGraph + ERMeta list), executed *through the engine*: the
  * [[MetaGraph]] config emits extraction SqlNodes, the ER branch produces a
  * (messy_id, new_id) mapping, [[ErMeta]] retargets the grouping stage at the
  * rewritten `{item}Q` tables (alter_grouping_way, resolution/meta.py:37-59),
  * and generated grouping + LinkIDValidators + the final read all run as one
  * concurrent [[EtlGroup]] over a [[Catalog]].
  *
  * Inputs are staged with Catalog.link (no copy); the work dir is removed on
  * JVM exit so repeated runs do not leak parquet temp dirs.
  */
object Flagship {

  private val licenseNodeSql =
    """SELECT DISTINCT md5(license) AS node_id, license AS name, cnt FROM (
      |  SELECT o_orderpriority AS license, count(*) AS cnt FROM orders GROUP BY o_orderpriority) c
      |WHERE license IS NOT NULL AND license <> '' AND license <> 'UNKNOWN' AND cnt >= 2""".stripMargin

  /** Declarative graph config (examples/meta.py metagraph shape): buyers,
    * licenses, and the messy part-name node the ER branch canonicalizes. */
  val metagraph: MetaGraph = MetaGraph(
    subgraphs = Map(
      "has_license" -> (("buyer", "license")),
      "ordered_material" -> (("buyer", "material"))),
    nodeGrouping = Map("customer" -> Seq("buyer"), "product" -> Seq("material")),
    linkGrouping = Map.empty,
    inputIds = Seq("orders", "customer", "part", "lineitem"),
    nodeSqls = Map(
      "buyer" ->
        """SELECT DISTINCT md5(c.c_name) AS node_id, c.c_name AS name
          |FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,
      "license" -> licenseNodeSql,
      "material" -> "SELECT DISTINCT md5(p_name) AS node_id, p_name AS name FROM part"),
    linkSqls = Map(
      "has_license" ->
        s"""WITH license_node AS ($licenseNodeSql)
           |SELECT DISTINCT md5(c.c_name) AS from_id, md5(o.o_orderpriority) AS to_id
           |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           |WHERE EXISTS (SELECT 1 FROM license_node n WHERE n.node_id = md5(o.o_orderpriority))""".stripMargin,
      "ordered_material" ->
        """SELECT DISTINCT md5(c.c_name) AS from_id, md5(p.p_name) AS to_id
          |FROM orders o
          |JOIN customer c ON o.o_custkey = c.c_custkey
          |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
          |JOIN part p ON p.p_partkey = l.l_partkey""".stripMargin),
    // singleton groups pass through; "customer"/"product" names the final tables
    nodeGroupingSqls = Map.empty)

  private val erFields = Seq(
    DedupeField("full_name", DedupeField.StringDist, 0.5),
    DedupeField("first_token", DedupeField.Exact, 0.25),
    DedupeField("last_token", DedupeField.Exact, 0.25))

  /** ER attachment: part names are the messy node; the derived messyItems are
    * (material, node_id) and (ordered_material, to_id). */
  val erMeta: ErMeta = ErMeta(metagraph.subgraphs, "material", erFields)

  /** ER branch (messy.py feature->block->pair->score + clusterer): emits the
    * (messy_id, new_id) mapping in the SAME id space as the material node. */
  def erResolutionNode: DfNode = new DfNode(
    "er_resolution",
    inputIds = Seq("part"),
    outputIds = Seq("er_mapping"),
    fn = { case Seq(part) =>
      val feats = part.groupBy(col("p_name").as("full_name"))
        .agg(min(col("p_partkey")).as("__pk"))
        .select(
          md5(col("full_name")).as("node_id"),
          col("full_name"),
          substring_index(col("full_name"), " ", 1).as("first_token"),
          element_at(split(col("full_name"), " "), 2).as("last_token"))
      val blocks = Blocking.blockTable(feats, "node_id",
        Seq(col("first_token"), col("last_token")))
      val pairs = Pairing.candidatePairs(blocks)
      val entityMap = Pairing.withFeatures(pairs, feats, "node_id", erFields.map(_.name))
      val matches = Scoring.selectPairs(entityMap, erFields, threshold = 0.6)
      val clusters = ConnectedComponents.clusterMapping(matches.select("from", "to"))
      Seq(clusters
        .filter(col("messy_id") =!= col("cluster_id"))
        .select(col("messy_id"), col("cluster_id").as("new_id")))
    })

  /** Final read: rewritten links joined back to the rewritten product node —
    * non-empty only if the whole chain (extraction, ER, retarget, grouping,
    * validation) held together. */
  def resultNode: SqlNode = new SqlNode(
    "flagship_result",
    inputIds = Seq("glink_ordered_material", "gnode_product", "gnode_customer"),
    sqls = Map(
      "flagship_graph" ->
        """SELECT l.from_id, l.to_id, n.name AS product, c.name AS customer
          |FROM glink_ordered_material l
          |JOIN gnode_product n ON l.to_id = n.node_id
          |JOIN gnode_customer c ON l.from_id = c.node_id""".stripMargin))

  /** The pipeline's stage families in dependency order. `run` composes them
    * into ONE concurrent EtlGroup (the reference shape); [[ScaleFlagship]]
    * executes them one group at a time to attribute per-stage wall time. */
  def stages: Seq[(String, Seq[EtlNode])] = Seq(
    "extraction" -> metagraph.extractionNodes,
    "er" -> Seq(erResolutionNode: EtlNode),
    "idconvert" -> erMeta.idConvertNodes("er_mapping"),
    "grouping" -> metagraph.groupingNodes(erMeta.memberTable),
    "validate" -> metagraph.validatorNodes,
    "result" -> Seq(resultNode: EtlNode))

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val work = java.nio.file.Files.createTempDirectory("graft_flagship")
    TempCleanup.deleteOnExit(work)
    val cat = new Catalog(spark, work.toString)

    // stage inputs by reference, not by copy (id -> external parquet)
    metagraph.inputIds.foreach(id => cat.link(id, s"$sfDir/$id.parquet"))

    new EtlGroup("flagship_pipeline", stages.flatMap(_._2), dropIntermediates = false)
      .execute(cat, maxActiveRun = 4)

    val graph = cat.read("flagship_graph")
    // ER actually rewrote something: no messy (non-canonical) id survives
    val mapping = cat.read("er_mapping")
    val messyLeft = graph.join(mapping,
      graph("to_id") === mapping("messy_id"), "left_semi").count()
    require(messyLeft == 0, s"$messyLeft link endpoints still carry messy ids after ER rewrite")
    graph.orderBy(col("product"), col("from_id"))
  }
}
