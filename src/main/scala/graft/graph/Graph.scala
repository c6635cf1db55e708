package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.{Catalog, DfNode, EtlNode, SqlNode}

/** Declarative property-graph extraction config — the Spark equivalent of the
  * reference's MetaGraph data class (reference: examples/graph/metagraph.py:6-48).
  *
  * A graph is layered on tables by convention: node tables carry `node_id` +
  * properties; link tables carry `from_id`/`to_id`. `subgraphs` names each
  * link's (source, target) node; `nodeSqls`/`linkSqls` define extraction from
  * the input tables; groupings describe how subgraph node/link tables merge
  * into final tables (metagraph.py node_grouping/link_grouping).
  */
final case class MetaGraph(
    subgraphs: Map[String, (String, String)],
    nodeGrouping: Map[String, Seq[String]],
    linkGrouping: Map[String, Seq[String]],
    inputIds: Seq[String],
    nodeSqls: Map[String, String],
    linkSqls: Map[String, String]) {

  /** All subgraph node names (metagraph.py `nodes`). */
  val nodes: Seq[String] =
    subgraphs.values.flatMap { case (s, t) => Seq(s, t) }.toSeq.distinct.sorted

  /** All subgraph link names. */
  val links: Seq[String] = subgraphs.keys.toSeq.sorted

  // config validation, mirroring metagraph.py __check_* asserts
  nodeGrouping.values.flatten.foreach(n =>
    require(nodes.contains(n), s"node '$n' in node_grouping is not defined in subgraphs ($nodes)"))
  linkGrouping.values.flatten.foreach(l =>
    require(links.contains(l), s"link '$l' in link_grouping is not defined in subgraphs ($links)"))
  nodes.foreach(n => require(nodeSqls.contains(n), s"sql of subgraph node '$n' is not provided"))
  links.foreach(l => require(linkSqls.contains(l), s"sql of subgraph link '$l' is not provided"))
  nodeSqls.keys.foreach(n => require(nodes.contains(n), s"node '$n' of node_sqls is not in subgraphs"))
  linkSqls.keys.foreach(l => require(links.contains(l), s"link '$l' of link_sqls is not in subgraphs"))

  /** Groupings completed with singleton groups for ungrouped items
    * (metagraph.py node_grouping/link_grouping properties). */
  def fullNodeGrouping: Map[String, Seq[String]] = {
    val grouped = nodeGrouping.values.flatten.toSet
    nodeGrouping ++ nodes.filterNot(grouped.contains).map(n => n -> Seq(n))
  }
  def fullLinkGrouping: Map[String, Seq[String]] = {
    val grouped = linkGrouping.values.flatten.toSet
    linkGrouping ++ links.filterNot(grouped.contains).map(l => l -> Seq(l))
  }

  /** Final-graph triplets: link -> (source group, target group)
    * (metagraph.py `triplets`). */
  def triplets: Map[String, (String, String)] =
    fullLinkGrouping.map { case (link, children) =>
      val (srcChild, dstChild) = subgraphs(children.head)
      def parentOf(child: String): String =
        fullNodeGrouping.collectFirst { case (g, cs) if cs.contains(child) => g }
          .getOrElse(throw new IllegalArgumentException(
            s"cannot find '$child' in node grouping $fullNodeGrouping"))
      link -> (parentOf(srcChild), parentOf(dstChild))
    }

  /** Extraction stage as engine nodes: one SqlNode per node/link table. */
  def extractionNodes: Seq[EtlNode] =
    nodeSqls.map { case (n, sql) =>
      new SqlNode(s"extract_node_$n", inputIds, Map(s"node_$n" -> sql)): EtlNode
    }.toSeq ++
      linkSqls.map { case (l, sql) =>
        new SqlNode(s"extract_link_$l", inputIds, Map(s"link_$l" -> sql)): EtlNode
      }
}

/** Grouping SQL builder — the reference's SqlBuilder
  * (examples/graph/group/meta.py:10-68): population = UNION (distinct) of
  * member-table keys, then N-way LEFT JOIN back to each member for properties.
  * The reference's `DISTINCT ON (node_id) node_id` is a keys-only projection,
  * i.e. plain DISTINCT — written as such here (and in any oracle).
  */
object Grouping {

  def nodePopSql(nodeNames: Seq[String]): String =
    nodeNames.map(n => s"SELECT node_id FROM $n").mkString("SELECT DISTINCT node_id FROM (", " UNION ", ") u")

  def nodeJoinSql(columnSql: String, nodeNames: Seq[String]): String = {
    val joins = nodeNames.zipWithIndex
      .map { case (n, i) => s"LEFT JOIN $n AS t${i + 1} ON t0.node_id = t${i + 1}.node_id" }
      .mkString("\n")
    s"WITH pop AS (${nodePopSql(nodeNames)})\nSELECT $columnSql\nFROM pop AS t0\n$joins"
  }

  def linkPopSql(linkNames: Seq[String]): String =
    linkNames.map(l => s"SELECT from_id, to_id FROM $l")
      .mkString("SELECT DISTINCT from_id, to_id FROM (", " UNION ", ") u")

  def linkJoinSql(columnSql: String, linkNames: Seq[String]): String = {
    val joins = linkNames.zipWithIndex
      .map { case (l, i) =>
        s"LEFT JOIN $l AS t${i + 1} ON t0.from_id = t${i + 1}.from_id AND t0.to_id = t${i + 1}.to_id"
      }
      .mkString("\n")
    s"WITH pop AS (${linkPopSql(linkNames)})\nSELECT $columnSql\nFROM pop AS t0\n$joins"
  }
}

/** LinkIDValidator (J8, reference examples/graph/validate.py:8-43): link
  * endpoint ids must be a subset of the node table's ids. Implemented as an
  * anti-join (violations table) — empty means valid; as an engine node it
  * throws on violations, mirroring the reference's assert. */
object Validate {

  /** Violating link rows (empty = valid). */
  def violations(link: DataFrame, node: DataFrame, idType: String): DataFrame = {
    require(idType == "from_id" || idType == "to_id", s"idType must be from_id/to_id, got $idType")
    link.join(node, link(idType) === node("node_id"), "left_anti").select(col(idType))
  }

  /** Engine node asserting containment for one link×endpoint (no outputs). */
  def linkIdValidator(linkId: String, nodeId: String, idType: String): EtlNode =
    new DfNode(s"validate_${linkId}_${idType}_in_$nodeId",
      inputIds = Seq(linkId, nodeId), outputIds = Seq.empty,
      fn = { case Seq(link, node) =>
        val bad = violations(link, node, idType).count()
        require(bad == 0, s"$bad $idType values in '$linkId' missing from '$nodeId'")
        Seq.empty
      })
}
