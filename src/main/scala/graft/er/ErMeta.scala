package graft.er

import org.apache.spark.sql.functions._

import graft.engine.{DfNode, EtlNode}
import graft.graph.MetaGraph

/** Declarative ER-to-graph attachment — the Spark equivalent of the reference's
  * `ERMeta` (reference: examples/graph/resolution/meta.py:11-88).
  *
  * Given the subgraph topology and the name of the messy node, it derives which
  * node/link tables carry messy ids (`messyItems`, meta.py get_messy_items:
  * the messy node's `node_id` plus every incident link's `from_id`/`to_id`),
  * emits one IDConvertor engine node per item producing the rewritten `{item}Q`
  * table (convertor.py:17-115), and retargets a [[MetaGraph]]'s grouping stage
  * at those Q tables (`alter_grouping_way`, meta.py:37-59) — so downstream
  * grouping reads canonical entity ids with zero changes to its own config.
  */
final case class ErMeta(
    subgraphs: Map[String, (String, String)],
    messyNode: String,
    dedupeFields: Seq[DedupeField],
    canonNode: Option[String] = None) {

  def hasCanon: Boolean = canonNode.isDefined

  /** (item, id column) pairs needing id rewrite; sorted for deterministic
    * node-id generation (the reference's Set iteration order is incidental). */
  val messyItems: Seq[(String, String)] = {
    val fromLinks = subgraphs.collect { case (l, (f, _)) if f == messyNode => Seq((messyNode, "node_id"), (l, "from_id")) }
    val toLinks = subgraphs.collect { case (l, (_, t)) if t == messyNode => Seq((messyNode, "node_id"), (l, "to_id")) }
    (fromLinks ++ toLinks).flatten.toSeq.distinct.sorted
  }

  private val messyNames: Set[String] = messyItems.map(_._1).toSet

  /** Grouping-stage member resolution: messy members read their rewritten
    * `{member}Q` table (pass to [[MetaGraph.groupingNodes]]). */
  def memberTable(m: String): String = if (messyNames.contains(m)) s"${m}Q" else m

  /** The reference's `alter_grouping_way`: same retargeting expressed on the
    * immutable config — grouping member lists rewritten to `{item}Q` names.
    * Prefer passing [[memberTable]] to `groupingNodes` directly; this exists
    * for parity with code that inspects the altered config. */
  def alterGroupingWay(meta: MetaGraph): MetaGraph =
    meta.copy(
      nodeGrouping = meta.nodeGrouping.map { case (g, ms) => g -> ms.map(memberTable) },
      linkGrouping = meta.linkGrouping.map { case (g, ms) => g -> ms.map(memberTable) })

  /** Rewritten-table ids this config produces (meta.py output_ids). */
  def outputIds: Seq[String] =
    messyItems.map { case (item, c) =>
      if (c == "node_id") s"node_${item}Q" else s"link_${item}Q"
    }.distinct

  /** IDConvertor stage: one engine node per messy item, rewriting ALL of the
    * item's messy id columns (a self-referential link has two) through the
    * (messy_id, new_id) mapping table `mappingId` with COALESCE fallback
    * (convertor.py:105-115). */
  def idConvertNodes(mappingId: String): Seq[EtlNode] =
    messyItems.groupBy(_._1).toSeq.sortBy(_._1).map { case (item, cols) =>
      val columns = cols.map(_._2).sorted
      val isNode = columns.contains("node_id")
      val (inId, outId) =
        if (isNode) (s"node_$item", s"node_${item}Q")
        else (s"link_$item", s"link_${item}Q")
      new DfNode(s"id_convert_$item",
        inputIds = Seq(inId, mappingId), outputIds = Seq(outId),
        fn = { case Seq(df, mapping) =>
          val m = mapping.select(col("messy_id"), col("new_id"))
          Seq(columns.foldLeft(df)((acc, c) => IdConvert.convert(acc, m, c)))
        }): EtlNode
    }
}
