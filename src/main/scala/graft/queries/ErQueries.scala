package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.er._

/** Entity-resolution query surface (SURVEY §2.9, E1-E8) over the testdata.
  *
  * The messy universe is the distinct `part` names ("small ring", "red widget",
  * ...) with the min partkey as entity id — the exact analogue of the reference's
  * messy `requirement` names (examples/meta.py:252-266); the canon universe is the
  * distinct noun (second token), the analogue of canonical `package` names.
  *
  * Determinism: every score is a weighted mean with exact binary-fraction weights
  * (0.5/0.25/0.25) evaluated in fixed field order, so Spark and the DuckDB oracle
  * agree bit-for-bit (products and the left-assoc sum round identically under
  * IEEE-754); cluster ids are min-reachable-entity-ids, not engine hashes
  * (SURVEY §7.4 hash-parity rule).
  */
object ErQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  // --- shared pipeline stages (Spark side) ---

  /** Distinct-name messy entities: (name, node_id = min partkey). */
  private def messyEntities(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").groupBy(col("p_name").as("name")).agg(min("p_partkey").as("node_id"))

  /** E1: per-entity feature columns (reference messy_lambda shape, meta.py:261-266). */
  private def messyFeatures(s: SparkSession, dir: String): DataFrame =
    messyEntities(s, dir).select(
      col("node_id"),
      col("name").as("full_name"),
      Features.beforeWhitespace(col("name")).as("first_token"),
      element_at(split(col("name"), " "), 2).as("last_token"))

  private val messyFields = Seq(
    DedupeField("full_name", DedupeField.StringDist, 0.5),
    DedupeField("first_token", DedupeField.Exact, 0.25),
    DedupeField("last_token", DedupeField.Exact, 0.25))

  private def messyBlocks(s: SparkSession, dir: String): DataFrame = {
    val f = messyFeatures(s, dir)
    Blocking.blockTable(f, "node_id", Seq(col("first_token"), col("last_token")))
  }

  /** threshold 0.5 = reference messy default (resolution/main.py:48); the
    * clustering queries use 0.6, where the data shows real cluster structure
    * (0.5 transitively collapses all 64 entities into one giant component —
    * the classic over-blocking failure the threshold exists to prevent). */
  private def scoredPairs(s: SparkSession, dir: String, threshold: Double): DataFrame = {
    val feats = messyFeatures(s, dir)
    val pairs = Pairing.candidatePairs(messyBlocks(s, dir))
    val entityMap = Pairing.withFeatures(pairs, feats, "node_id", messyFields.map(_.name))
    Scoring.selectPairs(entityMap, messyFields, threshold)
  }

  /** Canon universe: distinct nouns, id = min partkey of parts with that noun. */
  private def canonEntities(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .groupBy(element_at(split(col("p_name"), " "), 2).as("name"))
      .agg(min("p_partkey").as("node_id"))

  private val m2cFields = Seq(
    DedupeField("full_name", DedupeField.StringDist, 0.5),
    DedupeField("match_token", DedupeField.Exact, 0.5))

  private def gazetteerMatches(s: SparkSession, dir: String, threshold: Double): DataFrame = {
    val messyF = messyFeatures(s, dir)
      .select(col("node_id"), col("full_name"), col("last_token").as("match_token"))
    val canonF = canonEntities(s, dir)
      .select(col("node_id"), col("name").as("full_name"), col("name").as("match_token"))
    val mBlocks = Blocking.blockTable(messyF, "node_id", Seq(col("match_token")))
    val cBlocks = Blocking.blockTable(canonF, "node_id", Seq(col("match_token")))
    Gazetteer.matchTables(mBlocks, cBlocks, messyF, canonF, "node_id", m2cFields, threshold)
  }

  /** The JSON a user exports from a trained dedupe model (one line of
    * Python: weights/bias off `deduper.classifier`, kinds off the data
    * model). threshold 0.5 ⇒ margin cut logit(0.5) = 0 exactly. */
  private val importedModelJson =
    """{"bias": -1.25, "threshold": 0.5,
      | "fields": [
      |  {"name": "full_name",  "kind": "string_dist", "weight": 2.0},
      |  {"name": "first_token", "kind": "exact", "weight": 0.75},
      |  {"name": "last_token",  "kind": "exact", "weight": 0.75}]}""".stripMargin

  // --- shared pipeline stages (DuckDB oracle side; mirrors the Spark stages) ---

  private val sqlMessy = "SELECT p_name AS name, min(p_partkey) AS node_id FROM part GROUP BY p_name"

  private val sqlFeat =
    s"""SELECT node_id, name AS full_name,
       |  split_part(split_part(name, ' ', 1), ';', 1) AS first_token,
       |  string_split(name, ' ')[2] AS last_token
       |FROM ($sqlMessy) m""".stripMargin

  private val sqlBlocks =
    s"""SELECT DISTINCT block_key, messy_id FROM (
       |  SELECT '0:' || first_token AS block_key, node_id AS messy_id FROM feat
       |  UNION ALL
       |  SELECT '1:' || last_token AS block_key, node_id AS messy_id FROM feat) b
       |WHERE block_key IS NOT NULL AND NOT regexp_matches(block_key, '^[0-9]+:$$')""".stripMargin

  private val sqlPairs =
    """SELECT DISTINCT l.messy_id AS east, r.messy_id AS west
      |FROM blocks l JOIN blocks r USING (block_key)
      |WHERE l.messy_id < r.messy_id""".stripMargin

  /** Weighted-mean score, exact arithmetic order as Scoring.score. */
  private def sqlScore(w1: String, f1a: String, f1b: String,
                       rest: Seq[(String, String, String)]): String = {
    val s1 = s"(1.0 - CAST(levenshtein($f1a, $f1b) AS DOUBLE) / CAST(greatest(length($f1a), length($f1b)) AS DOUBLE)) * $w1"
    val exacts = rest.map { case (w, a, b) => s"CAST($a = $b AS DOUBLE) * $w" }
    "(" + (s1 +: exacts).mkString(" + ") + ") / 1.0"
  }

  private def sqlScored(threshold: String) =
    s"""SELECT a_node_id AS "from", b_node_id AS "to", score FROM (
       |  SELECT p.east AS a_node_id, p.west AS b_node_id,
       |    ${sqlScore("0.5", "a.full_name", "b.full_name",
                       Seq(("0.25", "a.first_token", "b.first_token"),
                           ("0.25", "a.last_token", "b.last_token")))} AS score
       |  FROM pairs p
       |  JOIN feat a ON p.east = a.node_id
       |  JOIN feat b ON p.west = b.node_id) s
       |WHERE score > $threshold""".stripMargin

  // RECURSIVE is harmless when unused and required by the components/combine CTEs
  private def sqlErPrefix(threshold: String) =
    s"""WITH RECURSIVE feat AS ($sqlFeat),
       |blocks AS ($sqlBlocks),
       |pairs AS ($sqlPairs),
       |scored AS (${sqlScored(threshold)})""".stripMargin

  private val sqlCanon =
    "SELECT string_split(p_name, ' ')[2] AS name, min(p_partkey) AS node_id FROM part GROUP BY 1"

  /** Gazetteer: block on match_token, score, keep > threshold, best per messy. */
  private def sqlGazetteer(threshold: String): String =
    s"""WITH mfeat AS (SELECT node_id, full_name, last_token AS match_token FROM ($sqlFeat) f),
       |cfeat AS (SELECT node_id, name AS full_name, name AS match_token FROM ($sqlCanon) c),
       |cand AS (
       |  SELECT DISTINCT m.node_id AS messy_id, c.node_id AS canon_id
       |  FROM mfeat m JOIN cfeat c ON ('0:' || m.match_token) = ('0:' || c.match_token)),
       |gscored AS (
       |  SELECT cand.messy_id, cand.canon_id,
       |    ${sqlScore("0.5", "a.full_name", "b.full_name",
                       Seq(("0.5", "a.match_token", "b.match_token")))} AS score
       |  FROM cand
       |  JOIN mfeat a ON cand.messy_id = a.node_id
       |  JOIN cfeat b ON cand.canon_id = b.node_id)
       |SELECT messy_id, canon_id, score FROM (
       |  SELECT messy_id, canon_id, score,
       |    row_number() OVER (PARTITION BY messy_id ORDER BY score DESC, canon_id) AS rn
       |  FROM gscored WHERE score > $threshold) g WHERE rn = 1""".stripMargin

  // --- query + oracle maps ---

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E1 + F5: feature engineering exprs (reference meta.py:261-266)
    "q_er_features" -> ((s, dir) => {
      messyEntities(s, dir).select(
        col("node_id"),
        col("name").as("full_name"),
        Features.beforeWhitespace(col("name")).as("before_whitespace"),
        Features.beforeUpperBracket(col("name")).as("before_upper_bracket"),
        Features.beforeMarks(col("name")).as("before_marks"))
    }),

    // E2+E3 / J4: multi-predicate blocking + block-bounded pair self-join
    "q_er_blocking_pairs" -> ((s, dir) => Pairing.candidatePairs(messyBlocks(s, dir))),

    // E4: pair scoring (levenshtein + exact fields, weighted mean, threshold 0.5)
    "q_er_scoring" -> ((s, dir) => scoredPairs(s, dir, threshold = 0.5)),

    // E9 (open-format half): a learned dedupe classifier imported from its
    // JSON export (weights + bias + threshold + comparator kinds) drives the
    // same block->pair->score pipeline; score = the linear margin (exact
    // fixed-order IEEE, see DedupeModel), cut = logit(threshold)
    "q_er_model_import" -> ((s, dir) => {
      val model = graft.er.DedupeModel.fromJson(importedModelJson)
      val feats = messyFeatures(s, dir)
      val pairs = Pairing.candidatePairs(messyBlocks(s, dir))
      model.selectPairs(
        Pairing.withFeatures(pairs, feats, "node_id", model.fields.map(_.name)))
    }),

    // E4 with dedupe's real comparator (the native codegen'd affine-gap
    // expression) is covered spec-only: the DP kernel is not expressible in
    // DuckDB SQL, so an oracle row would be permanently unverifiable.
    // AffineGapSpec verifies the kernel against hand-computed alignments and
    // runs it through the full blocking->pairing->scoring pipeline.

    // E5: connected components over matched pairs (min-label propagation)
    "q_er_components" -> ((s, dir) =>
      ConnectedComponents.clusterMapping(scoredPairs(s, dir, threshold = 0.6).select("from", "to"))),

    // E6: gazetteer matching messy->canon (threshold 0.25, top-1 per messy).
    // Measured A/B (r17): the StaticScope treatment that helped
    // q_graph_grouping/q_dedup_ngram HURTS here — 2.2s/6 jobs static vs
    // 1.6s/13 jobs adaptive — because this plan's cost is the two block
    // joins, which AQE converts to broadcasts at runtime and the static
    // planner (agg-output sizes unknown) sort-merges. Left adaptive.
    "q_er_gazetteer" -> ((s, dir) => gazetteerMatches(s, dir, threshold = 0.25)),

    // E7 / P2: id rewrite through mapping with COALESCE fallback + star-except
    "q_er_idconvert" -> ((s, dir) => {
      val part = t(s, dir, "part")
      val entities = messyEntities(s, dir)
      val mapping = part
        .join(entities, part("p_name") === entities("name"))
        .filter(col("p_partkey") =!= col("node_id"))
        .select(col("p_partkey").as("messy_id"), col("node_id").as("new_id"))
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
      IdConvert.convert(li, mapping, "l_partkey")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    }),

    // E8 + J6: high-precision gazetteer pass ∪ cluster assignments for the rest
    "q_er_mapping_combine" -> ((s, dir) => {
      // m2c feeds BOTH the union branch and the unmapped anti-join below.
      // Without the checkpoint the whole gazetteer block/pair/score cascade
      // is in the plan twice, leaning on Catalyst exchange reuse to not run
      // twice — reuse that AQE re-planning does not reliably preserve.
      // Materializing the tiny mapping once (dozens of rows) truncates both
      // consumers' lineage to a block read.
      val m2c = gazetteerMatches(s, dir, threshold = 0.75)
        .select(col("messy_id"), col("canon_id").as("new_id"))
        .localCheckpoint(true)
      val clusters = ConnectedComponents.clusterMapping(scoredPairs(s, dir, threshold = 0.6).select("from", "to"))
      val unmappedClusters = Mappings.unmapped(clusters, m2c, "messy_id")
      m2c.unionByName(unmappedClusters.select(col("messy_id"), col("cluster_id").as("new_id")))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_er_features" ->
      s"""SELECT node_id, name AS full_name,
         |  split_part(split_part(name, ' ', 1), ';', 1) AS before_whitespace,
         |  split_part(split_part(name, '[', 1), '(', 1) AS before_upper_bracket,
         |  split_part(split_part(split_part(split_part(name, '<', 1), '>', 1), '=', 1), '~', 1) AS before_marks
         |FROM ($sqlMessy) m""".stripMargin,

    "q_er_blocking_pairs" ->
      s"""WITH feat AS ($sqlFeat), blocks AS ($sqlBlocks)
         |$sqlPairs""".stripMargin,

    "q_er_scoring" -> s"${sqlErPrefix("0.5")}\nSELECT * FROM scored",

    // the imported model's linear margin, same term order as DedupeModel
    // (((sim1*w1 + sim2*w2) + sim3*w3) + bias), cut = logit(0.5) = 0
    "q_er_model_import" ->
      s"""WITH feat AS ($sqlFeat),
         |blocks AS ($sqlBlocks),
         |pairs AS ($sqlPairs)
         |SELECT a_node_id AS "from", b_node_id AS "to", score FROM (
         |  SELECT p.east AS a_node_id, p.west AS b_node_id,
         |    (1.0 - CAST(levenshtein(a.full_name, b.full_name) AS DOUBLE)
         |      / CAST(greatest(length(a.full_name), length(b.full_name)) AS DOUBLE)) * 2.0
         |      + CAST(a.first_token = b.first_token AS DOUBLE) * 0.75
         |      + CAST(a.last_token = b.last_token AS DOUBLE) * 0.75
         |      + -1.25 AS score
         |  FROM pairs p
         |  JOIN feat a ON p.east = a.node_id
         |  JOIN feat b ON p.west = b.node_id) s
         |WHERE score > 0.0""".stripMargin,

    "q_er_components" ->
      s"""${sqlErPrefix("0.6")},
         |edges AS (
         |  SELECT "from" AS a, "to" AS b FROM scored
         |  UNION SELECT "to" AS a, "from" AS b FROM scored),
         |walk AS (
         |  SELECT DISTINCT a AS id, a AS comp FROM edges
         |  UNION
         |  SELECT e.b AS id, w.comp FROM walk w JOIN edges e ON w.id = e.a)
         |SELECT id AS messy_id, min(comp) AS cluster_id FROM walk GROUP BY id""".stripMargin,

    "q_er_gazetteer" -> sqlGazetteer("0.25"),

    "q_er_idconvert" ->
      s"""WITH entities AS ($sqlMessy),
         |mapping AS (
         |  SELECT p.p_partkey AS messy_id, e.node_id AS new_id
         |  FROM part p JOIN entities e ON p.p_name = e.name
         |  WHERE p.p_partkey <> e.node_id)
         |SELECT COALESCE(m.new_id, l.l_partkey) AS l_partkey,
         |  l.l_orderkey, l.l_linenumber, l.l_quantity
         |FROM lineitem l LEFT JOIN mapping m ON l.l_partkey = m.messy_id""".stripMargin,

    "q_er_mapping_combine" ->
      s"""${sqlErPrefix("0.6")},
         |edges AS (
         |  SELECT "from" AS a, "to" AS b FROM scored
         |  UNION SELECT "to" AS a, "from" AS b FROM scored),
         |walk AS (
         |  SELECT DISTINCT a AS id, a AS comp FROM edges
         |  UNION
         |  SELECT e.b AS id, w.comp FROM walk w JOIN edges e ON w.id = e.a),
         |clusters AS (SELECT id AS messy_id, min(comp) AS cluster_id FROM walk GROUP BY id),
         |m2c AS (SELECT messy_id, canon_id AS new_id FROM (${sqlGazetteer("0.75")}) g)
         |SELECT messy_id, new_id FROM m2c
         |UNION ALL
         |SELECT c.messy_id, c.cluster_id AS new_id FROM clusters c
         |WHERE NOT EXISTS (SELECT 1 FROM m2c WHERE m2c.messy_id = c.messy_id)""".stripMargin
  )
}
