package graft.er

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ErSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("feature expressions match the reference lambdas (meta.py:261-266, 284-288)") {
    val df = Seq("numpy>=1.2", "pkg[extra]", "requests (>=2.0)", "plain").toDF("name")
    val out = df.select(
      col("name"),
      Features.beforeWhitespace(col("name")).as("w"),
      Features.beforeUpperBracket(col("name")).as("b"),
      Features.beforeMarks(col("name")).as("m"))
    val byName = out.collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2), r.getString(3))).toMap
    assert(byName("numpy>=1.2") === (("numpy>=1.2", "numpy>=1.2", "numpy")))
    assert(byName("pkg[extra]") === (("pkg[extra]", "pkg", "pkg[extra]")))
    assert(byName("requests (>=2.0)") === (("requests", "requests ", "requests (")))
    assert(byName("plain") === (("plain", "plain", "plain")))
  }

  test("titlePrefix and firstSentences build the license features (meta.py:284-288)") {
    val df = Seq("MIT License. Permission is granted. Free of charge. X. Y. Z").toDF("name")
    val out = df.select(
      Features.titlePrefix(col("name")).as("t"),
      Features.firstSentences(col("name"), 2).as("f2")).head()
    assert(out.getString(0) === "<start> MIT License")
    assert(out.getString(1) === "<start> MIT License.\n Permission is granted")
  }

  test("blockTable drops null-valued predicates instead of colliding them") {
    val feats = Seq((1L, "alpha"), (2L, null), (3L, "alpha")).toDF("node_id", "f")
    val blocks = Blocking.blockTable(feats, "node_id", Seq(col("f")))
    assert(TestSpark.rows(blocks) === Set(Seq(1L, "0:alpha"), Seq(3L, "0:alpha")))
  }

  test("candidatePairs is block-bounded with l<r dedup (messy.py:226-242)") {
    val blocks = Seq(
      ("0:a", 1L), ("0:a", 2L), ("0:a", 3L), // block of 3 -> 3 pairs
      ("0:b", 4L), ("0:b", 5L),              // block of 2 -> 1 pair
      ("1:x", 1L), ("1:x", 2L)               // duplicate pair via second predicate
    ).toDF("block_key", "messy_id")
    val pairs = Pairing.candidatePairs(blocks)
    assert(TestSpark.rows(pairs) ===
      Set(Seq(1L, 2L), Seq(1L, 3L), Seq(2L, 3L), Seq(4L, 5L)))
  }

  test("maxBlockSize drops oversized (skewed) blocks before pairing") {
    val blocks = (1L to 10L).map(i => ("0:hot", i)).toDF("block_key", "messy_id")
      .union(Seq(("0:ok", 91L), ("0:ok", 92L)).toDF("block_key", "messy_id"))
    val pairs = Pairing.candidatePairs(blocks, maxBlockSize = 5)
    assert(TestSpark.rows(pairs) === Set(Seq(91L, 92L)))
  }

  test("scoring computes exact weighted-mean similarities and thresholds strictly") {
    val fields = Seq(
      DedupeField("name", DedupeField.StringDist, 0.5),
      DedupeField("tok", DedupeField.Exact, 0.5))
    val entityMap = Seq(
      // identical name: sim 1.0 -> score 1.0
      (1L, "abcd", "t", 2L, "abcd", "t"),
      // lev("abcd","abxd")=1, len 4 -> 0.5*(0.75)+0.5 = 0.875
      (1L, "abcd", "t", 3L, "abxd", "t"),
      // no token match, far name: below threshold
      (1L, "abcd", "t", 4L, "zzzz", "u")
    ).toDF("a_node_id", "a_name", "a_tok", "b_node_id", "b_name", "b_tok")
    val out = Scoring.selectPairs(entityMap, fields, threshold = 0.5)
    val scores = out.collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(scores === Map(2L -> 1.0, 3L -> 0.875))
  }

  test("logistic scoring preserves the weighted order") {
    val fields = Seq(DedupeField("name", DedupeField.StringDist, 2.0))
    val df = Seq((1L, "abcd", 2L, "abcd"), (1L, "abcd", 3L, "zzzz"))
      .toDF("a_node_id", "a_name", "b_node_id", "b_name")
    val scored = df.withColumn("p", Scoring.logistic(fields, w0 = -1.0))
      .select(col("b_node_id"), col("p")).as[(Long, Double)].collect().toMap
    assert(scored(2L) > scored(3L))
    assert(scored(2L) > 0.7 && scored(2L) < 0.75) // sigmoid(1.0)
  }

  test("gazetteer keeps the best canon per messy above threshold (canon.py:160-231)") {
    val messyF = Seq((10L, "small ring", "ring")).toDF("node_id", "full_name", "match_token")
    val canonF = Seq((1L, "ring", "ring"), (2L, "rings", "ring")).toDF("node_id", "full_name", "match_token")
    val fields = Seq(
      DedupeField("full_name", DedupeField.StringDist, 0.5),
      DedupeField("match_token", DedupeField.Exact, 0.5))
    val mB = Blocking.blockTable(messyF, "node_id", Seq(col("match_token")))
    val cB = Blocking.blockTable(canonF, "node_id", Seq(col("match_token")))
    val out = Gazetteer.matchTables(mB, cB, messyF, canonF, "node_id", fields, threshold = 0.25)
    val r = out.head()
    assert(r.getLong(0) === 10L)
    assert(r.getLong(1) === 1L) // "ring" beats "rings" on levenshtein
  }

  test("IdConvert rewrites through mapping with COALESCE fallback (convertor.py:105-115)") {
    val df = Seq((100L, "a"), (200L, "b"), (300L, "c")).toDF("ref_id", "payload")
    val mapping = Seq((100L, 1L), (300L, 3L)).toDF("messy_id", "new_id")
    val out = IdConvert.convert(df, mapping, "ref_id")
    assert(TestSpark.rows(out.select("ref_id", "payload")) ===
      Set(Seq(1L, "a"), Seq(200L, "b"), Seq(3L, "c")))
  }

  test("DedupeModel.fromJson parses the exported classifier; margin selection matches Scoring") {
    val json =
      """{"bias": -1.0, "threshold": 0.5,
        | "fields": [
        |  {"name": "nm", "kind": "string_dist", "weight": 1.5},
        |  {"name": "tk", "kind": "exact", "weight": 0.5}]}""".stripMargin
    val m = DedupeModel.fromJson(json)
    assert(m.bias === -1.0 && m.threshold === 0.5)
    assert(m.fields === Seq(
      DedupeField("nm", DedupeField.StringDist, 1.5),
      DedupeField("tk", DedupeField.Exact, 0.5)))
    assert(m.marginCut === 0.0) // logit(0.5) exactly
    // margin selection over an entity map: identical pair clears the cut
    // (1.5 + 0.5 - 1.0 = 1.0 > 0); a dissimilar pair does not
    val em = Seq(
      (1L, 2L, "alpha", "alpha", "a", "a"),
      (1L, 3L, "alpha", "zzzzz", "a", "z")
    ).toDF("a_node_id", "b_node_id", "a_nm", "b_nm", "a_tk", "b_tk")
    val out = m.selectPairs(em).select("from", "to").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L)))
  }

  test("DedupeModel.fromJson fails loudly on malformed documents") {
    def bad(j: String): Unit = { intercept[IllegalArgumentException](DedupeModel.fromJson(j)); () }
    bad("""{"threshold": 0.5, "fields": [{"name":"x","kind":"exact","weight":1}]}""") // no bias
    bad("""{"bias": 0, "threshold": 0.5, "fields": []}""") // empty fields
    bad("""{"bias": 0, "threshold": 0.5, "fields": [{"name":"x","kind":"woble","weight":1}]}""") // bad kind
    bad("""{"bias": 0, "threshold": 0.5, "fields": [{"name":"x","kind":"exact"}]}""") // no weight
    bad("""[1,2,3]""") // not an object
    intercept[IllegalArgumentException](
      DedupeModel.fromJson("""{"bias":0,"threshold":1.5,"fields":[{"name":"x","kind":"exact","weight":1}]}"""))
    ()
  }

  test("requirement.model fixture: the reference's actual trained classifier replays to exact clusters") {
    // Fixture provenance (src/test/resources/requirement_model_export.json):
    // the reference ships its trained messy-dedupe model as
    // examples/data/model/requirement.model — a SEQUENTIAL pickle of
    // (dedupe.datamodel.DataModel, fitted sklearn GridSearchCV, predicates).
    // Extracted offline with a stub unpickler (dedupe/sklearn aren't needed
    // to read pickle STATE dicts):
    //   field order  = full_name (String → affine-gap comparator),
    //                  before_whitespace / before_upper_bracket /
    //                  before_marks (Exact)            [DataModel.primary_variables]
    //   coef_        = [-4.135198312439431e-05, 1.32320506e-04,
    //                   5.6134380677e-05, 1.0425172396e-04]
    //   intercept_   = 0.4012396574206389              [best_estimator_, C=1e-05]
    //   threshold    = 0.5   (MessyMatcher, examples/graph/resolution/main.py:48)
    val json = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/requirement_model_export.json"), "UTF-8").mkString
    val m = DedupeModel.fromJson(json)
    assert(m.fields.map(_.name) === Seq("full_name", "before_whitespace",
      "before_upper_bracket", "before_marks"))
    assert(m.fields.map(_.kind) === Seq[DedupeField.Kind](DedupeField.AffineGap,
      DedupeField.Exact, DedupeField.Exact, DedupeField.Exact))
    assert(m.bias === 0.4012396574206389 && m.threshold === 0.5)
    // The REAL model is nearly constant: |Σ wᵢ·simᵢ| ≤ 3.35e-4 while the bias
    // is 0.401, so EVERY candidate pair clears logit(0.5) = 0. dedupe agrees:
    // sigmoid(0.401 ± 3e-4) ≈ 0.599 > 0.5 whatever the comparator values (its
    // affine-gap distance scale vs our [0,1] similarity cannot flip a margin
    // this lopsided). Expected clusters = connected components of the
    // BLOCKING graph, hand-derived below.
    val messy = Seq(
      (1L, "numpy >= 1.2"), // blocks with 2 via first-token "numpy"
      (2L, "numpy"),
      (3L, "pandas>=2.0"),  // blocks with 4 via 4-char prefix "pand"
      (4L, "pandas"),
      (5L, "scipy")         // alone in every block → no candidate pair
    ).toDF("node_id", "name")
    val feats = messy.select(
      col("node_id"),
      col("name").as("full_name"),
      Features.beforeWhitespace(col("name")).as("before_whitespace"),
      Features.beforeUpperBracket(col("name")).as("before_upper_bracket"),
      Features.beforeMarks(col("name")).as("before_marks"))
    val blocks = Blocking.blockTable(feats, "node_id",
      Blocking.defaultPredicates(col("full_name")))
    val pairs = Pairing.candidatePairs(blocks)
    val selected = m.selectPairs(
      Pairing.withFeatures(pairs, feats, "node_id", m.fields.map(_.name)))
    // every selected score sits in the near-constant band around the bias
    val scores = selected.select("score").as[Double].collect()
    assert(scores.nonEmpty && scores.forall(s => math.abs(s - m.bias) <= 3.35e-4))
    val clusters = ConnectedComponents.clusterMapping(selected.select("from", "to"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("Mappings.combine unions renamed mappings; unmapped anti-joins (main.py:161-244)") {
    val m2c = Seq((1L, 11L)).toDF("messy_id", "canon_id")
    val m2cl = Seq((2L, 22L)).toDF("messy_id", "cluster_id")
    val combined = Mappings.combine(m2c, m2cl)
    assert(TestSpark.rows(combined) === Set(Seq(1L, 11L), Seq(2L, 22L)))
    val messy = Seq((1L, "x"), (3L, "y")).toDF("node_id", "s")
    val un = Mappings.unmapped(messy, m2c.select(col("messy_id")), "node_id")
    assert(TestSpark.rows(un) === Set(Seq(3L, "y")))
  }
}
