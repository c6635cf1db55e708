package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AffineGapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kernel: identity, disjoint, and gap-vs-scatter ordering") {
    import AffineGapSimilarity.similarity
    assert(similarity("numpy", "numpy") === 1.0)
    assert(similarity("", "") === 1.0)
    assert(similarity("abc", "") === 0.0)
    assert(similarity("abcd", "wxyz") === 0.0) // all mismatches floor at 0
    // one contiguous gap must beat the same chars scattered as two gaps
    val contiguous = similarity("abcdefgh", "abcgh")   // one 3-gap
    val scattered = similarity("abcdefgh", "acegh")    // multiple gaps
    assert(contiguous > scattered)
    // affine vs levenshtein intuition: a long suffix gap is cheap relative
    // to its length ("numpy" vs a version-qualified requirement string)
    assert(similarity("numpy", "numpy >= 1.2") > 0.3)
  }

  test("expression evaluates inside codegen and handles nulls") {
    val df = Seq(
      ("numpy", "numpy"),
      ("numpy", "numpy >= 1.2"),
      ("abc", null)
    ).toDF("a", "b")
    val out = df.select(AffineGapSimilarity(col("a"), col("b")).as("sim"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(out(0) === 1.0)
    assert(out(1) === AffineGapSimilarity.similarity("numpy", "numpy >= 1.2"))
    assert(out(2) === null)
  }

  test("SQL registration via GraftExtensions") {
    // TestSpark session is built with the extension installed
    val r = spark.sql("SELECT affine_gap_sim('requests', 'requests (>=2.0)') AS s")
      .as[Double].head()
    assert(r === AffineGapSimilarity.similarity("requests", "requests (>=2.0)"))
  }

  test("affine comparator through the full blocking->pairing->scoring pipeline") {
    // replaces the retired q_er_scoring_affine oracle row (the DP kernel is
    // not expressible in DuckDB SQL): the E4 pipeline with an AffineGap field
    // must select exactly the pairs whose hand-computed weighted score passes
    import graft.er._
    val feats = Seq(
      (1L, "numpy base", "numpy", "base"),
      (2L, "numpy >= 1.2 base", "numpy", "base"),
      (3L, "scipy core", "scipy", "core"),
      (4L, "scipy-core core", "scipy-core", "core")
    ).toDF("node_id", "full_name", "first_token", "last_token")
    val fields = Seq(
      DedupeField("full_name", DedupeField.AffineGap, 0.5),
      DedupeField("first_token", DedupeField.Exact, 0.25),
      DedupeField("last_token", DedupeField.Exact, 0.25))
    val blocks = Blocking.blockTable(feats, "node_id", Seq(col("first_token"), col("last_token")))
    val pairs = Pairing.candidatePairs(blocks)
    val entityMap = Pairing.withFeatures(pairs, feats, "node_id", fields.map(_.name))
    val got = Scoring.selectPairs(entityMap, fields, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    def expectScore(a: (String, String, String), b: (String, String, String)): Double =
      (AffineGapSimilarity.similarity(a._1, b._1) * 0.5
        + (if (a._2 == b._2) 0.25 else 0.0)
        + (if (a._3 == b._3) 0.25 else 0.0)) / 1.0
    val rows = Map(
      1L -> ("numpy base", "numpy", "base"),
      2L -> ("numpy >= 1.2 base", "numpy", "base"),
      3L -> ("scipy core", "scipy", "core"),
      4L -> ("scipy-core core", "scipy-core", "core"))
    val want = (for {
      (i, fi) <- rows; (j, fj) <- rows if i < j
      // candidate iff they share a block (first or last token)
      if fi._2 == fj._2 || fi._3 == fj._3
      s = expectScore(fi, fj) if s > 0.5
    } yield (i, j, s)).toSet
    assert(want.nonEmpty)
    assert(got === want)
  }
}
