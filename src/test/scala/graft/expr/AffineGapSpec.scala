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
}
