package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Contract tests for the statistics-gated static-planning scope that the
  * dedup cascade, token-Jaccard, and contamination operators run under. */
class StaticScopeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def smallDf = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "v")

  test("scoped turns AQE off inside and restores both confs after") {
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    val partsBefore = spark.conf.get("spark.sql.shuffle.partitions")
    var insideAqe = ""
    var insideParts = ""
    StaticScope.scoped(smallDf) {
      insideAqe = spark.conf.get("spark.sql.adaptive.enabled")
      insideParts = spark.conf.get("spark.sql.shuffle.partitions")
    }
    assert(insideAqe == "false")
    // partition count is clamped to [floor, session setting]; a 3-row input
    // must never EXCEED the session setting
    assert(insideParts.toInt <= partsBefore.toInt && insideParts.toInt >= 1)
    assert(spark.conf.get("spark.sql.adaptive.enabled") == aqeBefore)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == partsBefore)
  }

  test("scoped restores confs when the body throws") {
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    val partsBefore = spark.conf.get("spark.sql.shuffle.partitions")
    intercept[RuntimeException] {
      StaticScope.scoped(smallDf) { throw new RuntimeException("boom") }
    }
    assert(spark.conf.get("spark.sql.adaptive.enabled") == aqeBefore)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == partsBefore)
  }

  test("scoped leaves a large-estimate input untouched") {
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    var insideAqe = ""
    // threshold 0 bytes => every input counts as large => body runs as-is
    StaticScope.scoped(smallDf, thresholdBytes = 0L) {
      insideAqe = spark.conf.get("spark.sql.adaptive.enabled")
    }
    assert(insideAqe == aqeBefore)
  }

  test("materialize pins the gated plan inside the scope (checkpointed)") {
    val out = StaticScope.materialize(smallDf) {
      smallDf.groupBy("v").agg(count(lit(1)).as("n"))
    }
    // a localCheckpoint'ed plan has truncated lineage: rerunning it under
    // any later session conf reads stored blocks, which is the soundness
    // rule the scope depends on
    assert(out.queryExecution.analyzed.collectLeaves().exists(
      _.getClass.getSimpleName.contains("LogicalRDD")))
    assert(TestSpark.rows(out) == Set(Seq("a", 2L), Seq("b", 1L)))
  }

  test("materialize returns the lazy plan unchanged for large inputs") {
    val out = StaticScope.materialize(smallDf, thresholdBytes = 0L) {
      smallDf.groupBy("v").agg(count(lit(1)).as("n"))
    }
    assert(!out.queryExecution.analyzed.collectLeaves().exists(
      _.getClass.getSimpleName.contains("LogicalRDD")))
    assert(TestSpark.rows(out) == Set(Seq("a", 2L), Seq("b", 1L)))
  }
}
