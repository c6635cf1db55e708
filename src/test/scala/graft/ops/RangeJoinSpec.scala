package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(points: Seq[(Long, Long, Long)],
                    ranges: Seq[(Long, Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      (pid, pk, pt) <- points
      (rid, rk, s, e) <- ranges
      if pk == rk && pt >= s && pt <= e
    } yield (pid, rid)).toSet

  test("matches brute force across bin boundaries, negatives, and inverted ranges") {
    val points = Seq(
      (1L, 7L, 0L), (2L, 7L, 99L), (3L, 7L, 100L), (4L, 7L, 101L),
      (5L, 7L, -1L), (6L, 7L, -100L), (7L, 8L, 50L), (8L, 7L, 250L))
    val ranges = Seq(
      (10L, 7L, 0L, 100L),      // spans bins 0 and 1 at width 100
      (11L, 7L, 95L, 105L),     // straddles a bin boundary
      (12L, 7L, -150L, -50L),   // negative domain
      (13L, 8L, 0L, 60L),       // other key
      (14L, 7L, 300L, 200L))    // inverted: matches nothing
    val out = RangeJoin.pointInRange(
      points.toDF("pid", "k", "pt"), ranges.toDF("rid", "k", "s", "e"),
      keys = Seq("k"), ptCol = "pt", startCol = "s", endCol = "e", binWidth = 100L)
      .select("pid", "rid").as[(Long, Long)].collect().toSet
    assert(out === brute(points, ranges))
    // each matching pair appears exactly once (single-bin meeting point)
    val withDups = RangeJoin.pointInRange(
      points.toDF("pid", "k", "pt"), ranges.toDF("rid", "k", "s", "e"),
      keys = Seq("k"), ptCol = "pt", startCol = "s", endCol = "e", binWidth = 7L)
      .select("pid", "rid").as[(Long, Long)].collect()
    assert(withDups.length === withDups.toSet.size)
    assert(withDups.toSet === brute(points, ranges)) // any bin width, same answer
  }

  test("pathological interval fails with a domain error, not an array blowup") {
    val points = Seq((1L, 7L, 0L)).toDF("pid", "k", "pt")
    val ranges = Seq((10L, 7L, 0L, Long.MaxValue)).toDF("rid", "k", "s", "e")
    val e = intercept[Exception] {
      RangeJoin.pointInRange(points, ranges, Seq("k"), "pt", "s", "e",
        binWidth = 100L, maxBins = 1000L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("RangeJoin: interval spans more than 1000 bins")))
    // an in-cap interval on the same plan still works
    val ok = RangeJoin.pointInRange(points,
      Seq((10L, 7L, 0L, 99999L)).toDF("rid", "k", "s", "e"),
      Seq("k"), "pt", "s", "e", binWidth = 100L, maxBins = 1001L)
      .select("pid", "rid").as[(Long, Long)].collect().toSet
    assert(ok === Set((1L, 10L)))
  }

  test("reserved __bin column is rejected") {
    import org.apache.spark.sql.functions.lit
    val points = Seq((1L, 7L, 0L)).toDF("pid", "k", "pt").withColumn("__bin", lit(0))
    val ranges = Seq((10L, 7L, 0L, 10L)).toDF("rid", "k", "s", "e")
    assertThrows[IllegalArgumentException] {
      RangeJoin.pointInRange(points, ranges, Seq("k"), "pt", "s", "e", binWidth = 100L)
    }
  }
}
