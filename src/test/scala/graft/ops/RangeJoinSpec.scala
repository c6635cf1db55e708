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
}
