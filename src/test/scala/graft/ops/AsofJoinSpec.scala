package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("latest at-or-before match per key; null before first right row; keys isolated") {
    val left = Seq(
      (1L, 10L, 5L),    // u10 @5: before any view -> null
      (2L, 10L, 15L),   // u10 @15: view@10 wins over nothing later
      (3L, 10L, 20L),   // u10 @20: ties with view@20 -> inclusive match
      (4L, 11L, 100L),  // u11 @100: only u11's views are visible
      (5L, 12L, 50L)    // u12: key with no right rows at all
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 10L, 1.0),
      (10L, 20L, 2.0),
      (11L, 90L, 9.0),
      (11L, 10L, 8.0)
    ).toDF("user_id", "ts", "v")
    val out = AsofJoin.asofLeft(left, right, keys = Seq("user_id"), tsCol = "ts",
      valCols = Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out === Map(
      1L -> None, 2L -> Some(1.0), 3L -> Some(2.0), 4L -> Some(9.0), 5L -> None))
  }

  test("output schema: left columns first, then value columns; rows preserved") {
    val left = Seq((1L, 7L, 3L, "x")).toDF("event_id", "user_id", "ts", "extra")
    val right = Seq((7L, 1L, 42.0)).toDF("user_id", "ts", "v")
    val out = AsofJoin.asofLeft(left, right, Seq("user_id"), "ts", Seq("v"))
    assert(out.columns.toSeq === Seq("event_id", "user_id", "ts", "extra", "v"))
    val row = out.collect().head
    assert(row.getString(3) === "x" && row.getDouble(4) === 42.0)
  }
}
