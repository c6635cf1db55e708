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

  test("matched row's NULL value stays NULL (no fallback to an older non-null row)") {
    val left = Seq((1L, 10L, 25L)).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 10L, Some(1.0), Some("a")),
      (10L, 20L, None, Some("b")) // the as-of match: v is legitimately NULL
    ).toDF("user_id", "ts", "v", "tag")
    val row = AsofJoin.asofLeft(left, right, Seq("user_id"), "ts", Seq("v", "tag"))
      .collect().head
    // v must be NULL (from the matched @20 row), and tag must come from the
    // SAME row — a per-column last(ignoreNulls) would return (1.0, "b")
    assert(row.isNullAt(3) && row.getString(4) === "b")
  }

  test("tieBreak: max-by wins deterministically among equal (keys, ts) right rows") {
    import org.apache.spark.sql.functions.col
    val left = Seq((1L, 10L, 20L), (2L, 10L, 5L)).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 20L, 100L, 1.0),
      (10L, 20L, 300L, 3.0), // same ts, max seq -> must win
      (10L, 20L, 200L, 2.0)
    ).toDF("user_id", "ts", "seq", "v")
    val out = AsofJoin.asofLeft(left, right, Seq("user_id"), "ts", Seq("v"),
      tieBreak = Some(col("seq")))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(out === Map(1L -> Some(3.0), 2L -> None))
  }

  test("forward mode: earliest at-or-after match; null after the last right row") {
    val left = Seq(
      (1L, 10L, 5L),   // next view @10
      (2L, 10L, 10L),  // ties with view@10 -> inclusive match
      (3L, 10L, 15L),  // next view @20
      (4L, 10L, 25L)   // nothing after -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq((10L, 10L, 1.0), (10L, 20L, 2.0)).toDF("user_id", "ts", "v")
    val out = AsofJoin.asofLeft(left, right, Seq("user_id"), "ts", Seq("v"),
      forward = true)
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out === Map(
      1L -> Some(1.0), 2L -> Some(1.0), 3L -> Some(2.0), 4L -> None))
  }

  test("reserved working-column names are rejected") {
    val left = Seq((1L, 10L, 5L)).toDF("event_id", "user_id", "ts")
    val bad = left.withColumn("__side", org.apache.spark.sql.functions.lit(0))
    val right = Seq((10L, 1L, 1.0)).toDF("user_id", "ts", "v")
    assertThrows[IllegalArgumentException] {
      AsofJoin.asofLeft(bad, right, Seq("user_id"), "ts", Seq("v"))
    }
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
