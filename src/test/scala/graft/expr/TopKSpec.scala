package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("k largest per group, sorted descending, duplicates kept") {
    val df = Seq(("a", 3), ("a", 1), ("a", 5), ("a", 5), ("a", 2), ("b", 9))
      .toDF("g", "v")
    val out = df.groupBy("g").agg(TopK(col("v"), 3).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    assert(out === Map("a" -> Seq(5, 5, 3), "b" -> Seq(9)))
  }

  test("matches the window row_number idiom on random grouped data") {
    val df = spark.range(0, 5000).selectExpr(
      "id % 97 AS g", "xxhash64(id) AS score", "id")
    val viaAgg = df.groupBy("g")
      .agg(TopK(struct(col("score"), col("id")), 5).as("top"))
      .select(col("g"), explode(col("top")).as("t"))
      .select(col("g"), col("t.score"), col("t.id"))
    val viaWindow = df
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy(col("score").desc, col("id").desc)))
      .filter(col("rn") <= 5).select("g", "score", "id")
    assert(TestSpark.rows(viaAgg) === TestSpark.rows(viaWindow))
  }

  test("partial-state serialization round-trips across a repartitioned shuffle") {
    // many small input partitions force map-side partials + merge
    val df = spark.range(0, 2000).repartition(16)
      .selectExpr("id % 7 AS g", "xxhash64(id, 2) AS v")
    val expected = df.groupBy("g").agg(max("v").as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = df.groupBy("g").agg(TopK(col("v"), 1).as("top"))
      .select(col("g"), element_at(col("top"), 1).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("string values and nulls: nulls skipped, order lexicographic") {
    val df = Seq(("g", Some("pear")), ("g", None), ("g", Some("apple")),
      ("g", Some("zig")), ("g", Some("mango"))).toDF("g", "v")
    val out = df.groupBy("g").agg(TopK(col("v"), 2).as("top"))
      .collect().head.getSeq[String](1)
    assert(out === Seq("zig", "pear"))
  }

  test("SQL surface through GraftExtensions") {
    Seq((1, 10), (1, 30), (1, 20)).toDF("g", "v").createOrReplaceTempView("topk_in")
    val out = spark.sql("SELECT g, top_k(v, 2) AS top FROM topk_in GROUP BY g")
      .collect().head.getSeq[Int](1)
    assert(out === Seq(30, 20))
  }
}
