package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FreqSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact regime: distinct <= capacity reproduces exact counts in order") {
    val df = Seq("x", "x", "x", "y", "y", "z", "w", "w", "w", "w")
      .toDF("v").withColumn("g", lit(1))
    val out = df.groupBy("g").agg(FreqSketch(col("v"), k = 3, capacity = 16).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.value"), col("e.cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out === Seq(("w", 4L), ("x", 3L), ("y", 2L)))
  }

  test("exact regime ties break by value ascending") {
    val df = Seq("b", "b", "a", "a", "c").toDF("v").withColumn("g", lit(1))
    val out = df.groupBy("g").agg(FreqSketch(col("v"), k = 2, capacity = 8).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.value"), col("e.cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out === Seq(("a", 2L), ("b", 2L)))
  }

  test("exact regime matches exact group counts across many partitions (merge path)") {
    // 50k rows, 40 distinct values with a skewed (zipf-ish) distribution,
    // spread over partitions so partial buffers merge across the shuffle
    val df = spark.range(0, 50000, 1, 16)
      .selectExpr("id % 5 AS g", "CAST(CAST(pow(id % 1600, 0.5) AS INT) AS STRING) AS v")
    val viaSketch = df.groupBy("g").agg(FreqSketch(col("v"), k = 8, capacity = 64).as("hh"))
      .select(col("g"), explode(col("hh")).as("e"))
      .select(col("g"), col("e.value").as("v"), col("e.cnt").as("cnt"))
    val viaExact = df.groupBy("g", "v").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy(col("cnt").desc, col("v").asc)))
      .filter(col("rn") <= 8).drop("rn")
    assert(TestSpark.rows(viaSketch) === TestSpark.rows(viaExact))
  }

  test("over-capacity regime never misses a true heavy hitter") {
    // one value holds 20% of the stream; 500 rare values churn the counters.
    // MG guarantees anything above n/capacity survives: 2000 > 10000/32
    val heavy = Seq.fill(2000)("HH")
    val noise = (0 until 8000).map(i => s"n${i % 500}")
    val df = scala.util.Random.shuffle(heavy ++ noise).toDF("v").withColumn("g", lit(1))
      .repartition(8)
    val out = df.groupBy("g").agg(FreqSketch(col("v"), k = 5, capacity = 32).as("hh"))
      .select(explode(col("hh")).as("e")).select(col("e.value"))
      .collect().map(_.getString(0))
    assert(out.contains("HH"))
  }

  test("sketched count never exceeds the true count (one-sided error)") {
    val heavy = Seq.fill(300)("HH")
    val noise = (0 until 900).map(i => s"n${i % 90}")
    val df = (heavy ++ noise).toDF("v").withColumn("g", lit(1)).repartition(4)
    val got = df.groupBy("g").agg(FreqSketch(col("v"), k = 1, capacity = 16).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.value"), col("e.cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).head
    assert(got._1 === "HH")
    assert(got._2 <= 300L)
    assert(got._2 >= 300L - (1200L / 16L)) // MG lower bound: true - n/capacity
  }
}
