package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LongDotProductSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("codegen path, SQL registration, nulls, and length clamp") {
    val df = Seq(
      (1L, Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),       // 4 + 10 + 18 = 32
      (2L, Seq(-2L, 1000000L), Seq(3L, 1000000L)),  // -6 + 1e12
      (3L, Seq(1L, 1L, 1L), Seq(7L)),               // clamped to min length
      (4L, Seq.empty[Long], Seq(9L))                // empty -> 0
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), LongDotProduct(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 32L, 2L -> 999999999994L, 3L -> 7L, 4L -> 0L))

    // SQL surface through GraftExtensions
    df.createOrReplaceTempView("ldp_t")
    val sql = spark.sql("SELECT id, qdot_long(a, b) AS d FROM ldp_t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sql === out)
    spark.catalog.dropTempView("ldp_t")

    // null input -> null out (BinaryExpression null-safety)
    val withNull = Seq((1L, Option(Seq(1L)), Option.empty[Seq[Long]]))
      .toDF("id", "a", "b")
      .select(LongDotProduct(col("a"), col("b")).as("d")).collect()
    assert(withNull.head.isNullAt(0))
  }

  test("matches the HOF formulation on random vectors (the value it replaced)") {
    val rnd = new scala.util.Random(5)
    val rows = (0L until 50L).map { i =>
      (i, Seq.fill(64)(rnd.nextInt(2001).toLong - 1000), Seq.fill(64)(rnd.nextInt(2001).toLong - 1000))
    }
    val df = rows.toDF("id", "a", "b")
    val both = df.select(col("id"),
        LongDotProduct(col("a"), col("b")).as("native"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("hof"))
      .collect()
    both.foreach(r => assert(r.getLong(1) === r.getLong(2), s"id=${r.getLong(0)}"))
  }
}
