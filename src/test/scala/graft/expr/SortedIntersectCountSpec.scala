package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SortedIntersectCountSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("codegen path, SQL registration, nulls, empties") {
    val df = Seq(
      (1L, Seq(1L, 3L, 5L, 7L), Seq(2L, 3L, 5L, 8L)), // {3,5} -> 2
      (2L, Seq(1L, 2L), Seq(3L, 4L)),                 // disjoint -> 0
      (3L, Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),         // equal -> 3
      (4L, Seq.empty[Long], Seq(9L)),                 // empty -> 0
      (5L, Seq(-5L, 0L, 10L), Seq(-5L, 10L))          // negatives sort first
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), SortedIntersectCount(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === Map(1L -> 2, 2L -> 0, 3L -> 3, 4L -> 0, 5L -> 2))

    // SQL surface through GraftExtensions
    df.createOrReplaceTempView("sic_t")
    val sql = spark.sql("SELECT id, sorted_intersect_count(a, b) AS c FROM sic_t")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(sql === out)
    spark.catalog.dropTempView("sic_t")

    // null input -> null out (BinaryExpression null-safety)
    val withNull = Seq((1L, Option(Seq(1L)), Option.empty[Seq[Long]]))
      .toDF("id", "a", "b")
      .select(SortedIntersectCount(col("a"), col("b")).as("c")).collect()
    assert(withNull.head.isNullAt(0))
  }

  test("accepts nullable-element arrays; null elements never match (skipped)") {
    // r13 rejected containsNull = true at analysis time, which broke sources
    // that REPORT nullable elements without holding a null (CAST to
    // array<bigint>, parquet from other engines). Nullable types must work,
    // and actual null elements must count as matching nothing.
    val df = Seq((1L, Seq(1L, 2L, 3L))).toDF("id", "a")
    df.createOrReplaceTempView("sic_null_t")
    // nullable TYPE, no null values: same answer as the non-null path
    val castOnly = spark.sql(
      "SELECT sorted_intersect_count(a, CAST(array(2, 3, 9) AS ARRAY<BIGINT>)) AS c FROM sic_null_t")
      .collect().head.getInt(0)
    assert(castOnly === 2)
    // actual nulls (sorted null-first and null-last positions): skipped
    val withNulls = spark.sql(
      "SELECT sorted_intersect_count(a, array(CAST(NULL AS BIGINT), CAST(1 AS BIGINT), CAST(3 AS BIGINT))) AS c1, " +
        "sorted_intersect_count(array(CAST(2 AS BIGINT), CAST(NULL AS BIGINT)), a) AS c2 FROM sic_null_t")
      .collect().head
    assert(withNulls.getInt(0) === 2) // {1,3}
    assert(withNulls.getInt(1) === 1) // {2}; trailing null skipped
    spark.catalog.dropTempView("sic_null_t")
  }

  test("matches size(array_intersect) on random sorted distinct arrays") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 60L).map { i =>
      def arr() = rnd.shuffle((0L until 200L).toList).take(rnd.nextInt(40)).distinct.sorted
      (i, arr(), arr())
    }.toDF("id", "a", "b")
    val mine = rows.select(col("id"), SortedIntersectCount(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ref = rows.select(col("id"), size(array_intersect(col("a"), col("b"))).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(mine === ref)
  }
}
