package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // a deliberately hot key 0 plus normal keys, incl. a left key with no match
  private lazy val facts = ((1L to 50L).map(i => (i, 0L)) ++
    Seq((100L, 1L), (101L, 2L), (102L, 9L))).toDF("row_id", "k")
  private lazy val dim = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "unused"))
    .toDF("k", "name")

  test("inner salted join is row-identical to the plain join") {
    val plain = facts.join(dim, Seq("k")).select("row_id", "k", "name")
      .as[(Long, Long, String)].collect().sorted
    val salted = SkewJoin.salted(facts, dim, Seq("k"), col("row_id"), salt = 4)
      .select("row_id", "k", "name").as[(Long, Long, String)].collect().sorted
    assert(salted.sameElements(plain))
  }

  test("left salted join keeps unmatched left rows exactly once") {
    val out = SkewJoin.salted(facts, dim, Seq("k"), col("row_id"), salt = 4,
      joinType = "left")
      .select("row_id", "name").as[(Long, Option[String])].collect()
    assert(out.length === facts.count())
    assert(out.toMap.apply(102L) === None) // k=9 has no dim row
  }

  test("reserved __salt column is rejected") {
    assertThrows[IllegalArgumentException] {
      SkewJoin.salted(facts.withColumn("__salt", lit(0)), dim, Seq("k"),
        col("row_id"), 4)
    }
  }
}
