package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class KmvMinHashesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("below k distinct values the sketch IS the distinct set (exact branch)") {
    val df = Seq("a", "b", "a", "c", "b").toDF("v")
    val out = df.agg(KmvMinHashes(col("v"), 64).as("s"))
      .select(KmvMinHashes.estimate(col("s"), 64).as("est"), size(col("s")).as("n"))
      .collect().head
    assert(out.getDouble(0) === 3.0)
    assert(out.getInt(1) === 3)
  }

  test("sketch is partition-layout invariant (partial merge correctness)") {
    val vals = (0 until 5000).map(i => s"v$i")
    val one = vals.toDF("v").coalesce(1)
      .agg(KmvMinHashes(col("v"), 32).as("s")).select("s").as[Seq[String]].head()
    val many = vals.toDF("v").repartition(17)
      .agg(KmvMinHashes(col("v"), 32).as("s")).select("s").as[Seq[String]].head()
    assert(one === many)
    assert(one.length === 32)
    assert(one === one.sorted)
  }

  test("estimator lands within the KMV error bound on 10k distinct values") {
    val vals = (0 until 10000).map(i => s"item_$i")
    val k = 256
    val est = vals.toDF("v").agg(KmvMinHashes(col("v"), k).as("s"))
      .select(KmvMinHashes.estimate(col("s"), k).as("e")).as[Double].head()
    // KMV relative std error ~ 1/sqrt(k-2) ≈ 6.3%; assert within 4 sigma
    assert(math.abs(est - 10000.0) / 10000.0 < 0.25, s"estimate $est too far from 10000")
  }

  test("duplicates never inflate the sketch; nulls are ignored") {
    val df = (Seq.fill(100)("dup") ++ Seq("x", "y")).map(Option(_))
      .appended(Option.empty[String]).toDF("v")
    val out = df.agg(KmvMinHashes(col("v"), 8).as("s"))
      .select(size(col("s"))).as[Int].head()
    assert(out === 3)
  }
}
