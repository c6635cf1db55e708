package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("distinctOn keeps exactly one row per key") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
    val out = DistinctOn.distinctOn(df, Seq("k"))
    assert(out.count() === 2)
    assert(out.select("k").as[String].collect().toSet === Set("a", "b"))
  }

  test("distinctOnOrdered keeps the best row per key deterministically (canon.py:160-164)") {
    val df = Seq(("a", 1, "x"), ("a", 9, "y"), ("a", 9, "z"), ("b", 5, "w")).toDF("k", "score", "tag")
    val out = DistinctOn.distinctOnOrdered(df,
      keys = Seq(col("k")), order = Seq(col("score").desc, col("tag").asc))
    assert(TestSpark.rows(out) === Set(Seq("a", 9, "y"), Seq("b", 5, "w")))
  }

  test("hash ids are stable and collision-distinct on small domains") {
    val df = Seq("x", "y", "x").toDF("s").select(Ids.hash64(col("s")).as("h"))
    val hs = df.as[Long].collect()
    assert(hs(0) === hs(2))
    assert(hs(0) !== hs(1))
  }

  test("hashKey separates composite keys that concat would merge") {
    val a = Seq(("ab", "c")).toDF("x", "y").select(Ids.hashKey(col("x"), col("y")).as("h")).as[Long].head()
    val b = Seq(("a", "bc")).toDF("x", "y").select(Ids.hashKey(col("x"), col("y")).as("h")).as[Long].head()
    assert(a !== b)
  }

  test("flattenStruct extracts nested JSON fields (tabularize.py:44-71)") {
    val schema = StructType(Seq(
      StructField("info", StructType(Seq(
        StructField("name", StringType), StructField("version", StringType))))))
    val df = Seq("""{"info":{"name":"pkg","version":"1.0"}}""", """{"info":{"name":"other"}}""")
      .toDF("latest")
    val out = JsonFlatten.flattenStruct(df, "latest", schema, Seq("info.name", "info.version"))
    assert(TestSpark.rows(out.select(col("`info.name`"), col("`info.version`"))) ===
      Set(Seq("pkg", "1.0"), Seq("other", null)))
  }

  test("explodeJsonArray yields one row per element and zero rows for null/missing arrays (tabularize.py:73-93)") {
    val df = Seq((1, """["a","b"]"""), (2, null), (3, """[]""")).toDF("id", "arr")
    val out = JsonFlatten.explodeJsonArray(df, "arr", "item")
    assert(TestSpark.rows(out.select("id", "item")) === Set(Seq(1, "a"), Seq(1, "b")))
  }

  test("explodeJsonMap yields (key,value) rows and drops null values (tabularize.py:95-115)") {
    val df = Seq((1, """{"home":"http://h","docs":null}""")).toDF("id", "urls")
    val out = JsonFlatten.explodeJsonMap(df, "urls", "url_type", "url")
    assert(TestSpark.rows(out.select("id", "url_type", "url")) === Set(Seq(1, "home", "http://h")))
  }

  test("toJson/from_json round-trips (F7 both directions, crawl.py:54 / tabularize.py:25)") {
    val df = Seq((1L, "pkg", 2L)).toDF("id", "name", "n")
    val json = df.select(JsonFlatten.toJson(col("name"), col("n")).as("j")).as[String].head()
    assert(json === """{"name":"pkg","n":2}""")
    val back = Seq(json).toDF("j")
      .select(from_json(col("j"), StructType(Seq(
        StructField("name", StringType), StructField("n", LongType)))).as("s"))
      .select("s.name", "s.n").head()
    assert((back.getString(0), back.getLong(1)) === (("pkg", 2L)))
  }

  test("jsonCardinality counts object keys (F12, crawl.py:30-34)") {
    val df = Seq("""{"a":1,"b":2}""", """{}""").toDF("j")
    assert(df.select(JsonFlatten.jsonCardinality(col("j")).as("n")).as[Int].collect().toSeq === Seq(2, 0))
  }

  test("TextNorm collapses punctuation/whitespace and lowercases (dedupe_example.py:30-47)") {
    val out = Seq("  Foo-BAR/baz,  qux:  'quoted'\nline ")
      .toDF("s").select(TextNorm.normalize(col("s")).as("n")).as[String].head()
    assert(out === "foo bar baz qux quoted line")
  }
}
