package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "en", "a b c d e"),          // 5 tokens
    (2L, "en", "f g h"),              // 3
    (3L, "en", "i j k l"),            // 4
    (4L, "de", "m n"),                // 2
    (5L, "de", "o p q r s t u v")     // 8
  ).toDF("doc_id", "lang", "text")

  test("stratifiedSample: 0% keeps nothing, 100% keeps everything, deterministic") {
    val none = Corpus.stratifiedSample(docs, "cast(doc_id AS string)", "lang",
      Map.empty, defaultRate = 0)
    assert(none.count() === 0)
    val all = Corpus.stratifiedSample(docs, "cast(doc_id AS string)", "lang",
      Map.empty, defaultRate = 100)
    assert(all.count() === 5)
    val a = Corpus.stratifiedSample(docs, "cast(doc_id AS string)", "lang",
      Map("en" -> 50), 20).select("doc_id").as[Long].collect().sorted
    val b = Corpus.stratifiedSample(docs, "cast(doc_id AS string)", "lang",
      Map("en" -> 50), 20).select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b)) // hash-gated, not rand()
  }

  test("packSequences: start offsets are the running token sum per stream, chunked") {
    val out = Corpus.packSequences(docs, size(split(col("text"), " ")),
      partCols = Seq("lang"), orderCol = "doc_id", maxTokens = 6)
      .select("doc_id", "n_tokens", "seq_id", "seq_offset")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // en stream: starts 0, 5, 8 -> seqs 0,0,1; offsets 0,5,2
    assert(out(1L) === ((5L, 0L, 0L)))
    assert(out(2L) === ((3L, 0L, 5L)))
    assert(out(3L) === ((4L, 1L, 2L)))
    // de stream independent: starts 0, 2
    assert(out(4L) === ((2L, 0L, 0L)))
    assert(out(5L) === ((8L, 0L, 2L)))
  }

  test("mixByTokenBudget: zero budget drops a source, ample budget keeps all, partial thins") {
    import spark.implicits._
    // 50 docs x 10 tokens per source = 500 tokens/source
    val df = (0 until 150).map { i =>
      (i.toLong, s"src${i % 3}", Seq.fill(10)("w").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val out = Corpus.mixByTokenBudget(df, "cast(doc_id AS string)", "source",
      org.apache.spark.sql.functions.size(split(col("text"), " ")),
      budgets = Map("src0" -> 0L, "src1" -> 250L, "src2" -> 9999999L))
      .select("doc_id", "source").as[(Long, String)].collect()
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(!bySrc.contains("src0"))                   // zero budget -> nothing
    assert(bySrc("src2") === 50)                      // ample budget -> everything
    // 250/500 tokens -> ~half the docs; hash gate is not exact, allow slack
    assert(bySrc("src1") > 10 && bySrc("src1") < 40)
    // determinism: same inputs -> same rows
    val again = Corpus.mixByTokenBudget(df, "cast(doc_id AS string)", "source",
      org.apache.spark.sql.functions.size(split(col("text"), " ")),
      budgets = Map("src0" -> 0L, "src1" -> 250L, "src2" -> 9999999L))
      .select("doc_id", "source").as[(Long, String)].collect()
    assert(out.toSet === again.toSet)
  }

  test("chunk: short doc passes through whole, long doc windows with overlap") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c"),                             // 3 tokens < window -> 1 chunk
      (2L, (1 to 10).map("t" + _).mkString(" ")) // 10 tokens, window 4, overlap 1
    ).toDF("doc_id", "text")
    val out = Corpus.chunk(df, "doc_id", "text", chunkTokens = 4, overlap = 1)
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    assert(out(1L) === Seq((1L, 0L, "a b c", 3L)))
    // stride 3, ceil((10-1)/3) = 3 chunks: tokens 1-4, 4-7, 7-10 cover all
    assert(out(2L) === Seq(
      (2L, 0L, "t1 t2 t3 t4", 4L),
      (2L, 1L, "t4 t5 t6 t7", 4L),
      (2L, 2L, "t7 t8 t9 t10", 4L)))
    // consecutive chunks share exactly `overlap` tokens
    val texts = out(2L).map(_._3.split(" ").toSeq)
    texts.sliding(2).foreach { case Seq(a, b) => assert(a.takeRight(1) === b.take(1)) }
  }

  test("chunk property: chunks tile the stream — stride starts, exact overlap, full coverage") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val (win, ov) = (8, 3)
    val stride = win - ov
    val docs = (1 to 25).map { d =>
      val n = 1 + rnd.nextInt(40)
      (d.toLong, (1 to n).map(i => s"d${d}t$i").mkString(" "))
    }
    val out = Corpus.chunk(docs.toDF("doc_id", "text"), "doc_id", "text", win, ov)
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3.split(" ").toSeq)).toMap
    docs.foreach { case (d, text) =>
      val toks = text.split(" ").toSeq
      val chunks = out(d)
      // chunk i starts exactly i*stride tokens in
      chunks.zipWithIndex.foreach { case (c, i) =>
        assert(c.head === toks(i * stride), s"doc $d chunk $i start")
        assert(c.length <= win)
      }
      // stitching chunks (dropping each successor's overlap) rebuilds the doc
      val stitched = chunks.head ++ chunks.tail.flatMap(_.drop(ov))
      assert(stitched === toks, s"doc $d coverage")
    }
  }

  test("chunk: exact multiple of stride does not emit an empty trailing chunk") {
    import spark.implicits._
    val df = Seq((1L, (1 to 7).map("t" + _).mkString(" "))).toDF("doc_id", "text")
    // window 4, overlap 1, stride 3: ceil((7-1)/3) = 2 chunks, tokens 1-4, 4-7
    val out = Corpus.chunk(df, "doc_id", "text", chunkTokens = 4, overlap = 1)
      .as[(Long, Long, String, Long)].collect().sortBy(_._2)
    assert(out.map(_._3).toSeq === Seq("t1 t2 t3 t4", "t4 t5 t6 t7"))
  }

  test("vocabulary: rank contiguous, counts non-increasing, ties broken by token") {
    val v = Corpus.vocabulary(docs, "text", topN = 3)
      .select("token", "cnt", "rank").as[(String, Long, Long)].collect().sortBy(_._3)
    assert(v.map(_._3).toSeq === Seq(1L, 2L, 3L))
    assert(v.map(_._2).toSeq === v.map(_._2).toSeq.sortBy(-_))
    // all tokens appear once here -> pure lexicographic tie-break
    assert(v.map(_._1).toSeq === Seq("a", "b", "c"))
  }
}
