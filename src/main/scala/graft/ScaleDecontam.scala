package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Off-toy scale proof for the decontamination family: does the Bloom gate
  * actually deliver its claimed shuffle reduction when the training corpus is
  * 1M+ documents and the benchmark is small?
  *
  * Workload: [[ScaleCorpus]] replicas of the sf documents table (copy 0
  * original, 1-in-10 copies a one-token mutant, the rest digest-perturbed) —
  * the benchmark is the ORIGINAL text of the first `SCALE_BENCH_DOCS` base
  * documents, so contamination is real (every benchmark doc has `copies`-1
  * siblings in training sharing most of its grams) but rare (the other base
  * documents' copies dominate the posting stream), mirroring the TB-corpus /
  * MB-benchmark shape of production decontamination.
  *
  * Measured:
  *  - `train_postings` / `gated_postings` — training gram postings total vs
  *    surviving the narrow `bloom_contains` prefilter: `postings_pruned_frac`
  *    is THE claim under test (TextAnalysis.contaminationFlagsBloom docs say
  *    "for a benchmark measured in MB against a corpus measured in TB that is
  *    a >99% shuffle reduction");
  *  - `bloom_sec` — the production operator ([[graft.llm.TextAnalysis.contaminationFlags]],
  *    Bloom-gated equi-join) end to end;
  *  - `nogate_sec` — the identical exact equi-join WITHOUT the gate, so the
  *    delta is exactly what the pruned postings buy;
  *  - `outputs_equal` — both paths' flagged sets compared (Bloom false
  *    positives are discarded by the confirming join, so they must match);
  *  - per-phase straggler ratio and 1-min loadavg, min-of-K per phase — the
  *    same measurement discipline as [[ScaleAnn]].
  */
object ScaleDecontam {

  def main(args: Array[String]): Unit = {
    val copies = sys.env.getOrElse("SCALE_COPIES", "250").toInt
    val benchBases = sys.env.getOrElse("SCALE_BENCH_DOCS", "250").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // n = 8: the production gram width (GPT-3 appendix C uses 13-grams, the
    // Pile 13, CCNet-family 8+) — short grams over-flag, and on THIS corpus
    // they collide by construction: the synthetic documents draw from a ~40
    // word vocabulary, so at n = 3 a 250-doc benchmark already covers 39% of
    // all training postings (measured: 80.5% pruned, 90% of docs flagged —
    // saturation, not contamination). At n = 8 the gram space is vocab^8 and
    // only true near-copies share grams, which is the TB-corpus/MB-benchmark
    // shape the Bloom gate's >99% claim is about.
    val gramN = sys.env.getOrElse("SCALE_GRAM_N", "8").toInt
    val minHits = 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def loadavg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ").head.toDouble
      catch { case _: Throwable => -1.0 }
    val loadGate = sys.env.get("SPARK_GRAFT_LOAD_GATE").map(_.toDouble)
      .getOrElse(math.max(2.0, 0.5 * cpus.toDouble))
    var waitBudgetMs = sys.env.get("SPARK_GRAFT_LOAD_WAIT_BUDGET_MS").map(_.toLong)
      .getOrElse(600000L)
    def gateOnLoad(tag: String): Double = {
      var l = loadavg()
      var tries = 0
      while (l > loadGate && tries < 10 && waitBudgetMs > 0) {
        val napMs = math.min(30000L, waitBudgetMs)
        System.err.println(f"[scale_decontam][gate] $tag load=$l%.2f > $loadGate%.1f, waiting ${napMs / 1000}s")
        Thread.sleep(napMs)
        waitBudgetMs -= napMs
        tries += 1
        l = loadavg()
      }
      l
    }

    val durations = new ConcurrentLinkedQueue[(Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        durations.add((te.stageId, te.taskInfo.duration)); ()
      }
    })
    def straggler(): Double = {
      val byStage = durations.toArray(Array.empty[(Int, Long)])
        .groupBy(_._1).values.map(_.map(_._2).filter(_ >= 200).sorted)
        .filter(_.length >= 8)
      val r = if (byStage.isEmpty) 1.0
        else byStage.map(ts => ts.last.toDouble / ts(ts.length / 2).toDouble).max
      durations.clear()
      r
    }
    val phaseSamples = sys.env.getOrElse("SCALE_PHASE_SAMPLES", "2").toInt
    def bestOf[A](tag: String)(body: => A): (A, Double, Double, Double) = {
      val runs = (1 to phaseSamples).map { _ =>
        val load = gateOnLoad(tag)
        val t = System.nanoTime()
        val a = body
        val sec = (System.nanoTime() - t) / 1e9
        val st = straggler()
        System.err.println(f"[scale_decontam] $tag sample $sec%.1fs load=$load%.2f")
        (a, sec, st, load)
      }
      runs.minBy(_._2)
    }

    // --- scaled corpus, materialized and re-read like a real input table
    val work = java.nio.file.Files.createTempDirectory("graft_scale_decontam")
    TempCleanup.deleteOnExit(work)
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    ScaleCorpus.build(spark, sfDir, copies, n)
      .write.mode("overwrite").parquet(s"$work/docs.parquet")
    val corpus = spark.read.parquet(s"$work/docs.parquet")
    // ScaleCorpus ids are base*1000 + copy: copy 0 of the first benchBases
    // base documents is the benchmark; everything else trains
    val isBench = col("doc_id") % 1000 === 0 && col("doc_id") < benchBases.toLong * 1000L
    val bench = corpus.filter(isBench)
    val train = corpus.filter(!isBench)
    val nDocs = corpus.count()
    val benchBytes = bench.agg(sum(length(col("text")))).head.getLong(0)

    import graft.llm.TextAnalysis

    // --- the pruning claim, measured directly on the posting stream
    // (untimed diagnostics — counts, not wall times)
    val dGrams = train.select(col("doc_id"), explode(TextAnalysis.wordGrams("text", gramN)).as("g"))
    val bGrams = bench.select(explode(TextAnalysis.wordGrams("text", gramN)).as("g"))
      .distinct().localCheckpoint(true)
    val benchGrams = bGrams.count()
    val bloomBin = bGrams
      .agg(call_function("bloom_agg", xxhash64(col("g")),
        lit(math.max(1024L, 2L * benchGrams))).as("bf"))
      .head.getAs[Array[Byte]](0)
    val trainPostings = dGrams.count()
    val gatedPostings = dGrams
      .filter(call_function("bloom_contains", lit(bloomBin), xxhash64(col("g"))))
      .count()
    val prunedFrac = 1.0 - gatedPostings.toDouble / trainPostings.toDouble

    // --- timed: the production operator (Bloom-gated exact equi-join)
    val (bloomOut, bloomSec, bloomStraggler, loadBloom) = bestOf("bloom") {
      val out = TextAnalysis.contaminationFlags(train, bench, "text", "doc_id",
        n = gramN, minHits = minHits).localCheckpoint(true)
      out.count()
      out
    }
    val flaggedRows = bloomOut.count()

    // --- timed: the identical exact equi-join WITHOUT the gate — every
    // training posting crosses the join shuffle just to (mostly) miss
    val (nogateOut, nogateSec, nogateStraggler, loadNogate) = bestOf("nogate") {
      val out = dGrams.join(bGrams, Seq("g"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= minHits)
        .localCheckpoint(true)
      out.count()
      out
    }

    // Bloom false positives are discarded by the confirming join, so the two
    // flagged sets must be identical
    val outputsEqual =
      bloomOut.except(nogateOut).isEmpty && nogateOut.except(bloomOut).isEmpty

    println(s"""{"metric":"scale_decontam","docs":$nDocs,"copies":$copies,""" +
      s""""bench_docs":$benchBases,"bench_bytes":$benchBytes,"bench_grams":$benchGrams,""" +
      s""""gram_n":$gramN,"min_hits":$minHits,""" +
      s""""train_postings":$trainPostings,"gated_postings":$gatedPostings,""" +
      s""""postings_pruned_frac":$prunedFrac,""" +
      s""""bloom_sec":$bloomSec,"nogate_sec":$nogateSec,"flagged_rows":$flaggedRows,""" +
      s""""outputs_equal":$outputsEqual,""" +
      s""""stragglers":{"bloom":$bloomStraggler,"nogate":$nogateStraggler},""" +
      s""""loads":{"bloom":$loadBloom,"nogate":$loadNogate}}""")
    spark.stop()
  }
}
