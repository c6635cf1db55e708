package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main: one JSON line with per-query wall times.
  *
  * Measurement discipline (round-1 verdict fixes):
  *  - results are reduced with xxhash64 over ALL columns + a sum, so every
  *    projected expression is actually computed (a bare `.count()` lets Catalyst
  *    prune unreferenced projections and would partially measure scans);
  *  - one un-timed warm-up pass absorbs first-touch codegen / classloading /
  *    parquet footer caching, so per-query numbers measure the query;
  *  - failures are recorded per query (negative sentinel + stderr), never
  *    silently swallowed into a plausible wall time.
  */
object Bench {

  /** Force full computation of every output column. bit_xor is overflow-free
    * (ANSI mode) and order-independent. */
  private def consume(df: DataFrame): Unit = {
    val cols = df.columns.map(c => col(s"`$c`").cast("string"))
    df.select(xxhash64(cols: _*).as("h")).agg(expr("bit_xor(h)")).collect()
    ()
  }

  private def build(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

    // Each query runs on a FRESH SparkSession + SparkContext. Rounds 2-5 all
    // recorded 10-25× inflation on the heaviest queries in the full ~110-
    // execution session (q_dedup_clusters 98-104s, q_dedup_minhash 54-99s)
    // that no isolated rerun ever reproduced (4-9s under the same configs,
    // even with 8× CPU oversubscription or a quartered heap), and that
    // in-session cleanup (clearCache + blocking unpersist of all persistent
    // RDDs + stream stop + GC, rounds 3-4) did not eliminate. A context
    // restart is the measurement-hygiene guarantee: no storage blocks,
    // broadcasts, shuffle files, state stores, memory-sink tables, status-
    // store/listener backlog, or mutated session confs can leak between
    // measurements, whatever the decay mechanism was. Restart cost (~0.5s)
    // is paid OUTSIDE the per-query timer; JIT + whole-stage-codegen caches
    // are JVM-global, so the warm-up pass still warms the timed pass.
    var spark = build(cpus)
    def restart(): SparkSession = {
      // a failed teardown must never kill the whole bench run: log, wait out
      // transient churn (port reuse, executor threads draining), try once more
      try {
        spark.streams.active.foreach(_.stop())
        spark.stop()
      } catch { case e: Throwable => System.err.println(s"[bench] stop failed: ${e.getMessage}") }
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      spark =
        try build(cpus)
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] session rebuild failed, retrying: ${e.getMessage}")
            Thread.sleep(2000)
            build(cpus)
        }
      spark
    }

    // optional comma-separated filter for one-off investigations
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    // warm-up: run everything once, un-timed
    queries.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try consume(fn(spark, sfDir))
      catch { case e: Throwable => System.err.println(s"[bench][warmup] $name failed: ${e.getMessage}") }
      System.err.println(f"[bench][warmup] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
      restart()
    }

    // Timed: min of two isolated runs per query, with the two passes
    // INTERLEAVED suite-wide (pass 1 over every query, then pass 2 over every
    // query) rather than back-to-back per query. Round-6 postmortem: a
    // sustained ambient-load burst (anything else scheduled on the box) hits
    // both back-to-back samples of the same query, so min() can't cancel it —
    // q_er_mapping_combine recorded 10.8s vs 3.7s isolated. With the passes
    // a full suite apart (~minutes), a burst inflates at most one sample per
    // query. 1-minute /proc/loadavg is logged per measurement so any still-
    // inflated record is self-identifying in the driver log.
    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ").head
      catch { case _: Throwable => "?" }

    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    queries.foreach { case (name, _) => best(name) = -1.0 }
    def emit(): Unit = {
      val qs = best.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      val failed = best.valuesIterator.count(_ < 0)
      val total = best.valuesIterator.filter(_ >= 0).sum
      println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    }

    // Results are emitted even if a session rebuild dies mid-suite: a crash
    // in pass 2 must not discard every measurement already taken.
    val samples = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    def measure(pass: String, name: String, fn: (SparkSession, String) => DataFrame): Unit = {
      val load = loadavg()
      val t0 = System.nanoTime()
      val sec =
        try { consume(fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            -1.0
        }
      System.err.println(f"[bench][$pass] $name $sec%.2fs load=$load")
      if (sec >= 0) samples(name) = sec :: samples(name)
      val prev = best(name)
      best(name) = if (sec < 0) prev else if (prev < 0) sec else math.min(prev, sec)
      restart()
    }
    try {
      for (pass <- 1 to 2)
        queries.foreach { case (name, fn) => measure(s"pass$pass", name, fn) }
      // Adaptive third sample: two samples that disagree by >1.5× mean at
      // least one was taken under a load burst — exactly the case where
      // min-of-2 can still overstate (the smaller sample may itself be
      // inflated). Bounded extra cost: only the disagreeing queries re-run.
      val unstable = queries.filter { case (name, _) =>
        samples(name) match {
          case a :: b :: _ => math.max(a, b) > 1.5 * math.min(a, b)
          case _ => true // a failed sample: give it one more chance
        }
      }
      if (unstable.nonEmpty) {
        System.err.println(s"[bench] re-measuring ${unstable.size} unstable queries: " +
          unstable.map(_._1).mkString(", "))
        unstable.foreach { case (name, fn) => measure("pass3", name, fn) }
      }
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] suite aborted, emitting partial results: ${e.getMessage}")
    } finally {
      emit()
    }
    try spark.stop() catch { case _: Throwable => () }
  }
}
