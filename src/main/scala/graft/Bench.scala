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

  /** Release state a query left behind (caches, checkpointed RDDs held only
    * by dead references) so later queries are measured on a clean session —
    * without this, storage accumulated across ~50 warm-up queries evicts the
    * next query's checkpoints and its timed pass degrades several-fold. */
  private def cleanup(spark: SparkSession): Unit = {
    // defensive: no query should leave a live stream, but a leaked one would
    // keep writing state forever and skew every later measurement
    spark.streams.active.foreach(_.stop())
    spark.streams.resetTerminated()
    spark.catalog.clearCache()
    // localCheckpoint()ed RDDs are persisted RDDs whose blocks are only freed
    // when the async ContextCleaner gets to the dead references; across ~50
    // queries they accumulate and evict later queries' live checkpoints
    // mid-loop, triggering recompute storms. Free them deterministically.
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    System.gc()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // A 110-execution session accumulates status-store state (job/stage/
      // task/SQL-execution records incl. full plan strings) that the listener
      // bus must keep maintaining; bound it so late queries aren't measured
      // on an aged driver.
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "100")
      .config("spark.ui.retainedTasks", "5000")
      .config("spark.sql.ui.retainedExecutions", "10")
      // ~110 executions write a lot of shuffle files; by default their
      // deletion is async (ContextCleaner best-effort after GC), so dead
      // shuffle data can pile up on local disk for the whole run and slow
      // every later disk-bound exchange. Blocking mode makes the per-query
      // System.gc() in cleanup() a deterministic disk release.
      .config("spark.cleaner.referenceTracking.blocking.shuffle", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // optional comma-separated filter for one-off investigations
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    // warm-up: run everything once, un-timed
    queries.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try consume(fn(spark, sfDir))
      catch { case e: Throwable => System.err.println(s"[bench][warmup] $name failed: ${e.getMessage}") }
      cleanup(spark)
      System.err.println(f"[bench][warmup] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    val results = queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val sec =
        try { consume(fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            -1.0
        }
      cleanup(spark)
      System.err.println(f"[bench] $name $sec%.2fs")
      name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
