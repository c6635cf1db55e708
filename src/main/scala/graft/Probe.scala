package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch repetition probe: does re-running the same query degrade in-session? */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val which = sys.env.getOrElse("PROBE_Q", "q_dedup_clusters")
    val rounds = sys.env.getOrElse("PROBE_N", "6").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fn = SparkEntry.queries(which)
    (1 to rounds).foreach { round =>
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val cols = df.columns.map(c => col(s"`$c`").cast("string"))
      df.select(xxhash64(cols: _*).as("h")).agg(expr("bit_xor(h)")).collect()
      System.err.println(f"[probe] $which round $round ${(System.nanoTime() - t0) / 1e9}%.2fs")
      spark.streams.active.foreach(_.stop())
      spark.streams.resetTerminated()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    spark.stop()
  }
}
