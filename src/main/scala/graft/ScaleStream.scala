package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Off-toy scale proof for the Structured Streaming pillar: drain a 10 M-event
  * backlog through the SAME transforms the oracle-checked queries use
  * ([[graft.streaming.Streams.windowedAggPlan]] / `sessionWindowPlan` /
  * the stream-stream interval join shape) and record what a capacity
  * planner needs:
  *
  *  - `rows_per_sec` — end-to-end drain throughput per stateful operator;
  *  - `batches` — the windowed/session phases run with `maxFilesPerTrigger`
  *    so the backlog crosses SEVERAL micro-batches: state merging across
  *    commits is exercised, not just the one-shot drain;
  *  - `state_rows_peak` — peak `numRowsTotal` across state operators, read
  *    from the progress events: the bounded-state claims
  *    (watermark-evicted windows, one open session per active chain,
  *    interval-bounded join buffers) as measured numbers;
  *  - exactness cross-checks against the BATCH execution of the identical
  *    plan: the windowed aggregate must match exactly (complete mode
  *    aggregates late rows regardless of arrival batch); the interval join
  *    runs the whole backlog in one batch so inner-join semantics are
  *    exact and its row count must equal the batch range join; the
  *    append-mode session phase reports emitted vs batch-total rows (the
  *    difference is the watermark-open tail, reported, not hidden).
  */
object ScaleStream {

  private def peakState(q: StreamingQuery): Long =
    q.recentProgress.flatMap(p => p.stateOperators.map(_.numRowsTotal)).foldLeft(0L)(math.max)

  private def batches(q: StreamingQuery): Int =
    q.recentProgress.count(_.numInputRows > 0)

  def main(args: Array[String]): Unit = {
    val nEvents = sys.env.getOrElse("SCALE_EVENTS", "10000000").toLong
    val nUsers = sys.env.getOrElse("SCALE_USERS", "50000").toLong
    val nFiles = 64
    val filesPerTrigger = 16 // => 4 micro-batches for the multi-batch phases
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("graft_scale_stream")
    TempCleanup.deleteOnExit(work)
    val tsRange = 2592000000000L // 30 days of microseconds
    spark.range(nEvents)
      .select(
        col("id").as("event_id"),
        pmod(xxhash64(col("id"), lit(3)), lit(tsRange)).as("ts"),
        pmod(xxhash64(col("id"), lit(2)), lit(nUsers)).as("user_id"),
        when(pmod(xxhash64(col("id"), lit(4)), lit(2)) === 0, lit("click"))
          .otherwise(lit("view")).as("event_type"),
        (pmod(xxhash64(col("id"), lit(5)), lit(1000)) / lit(100.0)).as("value"),
        lit("{}").as("props"))
      // TIME-ORDERED files (range-partition on ts): the file source feeds
      // batches in path order, so the watermark advances the way it does on
      // a real feed. Hash-random file order lets batch 1 contain near-max
      // timestamps — the watermark jumps to max-1h immediately and every
      // later batch's events arrive "late" and are dropped from stateful
      // aggregation, which both corrupts the session comparison and
      // understates the state work being measured.
      .repartitionByRange(nFiles, col("ts"))
      .sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(s"$work/events")
    val batchEvents = spark.read.schema(graft.streaming.Streams.eventsSchema)
      .parquet(s"$work/events")
    val total = batchEvents.count()

    def readStreamEvents(maxFiles: Option[Int]): DataFrame = {
      val r = spark.readStream.schema(graft.streaming.Streams.eventsSchema)
      maxFiles.foreach(m => r.option("maxFilesPerTrigger", m))
      r.parquet(s"$work/events")
    }

    def drain(name: String, out: DataFrame, mode: String): (Double, StreamingQuery, Long) = {
      var sink = 0L
      val t0 = System.nanoTime()
      val q = out.writeStream
        .outputMode(mode)
        .foreachBatch { (df: DataFrame, _: Long) =>
          // count + consume: measures the full pipeline, keeps the driver
          // from holding 10M result rows (complete mode REPLACES per batch,
          // so only the final batch's count stands)
          val n = df.count()
          if (mode == "complete") sink = n else sink += n
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.streams.resetTerminated()
      (sec, q, sink)
    }

    // 1) watermarked tumbling-window aggregate, 4 micro-batches
    val (winSec, winQ, winRows) = drain("windowed",
      graft.streaming.Streams.windowedAggPlan(readStreamEvents(Some(filesPerTrigger))),
      "complete")
    val winBatchRows = graft.streaming.Streams.windowedAggPlan(batchEvents).count()
    require(winRows == winBatchRows,
      s"windowed agg diverged from batch: $winRows vs $winBatchRows rows")

    // 2) native session_window sessionization (30 min gap), 4 micro-batches,
    // append mode: emitted = sessions the final watermark closed
    val (sesSec, sesQ, sesRows) = drain("sessions",
      graft.streaming.Streams.sessionWindowPlan(readStreamEvents(Some(filesPerTrigger)), 30),
      "append")
    val sesBatchRows = graft.streaming.Streams.sessionWindowPlan(batchEvents, 30).count()
    require(sesRows <= sesBatchRows,
      s"session stream emitted MORE than batch: $sesRows vs $sesBatchRows")

    // 3) stream-stream interval join (clicks to 60s post-view windows),
    // single batch so inner-join emission is exact vs the batch range join
    def sided(tpe: String): DataFrame = readStreamEvents(None)
      .filter(col("event_type") === tpe)
      .select(col("event_id").as(s"${tpe}_id"), col("user_id").as(s"${tpe}_user"),
        expr("timestamp_micros(ts)").as(s"${tpe}_ts"))
      .withWatermark(s"${tpe}_ts", "1 hour")
    val joined = sided("click").join(sided("view"),
      col("click_user") === col("view_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr("INTERVAL 60 seconds"))
    val (joinSec, joinQ, joinRows) = drain("interval_join", joined, "append")
    val batchJoinRows = graft.ops.RangeJoin.pointInRange(
      batchEvents.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts")),
      batchEvents.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          col("ts").as("w_start"), (col("ts") + 60L * 1000000L).as("w_end")),
      keys = Seq("user_id"), ptCol = "ts", startCol = "w_start", endCol = "w_end",
      binWidth = 60L * 1000000L).count()
    require(joinRows == batchJoinRows,
      s"stream interval join diverged from batch range join: $joinRows vs $batchJoinRows")

    def rate(sec: Double): Long = math.round(total / sec)
    println(s"""{"metric":"scale_stream","events":$total,"users":$nUsers,""" +
      s""""windowed":{"drain_sec":$winSec,"batches":${batches(winQ)},""" +
      s""""rows_per_sec":${rate(winSec)},"state_rows_peak":${peakState(winQ)},""" +
      s""""result_rows":$winRows},""" +
      s""""sessions":{"drain_sec":$sesSec,"batches":${batches(sesQ)},""" +
      s""""rows_per_sec":${rate(sesSec)},"state_rows_peak":${peakState(sesQ)},""" +
      s""""emitted":$sesRows,"batch_total":$sesBatchRows,""" +
      s""""open_tail":${sesBatchRows - sesRows}},""" +
      s""""interval_join":{"drain_sec":$joinSec,"batches":${batches(joinQ)},""" +
      s""""rows_per_sec":${rate(joinSec)},"state_rows_peak":${peakState(joinQ)},""" +
      s""""joined_rows":$joinRows}}""")
    spark.stop()
  }
}
