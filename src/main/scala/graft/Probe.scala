package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostics. Default mode: bucket-size distribution + candidate
  * volume of the MinHash cascade on a scaled corpus. `floor` mode: break the
  * fixed per-query cost a fresh-session bench sample pays — session build,
  * parquet listing/footer, first action (codegen + scheduling), warm action —
  * so the bench's per-query overhead floor is attributed, not guessed. */
object Probe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("floor")) { floorProbe(); return }
    if (args.headOption.contains("stream")) { streamProbe(); return }
    val copies = sys.env.getOrElse("SCALE_COPIES", "20").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm.Dedup

    val n = 32
    val docs = ScaleCorpus.build(spark, sfDir, copies, n).localCheckpoint(true)

    val sets = Dedup.shingleSets(docs, "text", "doc_id", 5).localCheckpoint(true)
    val sig = Dedup.minhashSignatures(sets, "doc_id", 8).localCheckpoint(true)

    val bandStructs = (0 until 4).map { b =>
      val bv = concat(col(s"h${b * 2}"), col(s"h${b * 2 + 1}"))
      struct(lit(b).as("band"), bv.as("bv"))
    }
    val bands = sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("x"))
      .select(col("doc_id"), col("x.band").as("band"), col("x.bv").as("bv"))
      .localCheckpoint(true)

    val sizes = bands.groupBy("band", "bv").agg(count(lit(1)).as("sz")).localCheckpoint(true)
    System.err.println("[probe] bucket size distribution (top 10):")
    sizes.orderBy(desc("sz")).limit(10).collect()
      .foreach(r => System.err.println(s"[probe]   band=${r.get(0)} sz=${r.get(2)}"))
    val stats = sizes.agg(
      count(lit(1)).as("buckets"),
      sum(col("sz") * col("sz")).as("sum_sq")).first()
    System.err.println(s"[probe] buckets=${stats.get(0)} sum_sq(pair work)=${stats.get(1)}")
    val capped = sizes.filter(col("sz") <= 50)
      .agg(sum(col("sz") * col("sz"))).first()
    System.err.println(s"[probe] pair work with cap 50: ${capped.get(0)}")
    spark.stop()
  }

  /** Per-batch breakdown of the bench's stream-stream interval-join drain:
    * how many AvailableNow micro-batches the fixture takes and where each
    * batch's time goes (planning, state commit, addBatch). */
  private def streamProbe(): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val d = p.durationMs
        println(s"[stream] batch=${p.batchId} rows=${p.numInputRows} " +
          s"trigger=${d.get("triggerExecution")}ms addBatch=${d.get("addBatch")}ms " +
          s"planning=${d.get("queryPlanning")}ms walCommit=${d.get("walCommit")}ms " +
          s"commitOffsets=${d.get("commitOffsets")}ms getBatch=${d.get("getBatch")}ms " +
          s"stateRows=${p.stateOperators.map(_.numRowsTotal).sum} " +
          s"stateCommitMs=${p.stateOperators.map(_.commitTimeMs).sum}")
      }
    })
    for (i <- 1 to sys.env.getOrElse("PROBE_REPS", "2").toInt) {
      val t0 = System.nanoTime()
      val out = graft.streaming.Streams.streamIntervalJoin(spark, s"$sfDir/events.parquet", 60)
      val n = out.count()
      println(f"[stream] rep=$i total=${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    spark.stop()
  }

  /** Fresh-session trivial-query cost breakdown, run K times (mirrors one
    * Bench sample: build a session, read a table, hash-reduce it). */
  private def floorProbe(): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("PROBE_REPS", "5").toInt
    def ms(t0: Long) = (System.nanoTime() - t0) / 1e6
    for (i <- 1 to reps) {
      val tBuild = System.nanoTime()
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.extensions", "graft.GraftExtensions")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val buildMs = ms(tBuild)
      val tRead = System.nanoTime()
      val df = spark.read.parquet(s"$sfDir/region.parquet") // 5 rows: pure overhead
      val readMs = ms(tRead)
      def consume(): Double = {
        val t = System.nanoTime()
        val cols = df.columns.map(c => col(s"`$c`").cast("string"))
        df.select(xxhash64(cols: _*).as("h")).agg(expr("bit_xor(h)")).collect()
        ms(t)
      }
      val firstMs = consume()  // plan + codegen + schedule + scan, cold session
      val warmMs = consume()   // same minus first-touch costs
      // a shuffling microquery: the smallest groupBy, to price one exchange
      val tShuffle = System.nanoTime()
      df.groupBy("r_regionkey").agg(count(lit(1))).collect()
      val shuffleMs = ms(tShuffle)
      println(f"""{"metric":"floor","rep":$i,"build_ms":$buildMs%.0f,"read_ms":$readMs%.0f,""" +
        f""""first_action_ms":$firstMs%.0f,"warm_action_ms":$warmMs%.0f,"shuffle_action_ms":$shuffleMs%.0f}""")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
