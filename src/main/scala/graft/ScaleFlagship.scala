package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Catalog, EtlGroup}

/** Off-toy scale proof for the WHOLE flagship pipeline shape: extraction →
  * ER (feature/block/pair/score/cluster) → id rewrite → grouping →
  * LinkIDValidators → final graph read, the reference's run_whole.py DAG —
  * `q_metagraph_whole` proves it at sf0.1; this runs the [[Flagship]]
  * config on a ×N corpus and attributes wall time PER STAGE (each stage
  * family executes as its own EtlGroup in dependency order — semantically
  * identical to the one concurrent group, but separable on the clock).
  *
  * Corpus scaling is id-disjoint replication: copy `rep` of every table
  * shifts its keys by rep·stride and suffixes its entity names, so node
  * counts, ER block counts, and link cardinalities all grow ×N (a naive row
  * copy would dedup away in the DISTINCT extractions). Part names get their
  * first TWO tokens rep-suffixed because those are the ER blocking keys —
  * without the suffix a ×100 corpus collapses into ~90 giant blocks and the
  * pair generator's skew cap (not the pipeline) becomes the thing measured;
  * with it, per-block size stays that of the base corpus and ER work scales
  * linearly, which is the production shape (more entities, not
  * proportionally hotter blocks).
  */
object ScaleFlagship {

  def main(args: Array[String]): Unit = {
    // comma-separated list → one record with a per-count `points` array
    // (the ×100-then-×250 linearity proof of the result stage runs as ONE
    // invocation); the LAST (largest) count is the headline record
    val copiesList = sys.env.getOrElse("SCALE_FLAGSHIP_COPIES", "100")
      .split(",").map(_.trim.toInt).toSeq
    // dedicated env (not SPARK_GRAFT_SF_DIR): the scale axis here is REPLICAS
    // of the sf0.01 base, not a bigger base — ER cluster sizes grow with the
    // per-replica corpus, and the final graph join fans out ~quadratically in
    // cluster size (measured: sf0.001 base ×2/link, sf0.01 ×36/link), so a
    // sf0.1 base at ×100 would blow the result join to billions of rows while
    // ×100 disjoint sf0.01 replicas keep every stage linear in copies — the
    // production shape (more entities, not hotter blocks)
    val sfDir = sys.env.getOrElse("SCALE_FLAGSHIP_SF_DIR", "/root/testdata/sf0.01")
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
        System.err.println(f"[scale_flagship][gate] $tag load=$l%.2f > $loadGate%.1f, waiting ${napMs / 1000}s")
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

    case class Point(copies: Int, counts: Map[String, Long],
                     stageSecs: scala.collection.Map[String, Double],
                     stageStragglers: scala.collection.Map[String, Double],
                     stageLoads: scala.collection.Map[String, Double],
                     graphRows: Long, mappingRows: Long)

    def runPoint(copies: Int): Point = {
    // --- id-disjoint ×copies corpus, projected to the columns the pipeline
    // reads, materialized and linked like real input tables
    val work = java.nio.file.Files.createTempDirectory("graft_scale_flagship")
    TempCleanup.deleteOnExit(work)
    val reps = broadcast(spark.range(copies).select(col("id").as("rep")))
    def base(name: String): DataFrame = spark.read.parquet(s"$sfDir/$name.parquet")
    // stride derived from the MEASURED max base key (one untimed setup job),
    // not assumed: a fixed 10M stride silently corrupts the scaled corpus
    // with replica-key collisions if SCALE_FLAGSHIP_SF_DIR points at a base
    // whose keys exceed it (sf10 orderkeys reach ~60M)
    def maxOf(name: String, cols: String*): DataFrame =
      base(name).select(max(cols.map(c => col(c).cast("long")).reduce(greatest(_, _))).as("m"))
    val maxBaseKey = Seq(
        maxOf("customer", "c_custkey"),
        maxOf("orders", "o_orderkey", "o_custkey"),
        maxOf("lineitem", "l_orderkey", "l_partkey"),
        maxOf("part", "p_partkey"))
      .reduce(_ union _).agg(max("m")).head.getLong(0)
    val stride = math.max(10000000L,
      math.pow(10, math.ceil(math.log10(maxBaseKey.toDouble + 1))).toLong)
    require(maxBaseKey < stride, s"stride $stride <= max base key $maxBaseKey")
    def shifted(c: String): org.apache.spark.sql.Column =
      (col(c) + col("rep") * stride).as(c)

    base("customer").crossJoin(reps)
      .select(shifted("c_custkey"),
        concat(col("c_name"), lit("#"), col("rep")).as("c_name"))
      .write.mode("overwrite").parquet(s"$work/in/customer.parquet")
    base("orders").crossJoin(reps)
      .select(shifted("o_orderkey"), shifted("o_custkey"), col("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$work/in/orders.parquet")
    base("lineitem").crossJoin(reps)
      .select(shifted("l_orderkey"), shifted("l_partkey"))
      .write.mode("overwrite").parquet(s"$work/in/lineitem.parquet")
    base("part").crossJoin(reps)
      .withColumn("toks", split(col("p_name"), " "))
      .select(shifted("p_partkey"),
        concat_ws(" ",
          concat(element_at(col("toks"), 1), lit("_"), col("rep")),
          concat(element_at(col("toks"), 2), lit("_"), col("rep")),
          array_join(slice(col("toks"), 3, 1000), " ")).as("p_name"))
      .write.mode("overwrite").parquet(s"$work/in/part.parquet")

    val cat = new Catalog(spark, s"$work/cat")
    val counts = Flagship.metagraph.inputIds.map { id =>
      cat.link(id, s"$work/in/$id.parquet")
      id -> spark.read.parquet(s"$work/in/$id.parquet").count()
    }.toMap

    // --- the pipeline, stage family by stage family
    val stageSecs = scala.collection.mutable.LinkedHashMap[String, Double]()
    val stageStragglers = scala.collection.mutable.LinkedHashMap[String, Double]()
    val stageLoads = scala.collection.mutable.LinkedHashMap[String, Double]()
    Flagship.stages.foreach { case (stage, nodes) =>
      val load = gateOnLoad(stage)
      val t0 = System.nanoTime()
      new EtlGroup(s"flagship_$stage", nodes, dropIntermediates = false)
        .execute(cat, maxActiveRun = 4)
      val sec = (System.nanoTime() - t0) / 1e9
      stageSecs(stage) = sec
      stageStragglers(stage) = straggler()
      stageLoads(stage) = load
      System.err.println(f"[scale_flagship] $stage $sec%.1fs load=$load%.2f")
    }

    val graph = cat.read("flagship_graph")
    val graphRows = graph.count()
    val mapping = cat.read("er_mapping")
    val mappingRows = mapping.count()
    // the flagship invariant: ER actually rewrote — no messy id survives
    // (the validate stage already threw if any link endpoint dangled)
    val messyLeft = graph.join(mapping,
      graph("to_id") === mapping("messy_id"), "left_semi").count()
    require(messyLeft == 0L, s"$messyLeft link endpoints still carry messy ids after ER rewrite")
    System.err.println(f"[scale_flagship] x$copies total=${stageSecs.values.sum}%.1fs " +
      s"graph_rows=$graphRows")
    // free this point's corpus + catalog NOW: every count above is already
    // materialized, and a multi-point run holding all work dirs until JVM
    // exit stacks ~13 GB (×100) + ~34 GB (×250) + ~55 GB (×400) of parquet
    // on one disk — eager deletion caps peak usage at the largest point
    TempCleanup.deleteNow(work)
    Point(copies, counts, stageSecs, stageStragglers, stageLoads, graphRows, mappingRows)
    } // runPoint

    val points = copiesList.map(runPoint)
    val p = points.last

    def jmap(m: scala.collection.Map[String, Double], f: Double => String): String =
      m.map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    val pointsJson = points.map { pt =>
      s"""{"copies":${pt.copies},"total_sec":${f"${pt.stageSecs.values.sum}%.3f"},""" +
        s""""result_sec":${f"${pt.stageSecs.getOrElse("result", 0.0)}%.3f"},""" +
        s""""graph_rows":${pt.graphRows}}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"scale_flagship","copies":${p.copies},""" +
      s""""customers":${p.counts("customer")},"orders":${p.counts("orders")},""" +
      s""""lineitems":${p.counts("lineitem")},"parts":${p.counts("part")},""" +
      s""""points":$pointsJson,""" +
      s""""stage_secs":${jmap(p.stageSecs, v => f"$v%.3f")},""" +
      s""""total_sec":${f"${p.stageSecs.values.sum}%.3f"},""" +
      s""""graph_rows":${p.graphRows},"er_mapping_rows":${p.mappingRows},""" +
      s""""messy_left":0,"validators_pass":true,""" +
      s""""stage_stragglers":${jmap(p.stageStragglers, v => f"$v%.2f")},""" +
      s""""loads":${jmap(p.stageLoads, v => f"$v%.2f")}}""")
    spark.stop()
  }
}
