package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Off-toy scale proof for [[graft.ops.ZOrder]]: the scaladoc promises that a
  * z-ordered layout gives every file/row-group a tight min/max envelope on
  * EVERY clustered column, so selective multi-column filters skip most of the
  * data — this harness measures that skipping instead of asserting it.
  *
  * Method: synthesize `SCALE_EVENTS` events (hash-scattered user ids and
  * timestamps, the [[ScaleJoins]] generator), write them twice at the same
  * file/row-group granularity —
  *
  *  - `plain`: range-partitioned + sorted by `ts_us` (the natural ingest
  *    order of an event stream: perfect time locality, none on user);
  *  - `zorder`: [[graft.ops.ZOrder.clusteredWrite]] on (user_id, ts_us);
  *
  * — then audit the parquet FOOTERS directly (same stats the reader's
  * row-group pruning consults, parquet-hadoop public API): a row group is
  * prunable for a predicate iff its min/max envelope misses the predicate
  * range on at least one conjunct. Reported per layout:
  *
  *  - `rg_skip_frac` / `row_skip_frac` — fraction of row groups / rows a
  *    min/max-pruning scan skips for the two-column probe
  *    (0.1 % selectivity: 1 % of users × 10 % of the time range);
  *  - `row_skip_frac_user` — same for the user-ONLY probe, the dimension a
  *    time-sorted layout cannot prune at all (its z-order number is the
  *    clustering win in its purest form);
  *  - `scan_sec` — wall time of the actual filtered Spark scan (pushed
  *    filters → parquet row-group pruning), result rows required identical
  *    across layouts.
  *
  * Row groups are capped small (`parquet.block.size` 1 MiB) so the 10 M-row
  * corpus yields hundreds of pruning units — the same files-per-terabyte
  * granularity a real lakehouse table has, shrunk to harness scale.
  */
object ScaleZOrder {

  /** Footer audit: (rowGroups, rowGroupsSkipped2d, rowsTotal, rowsSkipped2d,
    * rowsSkippedUserOnly, files, filesSkipped2d) for a conjunctive range
    * probe on two long columns. */
  private def auditFooters(dir: String, userLo: Long, userHi: Long,
                           tsLo: Long, tsHi: Long): (Long, Long, Long, Long, Long, Long, Long) = {
    val conf = new Configuration()
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && f.isFile)
      .sortBy(_.getName)
    var rgs = 0L; var rgsSkip = 0L; var rows = 0L; var rowsSkip = 0L
    var rowsSkipUser = 0L; var nFiles = 0L; var filesSkip = 0L
    files.foreach { f =>
      val in = HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf)
      val reader = ParquetFileReader.open(in)
      try {
        nFiles += 1
        var fileAllSkip = true
        reader.getFooter.getBlocks.forEach { block =>
          def range(colName: String): (Long, Long) = {
            val cc = block.getColumns.stream()
              .filter(c => c.getPath.toDotString == colName).findFirst().get()
            val st = cc.getStatistics
            (st.genericGetMin.asInstanceOf[Number].longValue(),
              st.genericGetMax.asInstanceOf[Number].longValue())
          }
          val (uMin, uMax) = range("user_id")
          val (tMin, tMax) = range("ts_us")
          val userMiss = uMax < userLo || uMin > userHi
          val tsMiss = tMax < tsLo || tMin > tsHi
          rgs += 1
          rows += block.getRowCount
          if (userMiss || tsMiss) { rgsSkip += 1; rowsSkip += block.getRowCount }
          else fileAllSkip = false
          if (userMiss) rowsSkipUser += block.getRowCount
        }
        if (fileAllSkip) filesSkip += 1
      } finally reader.close()
    }
    (rgs, rgsSkip, rows, rowsSkip, rowsSkipUser, nFiles, filesSkip)
  }

  def main(args: Array[String]): Unit = {
    val nEvents = sys.env.getOrElse("SCALE_EVENTS", "10000000").toLong
    val nUsers = sys.env.getOrElse("SCALE_USERS", "50000").toLong
    val nFiles = sys.env.getOrElse("SCALE_ZORDER_FILES", "64").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("graft_scale_zorder")
    TempCleanup.deleteOnExit(work)
    val tsRange = 2592000000000L // 30 days of microseconds
    spark.range(nEvents)
      .select(
        col("id").as("event_id"),
        pmod(xxhash64(col("id"), lit(2)), lit(nUsers)).as("user_id"),
        pmod(xxhash64(col("id"), lit(3)), lit(tsRange)).as("ts_us"),
        (pmod(xxhash64(col("id"), lit(5)), lit(1000)) / lit(100.0)).as("value"))
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    val events = spark.read.parquet(s"$work/events.parquet")
    val total = events.count()

    // small row groups => many pruning units at harness scale (see scaladoc)
    val rgBytes = (1 << 20).toString

    val tPlain = System.nanoTime()
    events.repartitionByRange(nFiles, col("ts_us"))
      .sortWithinPartitions("ts_us")
      .write.mode("overwrite").option("parquet.block.size", rgBytes)
      .parquet(s"$work/plain")
    val plainWriteSec = (System.nanoTime() - tPlain) / 1e9

    val tZ = System.nanoTime()
    // session-conf entries are copied into the write job's Hadoop conf, so
    // this caps clusteredWrite's internal writer the same way .option does
    spark.conf.set("parquet.block.size", rgBytes)
    graft.ops.ZOrder.clusteredWrite(events, Seq("user_id", "ts_us"), s"$work/zorder", nFiles)
    val zWriteSec = (System.nanoTime() - tZ) / 1e9

    // probe: 1% of users x 10% of the time range ~ 0.1% of rows
    val userLo = 1000L; val userHi = userLo + nUsers / 100 - 1
    val tsLo = tsRange / 3; val tsHi = tsLo + tsRange / 10 - 1

    val probe2d = col("user_id").between(userLo, userHi) &&
      col("ts_us").between(tsLo, tsHi)
    val probeUser = col("user_id").between(userLo, userHi)

    def timedScan(path: String, pred: org.apache.spark.sql.Column): (Double, Long) = {
      val t0 = System.nanoTime()
      val r = spark.read.parquet(path).filter(pred)
        .agg(count(lit(1)).as("n"), sum("value")).collect()(0)
      ((System.nanoTime() - t0) / 1e9, r.getLong(0))
    }

    // interleaved two-sample min per layout: same defense as Bench's
    // min-of-interleaved against a one-off burst landing on one layout
    var plainSec = Double.MaxValue; var zSec = Double.MaxValue
    var plainUserSec = Double.MaxValue; var zUserSec = Double.MaxValue
    var plainRows = -1L; var zRows = -1L
    var plainUserRows = -1L; var zUserRows = -1L
    for (_ <- 1 to 2) {
      val (ps, pr) = timedScan(s"$work/plain", probe2d)
      plainSec = math.min(plainSec, ps); plainRows = pr
      val (zs, zr) = timedScan(s"$work/zorder", probe2d)
      zSec = math.min(zSec, zs); zRows = zr
      val (pus, pur) = timedScan(s"$work/plain", probeUser)
      plainUserSec = math.min(plainUserSec, pus); plainUserRows = pur
      val (zus, zur) = timedScan(s"$work/zorder", probeUser)
      zUserSec = math.min(zUserSec, zus); zUserRows = zur
    }
    require(plainRows == zRows, s"layouts disagree: plain $plainRows vs zorder $zRows rows")
    require(plainUserRows == zUserRows,
      s"layouts disagree on user probe: $plainUserRows vs $zUserRows rows")

    val (pRgs, pRgsSkip, pRows, pRowsSkip, pRowsSkipUser, pFiles, pFilesSkip) =
      auditFooters(s"$work/plain", userLo, userHi, tsLo, tsHi)
    val (zRgs, zRgsSkip, zRowsT, zRowsSkip, zRowsSkipUser, zFiles, zFilesSkip) =
      auditFooters(s"$work/zorder", userLo, userHi, tsLo, tsHi)
    require(pRows == total && zRowsT == total, s"footer row counts diverge: $pRows/$zRowsT vs $total")

    def frac(num: Long, den: Long): Double =
      if (den == 0) 0.0 else num.toDouble / den.toDouble

    println(s"""{"metric":"scale_zorder","events":$total,"files":$nFiles,""" +
      s""""probe_rows":$plainRows,"probe_rows_user":$plainUserRows,""" +
      s""""plain":{"rgs":$pRgs,"rg_skip_frac":${frac(pRgsSkip, pRgs)},""" +
      s""""row_skip_frac":${frac(pRowsSkip, pRows)},""" +
      s""""row_skip_frac_user":${frac(pRowsSkipUser, pRows)},""" +
      s""""files_skipped":$pFilesSkip,"n_files":$pFiles,""" +
      s""""scan_sec":$plainSec,"scan_user_sec":$plainUserSec,"write_sec":$plainWriteSec},""" +
      s""""zorder":{"rgs":$zRgs,"rg_skip_frac":${frac(zRgsSkip, zRgs)},""" +
      s""""row_skip_frac":${frac(zRowsSkip, zRowsT)},""" +
      s""""row_skip_frac_user":${frac(zRowsSkipUser, zRowsT)},""" +
      s""""files_skipped":$zFilesSkip,"n_files":$zFiles,""" +
      s""""scan_sec":$zSec,"scan_user_sec":$zUserSec,"write_sec":$zWriteSec}}""")
    spark.stop()
  }
}
