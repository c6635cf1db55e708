package graft.sink

import java.io.File

/** S11 — RedisGraph bulk-load invocation (reference: examples/run_ingest.py:4-16):
  * scan an export directory for the S7 CSV files ([[RedisGraphCsv]] layout:
  * `node_*` / `link_*`), assemble the `redisgraph-bulk-insert` argument vector,
  * and hand it to a runner. The runner is injected — production passes a real
  * process launcher, the zero-egress environment (and the spec) passes a
  * recorder — so the *contract* (flags, file discovery, ordering) is testable
  * without Redis.
  *
  * Unlike the reference's `os.system(cmd)` string concatenation, the command
  * is built as an argv list (no shell, no quoting bugs). File discovery is
  * sorted for determinism (os.listdir order is filesystem-dependent).
  */
object RedisGraphBulkLoad {

  /** The loader argv for an export dir (one file set per graph).
    *
    * @param exportDir directory holding `node_<label>` / `link_<rel>` CSVs
    * @param url       redis endpoint (reference: redis://localhost:9001)
    * @param graphName target graph key (reference: PYPI)
    */
  def command(exportDir: String, url: String, graphName: String): Seq[String] = {
    val files = Option(new File(exportDir).list()).map(_.toSeq).getOrElse(Seq.empty).sorted
    val nodes = files.filter(_.startsWith("node_"))
      .flatMap(f => Seq("--nodes", s"$exportDir/$f"))
    val links = files.filter(_.startsWith("link_"))
      .flatMap(f => Seq("--relations", s"$exportDir/$f"))
    Seq("redisgraph-bulk-insert", "-u", url, graphName,
      "--enforce-schema", "--skip-invalid-nodes", "--skip-invalid-edges") ++ nodes ++ links
  }

  /** Build and run the load. @param runner argv => exit code (injectable). */
  def run(exportDir: String, url: String, graphName: String)
         (runner: Seq[String] => Int): Int = {
    val argv = command(exportDir, url, graphName)
    val rc = runner(argv)
    require(rc == 0, s"redisgraph-bulk-insert exited $rc: ${argv.mkString(" ")}")
    rc
  }

  /** Default production runner: spawn the process, inherit IO. Kept trivial
    * and injectable so environments without the loader binary never call it. */
  def processRunner(argv: Seq[String]): Int =
    new ProcessBuilder(argv: _*).inheritIO().start().waitFor()
}
