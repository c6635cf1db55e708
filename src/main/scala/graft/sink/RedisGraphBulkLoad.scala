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
    * A `node_<label>` / `link_<rel>` entry is either a plain CSV file (the
    * reference's layout — label inferred by the loader from the filename) or
    * a Spark text-output DIRECTORY holding `part-*` files plus `_SUCCESS`.
    * The loader opens each argument as a CSV file, so directories must be
    * resolved to their part files; since a part filename no longer carries
    * the label, those are passed with the explicit-label flags
    * (`--nodes-with-label LABEL FILE` / `--relations-with-type TYPE FILE`,
    * repeatable — each part file leads with its own header per the S7
    * contract, so every part parses standalone).
    *
    * @param exportDir directory holding `node_<label>` / `link_<rel>` CSVs
    * @param url       redis endpoint (reference: redis://localhost:9001)
    * @param graphName target graph key (reference: PYPI)
    */
  def command(exportDir: String, url: String, graphName: String): Seq[String] = {
    val files = Option(new File(exportDir).list()).map(_.toSeq).getOrElse(Seq.empty).sorted
    def resolve(entry: String, plainFlag: String, labeledFlag: String, label: String): Seq[String] = {
      val f = new File(exportDir, entry)
      if (f.isDirectory) {
        val parts = Option(f.list()).map(_.toSeq).getOrElse(Seq.empty)
          .filter(_.startsWith("part-")).sorted
        require(parts.nonEmpty, s"no part-* files in Spark output dir $f")
        parts.flatMap(p => Seq(labeledFlag, label, s"$exportDir/$entry/$p"))
      } else Seq(plainFlag, s"$exportDir/$entry")
    }
    val nodes = files.filter(_.startsWith("node_")).flatMap(e =>
      resolve(e, "--nodes", "--nodes-with-label", e.stripPrefix("node_")))
    val links = files.filter(_.startsWith("link_")).flatMap(e =>
      resolve(e, "--relations", "--relations-with-type", e.stripPrefix("link_")))
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
