package graft.sink

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

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
    * The loader opens each argument as a CSV file, so directories are
    * resolved to ONE CSV per entity: empty Spark partitions emit header-only
    * part files (no rows to load — dropped), and multiple data-bearing parts
    * are merged into a single `merged.csv` (first header kept, the repeated
    * per-part headers stripped) so the loader never sees the same label
    * twice — the reference's loader consumed exactly one CSV per label
    * (run_ingest.py:4-16) and repeated same-label descriptors are an
    * unverified extension of that contract. The merge is driver-local IO,
    * fine at export scale: the bulk loader itself is a single process, so a
    * graph small enough to bulk-insert is small enough to concatenate.
    * Merged files land in a fresh per-call temp STAGING dir (deleted at JVM
    * exit), never inside the export directory — building an argv must not
    * mutate the export artifact (and dry-run/test invocations stay free of
    * side effects on it). Since the merged filename no longer carries the
    * label, it is passed with the explicit-label flags
    * (`--nodes-with-label LABEL FILE` / `--relations-with-type TYPE FILE`).
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
        // header-only parts come from empty Spark partitions: nothing to load
        val dataParts = parts.filter(p => hasDataRow(s"$exportDir/$entry/$p"))
        dataParts match {
          case Seq() => Seq.empty // zero-row export: no entities of this label
          case Seq(one) => Seq(labeledFlag, label, s"$exportDir/$entry/$one")
          case many =>
            val merged = mergeParts(s"$exportDir/$entry", many, entry)
            Seq(labeledFlag, label, merged)
        }
      } else Seq(plainFlag, s"$exportDir/$entry")
    }
    val nodes = files.filter(_.startsWith("node_")).flatMap(e =>
      resolve(e, "--nodes", "--nodes-with-label", e.stripPrefix("node_")))
    val links = files.filter(_.startsWith("link_")).flatMap(e =>
      resolve(e, "--relations", "--relations-with-type", e.stripPrefix("link_")))
    Seq("redisgraph-bulk-insert", "-u", url, graphName,
      "--enforce-schema", "--skip-invalid-nodes", "--skip-invalid-edges") ++ nodes ++ links
  }

  /** True iff the CSV has at least one NON-BLANK row after the S7 header
    * line. Spark's text writer does not emit blank lines, but a hand-edited
    * or foreign part file with a trailing newline must not be classified as
    * data-bearing. Reads until the first data row — never the data body. */
  private def hasDataRow(path: String): Boolean = {
    val r = Files.newBufferedReader(Paths.get(path), StandardCharsets.UTF_8)
    try {
      if (r.readLine() == null) false // no header at all
      else Iterator.continually(r.readLine()).takeWhile(_ != null).exists(_.nonEmpty)
    } finally r.close()
  }

  /** Concatenate data-bearing part files into `merged.csv` inside a fresh
    * temp staging dir (registered for JVM-exit deletion): the first part's
    * header line leads, every other part's header is dropped (the S7
    * contract writes the identical typed header on each part), and blank
    * lines never propagate to the loader. Deterministic: parts arrive
    * sorted; the write goes to a temp file promoted by an ATOMIC_MOVE
    * within the same staging dir. */
  private def mergeParts(dir: String, parts: Seq[String], entry: String): String = {
    val staging = Files.createTempDirectory(s"graft_bulkload_${entry}_")
    graft.TempCleanup.deleteOnExit(staging)
    val out = staging.resolve("merged.csv")
    val tmp = staging.resolve(".merged.csv.tmp")
    val w = Files.newBufferedWriter(tmp, StandardCharsets.UTF_8,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    try {
      parts.zipWithIndex.foreach { case (p, i) =>
        val lines = Files.lines(Paths.get(dir, p), StandardCharsets.UTF_8)
        try {
          val it = lines.iterator().asScala
          if (i > 0 && it.hasNext) it.next() // skip the repeated header
          it.filter(_.nonEmpty).foreach { l => w.write(l); w.newLine() }
        } finally lines.close()
      }
    } finally w.close()
    Files.move(tmp, out,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    out.toString
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
