package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-memoized testdata reads for the query surface.
  *
  * A schemaless `spark.read.parquet` runs a one-task footer-inference job
  * before the query proper — pure per-query floor (0.1-0.3s each on this
  * machine), paid again for every table because the bench isolates each
  * query in a fresh SparkSession (see [[graft.Bench]]'s session discipline).
  * The testdata is immutable for the process lifetime, so the inferred
  * schema is memoized per PATH process-wide (the same advisory-memo rule as
  * [[graft.engine.Catalog]]'s schema map): the first read infers, every
  * later read — any query, any session — skips straight to the scan.
  */
object Tables {

  private val schemas = new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  /** Memo key fingerprints the dataset's current state (same defense as
    * LlmQueries' AnnIndex key): a table regenerated in-JVM with a changed
    * schema must MISS — serving the old schema to spark.read.schema would
    * silently return NULL for the renamed columns, not an error. For the
    * read-only testdata the stat costs ~nothing and the key never changes. */
  private def key(path: String): String = {
    val d = new java.io.File(path.stripPrefix("file:"))
    val parts = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("part-"))
    s"$path@${d.lastModified()}#${parts.length}:${parts.map(_.length()).sum}"
  }

  /** Read `dir/name.parquet` with the memoized schema (inferring and
    * memoizing on first touch). */
  def read(s: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val sch = schemas.computeIfAbsent(key(path), _ => s.read.parquet(path).schema)
    s.read.schema(sch).parquet(path)
  }

  /** [[read]] + temp-view registration, for the SQL-text queries. */
  def view(s: SparkSession, dir: String, name: String): Unit = {
    read(s, dir, name).createOrReplaceTempView(name)
    ()
  }
}
