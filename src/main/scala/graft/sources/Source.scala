package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pluggable external-source layer (SURVEY §2.2 S8/S9) — the reference
  * pipeline *starts* from HTTP sources: an HTML index page listing the key
  * universe (trigger.py:28-52) and a per-key JSON endpoint fetched with
  * ETag-conditional GETs and bounded retries (crawl.py:57-91,195-227).
  *
  * The HTTP status contract is reproduced exactly; the transport is a trait so
  * the zero-egress environment (and any test) swaps in a local-FS mock while a
  * production deployment plugs a real HTTP client into the same interface:
  *
  *  - 200 → [[Fetch.Ok]] new content + new etag,
  *  - 304 → [[Fetch.NotModified]] (conditional GET matched; keep the cache),
  *  - 404 → [[Fetch.Gone]] (skip new keys; cached record survives, as in the
  *    reference where only 200 responses overwrite the snapshot),
  *  - connection error → [[Fetch.TransientError]], re-fetched with a sleep
  *    until `maxAttempts` TOTAL attempts are exhausted (maxAttempts = 3 means
  *    two retries after the first failure — crawl.py RETRIES_COUNT=3).
  *
  * Scale design: [[Crawl.incremental]] is the reference's Downloader+Updator
  * as ONE dataflow — the key universe joins the previous snapshot to split
  * new vs known keys, fetches run executor-side via `mapPartitions` (the
  * reference's ThreadPoolExecutor chunking maps to partitions — 1000
  * executors = 1000 crawl workers), and only 200-responses shuffle; the
  * merged snapshot is written once per run.
  */
sealed trait Fetch
object Fetch {
  /** HTTP 200: fresh content + its etag. */
  final case class Ok(content: String, etag: String) extends Fetch
  /** HTTP 304: the conditional GET matched the supplied etag. */
  case object NotModified extends Fetch
  /** HTTP 404: the key no longer exists upstream. */
  case object Gone extends Fetch
  /** Connection-level failure — retryable (crawl.py ConnectionError path). */
  final case class TransientError(msg: String) extends Fetch
}

/** A keyed external source. Implementations must be serializable: `fetch`
  * runs on executors. */
trait Source extends Serializable {
  /** The key universe (the reference's HTML-index trigger). */
  def list(): Seq[String]
  /** Conditional fetch: `etag` from the previous crawl, if any. */
  def fetch(key: String, etag: Option[String]): Fetch
}

/** Local-filesystem Source: key → `$baseDir/$key$ext`, etag = MD5 of the
  * bytes (a strong content ETag, like PyPI's). Missing file → Gone. This is
  * the offline mock of the reference's HTTP endpoints — same contract, no
  * network. */
final case class LocalFsSource(baseDir: String, ext: String = ".json") extends Source {

  def list(): Seq[String] = {
    val d = new java.io.File(baseDir)
    Option(d.list()).map(_.toSeq).getOrElse(Seq.empty)
      .filter(_.endsWith(ext)).map(_.stripSuffix(ext)).sorted
  }

  def fetch(key: String, etag: Option[String]): Fetch = {
    val p = Paths.get(baseDir, key + ext)
    if (!Files.exists(p)) Fetch.Gone
    else {
      val content = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(content.getBytes(StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      if (etag.contains(digest)) Fetch.NotModified else Fetch.Ok(content, digest)
    }
  }
}

/** The crawl dataflow over a [[Source]]. Snapshot schema matches the
  * reference's `latest` table: (name, latest, etag) (crawl.py:54-80). */
object Crawl {

  /** Trigger stage: the source's key universe as a one-column DataFrame
    * (PyPiNameTrigger, trigger.py:28-52 — list() stands in for the HTML
    * scrape; a production HTML source implements list() by parsing hrefs). */
  def trigger(spark: SparkSession, source: Source): DataFrame = {
    import spark.implicits._
    source.list().toDF("name")
  }

  /** Executor-side fetch with the reference's bounded retry loop
    * (call_api / _update_with_etag, crawl.py:84-91,195-227). Exhausted
    * retries throw — a crawl that cannot reach its source must fail the run,
    * not silently emit a partial snapshot. */
  private def fetchWithRetry(source: Source, key: String, etag: Option[String],
                             maxAttempts: Int, retrySleepMs: Long): Fetch = {
    var attempt = 0
    while (true) {
      source.fetch(key, etag) match {
        case Fetch.TransientError(msg) =>
          attempt += 1
          if (attempt >= maxAttempts)
            throw new RuntimeException(s"fetch '$key' failed after $maxAttempts attempts: $msg")
          Thread.sleep(retrySleepMs)
        case other => return other
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Fetch parallelism: `hint` when given (the crawl driver knows the key-
    * universe size from the trigger — a handful of keys shouldn't fan out to
    * the full shuffle width, which costs 32 near-empty tasks AND 32 output
    * part files that every snapshot copy then pays for), else the session
    * shuffle width. */
  private def fetchParts(spark: SparkSession, hint: Int): Int = {
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    if (hint > 0) math.min(n, hint) else n
  }

  /** Batch ~4 keys per fetch task: enough tasks that slow endpoints overlap,
    * few enough that a small key universe stays a small job. */
  def partitionHint(nKeys: Int): Int = math.max(1, (nKeys + 3) / 4)

  /** Download brand-new keys (LatestDownloader, crawl.py:57-80): plain GET,
    * 404s skipped, anything else must be 200. */
  def fetchNew(keys: DataFrame, source: Source,
               maxAttempts: Int = 3, retrySleepMs: Long = 0L,
               partitionsHint: Int = 0): DataFrame = {
    val spark = keys.sparkSession
    import spark.implicits._
    val n = fetchParts(spark, partitionsHint)
    keys.select(col("name").cast("string")).as[String]
      .repartition(n) // spread I/O-bound fetches; a key list arrives in one split
      .mapPartitions { it =>
        it.flatMap { key =>
          fetchWithRetry(source, key, None, maxAttempts, retrySleepMs) match {
            case Fetch.Ok(content, etag) => Some((key, content, etag))
            case Fetch.Gone => None
            case other => throw new RuntimeException(s"unexpected $other for unconditional fetch '$key'")
          }
        }
      }
      .toDF("name", "latest", "etag")
  }

  /** One incremental crawl round (Downloader + Updator fused): conditional-
    * GET every key in the previous snapshot — the reference updates from the
    * CACHE's name list, not the trigger's (crawl.py:123-127), so keys that
    * left the index are still probed and a 404/304 keeps their cached row —
    * plain-GET the trigger keys not yet in the snapshot, and merge 200-rows
    * over the previous snapshot keep-first (crawl.py:133-153 concat +
    * drop_duplicates keep='first'). The snapshot is never pruned.
    *
    * Scale shape: ONE shuffle. Cache rows and trigger keys union and group
    * by name — each key then carries its cached (latest, etag) if any — and
    * a single fetch pass applies the per-key decision inline: cached key ⇒
    * conditional GET (200 overwrites; 304/Gone keep the cached row), new
    * key ⇒ plain GET (Gone skipped). The previous formulation ran two fetch
    * jobs, an anti-join, and a window merge for the same answer. */
  def incremental(keys: DataFrame, state: Option[DataFrame], source: Source,
                  maxAttempts: Int = 3, retrySleepMs: Long = 0L,
                  partitionsHint: Int = 0): DataFrame =
    state match {
      case None => fetchNew(keys, source, maxAttempts, retrySleepMs, partitionsHint)
      case Some(cache) =>
        val spark = keys.sparkSession
        import spark.implicits._
        val n = fetchParts(spark, partitionsHint)
        val u = cache
          .select(col("name").cast("string"), col("latest").cast("string"),
            col("etag").cast("string"), lit(1).as("cached"))
          .unionByName(keys.select(col("name").cast("string"),
            lit(null).cast("string").as("latest"), lit(null).cast("string").as("etag"),
            lit(0).as("cached")))
        // per name: at most one cached row (this operator wrote the snapshot)
        // and possibly a trigger marker — max() surfaces the cached fields.
        // cached/new is classified by PROVENANCE (the cached flag), not by
        // etag nullability: a Source may legally return a null etag, and its
        // cached row must still survive a Gone (snapshot never pruned).
        // The explicit repartition on the group key sets the fetch width to
        // the hint (the groupBy reuses the partitioning — still ONE shuffle).
        u.repartition(n, col("name"))
          .groupBy(col("name"))
          .agg(max(col("latest")).as("latest"), max(col("etag")).as("etag"),
            max(col("cached")).as("cached"))
          .as[(String, String, String, Int)]
          .mapPartitions { it =>
            it.flatMap { case (key, cachedLatest, etag, cached) =>
              if (cached == 1)
                fetchWithRetry(source, key, Option(etag), maxAttempts, retrySleepMs) match {
                  case Fetch.Ok(content, newEtag) => Some((key, content, newEtag))
                  case Fetch.NotModified => Some((key, cachedLatest, etag))
                  case Fetch.Gone => Some((key, cachedLatest, etag)) // survives
                  case other => throw new RuntimeException(s"unexpected $other for '$key'")
                }
              else
                fetchWithRetry(source, key, None, maxAttempts, retrySleepMs) match {
                  case Fetch.Ok(content, newEtag) => Some((key, content, newEtag))
                  case Fetch.Gone => None
                  case other => throw new RuntimeException(s"unexpected $other for new key '$key'")
                }
            }
          }
          .toDF("name", "latest", "etag")
    }
}

/** S8/S9 as an engine node: trigger + incremental crawl + snapshot merge in
  * one [[graft.engine.EtlNode]]. `doCache` is forced on — the cache snapshot
  * of `outputId` is the state the NEXT run diffs against, exactly the
  * reference's `make_cache=True` on LatestUpdator (crawl.py:96-101). */
class CrawlNode(
    override val name: String,
    source: Source,
    outputId: String,
    maxAttempts: Int = 3,
    retrySleepMs: Long = 0L)
  extends graft.engine.EtlNode {

  val inputIds: Seq[String] = Seq.empty
  val outputIds: Seq[String] = Seq(outputId)
  override def doCache: Boolean = true

  def run(cat: graft.engine.Catalog): Unit = {
    // list() runs once; the trigger df and the fetch-parallelism hint both
    // derive from it (the key-universe size is driver-side knowledge — no
    // extra job to count it)
    val universe = source.list()
    import cat.spark.implicits._
    val keys = universe.toDF("name")
    val state = if (cat.existsCache(outputId)) Some(cat.loadCache(outputId)) else None
    val hint = Crawl.partitionHint(universe.size)
    // statistics-gated static planning for the merge-write: a small snapshot
    // pays more in AQE per-stage re-planning than in the work itself, and
    // the partition floor is the fetch hint (I/O-light — no CPU floor);
    // a big snapshot (gate trips) keeps AQE untouched
    graft.ops.StaticScope.scoped(state.getOrElse(keys), minParts = hint) {
      cat.write(Crawl.incremental(keys, state, source, maxAttempts, retrySleepMs,
        partitionsHint = hint), outputId)
    }
  }
}
