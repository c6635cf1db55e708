package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride as opaque `binary` columns
  * with typed metadata extracted by a distributed decode pass.
  *
  * The decode itself is STUBBED (no image/audio codecs in this environment —
  * [[StubDecoder.decode]] is a deterministic fake); everything around it is the
  * real 100 TB shape: a typed `Dataset[MediaRow]`, `mapPartitions` so any
  * per-partition decoder state (codec contexts, model handles) is initialized
  * once per task rather than once per row, and a typed `MediaMeta` output
  * schema that downstream relational ops consume like any other table.
  */
object Multimodal {

  /** Input row: id + opaque payload (what an image/audio column looks like). */
  final case class MediaRow(id: Long, payload: Array[Byte])

  /** Extracted metadata: byte size, content digest, checksum, decoded dims. */
  final case class MediaMeta(id: Long, n_bytes: Int, digest: String,
                             checksum: Long, width: Int, height: Int)

  /** The clearly-marked decode stub: a real implementation would parse the
    * container format here. This fake derives dimensions deterministically
    * from size/checksum so tests and oracles can verify the plumbing. */
  object StubDecoder {
    def decode(payload: Array[Byte]): (Int, Int) = {
      val checksum = payload.foldLeft(0L)((a, b) => a + (b & 0xff)) % 997L
      val width = 64 + (checksum % 576L).toInt
      val height = 64 + (payload.length % 416)
      (width, height)
    }
  }

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** Distributed metadata extraction: one decoder per partition, streaming
    * through rows (no per-row decoder setup, no driver collect). */
  def extractMeta(rows: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // per-partition decoder/codec initialization would go here
      it.map { r =>
        val checksum = r.payload.foldLeft(0L)((a, b) => a + (b & 0xff)) % 997L
        val (w, h) = StubDecoder.decode(r.payload)
        MediaMeta(r.id, r.payload.length, md5Hex(r.payload), checksum, w, h)
      }
    }
  }

  /** Wrap a string column as a binary media payload (the testdata has no real
    * media blobs; UTF-8 text bytes stand in — the plumbing is identical). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"),
      col(payloadCol).cast("binary").as("payload")).as[MediaRow]
  }
}
