package graft.expr

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch as a custom Catalyst
  * aggregate — the engine's bounded-state alternative to exact
  * `count(DISTINCT ...)` at 100 TB.
  *
  * Keeps the `k` smallest MD5 digests of the input values (Bar-Yossef et
  * al., RANDOM 2002; Beyer et al., "On Synopses for Distinct-Value
  * Estimation under Multiset Operations", SIGMOD 2007). The aggregation
  * buffer is a size-bounded sorted set — O(k) memory per group regardless
  * of cardinality, mergeable across partitions (map-side partials work),
  * and the result array is ALSO the mergeable synopsis for cross-dataset
  * union estimates.
  *
  * Unlike HLL-family sketches the output is DETERMINISTIC given the hash
  * function: the k smallest digests of a value set are a pure function of
  * the set, so the sketch — and any estimate derived from it — is
  * reproducible cross-engine and sits under the DuckDB oracle gate like
  * every exact operator ([[KmvMinHashes.estimate]] turns the synopsis into
  * the standard (k-1)/m'th-value cardinality estimate).
  *
  * Duplicates dedup naturally (a set of digests); the digest is the hex
  * string, whose lexicographic order equals numeric order at fixed width.
  */
case class KmvMinHashes(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[String]] {

  require(k >= 2, s"kmv_minhashes needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "kmv_minhashes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"kmv_minhashes requires a string column (cast first), got ${child.dataType}")

  override def createAggregationBuffer(): java.util.TreeSet[String] =
    new java.util.TreeSet[String]()

  private def md5hex(v: UTF8String): String = {
    // hot path: one digest + hex per input row. The digest instance is
    // thread-local (MessageDigest is stateful/not thread-safe; getInstance
    // per row was measured as a large share of the aggregate's CPU), and
    // the hex encoding is a table lookup instead of per-byte format calls.
    val d = KmvMinHashes.digest.get().digest(v.getBytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = KmvMinHashes.hexChars((d(i) & 0xf0) >>> 4)
      out(2 * i + 1) = KmvMinHashes.hexChars(d(i) & 0x0f)
      i += 1
    }
    new String(out)
  }

  override def update(buf: java.util.TreeSet[String], input: InternalRow): java.util.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) {
      val h = md5hex(v.asInstanceOf[UTF8String])
      if (buf.size < k) { buf.add(h); () }
      else if (h < buf.last) { if (buf.add(h)) { buf.pollLast(); () } }
    }
    buf
  }

  override def merge(a: java.util.TreeSet[String], b: java.util.TreeSet[String]): java.util.TreeSet[String] = {
    val it = b.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (a.size < k) { a.add(h); () }
      else if (h < a.last) { if (a.add(h)) { a.pollLast(); () } }
    }
    a
  }

  override def eval(buf: java.util.TreeSet[String]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[String]): Array[Byte] = {
    val sb = new java.lang.StringBuilder(buf.size * 33)
    val it = buf.iterator()
    while (it.hasNext) { sb.append(it.next()); sb.append('\n') }
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] = {
    val buf = createAggregationBuffer()
    new String(bytes, StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty)
      .foreach(h => buf.add(h))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinHashes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinHashes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KmvMinHashes {

  private[expr] val hexChars = "0123456789abcdef".toCharArray

  private[expr] val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.reset()
      d
    }
  }

  /** Column wrapper: the k smallest md5 hex digests of `c`'s distinct values. */
  def apply(c: Column, k: Int): Column =
    org.apache.spark.sql.functions.call_function("kmv_minhashes", c,
      org.apache.spark.sql.functions.lit(k))

  /** The standard KMV estimator over a synopsis array: fewer than k digests
    * means the set was seen exactly (size is the true distinct count);
    * otherwise distinct ≈ (k-1) / fraction-of-hash-space(k'th smallest).
    * The fraction uses the digest's first 13 nibbles as an exact 52-bit
    * integer — inside the double mantissa, so there is no rounding anywhere
    * and the estimate is bit-reproducible in any IEEE engine (the DuckDB
    * oracle mirrors it nibble-for-nibble). */
  def estimate(sketch: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    val kth = element_at(sketch, k)
    val hex13 = expr(s"conv(substring(${kth.toString}, 1, 13), 16, 10)").cast("double")
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) / (hex13 / lit(4503599627370496.0)))
  }
}
