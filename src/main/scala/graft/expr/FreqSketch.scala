package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Misra–Gries frequency sketch: the `k` most frequent values of `child` per
  * group from at most `capacity` counters of state, however many distinct
  * values stream past.
  *
  * Exact group-by-count of a high-cardinality column (the URLs of a crawl,
  * the n-grams of a corpus) needs state per DISTINCT value — at 100 TB that
  * is the difference between an aggregation that fits executor memory and
  * one that spills its way through the job. Misra–Gries (1982) bounds state
  * at `capacity` counters with the guarantee `true - n/capacity <= count <=
  * true`: every value with frequency above n/capacity is RETAINED, so heavy
  * hitters are never missed, only (rarely) joined by borderline extras with
  * deflated counts.
  *
  * Two regimes, one operator:
  *  - distinct(group) <= capacity: no counter is ever evicted and no merge
  *    overflows, so counts are EXACT and the result is a pure function of
  *    the group's multiset — this is the regime the DuckDB oracle row locks
  *    bit-for-bit (capacity sized above the sf vocabulary);
  *  - distinct(group) > capacity: the classic approximation bound above,
  *    with state still O(capacity).
  *
  * Merging follows the mergeable-summaries construction (Agarwal et al.,
  * PODS 2012): add counters pointwise, then subtract the (capacity+1)-th
  * largest count from all and drop the non-positive — associative, and the
  * error bound telescopes instead of compounding.
  *
  * Output: the top `k` surviving (value, cnt) structs ordered by count
  * descending, ties by value ascending — deterministic in the exact regime.
  */
case class FreqSketch(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Any, Long]] {

  require(k >= 1, s"freq_topk needs k >= 1, got $k")
  require(capacity >= k, s"freq_topk needs capacity >= k, got capacity=$capacity k=$k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("value", child.dataType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "freq_topk"

  /** Atomic types only: the buffer is a java.util.HashMap keyed on raw
    * catalyst values, and only atomic values (Long, UTF8String, ...) have
    * value-equality across the representations that reach the map (eval
    * copies on the scan side, UnsafeRow field slices on the deserialize
    * side). Struct/array catalyst values compare by identity, so admitting
    * them would silently split equal keys into separate counters. */
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType | _: MapType | _: StructType | NullType =>
      TypeCheckResult.TypeCheckFailure(
        s"freq_topk requires an atomic (non-nested) type, got ${child.dataType}")
    case dt if org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(dt) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"freq_topk requires an orderable atomic type, got $other")
  }

  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType).asInstanceOf[Ordering[Any]]

  override def createAggregationBuffer(): java.util.HashMap[Any, Long] =
    new java.util.HashMap[Any, Long](capacity * 2)

  /** Decrement every counter, dropping the zeroed — the Misra–Gries step
    * that pays for itself: each O(capacity) sweep retires capacity+1 units
    * of arrived count, so the amortized cost per row is O(1). */
  private def decrementAll(buf: java.util.HashMap[Any, Long], by: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= by) it.remove() else e.setValue(e.getValue - by)
    }
  }

  override def update(buf: java.util.HashMap[Any, Long], input: InternalRow): java.util.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val cur = buf.get(v)
      if (cur != 0L || buf.containsKey(v)) buf.put(v, cur + 1L)
      // copy before retaining: scan-side buffers are reused row to row
      else if (buf.size < capacity) buf.put(InternalRow.copyValue(v), 1L)
      else decrementAll(buf, 1L)
    }
    buf
  }

  override def merge(a: java.util.HashMap[Any, Long], b: java.util.HashMap[Any, Long]): java.util.HashMap[Any, Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = a.get(e.getKey)
      a.put(e.getKey, cur + e.getValue) // b's keys are owned copies
    }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count; what survives is again
      // at most `capacity` counters and the MG bound still holds
      val counts = new Array[Long](a.size)
      val cit = a.values().iterator()
      var i = 0
      while (cit.hasNext) { counts(i) = cit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(a.size - capacity - 1)
      decrementAll(a, cut)
    }
    a
  }

  override def eval(buf: java.util.HashMap[Any, Long]): Any = {
    val entries = new Array[(Any, Long)](buf.size)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortWith { case ((va, ca), (vb, cb)) =>
      if (ca != cb) ca > cb else ord.compare(va, vb) < 0
    }
    val out = sorted.take(k).map { case (v, c) =>
      val row = new GenericInternalRow(2)
      row.update(0, v)
      row.setLong(1, c)
      row: Any
    }
    new GenericArrayData(out)
  }

  // partial states cross the shuffle as (value, count) UnsafeRows
  @transient private lazy val serProj = UnsafeProjection.create(Array(child.dataType, LongType))
  @transient private lazy val twoField = new GenericInternalRow(2)

  override def serialize(buf: java.util.HashMap[Any, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      twoField.update(0, e.getKey)
      twoField.setLong(1, e.getValue)
      val row = serProj(twoField)
      out.writeInt(row.getSizeInBytes)
      out.write(row.getBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Any, Long] = {
    val buf = createAggregationBuffer()
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val row = new UnsafeRow(2)
    while (in.available() > 0) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      row.pointTo(b, len)
      buf.put(InternalRow.copyValue(row.get(0, child.dataType)), row.getLong(1))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object FreqSketch {

  /** Column wrapper: top `k` most frequent values of `c` from `capacity`
    * counters of state, as array<struct<value, cnt>> ordered by cnt desc,
    * value asc. Session must install [[graft.GraftExtensions]]. */
  def apply(c: Column, k: Int, capacity: Int): Column =
    org.apache.spark.sql.functions.call_function("freq_topk", c,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(capacity))
}
