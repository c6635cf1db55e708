package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Bounded-heap top-k aggregate: the k LARGEST values of `child` per group,
  * returned as an array sorted descending.
  *
  * Spark's own answer to top-k-per-key is the window idiom `row_number()
  * OVER (PARTITION BY g ORDER BY s DESC) <= k`, and since Spark 3.5 the
  * WindowGroupLimit pushdown makes that idiom shuffle-bounded too (each map
  * partition is sorted and trimmed to k rows per group before the
  * exchange). What the aggregate form adds is NOT asymptotics but shape:
  * it composes with other aggregates in the SAME groupBy — top-k + counts
  * + sums in one pass and one shuffle, where the window idiom needs a
  * second shuffle and a join back; it emits the per-group array directly
  * (no explode-and-refilter to get one row per group); it never sorts —
  * O(k) heap folds instead of the window's full map-side sort — and it
  * does not depend on the optimizer pattern-matching a rank filter.
  * Measured honestly at 10M rows / 50k groups on local[32] (ScaleJoins):
  * window 2.1s vs heap aggregate 3.4s — interpreted per-row struct eval
  * costs more than the avoided sort when the shuffle is a local memcpy;
  * both shuffle the same groups x k x partitions volume at cluster scale.
  *
  * For top-k ROWS, pass a struct whose FIRST fields are the ranking
  * expression and whose remaining fields are the payload (struct comparison
  * is lexicographic, so `struct(score, id, payload...)` ranks by score,
  * ties broken by id — include a unique id to make the result
  * deterministic), then `explode` + unpack. Duplicates are kept (multiset
  * semantics, same as the window idiom). Nulls are skipped.
  *
  * The result is a pure function of the group's value multiset —
  * deterministic, so it sits under the DuckDB oracle gate like every exact
  * operator (oracle: the row_number window formulation).
  *
  * Execution note: TypedImperativeAggregates run under
  * ObjectHashAggregateExec, whose hash map gives up and SORTS THE INPUT
  * after `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  * distinct groups per partition — and the default is only 128, which
  * silently forfeits the heap's advantage on any real key cardinality.
  * Aggregate state here is O(k) per group, so hashing is safe far beyond
  * that; the engine's session builders raise the threshold to 256k.
  * Sessions not built by this engine should do the same when using top_k
  * over many groups.
  */
case class TopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[Any]] {

  require(k >= 1, s"top_k needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "top_k"

  override def checkInputDataTypes(): TypeCheckResult =
    if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(child.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k requires an orderable type, got ${child.dataType}")

  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType).asInstanceOf[Ordering[Any]]

  // min-heap: the head is the SMALLEST of the k kept values, evicted first
  override def createAggregationBuffer(): java.util.PriorityQueue[Any] =
    new java.util.PriorityQueue[Any](k, ord)

  // compare BEFORE copying: most rows lose to the heap minimum and are
  // discarded without the (struct/string) deep copy — the copy only runs
  // for the <= k rows per partition that actually enter the heap
  private def offer(buf: java.util.PriorityQueue[Any], v: Any, copy: Any => Any): Unit =
    if (buf.size < k) { buf.add(copy(v)); () }
    else if (ord.compare(v, buf.peek) > 0) { buf.poll(); buf.add(copy(v)); () }

  override def update(buf: java.util.PriorityQueue[Any], input: InternalRow): java.util.PriorityQueue[Any] = {
    val v = child.eval(input)
    // eval of struct/string children returns buffers the scan reuses for
    // the next row, so anything RETAINED must be copied
    if (v != null) offer(buf, v, InternalRow.copyValue)
    buf
  }

  override def merge(a: java.util.PriorityQueue[Any], b: java.util.PriorityQueue[Any]): java.util.PriorityQueue[Any] = {
    val it = b.iterator()
    while (it.hasNext) offer(a, it.next(), identity) // b's values are owned
    a
  }

  override def eval(buf: java.util.PriorityQueue[Any]): Any = {
    val out = buf.toArray
    java.util.Arrays.sort(out, ord.reverse.asInstanceOf[java.util.Comparator[AnyRef]])
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  // partial states cross the shuffle as length-prefixed single-field
  // UnsafeRows — works for any orderable child type, including structs
  @transient private lazy val serProj = UnsafeProjection.create(Array(child.dataType))
  private val oneField = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)

  override def serialize(buf: java.util.PriorityQueue[Any]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    val it = buf.iterator()
    while (it.hasNext) {
      oneField.update(0, it.next())
      val row = serProj(oneField)
      out.writeInt(row.getSizeInBytes)
      out.write(row.getBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[Any] = {
    val buf = createAggregationBuffer()
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val row = new UnsafeRow(1)
    while (in.available() > 0) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      row.pointTo(b, len)
      buf.add(InternalRow.copyValue(row.get(0, child.dataType)))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object TopK {

  /** Column wrapper: the k largest values of `c`, sorted descending. The
    * session must install [[graft.GraftExtensions]] (all engine entry
    * points do). */
  def apply(c: Column, k: Int): Column =
    org.apache.spark.sql.functions.call_function("top_k", c,
      org.apache.spark.sql.functions.lit(k))
}
