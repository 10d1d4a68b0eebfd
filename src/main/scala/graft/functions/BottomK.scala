package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}
import java.util.PriorityQueue

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** The k SMALLEST values of a long column per group, as a sorted
  * `array<bigint>` — top-/bottom-k as a MERGEABLE AGGREGATE instead of
  * a window: each map task keeps a size-k heap and only k values per
  * group cross the exchange (partial → final ObjectHashAggregate),
  * where the `row_number() <= k` window form shuffles EVERY raw row
  * and sorts each key's whole history. That is the difference between
  * O(k·groups) and O(rows) exchange traffic at 100 TB — the same
  * reason `WeightedSample` rides TakeOrdered rather than a global
  * sort. WindowGroupLimit narrows the window form's gap (per-partition
  * pre-filter) but still re-sorts per partition; the heap never sorts
  * until the final k-element eval.
  *
  * State is a bounded max-heap (evict-largest once size k is reached),
  * so executor memory per group is k longs regardless of input size.
  * Result is the multiset of the k smallest values in ascending order
  * — deterministic for any input order, hence oracle-replayable as
  * `list_sort(list(x))[1:k]`. Empty group → empty array; NULLs are
  * skipped. For the k LARGEST, feed the negated column and negate
  * back. */
case class BottomK(child: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[PriorityQueue[java.lang.Long]]
    with UnaryLike[Expression] {

  require(k > 0, s"k must be positive: $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a bigint input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bottom_k"

  override def createAggregationBuffer(): PriorityQueue[java.lang.Long] =
    new PriorityQueue[java.lang.Long](k + 1,
      java.util.Collections.reverseOrder[java.lang.Long]())

  private def offer(buf: PriorityQueue[java.lang.Long], v: Long): Unit =
    if (buf.size < k) buf.add(v)
    else if (v < buf.peek) { buf.poll(); buf.add(v) }

  override def update(buf: PriorityQueue[java.lang.Long],
                      input: InternalRow): PriorityQueue[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: PriorityQueue[java.lang.Long],
                     other: PriorityQueue[java.lang.Long])
      : PriorityQueue[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) offer(buf, it.next())
    buf
  }

  override def eval(buf: PriorityQueue[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override def serialize(buf: PriorityQueue[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): PriorityQueue[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BottomK =
    copy(child = newChild)
}

object BottomK {
  /** Aggregate Column: k smallest values of `c` (bigint), ascending. */
  def bottomK(c: Column, k: Int): Column =
    GraftColumnBridge.column(
      BottomK(GraftColumnBridge.expression(c), k).toAggregateExpression())
}
