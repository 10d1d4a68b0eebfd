package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}
import java.util.PriorityQueue

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** The k (rank, value) pairs with the SMALLEST ranks per group, as a
  * sorted `array<struct<r:bigint, v:double>>` — [[BottomK]]'s
  * two-column sibling and the state builder of the mergeable
  * quantile-sample rollup ([[graft.operators.QuantileRollup]]): with
  * `rank = hash(row id)` the k smallest ranks are a uniform k-sample
  * of the group's rows (bottom-k / KMV sampling), and bottom-k states
  * MERGE losslessly — bottom-k of a union is the bottom-k of the
  * concatenated bottom-ks — which is what lets per-bucket samples
  * union up to any coarser grain without rescanning raw data.
  *
  * Same scale shape as [[BottomK]]: a bounded max-heap per group
  * (evict the largest rank at size k), partial→final
  * ObjectHashAggregate, k pairs per group on the exchange. Ordering and
  * eviction compare (rank, value) lexicographically so hash-collision
  * ties are deterministic. Rows where either side is NULL are skipped.
  * Deterministic for any input order — oracle-replayable as
  * `list_sort(list((r, v)))[1:k]`. */
case class BottomKPair(rank: Expression, value: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[PriorityQueue[(Long, Double)]]
    with BinaryLike[Expression] {

  require(k > 0, s"k must be positive: $k")

  override def left: Expression = rank
  override def right: Expression = value

  override def checkInputDataTypes(): TypeCheckResult =
    (rank.dataType, value.dataType) match {
      case (LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (r, v) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (bigint, double) inputs, got (${r.sql}, ${v.sql})")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("r", LongType, nullable = false),
      StructField("v", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bottom_k_pair"

  private val ord: Ordering[(Long, Double)] =
    Ordering.Tuple2(Ordering.Long, Ordering.Double.TotalOrdering)

  override def createAggregationBuffer(): PriorityQueue[(Long, Double)] =
    new PriorityQueue[(Long, Double)](k + 1, ord.reverse)

  private def offer(buf: PriorityQueue[(Long, Double)],
                    p: (Long, Double)): Unit =
    if (buf.size < k) buf.add(p)
    else if (ord.lt(p, buf.peek)) { buf.poll(); buf.add(p) }

  override def update(buf: PriorityQueue[(Long, Double)],
                      input: InternalRow): PriorityQueue[(Long, Double)] = {
    val r = rank.eval(input)
    val v = value.eval(input)
    if (r != null && v != null)
      offer(buf, (r.asInstanceOf[Long], v.asInstanceOf[Double]))
    buf
  }

  override def merge(buf: PriorityQueue[(Long, Double)],
                     other: PriorityQueue[(Long, Double)])
      : PriorityQueue[(Long, Double)] = {
    val it = other.iterator()
    while (it.hasNext) offer(buf, it.next())
    buf
  }

  override def eval(buf: PriorityQueue[(Long, Double)]): Any = {
    val arr = new Array[(Long, Double)](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr, ord)
    new GenericArrayData(arr.map(p =>
      new GenericInternalRow(Array[Any](p._1, p._2)): Any))
  }

  override def serialize(buf: PriorityQueue[(Long, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val p = it.next()
      out.writeLong(p._1); out.writeDouble(p._2)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : PriorityQueue[(Long, Double)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((in.readLong(), in.readDouble())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKPair =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKPair =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKPair =
    copy(rank = newLeft, value = newRight)
}

object BottomKPair {
  /** Aggregate Column: the k pairs with the smallest `rank`s, sorted. */
  def bottomKPair(rank: Column, value: Column, k: Int): Column =
    GraftColumnBridge.column(
      BottomKPair(GraftColumnBridge.expression(rank),
        GraftColumnBridge.expression(value), k).toAggregateExpression())
}
