package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

import java.nio.ByteBuffer
import scala.collection.mutable

/** Typed imperative top-k aggregate: keeps the best `k` rows of a
  * struct(score DOUBLE, tie BIGINT, payload…) child per group, ordered by
  * (score desc|asc, tie asc).
  *
  * This is the aggregation formulation of per-key top-k (SURVEY §4.1
  * "shuffle strategy"): ObjectHashAggregate runs it with MAP-SIDE PARTIAL
  * aggregation — each partition reduces to ≤ k rows per key before the
  * shuffle, the merge combines k-heaps — so the exchange carries
  * k·keys·partitions rows instead of the full scored set, and no full sort
  * ever happens. Compared to a mapPartitions heap it stays on InternalRows
  * (no external Row serde in the hot loop).
  *
  * Result: ARRAY<struct> of the k best rows, best first (rank = position+1).
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    desc: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {

  // resolved lazily: child is unresolved (NullType) at construction time
  private def structType = child.dataType.asInstanceOf[StructType]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(structType, containsNull = false)

  /** Worst-kept-row-first ordering (priority queue head = eviction candidate).
    * Row A is "better" than B if score compares favorably, ties by id asc.
    */
  private val sign = if (desc) -1 else 1
  private def cmp(a: InternalRow, b: InternalRow): Int = {
    val c = sign * java.lang.Double.compare(a.getDouble(0), b.getDouble(0))
    if (c != 0) c else java.lang.Long.compare(a.getLong(1), b.getLong(1))
  }
  // max-heap on "badness": head is the worst kept row
  private val heapOrd: Ordering[InternalRow] = (a, b) => cmp(a, b)

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    mutable.PriorityQueue.empty[InternalRow](heapOrd)

  override def update(buf: mutable.PriorityQueue[InternalRow], input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (buf.size < k) buf.enqueue(row.copy())
      else if (cmp(row, buf.head) < 0) { buf.dequeue(); buf.enqueue(row.copy()) }
    }
    buf
  }

  override def merge(a: mutable.PriorityQueue[InternalRow], b: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    b.foreach { row =>
      if (a.size < k) a.enqueue(row)
      else if (cmp(row, a.head) < 0) { a.dequeue(); a.enqueue(row) }
    }
    a
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(buf.toArray.sortWith((x, y) => cmp(x, y) < 0).toSeq)

  private lazy val proj = UnsafeProjection.create(structType)

  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val rows = buf.toArray.map(r => proj(r).copy().getBytes)
    val total = 4 + rows.map(_.length + 4).sum
    val bb = ByteBuffer.allocate(total)
    bb.putInt(rows.length)
    rows.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      val row = new UnsafeRow(structType.length)
      row.pointTo(arr, len)
      q.enqueue(row)
      i += 1
    }
    q
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKAgg =
    copy(child = c.head)
  override def prettyName: String = "topk_rows"
}

object TopKAgg {
  /** `topk_rows(struct(score, tie, payload…), k, desc)` as a Column. */
  def topkRows(structCol: Column, k: Int, desc: Boolean): Column =
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(structCol), k, desc).toAggregateExpression())
}
