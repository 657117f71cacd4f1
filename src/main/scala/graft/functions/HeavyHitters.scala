package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** Misra-Gries heavy-hitters summary (Misra & Gries 1982; mergeable form
  * per Agarwal et al., "Mergeable Summaries", PODS 2012): ≤k counters per
  * group, batched decrements — the buffer grows to 2k, then the (k+1)-th
  * largest count is subtracted from all and non-positives drop. Each such
  * compression removes ≥(k+1)·δ mass, so total decrement ≤ n/(k+1):
  *
  *   ANY term with true frequency > n/(k+1) is guaranteed present.
  *
  * The summary's counts are approximate and its exact content depends on
  * merge order — so this aggregate is the CANDIDATE stage. Exactness comes
  * from the verify pass ([[graft.operators.TextAnalysis.heavyTerms]]):
  * recount only the ≤k candidates with a broadcast semi-join and filter by
  * the true threshold. Candidate nondeterminism cancels (any superset of
  * the true heavy set recounts to the same final answer), so the PAIR is
  * deterministic and oracle-checkable while never shuffling the term
  * universe: the map-side partial sends ≤2k (term, count) pairs per
  * partition; the recount shuffles only candidate terms.
  *
  * Result: ARRAY<STRING> of candidate terms, lexicographic.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, s"need k >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  /** Subtract the (k+1)-th largest count from all, drop ≤0 → size ≤ k. */
  private def compress(buf: mutable.HashMap[String, Long]): Unit = {
    if (buf.size <= k) return
    val counts = buf.values.toArray
    java.util.Arrays.sort(counts)
    val delta = counts(counts.length - (k + 1)) // (k+1)-th largest
    buf.filterInPlace((_, c) => c > delta)
    buf.mapValuesInPlace((_, c) => c - delta)
  }

  private def add(buf: mutable.HashMap[String, Long], t: String, w: Long): Unit = {
    buf.updateWith(t) { case prev => Some(prev.getOrElse(0L) + w) }
    if (buf.size > 2 * k) compress(buf) // amortized O(1) per update
  }

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (t, c) => add(a, t, c) }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    compress(buf)
    val terms = buf.keysIterator.toArray.sorted.map(UTF8String.fromString)
    new GenericArrayData(terms.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray.map { case (t, c) =>
      (t.getBytes(StandardCharsets.UTF_8), c) }
    val bb = ByteBuffer.allocate(4 + entries.map(_._1.length + 12).sum)
    bb.putInt(entries.length)
    entries.foreach { case (tb, c) =>
      bb.putInt(tb.length); bb.put(tb); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val tb = new Array[Byte](len)
      bb.get(tb)
      buf.put(new String(tb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = c.head)
  override def prettyName: String = "mg_heavy_hitters"
}

object HeavyHitters {
  /** `mg_heavy_hitters(termCol, k)` as a Column: ≤k candidate terms
    * guaranteed to include every term with frequency > n/(k+1). */
  def mgTerms(termCol: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(termCol), k).toAggregateExpression())
}
