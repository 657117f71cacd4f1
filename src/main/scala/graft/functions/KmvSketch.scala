package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** KMV (k-minimum-values) distinct-count sketch as a typed imperative
  * aggregate (Bar-Yossef et al. 2002; the bottom-k / theta-sketch family).
  *
  * Keeps the k smallest DISTINCT hash values seen per group. The estimator
  * is (k−1)·M / h₍k₎ where M is the hash-space size and h₍k₎ the k-th
  * smallest hash; below k distinct values the sketch is exact.
  *
  * Why a sketch at 100 TB: an exact `count(DISTINCT token)` shuffles every
  * distinct value to its reducer — for a token vocabulary that is the whole
  * corpus re-keyed. This aggregate runs under ObjectHashAggregate with
  * MAP-SIDE PARTIAL aggregation: every partition reduces to ≤k longs per
  * group before the exchange, the merge is a bounded set-union, so the
  * shuffle carries k·|groups|·|partitions| longs no matter the corpus size
  * — same contract as [[TopKAgg]].
  *
  * DETERMINISM: the k smallest distinct values of a fixed hash function are
  * a set — independent of row order, partitioning, and merge order — so the
  * sketch (and any estimate derived from it) is bit-stable and, with the
  * shared Knuth hash ([[Text.tokenHash32]]), DuckDB-oracle-checkable.
  *
  * Result: ARRAY<BIGINT> of the ≤k kept hashes, ascending. The array IS the
  * mergeable sketch state; [[KmvSketch.estimate]] turns it into a count.
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, s"kmv needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) { if (buf.add(h)) { buf.pollLast(); () } }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long], b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvAgg =
    copy(child = c.head)
  override def prettyName: String = "kmv_sketch"
}

object KmvSketch {

  /** Hash space size for [[Text.tokenHash32]]-domain hashes: [0, 2^32). */
  val HashSpace: Double = 4294967296.0

  /** `kmv_sketch(hashCol, k)` as a Column — hashCol must be LONG, uniform
    * over [0, M). Returns the ascending ARRAY<BIGINT> sketch. */
  def kmvArray(hashCol: Column, k: Int): Column =
    ColumnBridge.column(
      KmvAgg(ColumnBridge.expression(hashCol), k).toAggregateExpression())

  /** Distinct-count estimate from a sketch array: exact size below k, else
    * (k−1)·M / h₍k₎. Written as one literal·division so the oracle can
    * reproduce the double bit-for-bit. */
  def estimate(sketch: Column, k: Int, hashSpace: Double = HashSpace): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble * hashSpace) / element_at(sketch, k).cast("double"))
}
