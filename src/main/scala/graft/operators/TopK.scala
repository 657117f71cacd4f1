package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Distributed per-key top-k without a full window sort.
  *
  * Spark's `Window.partitionBy(key).orderBy(...)` + `row_number <= k`
  * shuffles and sorts EVERY scored row (SURVEY §4.1 "shuffle strategy" /
  * §7.3 "hard parts": per-partition partial top-k then merge). This operator
  * does the classic two-phase algorithm instead:
  *
  *  phase 1 — mapPartitions keeps a bounded k-heap per key inside each input
  *            partition (no shuffle, no sort of the full set);
  *  phase 2 — the surviving ≤ k·keys·partitions rows (tiny) go through the
  *            exact Window rank.
  *
  * The final ranking is identical to the plain window — phase 1 only
  * discards rows that provably cannot be in the global top-k — so oracle
  * bit-exactness is preserved. At 100 TB this is the difference between
  * shuffling the corpus and shuffling k rows per partition.
  */
object TopK {

  /** Keep the top `k` rows per value of `keyCol`, ranked by `scoreCol`
    * (descending if `desc`), ties broken by ascending `tieCol`. Appends a
    * `rank` BIGINT column (1-based).
    */
  def perKey(df: DataFrame, keyCol: String, scoreCol: String, tieCol: String,
      k: Int, desc: Boolean = true): DataFrame = {
    val schema = df.schema
    val keyIdx   = schema.fieldIndex(keyCol)
    val scoreIdx = schema.fieldIndex(scoreCol)
    val tieIdx   = schema.fieldIndex(tieCol)
    val sign = if (desc) -1 else 1

    // Ordering identical to the final window: score direction, then tie asc.
    // A row loses to another if it sorts strictly later.
    val ord: Ordering[Row] = (a: Row, b: Row) => {
      val c = sign * java.lang.Double.compare(a.getDouble(scoreIdx), b.getDouble(scoreIdx))
      if (c != 0) c else java.lang.Long.compare(a.getLong(tieIdx), b.getLong(tieIdx))
    }

    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(schema))
    val pruned = df.mapPartitions { it =>
      // per-key bounded heap; heap head = current worst of the kept k
      val heaps = mutable.LongMap.empty[mutable.PriorityQueue[Row]]
      it.foreach { row =>
        val key = row.getLong(keyIdx)
        val h = heaps.getOrElseUpdate(key, mutable.PriorityQueue.empty[Row](ord))
        if (h.size < k) h.enqueue(row)
        else if (ord.compare(row, h.head) < 0) { h.dequeue(); h.enqueue(row) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }

    val w = Window.partitionBy(col(keyCol)).orderBy(
      (if (desc) col(scoreCol).desc else col(scoreCol).asc) :: col(tieCol).asc :: Nil: _*)
    pruned.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
