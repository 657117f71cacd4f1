package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.Partitioner

import scala.collection.mutable

/** Custom operator tier (SURVEY §4.2(1)): a LogicalPlan + Strategy +
  * SparkPlan implementing the NARROW half of distributed per-key top-k.
  *
  * `PartialTopKExec` runs per-partition bounded k-heaps directly on
  * `InternalRow`s — no encoder serde, no sort — and emits at most k rows per
  * (key, partition). It is a correctness-preserving row FILTER: the global
  * top-k per key always survives, so the exact Window rank that follows
  * operates on ≤ k·keys·partitions rows. This is the operator form of the
  * "per-partition partial top-k then merge" plan SURVEY §7.3 calls out as
  * the thing Catalyst can't express natively.
  *
  * Column contract (by ordinal in child output): `keyOrd` BIGINT, `scoreOrd`
  * DOUBLE, `tieOrd` BIGINT. Ordering: score desc|asc, tie asc.
  */
final case class PartialTopK(
    child: LogicalPlan, keyOrd: Int, scoreOrd: Int, tieOrd: Int,
    k: Int, desc: Boolean) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): PartialTopK =
    copy(child = c)
}

final case class PartialTopKExec(
    child: SparkPlan, keyOrd: Int, scoreOrd: Int, tieOrd: Int,
    k: Int, desc: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val (kOrd, sOrd, tOrd, kk, sign) = (keyOrd, scoreOrd, tieOrd, k, if (desc) -1 else 1)
    child.execute().mapPartitions { it =>
      // ordering: heap head = worst kept row (max-heap on badness)
      val ord: Ordering[InternalRow] = (a, b) => {
        val c = sign * java.lang.Double.compare(a.getDouble(sOrd), b.getDouble(sOrd))
        if (c != 0) c else java.lang.Long.compare(a.getLong(tOrd), b.getLong(tOrd))
      }
      val heaps = mutable.LongMap.empty[mutable.PriorityQueue[InternalRow]]
      it.foreach { row =>
        val h = heaps.getOrElseUpdate(row.getLong(kOrd),
          mutable.PriorityQueue.empty[InternalRow](ord))
        if (h.size < kk) h.enqueue(row.copy())
        else if (ord.compare(row, h.head) < 0) { h.dequeue(); h.enqueue(row.copy()) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): PartialTopKExec =
    copy(child = c)
}

object PartialTopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PartialTopK(child, keyOrd, scoreOrd, tieOrd, k, desc) =>
      PartialTopKExec(planLater(child), keyOrd, scoreOrd, tieOrd, k, desc) :: Nil
    case _ => Nil
  }
}

object PartialTopKStrategyInstaller {
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(PartialTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ PartialTopKStrategy
}
