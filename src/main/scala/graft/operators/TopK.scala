package graft.operators

import graft.functions.TopKAgg
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Distributed per-key top-k without a full window sort.
  *
  * Spark's `Window.partitionBy(key).orderBy(...)` + `row_number <= k` sorts
  * every scored row (Spark 4's WindowGroupLimit prunes per partition, but
  * only after an in-partition SORT of the full input). The strategies here
  * implement the classic partial-top-k-then-merge instead (SURVEY §4.1 /
  * §7.3 "hard parts"):
  *
  *  - "exec" (default): [[graft.plans.PartialTopKExec]] — a custom
  *    SparkPlan running bounded k-heaps per partition directly on
  *    InternalRows (no serde, no sort, no struct copies), then the exact
  *    window on the survivors. Fastest measured (~2× over "agg" at sf0.1).
  *  - "agg": [[TopKAgg]] TypedImperativeAggregate under
  *    ObjectHashAggregate — map-side partial k-heaps on InternalRows; the
  *    exchange carries ≤ k·keys·partitions rows. Measured at sf0.1 (9.6M
  *    scored pairs, 64 queries): ~3× faster than the plain window and on par
  *    with the mapPartitions heap locally, with the better scale profile
  *    (hash-agg spill handling, no closure serde, partial-agg combine).
  *  - "heap": mapPartitions bounded heaps (kept for comparison).
  *  - "window": plain window, Spark's own WindowGroupLimit (kept for
  *    comparison).
  *
  * All strategies produce identical rows and ranks (same order, same
  * tie-break) — selection only — so oracle bit-exactness is preserved.
  */
object TopK {

  val Strategy: String = sys.env.getOrElse("GRAFT_TOPK", "exec")

  /** Keep the top `k` rows per value of `keyCol`, ranked by `scoreCol`
    * (descending if `desc`), ties broken by ascending `tieCol`. Appends a
    * `rank` BIGINT column (1-based). `keyCol`/`tieCol` must be BIGINT,
    * `scoreCol` DOUBLE.
    */
  def perKey(df: DataFrame, keyCol: String, scoreCol: String, tieCol: String,
      k: Int, desc: Boolean = true): DataFrame = Strategy match {
    case "window" => windowTopK(df, keyCol, scoreCol, tieCol, k, desc)
    case "heap"   => heapTopK(df, keyCol, scoreCol, tieCol, k, desc)
    case "exec"   => execTopK(df, keyCol, scoreCol, tieCol, k, desc)
    case _        => aggTopK(df, keyCol, scoreCol, tieCol, k, desc)
  }

  /** Custom physical-operator path: [[graft.plans.PartialTopKExec]] prunes
    * per partition on InternalRows (no serde, no sort), then the exact
    * window ranks the tiny survivor set.
    */
  private def execTopK(df: DataFrame, keyCol: String, scoreCol: String,
      tieCol: String, k: Int, desc: Boolean): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val spark = df.sparkSession
    graft.plans.PartialTopKStrategyInstaller.install(spark)
    val plan = ColumnBridge.logicalPlan(df)
    val out = plan.output.map(_.name)
    val pruned = ColumnBridge.ofRows(spark, graft.plans.PartialTopK(plan,
      out.indexOf(keyCol), out.indexOf(scoreCol), out.indexOf(tieCol), k, desc))
    windowTopK(pruned, keyCol, scoreCol, tieCol, k, desc)
  }

  private def aggTopK(df: DataFrame, keyCol: String, scoreCol: String,
      tieCol: String, k: Int, desc: Boolean): DataFrame = {
    val payload = df.columns.filterNot(c => c == keyCol || c == scoreCol || c == tieCol).toSeq
    val fields = Seq(scoreCol, tieCol) ++ payload
    df.groupBy(col(keyCol))
      .agg(TopKAgg.topkRows(struct(fields.map(col): _*), k, desc).as("_topk"))
      .select(col(keyCol), posexplode(col("_topk")))
      .select(Seq(col(keyCol), (col("pos") + 1).cast("long").as("rank")) ++
        fields.map(f => col(s"col.$f").as(f)): _*)
  }

  private def windowTopK(df: DataFrame, keyCol: String, scoreCol: String,
      tieCol: String, k: Int, desc: Boolean): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(
      (if (desc) col(scoreCol).desc else col(scoreCol).asc) :: col(tieCol).asc :: Nil: _*)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  private def heapTopK(df: DataFrame, keyCol: String, scoreCol: String,
      tieCol: String, k: Int, desc: Boolean): DataFrame = {
    val schema = df.schema
    val keyIdx   = schema.fieldIndex(keyCol)
    val scoreIdx = schema.fieldIndex(scoreCol)
    val tieIdx   = schema.fieldIndex(tieCol)
    val sign = if (desc) -1 else 1

    val ord: Ordering[Row] = (a: Row, b: Row) => {
      val c = sign * java.lang.Double.compare(a.getDouble(scoreIdx), b.getDouble(scoreIdx))
      if (c != 0) c else java.lang.Long.compare(a.getLong(tieIdx), b.getLong(tieIdx))
    }

    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(schema))
    val pruned = df.mapPartitions { it =>
      val heaps = mutable.LongMap.empty[mutable.PriorityQueue[Row]]
      it.foreach { row =>
        val key = row.getLong(keyIdx)
        val h = heaps.getOrElseUpdate(key, mutable.PriorityQueue.empty[Row](ord))
        if (h.size < k) h.enqueue(row)
        else if (ord.compare(row, h.head) < 0) { h.dequeue(); h.enqueue(row) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
    windowTopK(pruned, keyCol, scoreCol, tieCol, k, desc)
  }
}
