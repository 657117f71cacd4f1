package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantiles, grouped: one sort shuffle per group column
  * set, then a rank filter — no per-group value collection (Spark's exact
  * `percentile` buffers every value of a group in the aggregation buffer;
  * this formulation keeps values distributed and spills through the
  * standard window sort).
  *
  * Discrete quantile ("lower" interpolation, numpy/DuckDB `quantile_disc`
  * family): value at 1-based rank floor(q·(n−1)) + 1 of the ascending
  * sort. Pure integer/IEEE arithmetic — same in DuckDB, so oracle-exact.
  *
  * Scale: the window sort is the one data-sized term (linear, spillable,
  * partitioned by group); the rank filter is map-side after it. For a
  * streaming/approximate variant use percentile_approx — this operator is
  * the exact batch path.
  */
object Quantiles {

  /** Per-group discrete quantiles of `valueCol` at each q in `qs`.
    * Output: groupCols..., q DOUBLE, value (valueCol's type).
    * Ties broken by value order only (stable for duplicate values since
    * any of the tied rows yields the same value).
    */
  def exactQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0), s"bad qs $qs")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(valueCol).asc)
    val ranked = df
      .withColumn("_rn", row_number().over(w).cast("long"))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(groupCols.map(col): _*)))
    // 1-based discrete rank: floor(q·(n−1)) + 1 — q and the product are
    // the same IEEE doubles in both engines, floor is exact. One row can
    // carry several qs (tiny groups), so collect matches per row and
    // explode — the window runs ONCE for all quantiles.
    def rankOf(q: Double): Column =
      floor(lit(q) * (col("_n") - 1).cast("double")).cast("long") + 1
    val qMatches = array(qs.map(q => when(col("_rn") === rankOf(q), lit(q))): _*)
    ranked
      .withColumn("_q", explode(filter(qMatches, x => x.isNotNull)))
      .select(groupCols.map(col) ++
        Seq(col("_q").as("q"), col(valueCol).as("value")): _*)
  }

  /** Approximate quantiles with NO sort: histogram the LONG `valueCol`
    * into fixed-width bins (one map-side-combinable groupBy — the only
    * exchange carries ≤|groups|·|bins| rows), cumulate bin counts with a
    * window over the BIN table (tiny), and answer each q with the bin
    * containing its rank. Error ≤ binWidth by construction; everything is
    * integer arithmetic, so the result is deterministic and oracle-exact
    * (the approximation is in the CONTRACT, not the execution).
    *
    * This is the streaming/100 TB path: the exact [[exactQuantiles]] sorts
    * the data; this shape never does — the same trade percentile_approx
    * makes, but with a deterministic, relationally-checkable sketch.
    *
    * Output: groupCols..., q, bin_lo, bin_hi (inclusive value bounds of
    * the answering bin), n (group row count).
    */
  def binnedQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      qs: Seq[Double],
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0), s"bad qs $qs")
    // exact integer floor-bin via integral division (LongMath.floorDiv) —
    // a double divide would silently round past 2^53 (ns-epoch magnitudes)
    // and diverge from the oracle's integer `//`
    val bins = df
      .withColumn("_bin",
        graft.functions.LongMath.floorDiv(col(valueCol).cast("long"), lit(binWidth)))
      .groupBy((groupCols :+ "_bin").map(col): _*)
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("_bin").asc)
    val cum = bins
      .withColumn("_cum", sum("_c").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_n", sum("_c").over(Window.partitionBy(groupCols.map(col): _*)))
    // same 1-based rank as exactQuantiles; the answering bin is the FIRST
    // whose cumulative count reaches it
    def rankOf(q: Double): Column =
      floor(lit(q) * (col("_n") - 1).cast("double")).cast("long") + 1
    val qMatches = array(qs.map(q =>
      when(col("_cum") >= rankOf(q) &&
        col("_cum") - col("_c") < rankOf(q), lit(q))): _*)
    cum
      .withColumn("q", explode(filter(qMatches, x => x.isNotNull)))
      .select(groupCols.map(col) ++ Seq(
        col("q"),
        (col("_bin") * binWidth).as("bin_lo"),
        (col("_bin") * binWidth + (binWidth - 1)).as("bin_hi"),
        col("_n").as("n")): _*)
  }
}
