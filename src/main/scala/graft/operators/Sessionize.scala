package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream: a new session starts when
  * the gap to the previous event of the same user exceeds `gapNs`.
  * Composition of lag + cumulative-sum windows — the batch formulation of
  * the classic streaming sessionizer (the streaming variant would be
  * `flatMapGroupsWithState`; this one is DuckDB-checkable).
  *
  * Input requires (user_id BIGINT, ts BIGINT ns, event_id BIGINT, value).
  * All arithmetic is integer (ns timestamps), so results are deterministic
  * and oracle-exact.
  */
object Sessionize {

  val DefaultGapNs: Long = 30L * 60 * 1000000000L // 30 min

  /** Event→session assignment: each event row gains its `session_idx`
    * (the lag/gap-flag/running-sum chain, shared by both aggregate shapes
    * so the boundary rule can never desynchronize them). */
  private def assignSessions(events: DataFrame, gapNs: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    events
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_s",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gapNs, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session aggregate: (user_id, session_idx, session_start ns,
    * n_events, total_value).
    */
  def sessions(events: DataFrame, gapNs: Long = DefaultGapNs): DataFrame =
    assignSessions(events, gapNs).groupBy("user_id", "session_idx")
      .agg(min("ts").as("session_start"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))

  /** [[sessions]] plus the closing bound: (user_id, session_idx,
    * session_start, session_end, n_events). Interval form consumed by
    * point-in-interval joins (TemporalJoin.intervalJoin); kept separate so
    * the oracle-pinned [[sessions]] schema stays untouched.
    */
  def sessionBounds(events: DataFrame, gapNs: Long = DefaultGapNs): DataFrame =
    assignSessions(events, gapNs).groupBy("user_id", "session_idx")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"))
}
