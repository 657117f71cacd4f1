package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins, expressed as single-shuffle
  * relational plans: AS-OF join (most recent right row at-or-before each
  * left row) and RANGE join (right rows inside a time window around each
  * left row).
  *
  * These are training-pipeline / event-analytics staples (attribute a
  * purchase to the last ad view; count activity in the 10 minutes before a
  * signal) that naive SQL expresses as inequality joins — which Spark plans
  * as a per-key cartesian (BroadcastNestedLoopJoin) and which explode at
  * scale. Both operators here compile to EQUI-joins / window functions
  * only, so Catalyst plans a plain shuffle on the key:
  *
  *  - as-of: union both sides, one window pass per key ordered by
  *    (ts, side) carrying the last-seen right row forward — ONE shuffle,
  *    linear work, the sort-merge formulation every columnar engine
  *    (DuckDB ASOF, pandas merge_asof, kdb aj) uses, made distributed.
  *  - range: bucketize time into bins of the window width; each left row
  *    joins ≤2 adjacent bins (constant duplication), then the exact
  *    predicate filters inside the equi-join result. This is the classic
  *    "bin the inequality" rewrite (Databricks' range-join hint does the
  *    same); the plan is a SortMergeJoin on (keys, bin) — never a
  *    nested-loop.
  *
  * Scale notes (100 TB): both shuffles partition on the join key, so
  * parallelism = |keys|; a pathologically hot key serializes its own
  * partition only. The as-of window is a streaming sort per key (spills via
  * the standard window exec); the range join's shuffle volume is
  * |left|·(1 + span/W) + |right| rows, W = bin width = window span.
  */
object TemporalJoin {

  /** Backward as-of join: for each left row, attach the right row with the
    * greatest `ts` ≤ left.`ts` (inclusive) sharing `keys`.
    *
    * Contract: both sides carry `keys` and `ts` (LONG, e.g. epoch µs);
    * right payload column names must be disjoint from left's. Output = all
    * left columns + `asof_ts` (matched right ts, null if none) + right
    * payload columns of the matched row (null if none).
    *
    * Ties: right rows with identical (keys, ts) are ordered by `rightTie`
    * ascending and the LAST one wins (i.e. max tie-break) — supply a unique
    * tie column for fully deterministic output.
    *
    * `toleranceUs`: a match farther than this behind the left row is
    * nulled out (the left row is kept) — pandas merge_asof semantics.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ts: String = "ts",
      rightTie: Option[String] = None,
      toleranceUs: Option[Long] = None,
      direction: String = "backward"): DataFrame = direction match {
    case "backward" => asofBackward(left, right, keys, ts, rightTie, toleranceUs)
    case "forward" =>
      // earliest right at-or-after == backward as-of on negated time
      // (tie-break semantics unchanged: max rightTie wins at equal ts)
      def neg(df: DataFrame) = df.withColumn(ts, -col(ts))
      neg(asofBackward(neg(left), neg(right), keys, ts, rightTie, toleranceUs))
        .withColumn("asof_ts", -col("asof_ts"))
    case d => throw new IllegalArgumentException(s"direction $d")
  }

  /** Reject input columns named like the plumbing/output names an operator
    * synthesizes — a silent collision would yield duplicate columns (or a
    * shadowed output) instead of a clear error. Each operator passes exactly
    * the names it creates, so composition (asofChunked feeding its own
    * `_chunk` key into the inner as-of) stays legal. */
  private def requireNoReserved(df: DataFrame, side: String, reserved: String*): Unit = {
    val bad = df.columns.filter(reserved.contains)
    require(bad.isEmpty,
      s"$side columns ${bad.mkString(",")} collide with synthesized names " +
        s"(reserved here: ${reserved.sorted.mkString(",")})")
  }

  private def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ts: String,
      rightTie: Option[String],
      toleranceUs: Option[Long]): DataFrame = {
    val leftCols  = left.columns.toSeq
    val rightPayload = right.columns.toSeq.filterNot(c => keys.contains(c) || c == ts)
    require(rightPayload.nonEmpty, "right side needs at least one payload column")
    require(rightPayload.intersect(leftCols).isEmpty,
      s"right payload ${rightPayload.mkString(",")} collides with left columns")
    requireNoReserved(left, "left", "asof_ts", "_side", "_tie", "_l", "_r", "_m")
    requireNoReserved(right, "right", "asof_ts", "_side", "_tie", "_l", "_r", "_m")
    val tie = rightTie.getOrElse(rightPayload.head)
    require(org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(right.schema(tie).dataType),
      s"tie column $tie has unorderable type ${right.schema(tie).dataType}; " +
        "pick an orderable rightTie (any numeric/string/timestamp works)")

    // Tag and union: right rows sort BEFORE left rows at equal ts (side 0 <
    // side 1), making the match inclusive (ts_r <= ts_l). The tie column is
    // carried UNCAST (a long cast would truncate fractional ties and
    // diverge from asofChunked's struct-max, which compares the original
    // value); left rows get a typed null — their _tie never orders against
    // a right row's because _side differs first.
    val rStruct = struct(col(ts).as("asof_ts") +: rightPayload.map(col): _*)
    val tieType = right.schema(tie).dataType
    val l = left.select(
      keys.map(col) ++ Seq(col(ts), lit(1).as("_side"),
        lit(null).cast(tieType).as("_tie"),
        struct(leftCols.map(col): _*).as("_l"),
        lit(null).cast(right.select(rStruct).schema.head.dataType).as("_r")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(ts), lit(0).as("_side"), col(tie).as("_tie"),
        lit(null).cast(left.select(struct(leftCols.map(col): _*)).schema.head.dataType).as("_l"),
        rStruct.as("_r")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col("_side").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val withTol = toleranceUs match {
      case Some(tol) => matched.withColumn("_m",
        when(col(ts) - col("_m.asof_ts") <= tol, col("_m")))
      case None => matched
    }
    withTol.select(
      leftCols.map(c => col(s"_l.$c").as(c)) ++
        (("asof_ts" +: rightPayload)).map(c => col(s"_m.$c").as(c)): _*)
  }

  /** Range join as equi-join: pairs (l, r) sharing `keys` with
    * r.ts − l.ts ∈ [lo, hi)  (µs offsets; lo may be negative — e.g.
    * lo = −600e6, hi = 0 is "the 10 minutes before, exclusive").
    *
    * Output: all left columns + right payload columns + `r_ts` (the matched
    * right ts). INNER semantics — aggregate-and-rejoin for left-outer
    * shapes (see [[windowAgg]]).
    */
  def rangePairs(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ts: String = "ts",
      lo: Long,
      hi: Long): DataFrame = {
    require(hi > lo, s"empty window [$lo,$hi)")
    require(hi - lo > 0, s"window [$lo,$hi) wider than Long.MaxValue")
    val w = hi - lo // bin width = window span → each left row spans ≤2 bins
    val leftCols = left.columns.toSeq
    val rightPayload = right.columns.toSeq.filterNot(c => keys.contains(c) || c == ts)
    require(rightPayload.intersect(leftCols).isEmpty,
      s"right payload ${rightPayload.mkString(",")} collides with left columns")
    requireNoReserved(left, "left", "r_ts", "_bin")
    requireNoReserved(right, "right", "r_ts", "_bin")

    def bin(c: Column): Column = floorDiv(c, lit(w))
    val l = left.withColumn("_bin",
      explode(sequence(bin(col(ts) + lo), bin(col(ts) + hi - 1))))
    val r = right.select(
      keys.map(col) ++ Seq(bin(col(ts)).as("_bin"), col(ts).as("r_ts")) ++
        rightPayload.map(col): _*)
    l.join(r, keys :+ "_bin")
      .filter(col("r_ts") - col(ts) >= lo && col("r_ts") - col(ts) < hi)
      // the ≤2-bin duplication can double-match only if a pair satisfies the
      // predicate under two bins — impossible since r_ts has ONE bin; each
      // (l, r) pair appears once. Drop the plumbing column.
      .drop("_bin")
      .select(leftCols.map(col) ++ ("r_ts" +: rightPayload).map(col): _*)
  }

  /** Left-outer windowed aggregation: for each left row (keyed by the
    * unique `leftPk`), aggregate the right rows in [lo, hi) around it.
    * `aggs` see the [[rangePairs]] schema. For left rows with an EMPTY
    * window, aggregates named in `fill` are coalesced to the given literal
    * (cast to the aggregate's type); the rest stay NULL — SQL left-outer
    * semantics. Zero is only a neutral fill for count/sum-style aggregates,
    * so the fill is explicit per aggregate rather than synthesized (a
    * blanket 0 is a wrong answer for max/min/avg).
    */
  def windowAgg(
      left: DataFrame,
      leftPk: Seq[String],
      right: DataFrame,
      keys: Seq[String],
      ts: String = "ts",
      lo: Long,
      hi: Long,
      fill: Map[String, Column] = Map.empty)(aggs: (String, Column)*): DataFrame = {
    val unknown = fill.keySet -- aggs.map(_._1).toSet
    require(unknown.isEmpty, s"fill names ${unknown.mkString(",")} match no aggregate")
    val pairs = rangePairs(left, right, keys, ts, lo, hi)
    val agged = pairs.groupBy(leftPk.map(col): _*)
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)
    left.join(agged, leftPk, "left")
      .select(left.columns.map(col).toSeq ++
        aggs.map { case (n, _) => fill.get(n) match {
          case Some(f) => coalesce(col(n), f.cast(agged.schema(n).dataType)).as(n)
          case None    => col(n)
        } }: _*)
  }

  /** Skew-resilient as-of: identical semantics to [[asof]] (backward,
    * inclusive, max-tie-break, tolerance), but the per-key window is split
    * into time chunks of `chunkUs` so ONE hot key parallelizes across its
    * own timeline instead of serializing one partition.
    *
    * Two-level plan: (1) a per-(key, chunk) summary of the latest right row
    * + a running "carry-in" (the best right row of all EARLIER chunks,
    * computed by a window over the SUMMARY — #chunks rows, not #events);
    * (2) the ordinary single-window as-of partitioned by (key, chunk),
    * with each chunk's carry-in injected as one extra right row. A chunk
    * with left rows but no in-chunk rights still matches through its
    * carry-in; carry rows keep their true timestamps, so tolerance and
    * tie semantics are untouched.
    *
    * Equivalence to [[asof]] is randomized-spec-verified; pick `chunkUs`
    * ≈ (time span) / (desired parallelism per key).
    */
  def asofChunked(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      ts: String = "ts",
      rightTie: Option[String] = None,
      toleranceUs: Option[Long] = None,
      chunkUs: Long): DataFrame = {
    require(chunkUs > 0, "chunkUs must be positive")
    requireNoReserved(left, "left", "asof_ts", "_chunk", "_best", "_cin")
    requireNoReserved(right, "right", "asof_ts", "_chunk", "_best", "_cin")
    val rightPayload = right.columns.toSeq.filterNot(c => keys.contains(c) || c == ts)
    val tie = rightTie.getOrElse(rightPayload.head)
    require(rightPayload.contains(tie), s"rightTie $tie must be a right payload column")
    // tie leads the payload so struct-max picks exactly asof's winner
    val payloadOrdered = tie +: rightPayload.filterNot(_ == tie)

    def chunkOf(c: Column): Column = floorDiv(c, lit(chunkUs))
    val l2 = left.withColumn("_chunk", chunkOf(col(ts)))
    val r2 = right.withColumn("_chunk", chunkOf(col(ts)))

    // latest right row per (keys, chunk): max over struct(ts, tie, rest)
    val best = struct((ts +: payloadOrdered).map(col): _*)
    val summary = r2.groupBy((keys :+ "_chunk").map(col): _*)
      .agg(max(best).as("_best"))
    // chunk universe: every chunk holding a left OR right row
    val chunks = l2.select((keys :+ "_chunk").map(col): _*)
      .union(r2.select((keys :+ "_chunk").map(col): _*)).distinct()
    val wCarry = Window.partitionBy(keys.map(col): _*).orderBy(col("_chunk").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = chunks.join(summary, keys :+ "_chunk", "left")
      .withColumn("_cin", max(col("_best")).over(wCarry)) // max skips nulls
      .filter(col("_cin").isNotNull)
      .select((keys :+ "_chunk").map(col) ++
        (col(s"_cin.$ts").as(ts) +:
          payloadOrdered.map(p => col(s"_cin.$p").as(p))): _*)
    val rAug = r2.select((keys ++ Seq("_chunk", ts) ++ payloadOrdered).map(col): _*)
      .unionByName(carry)

    // restore asof's exact output column order (the summary pass moved the
    // tie column first; "identical semantics" includes positional schema)
    asofBackward(l2, rAug, keys :+ "_chunk", ts, rightTie, toleranceUs)
      .select((left.columns.toSeq ++ ("asof_ts" +: rightPayload)).map(col): _*)
  }

  /** Point-in-interval join as equi-join: each point row (keys, ts) pairs
    * with the interval rows (keys, [startCol, endCol]) containing it,
    * bounds INCLUSIVE. Intervals explode to ceil(len/binWidth)+1 time bins,
    * points to one — the equi-join on (keys, bin) replaces the
    * BETWEEN-inequality join Spark would plan as a nested loop.
    *
    * `binWidth` trades interval fan-out (len/W + 1 copies of each interval
    * row in the shuffle) against bin selectivity; the expected interval
    * length is a good choice. INNER semantics: uncontained points drop.
    * Output: all point columns + the interval's payload columns.
    */
  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      ts: String = "ts",
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val pointCols = points.columns.toSeq
    val ivPayload = intervals.columns.toSeq.filterNot(keys.contains)
    require(ivPayload.intersect(pointCols).isEmpty,
      s"interval payload ${ivPayload.mkString(",")} collides with point columns")
    requireNoReserved(points, "point", "_bin")
    requireNoReserved(intervals, "interval", "_bin")

    def bin(c: Column): Column = floorDiv(c, lit(binWidth))
    val iv = intervals.withColumn("_bin",
      explode(sequence(bin(col(startCol)), bin(col(endCol)))))
    val p = points.withColumn("_bin", bin(col(ts)))
    // each (point, interval) pair meets in exactly one bin — the point's —
    // so the fan-out never duplicates matched pairs
    p.join(iv, keys :+ "_bin")
      .filter(col(ts) >= col(startCol) && col(ts) <= col(endCol))
      .select(pointCols.map(col) ++ ivPayload.map(col): _*)
  }

  /** Exact LONG floor division (shared helper — see
    * [[graft.functions.LongMath.floorDiv]]). */
  private def floorDiv(a: Column, w: Column): Column =
    graft.functions.LongMath.floorDiv(a, w)
}
