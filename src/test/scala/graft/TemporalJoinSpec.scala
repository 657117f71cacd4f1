package graft

import graft.operators.TemporalJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** As-of and range join: hand-computed fixtures, equivalence to the naive
  * inequality formulation on randomized data, and plan-shape locks (the
  * whole point of the operators is that NO nested-loop join appears).
  */
class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  // (key, ts, event_id) left; (key, ts, rid, rv) right
  private def L(rows: (Long, Long, Long)*): DataFrame =
    rows.toSeq.toDF("k", "ts", "event_id")
  private def R(rows: (Long, Long, Long, Double)*): DataFrame =
    rows.toSeq.toDF("k", "ts", "rid", "rv")

  test("asof: backward match, inclusive at equal ts, null when none") {
    val l = L((1L, 100L, 10L), (1L, 205L, 11L), (1L, 50L, 12L), (2L, 100L, 13L))
    val r = R((1L, 100L, 7L, 1.0), (1L, 200L, 8L, 2.0), (3L, 10L, 9L, 3.0))
    val out = TemporalJoin.asof(l, r, Seq("k"), "ts").collect()
      .map(x => x.getLong(2) -> (Option(x.get(3)), Option(x.get(4)))).toMap
    assert(out(10L) == (Some(100L), Some(7L)))  // equal ts matches (inclusive)
    assert(out(11L) == (Some(200L), Some(8L)))  // most recent, not first
    assert(out(12L) == (None, None))            // nothing at-or-before
    assert(out(13L) == (None, None))            // key with no right rows
  }

  test("asof: equal-ts right duplicates resolve to max tie-break") {
    val l = L((1L, 100L, 10L))
    val r = R((1L, 90L, 5L, 1.0), (1L, 90L, 9L, 2.0), (1L, 90L, 7L, 3.0))
    val row = TemporalJoin.asof(l, r, Seq("k"), "ts", rightTie = Some("rid"))
      .collect().head
    assert(row.getLong(4) == 9L && row.getDouble(5) == 2.0)
  }

  test("asof: tolerance nulls far matches but keeps the row") {
    val l = L((1L, 100L, 10L), (1L, 500L, 11L))
    val r = R((1L, 90L, 5L, 1.0))
    val out = TemporalJoin.asof(l, r, Seq("k"), "ts", toleranceUs = Some(50L))
      .collect().map(x => x.getLong(2) -> Option(x.get(4))).toMap
    assert(out == Map(10L -> Some(5L), 11L -> None))
  }

  test("asof forward: earliest at-or-after, inclusive, null when none behind") {
    val l = L((1L, 100L, 10L), (1L, 205L, 11L), (2L, 100L, 13L))
    val r = R((1L, 100L, 7L, 1.0), (1L, 200L, 8L, 2.0), (3L, 10L, 9L, 3.0))
    val out = TemporalJoin.asof(l, r, Seq("k"), "ts", direction = "forward")
      .collect().map(x => x.getLong(2) -> (Option(x.get(3)), Option(x.get(4)))).toMap
    assert(out(10L) == (Some(100L), Some(7L)))  // equal ts matches (inclusive)
    assert(out(11L) == (None, None))            // nothing at-or-after 205
    assert(out(13L) == (None, None))
  }

  test("asof ≡ naive argmax filter on randomized data") {
    val rnd = new scala.util.Random(42)
    val l = L(Seq.fill(300)((rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, rnd.nextLong().abs)): _*)
    // unique (k, ts) on the right so the naive form is well-defined
    val r = R(Seq.tabulate(200)(i => (rnd.nextInt(6).toLong, rnd.nextInt(1000).toLong, i.toLong, rnd.nextInt(10).toDouble)): _*)
      .groupBy("k", "ts").agg(max("rid").as("rid"), max("rv").as("rv"))
    val fast = TemporalJoin.asof(l, r, Seq("k"), "ts", rightTie = Some("rid"))
      .select($"event_id", coalesce($"asof_ts", lit(-1L)), coalesce($"rid", lit(-1L)))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sorted
    val naive = l.as("l").join(r.as("r"), $"l.k" === $"r.k" && $"r.ts" <= $"l.ts", "left")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"l.k", $"l.ts", $"event_id")
          .orderBy($"r.ts".desc_nulls_last, $"rid".desc_nulls_last)))
      .filter($"rk" === 1)
      .select($"event_id", coalesce($"r.ts", lit(-1L)), coalesce($"rid", lit(-1L)))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sorted
    assert(fast.toSeq == naive.toSeq)
  }

  test("asof plan: window pass only — no join operator of any kind") {
    val l = L((1L, 100L, 10L)); val r = R((1L, 90L, 5L, 1.0))
    val p = plan(TemporalJoin.asof(l, r, Seq("k"), "ts"))
    assert(p.contains("Window"), "expected the window formulation")
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
  }

  test("rangePairs: half-open window, cross-bin matches, no duplicate pairs") {
    val l = L((1L, 1000L, 10L))
    // window [ts-100, ts): 900 ≤ r.ts < 1000 — 899 out, 900 in, 999 in, 1000 out
    val r = R((1L, 899L, 1L, 0.0), (1L, 900L, 2L, 0.0), (1L, 999L, 3L, 0.0),
      (1L, 1000L, 4L, 0.0), (2L, 950L, 5L, 0.0))
    val got = TemporalJoin.rangePairs(l, r, Seq("k"), "ts", lo = -100L, hi = 0L)
      .select("rid").as[Long].collect().sorted.toSeq
    assert(got == Seq(2L, 3L))
  }

  test("rangePairs ≡ naive inequality join on randomized data (incl. negative ts)") {
    val rnd = new scala.util.Random(7)
    val l = L(Seq.fill(200)((rnd.nextInt(4).toLong, rnd.nextInt(2000).toLong - 1000L, rnd.nextLong().abs)): _*)
    val r = R(Seq.tabulate(300)(i => (rnd.nextInt(5).toLong, rnd.nextInt(2000).toLong - 1000L, i.toLong, 0.0)): _*)
    for ((lo, hi) <- Seq((-150L, 0L), (0L, 77L), (-30L, 31L))) {
      val fast = TemporalJoin.rangePairs(l, r, Seq("k"), "ts", lo, hi)
        .select("event_id", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).sorted
      val naive = l.as("l").join(r.as("r"),
          $"l.k" === $"r.k" && $"r.ts" - $"l.ts" >= lo && $"r.ts" - $"l.ts" < hi)
        .select($"event_id", $"rid").collect().map(x => (x.getLong(0), x.getLong(1))).sorted
      assert(fast.toSeq == naive.toSeq, s"window [$lo,$hi)")
      assert(fast.length == fast.distinct.length, "bin duplication leaked pairs")
    }
  }

  test("range join plan: equi-join on (keys, bin) — never a nested loop") {
    val l = L((1L, 100L, 10L)); val r = R((1L, 90L, 5L, 1.0))
    val p = plan(TemporalJoin.rangePairs(l, r, Seq("k"), "ts", -100L, 0L))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"inequality join leaked into the plan:\n$p")
  }

  test("asofChunked ≡ asof across chunk widths (hot single key, tolerance, ties)") {
    val rnd = new scala.util.Random(21)
    // ONE hot key: the case the chunking exists for
    val l = L(Seq.fill(500)((1L, rnd.nextInt(10000).toLong, rnd.nextLong().abs)) ++
      Seq.fill(50)((2L, rnd.nextInt(10000).toLong, rnd.nextLong().abs)): _*)
    val r = R(Seq.tabulate(400)(i =>
        ((if (i % 8 == 0) 2L else 1L), rnd.nextInt(10000).toLong, i.toLong, rnd.nextInt(5).toDouble)): _*)
      .groupBy("k", "ts").agg(max("rid").as("rid"), max("rv").as("rv"))
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select($"event_id", coalesce($"asof_ts", lit(-1L)), coalesce($"rid", lit(-1L)),
        coalesce($"rv", lit(-1.0)))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3))).sorted.toSeq
    for (tol <- Seq(None, Some(700L)); chunk <- Seq(100L, 1000L, 100000L)) {
      val plain   = norm(TemporalJoin.asof(l, r, Seq("k"), "ts",
        rightTie = Some("rid"), toleranceUs = tol))
      val chunked = norm(TemporalJoin.asofChunked(l, r, Seq("k"), "ts",
        rightTie = Some("rid"), toleranceUs = tol, chunkUs = chunk))
      assert(chunked == plain, s"tol=$tol chunk=$chunk")
    }
  }

  test("asofChunked window partitions by (key, chunk) — hot keys parallelize") {
    val l = L((1L, 100L, 10L)); val r = R((1L, 90L, 5L, 1.0))
    val p = plan(TemporalJoin.asofChunked(l, r, Seq("k"), "ts", chunkUs = 50L))
    assert(p.contains("_chunk"), "chunk column missing from the window key")
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("intervalJoin: inclusive bounds, multi-bin intervals, overlap fan-out") {
    val p = L((1L, 100L, 10L), (1L, 250L, 11L), (1L, 301L, 12L), (2L, 100L, 13L))
    val iv = Seq((1L, 100L, 300L, 77L), (1L, 250L, 260L, 88L), (3L, 0L, 999L, 99L))
      .toDF("k", "s", "e", "sid")
    val got = TemporalJoin.intervalJoin(p, iv, Seq("k"), "ts",
        startCol = "s", endCol = "e", binWidth = 50L)
      .select("event_id", "sid").collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    // 10 @100: start-inclusive in [100,300]; 11 @250: in BOTH intervals;
    // 12 @301: end-exclusive misses [100,300]; 13: no interval for key 2
    assert(got == Seq((10L, 77L), (11L, 77L), (11L, 88L)))
  }

  test("intervalJoin ≡ naive BETWEEN join on randomized data, several bin widths") {
    val rnd = new scala.util.Random(11)
    val p = L(Seq.fill(300)((rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong, rnd.nextLong().abs)): _*)
    val iv = Seq.tabulate(80) { i =>
      val s = rnd.nextInt(1000).toLong
      (rnd.nextInt(5).toLong, s, s + rnd.nextInt(200).toLong, i.toLong)
    }.toDF("k", "s", "e", "sid")
    val naive = p.join(iv, p("k") === iv("k") && $"ts" >= $"s" && $"ts" <= $"e")
      .select($"event_id", $"sid").collect().map(x => (x.getLong(0), x.getLong(1))).sorted
    for (w <- Seq(7L, 50L, 500L)) {
      val fast = TemporalJoin.intervalJoin(p, iv, Seq("k"), "ts", "s", "e", w)
        .select("event_id", "sid").collect().map(x => (x.getLong(0), x.getLong(1))).sorted
      assert(fast.toSeq == naive.toSeq, s"binWidth $w")
    }
  }

  test("intervalJoin plan: equi-join on (keys, bin) — never a nested loop") {
    val p = L((1L, 100L, 10L))
    val iv = Seq((1L, 50L, 150L, 1L)).toDF("k", "s", "e", "sid")
    val pl = plan(TemporalJoin.intervalJoin(p, iv, Seq("k"), "ts", "s", "e", 100L))
    assert(!pl.contains("BroadcastNestedLoopJoin") && !pl.contains("CartesianProduct"),
      s"inequality join leaked into the plan:\n$pl")
  }

  test("windowAgg: explicit fill for empty windows; unfilled aggs stay null") {
    val l = L((1L, 1000L, 10L), (1L, 5000L, 11L))
    val r = R((1L, 950L, 1L, 2.5), (1L, 960L, 2L, 1.5))
    val out = TemporalJoin.windowAgg(l, Seq("event_id"), r, Seq("k"), "ts",
      lo = -100L, hi = 0L, fill = Map("n" -> lit(0L), "s" -> lit(0.0)))(
      "n" -> count(lit(1)), "s" -> sum($"rv"))
      .collect().map(x => x.getLong(2) -> (x.getLong(3), x.getDouble(4))).toMap
    assert(out(10L) == (2L, 4.0))
    assert(out(11L) == (0L, 0.0))
    // no fill → SQL left-outer semantics: empty-window aggregates are NULL
    // (a synthesized 0 would be a wrong answer for max-style aggregates)
    val nulls = TemporalJoin.windowAgg(l, Seq("event_id"), r, Seq("k"), "ts",
      lo = -100L, hi = 0L)(
      "mx" -> max($"rv"))
      .collect().map(x => x.getLong(2) -> (if (x.isNullAt(3)) None else Some(x.getDouble(3)))).toMap
    assert(nulls(10L) == Some(2.5))
    assert(nulls(11L) == None)
    // fill naming a nonexistent aggregate is rejected up front
    intercept[IllegalArgumentException] {
      TemporalJoin.windowAgg(l, Seq("event_id"), r, Seq("k"), "ts",
        lo = -100L, hi = 0L, fill = Map("nope" -> lit(0L)))("n" -> count(lit(1)))
    }
  }

  test("reserved plumbing/output names are rejected, not silently shadowed") {
    val l = L((1L, 1000L, 10L))
    val r = R((1L, 950L, 1L, 2.5))
    intercept[IllegalArgumentException] {
      TemporalJoin.asof(l.withColumn("asof_ts", lit(0L)), r, Seq("k"), "ts")
    }
    intercept[IllegalArgumentException] {
      TemporalJoin.asof(l, r.withColumn("_tie", lit(0L)), Seq("k"), "ts")
    }
    intercept[IllegalArgumentException] {
      TemporalJoin.rangePairs(l.withColumn("r_ts", lit(0L)), r, Seq("k"), "ts",
        lo = -100L, hi = 0L)
    }
    intercept[IllegalArgumentException] {
      TemporalJoin.asofChunked(l.withColumn("_chunk", lit(0L)), r, Seq("k"), "ts",
        chunkUs = 100L)
    }
  }

  test("asof: fractional tie column breaks ties on the untruncated value") {
    // two right rows at the same ts with ties 1.9 and 1.2: a long-cast
    // tie-break would see (1, 1) and pick nondeterministically / wrongly;
    // the untruncated order picks 1.9 (max tie wins), matching asofChunked
    val l  = Seq((1L, 1000L, 10L)).toDF("k", "ts", "event_id")
    val r  = Seq((1L, 900L, 1.2, 100L), (1L, 900L, 1.9, 200L))
      .toDF("k", "ts", "tie", "rid")
    val plain = TemporalJoin.asof(l, r, Seq("k"), "ts", rightTie = Some("tie"))
      .select("rid").collect().map(_.getLong(0)).toSeq
    val chunked = TemporalJoin.asofChunked(l, r, Seq("k"), "ts",
      rightTie = Some("tie"), chunkUs = 500L)
      .select("rid").collect().map(_.getLong(0)).toSeq
    assert(plain == Seq(200L))
    assert(chunked == plain)
  }
}
