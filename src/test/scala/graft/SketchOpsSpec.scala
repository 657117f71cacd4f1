package graft

import graft.functions.HeavyHitters
import graft.operators.{Quantiles, TextAnalysis}
import org.apache.spark.sql.functions._

/** Exact quantiles and Misra-Gries heavy hitters: hand-computed fixtures,
  * randomized equivalence to naive formulations, the sketch's superset
  * guarantee, and determinism of the candidate+verify pipeline under
  * repartitioning (sketch content may vary; the verified result may not).
  */
class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  test("quantiles: hand-computed ranks incl. q=0 and q=1") {
    val df = Seq(("a", 10L), ("a", 20L), ("a", 30L), ("a", 40L), ("b", 7L))
      .toDF("lang", "n_chars")
    val got = Quantiles.exactQuantiles(df, Seq("lang"), "n_chars",
        Seq(0.0, 0.5, 1.0))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    // a: n=4 → ranks floor(q*3)+1 = 1, 2, 4 → 10, 20, 40; b: all 7
    assert(got == Set(("a", 0.0, 10L), ("a", 0.5, 20L), ("a", 1.0, 40L),
      ("b", 0.0, 7L), ("b", 0.5, 7L), ("b", 1.0, 7L)))
  }

  test("quantiles ≡ sorted-sequence indexing on randomized groups") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(2000)((s"g${rnd.nextInt(7)}", rnd.nextInt(10000).toLong))
    val qs = Seq(0.25, 0.5, 0.9, 0.99)
    val got = Quantiles.exactQuantiles(rows.toDF("lang", "n_chars"),
        Seq("lang"), "n_chars", qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    val expected = rows.groupBy(_._1).flatMap { case (g, grp) =>
      val sorted = grp.map(_._2).sorted
      qs.map(q => (g, q) -> sorted(math.floor(q * (sorted.size - 1)).toInt))
    }
    assert(got == expected)
  }

  test("quantiles: all qs ride ONE window pass") {
    val p = Quantiles.exactQuantiles(
        Seq(("a", 1L)).toDF("lang", "n_chars"), Seq("lang"), "n_chars",
        Seq(0.5, 0.9, 0.99))
      .queryExecution.executedPlan.toString
    assert(p.split("Window").length - 1 <= 2, // rn+count fold into ≤2 nodes
      s"quantiles re-ran the window per q:\n$p")
  }

  test("binnedQuantiles: the exact quantile always lands inside the answering bin") {
    val rnd = new scala.util.Random(9)
    val rows = Seq.fill(3000)((s"g${rnd.nextInt(5)}", rnd.nextInt(5000).toLong))
    val df = rows.toDF("lang", "n_chars")
    val qs = Seq(0.5, 0.9, 0.99)
    val exact = Quantiles.exactQuantiles(df, Seq("lang"), "n_chars", qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(2)).toMap
    for (w <- Seq(1L, 7L, 64L)) {
      val binned = Quantiles.binnedQuantiles(df, Seq("lang"), "n_chars", qs, w)
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> (r.getLong(2), r.getLong(3))).toMap
      assert(binned.keySet == exact.keySet)
      for ((k, (lo, hi)) <- binned) {
        assert(lo <= exact(k) && exact(k) <= hi, s"$k: exact ${exact(k)} not in [$lo,$hi] (w=$w)")
        assert(hi - lo == w - 1)
      }
      if (w == 1L) // width-1 bins ARE the exact quantile
        assert(binned.map { case (k, (lo, _)) => k -> lo } == exact)
    }
  }

  test("binnedQuantiles plan: map-side combinable histogram, no data-wide sort shuffle") {
    val df = Seq(("a", 5L)).toDF("lang", "n_chars")
    val p = Quantiles.binnedQuantiles(df, Seq("lang"), "n_chars", Seq(0.5), 8L)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("partial_count"), s"histogram must partial-aggregate:\n$p")
  }

  test("MG sketch: every term over the n/(k+1) guarantee survives") {
    // 20 heavy terms (200 each) buried in 30k distinct singletons
    val heavy = (0 until 20).flatMap(i => Seq.fill(200)(s"heavy$i"))
    val noise = (0 until 30000).map(i => s"noise$i")
    val df = scala.util.Random.shuffle(heavy ++ noise).toDF("term")
    val n = heavy.size + noise.size
    val cand = df.agg(HeavyHitters.mgTerms($"term", 256).as("c"))
      .select(explode($"c").as("t")).as[String].collect().toSet
    // guarantee threshold n/(k+1) with k=256: 34000/257 ≈ 132 < 200
    assert(n / 257 < 200, "fixture must keep heavies above the bound")
    assert((0 until 20).forall(i => cand.contains(s"heavy$i")),
      s"lost a guaranteed heavy hitter; kept ${cand.size}")
    assert(cand.size <= 256)
  }

  test("heavyTerms ≡ naive threshold group-by, stable under repartitioning") {
    // zipfy corpus: term t_i with frequency ~ 3000/(i+1)
    val words = (0 until 500).flatMap(i => Seq.fill(3000 / (i + 1))(s"w$i"))
    val docs = words.grouped(40).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val naive = graft.operators.Dedup.tokenTable(docs)
      .groupBy("term").agg(count(lit(1)).as("n"))
      .withColumn("tot", sum("n").over())
      .filter($"n".cast("double") > $"tot".cast("double") * 0.01)
      .select("term", "n").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    for (parts <- Seq(1, 7)) {
      val got = TextAnalysis.heavyTerms(docs.repartition(parts), k = 256,
          minShare = 0.01)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == naive, s"parts=$parts")
    }
  }

  test("heavyTerms plan: broadcast recount only — sketch pass ran exactly once") {
    val docs = Seq((1L, "a b c a")).toDF("doc_id", "text")
    val p = TextAnalysis.heavyTerms(docs, k = 64, minShare = 0.1)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the MG sketch is collected ONCE at call time (one row: ≤k candidates +
    // n_total) and inlined as literals — the returned plan must be the
    // recount alone: a broadcast semi of the candidate list, and NO second
    // MG aggregate re-scanning the corpus for either consumer
    assert(!p.contains("partial_mg_heavy_hitters"),
      s"sketch aggregate leaked into the recount plan (re-scan):\n$p")
    assert(p.contains("BroadcastHashJoin"), s"candidate recount must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"n_total must be a literal, not a cross-joined scalar:\n$p")
  }
}
