package graft

import graft.core.Tables
import graft.operators.{Knn, SearchParams}
import org.apache.spark.sql.functions._

class KnnSpec extends SparkSpec {

  private def corpus = Tables.ordersCorpus(spark, Sf)

  /** Queries taken from the corpus itself: top-1 must be self with cosine 1. */
  test("self-match invariant: each corpus vector's nearest neighbour is itself") {
    val queries = corpus.limit(4).select(col("doc_id").as("qid"), col("dv").as("qv"))
    val top1 = Knn.search(corpus, queries,
        SearchParams(metric = "COSINE", limit = 1, outputFields = Nil))
      .collect()
    assert(top1.length == 4)
    top1.foreach { r =>
      assert(r.getAs[Long]("qid") == r.getAs[Long]("doc_id"))
      assert(math.abs(r.getAs[Double]("score") - 1.0) < 1e-12)
    }
  }

  test("fused scan is bit-identical to the BNLJ plan (all metrics, band)") {
    import spark.implicits._
    val q = Tables.queryBatch(spark, 6)
    def run(fused: Boolean, c: org.apache.spark.sql.DataFrame, p: SearchParams) = {
      val was = Knn.fusedScan
      Knn.fusedScan = fused
      try Knn.search(c, q, p).select("qid", "rank", "doc_id", "score")
        .collect().map(_.toSeq).toSet
      finally Knn.fusedScan = was
    }
    for (m <- Seq("COSINE", "L2", "IP")) {
      val p = SearchParams(metric = m, limit = 7, outputFields = Nil)
      assert(run(fused = true, corpus, p) == run(fused = false, corpus, p),
        s"fused != bnlj for $m")
    }
    // band semantics (A3): applied before the cut on both paths
    val band = SearchParams(metric = "COSINE", limit = 7,
      rangeFilter = Some((0.0, 0.9)), outputFields = Nil)
    assert(run(fused = true, corpus, band) == run(fused = false, corpus, band),
      "fused != bnlj under a score band")
    // (All-zero vectors are out of contract for COSINE: the BNLJ path
    // throws ANSI DIVIDE_BY_ZERO, the fused path would yield NaN — both
    // "garbage in"; equality is asserted over the valid-input domain.)
  }

  test("top-k is a subset ordered by score and bounded by limit") {
    val res = Knn.search(corpus, Tables.queryBatch(spark, 3),
      SearchParams(metric = "L2", limit = 5, outputFields = Nil)).collect()
    assert(res.length == 15)
    res.groupBy(_.getAs[Long]("qid")).foreach { case (_, rows) =>
      val scores = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("score"))
      assert(scores.sameElements(scores.sorted), "L2 scores ascending by rank")
    }
  }

  test("score threshold only removes rows, keeps order (P2)") {
    val base = Knn.search(corpus, Tables.queryBatch(spark, 2),
      SearchParams(limit = 10, outputFields = Nil))
    val thr = Knn.search(corpus, Tables.queryBatch(spark, 2),
      SearchParams(limit = 10, scoreThreshold = Some(0.2), outputFields = Nil))
    val baseIds = base.filter(col("score") >= 0.2).select("qid", "doc_id").collect().toSet
    assert(thr.select("qid", "doc_id").collect().toSet == baseIds)
  }

  test("text filter with all-stopword filter string rejects every row (P3 quirk)") {
    val res = Knn.search(corpus, Tables.queryBatch(spark, 2),
      SearchParams(limit = 10, textFilter = Some("the a an of"), outputFields = Nil))
    assert(res.isEmpty)
  }

  test("meta filter drops rows missing the key (P5)") {
    val res = Knn.search(corpus, Tables.queryBatch(spark, 2),
      SearchParams(limit = 10, metaFilter = Map("nonexistent_key" -> "x")))
    assert(res.isEmpty)
  }

  test("round_decimal rounds the reported score (P8)") {
    val res = Knn.search(corpus, Tables.queryBatch(spark, 1),
        SearchParams(limit = 3, roundDecimal = 2, outputFields = Nil))
      .select("score").collect().map(_.getDouble(0))
    res.foreach(s => assert(math.abs(s * 100 - math.round(s * 100)) < 1e-9))
  }

  test("query batch over the fused-collect cap auto-routes to the distributed plan") {
    // the fused scan collects the query batch to the driver — bounded by
    // maxFusedQueries; past the cap, search must hand the SAME request to
    // the BNLJ plan (no driver-side array) with identical results
    val big   = Tables.queryBatch(spark, 24)
    val p     = SearchParams(metric = "COSINE", limit = 5, outputFields = Nil)
    val was   = Knn.maxFusedQueries
    val (capped, fused) = try {
      Knn.maxFusedQueries = 8 // 24-query batch is 3× over the cap
      val routed = Knn.search(corpus, big, p)
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin"),
        s"over-cap batch did not take the distributed BNLJ path:\n$plan")
      val cappedRows = routed.select("qid", "rank", "doc_id", "score")
        .collect().map(_.toSeq).toSet
      Knn.maxFusedQueries = was
      (cappedRows, Knn.search(corpus, big, p).select("qid", "rank", "doc_id", "score")
        .collect().map(_.toSeq).toSet)
    } finally Knn.maxFusedQueries = was
    assert(capped == fused, "auto-routed results differ from the fused path")
    // under the cap the fused mapPartitions path is used (no BNLJ)
    val under = Knn.search(corpus, Tables.queryBatch(spark, 4), p)
      .queryExecution.executedPlan.toString
    assert(!under.contains("BroadcastNestedLoopJoin"),
      s"under-cap batch unexpectedly took the BNLJ path:\n$under")
  }

  test("offset skips the first ranks (A5)") {
    val full = Knn.search(corpus, Tables.queryBatch(spark, 1),
      SearchParams(limit = 10, outputFields = Nil)).collect().sortBy(_.getAs[Long]("rank"))
    val off = Knn.search(corpus, Tables.queryBatch(spark, 1),
      SearchParams(limit = 5, offset = 5, outputFields = Nil)).collect().sortBy(_.getAs[Long]("rank"))
    assert(off.map(_.getAs[Long]("doc_id")).toSeq ==
      full.drop(5).take(5).map(_.getAs[Long]("doc_id")).toSeq)
  }
}
