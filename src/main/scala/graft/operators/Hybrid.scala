package graft.operators

import graft.functions.Vec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid dense+sparse search with Reciprocal Rank Fusion — the reference's
  * signature operator (`/root/reference/app/milvus/vector_store.py:594-822`).
  *
  * Faithful quirks reproduced:
  *  - per-leg fetch = min(limit, 50)                     (vector_store.py:609)
  *  - RRF(d) = Σ_legs 1/(60 + rank), k=60                (vector_store.py:797-822)
  *  - score threshold applies to the DENSE score only; sparse-only hits
  *    survive thresholding                               (vector_store.py:766-770)
  *  - sparse leg failure/absence degrades to dense-only  (vector_store.py:629-659)
  *
  * The fusion is a full-outer rank join on doc_id (SURVEY §2.3) — at scale
  * both legs are already top-≤50 per query, so the join inputs are tiny
  * (≤ 50·|queries| rows) regardless of corpus size.
  */
object Hybrid {

  val RrfK = 60

  /** queries: (qid, qv ARRAY<DOUBLE>, qtext STRING).
    * corpus:  (doc_id, dv, …).
    * Returns (qid, rank, doc_id, rrf_score, dense_score, sparse_score).
    */
  def search(corpus: DataFrame, queries: DataFrame, bm25: Bm25.Model,
      queryTexts: Seq[(Long, String)], p: SearchParams): DataFrame =
    searchScored(Knn.scored(corpus, queries.select("qid", "qv"), p.metric),
      bm25, queryTexts, p)

  /** Bulk variant of [[search]]: the queries arrive as ONE DataFrame
    * (qid BIGINT, qv ARRAY<DOUBLE>, text STRING) — both legs run their
    * distributed-query forms ([[Knn.scored]] with the queries broadcast;
    * [[Bm25.searchTopKDf]] tokenizes the query text inside the plan), so a
    * million-query hybrid batch never routes query text through a
    * driver-side Seq. Row-identical to [[search]] on the same queries
    * (HybridSpec: bulk ≡ Seq path; same tokenizer, same fusion).
    */
  def searchDf(corpus: DataFrame, queries: DataFrame, bm25: Bm25.Model,
      p: SearchParams, sparseCandidates: Option[DataFrame] = None): DataFrame =
    fuse(Knn.scored(corpus, queries.select("qid", "qv"), p.metric),
      Bm25.searchTopKDf(bm25, queries.select("qid", "text"),
        math.min(p.limit, 50), sparseCandidates), p)

  /** [[search]] over a PRE-SCORED dense leg (qid, doc_id, rawScore) — the
    * facade's index-bounded path supplies per-query cell-pruned scores here
    * instead of a full-corpus cross join.
    */
  def searchScored(denseScored: DataFrame, bm25: Bm25.Model,
      queryTexts: Seq[(Long, String)], p: SearchParams,
      sparseCandidates: Option[DataFrame] = None): DataFrame =
    fuse(denseScored,
      Bm25.searchTopK(bm25, queryTexts, math.min(p.limit, 50), sparseCandidates), p)

  /** [[searchScored]] with the query TEXTS as a DataFrame (qid, text) — the
    * end-to-end Df-native form the facade's batch path uses: the sparse
    * leg's query side stays in the plan ([[Bm25.searchTopKDf]], distributed
    * tokenization) instead of routing per-qid pairs through a driver Seq.
    * `knownTerms` forwards the facade's driver-known request vocabulary so
    * the stored-dictionary partition prune survives the Df form (see
    * [[Bm25.searchTopKDf]]).
    */
  def searchScoredDf(denseScored: DataFrame, bm25: Bm25.Model,
      queryTexts: DataFrame, p: SearchParams,
      sparseCandidates: Option[DataFrame] = None,
      knownTerms: Option[Seq[String]] = None): DataFrame =
    fuse(denseScored,
      Bm25.searchTopKDf(bm25, queryTexts, math.min(p.limit, 50),
        sparseCandidates, knownTerms), p)

  /** The shared fusion tail: top-legK both legs, full-outer RRF join,
    * dense-only threshold, final rank. `sparseTopK` is (qid, rank, doc_id,
    * score) from whichever sparse entry (driver Seq or distributed DF)
    * produced it.
    */
  private def fuse(denseScored: DataFrame, sparseTopK: DataFrame,
      p: SearchParams): DataFrame = {
    val legK = math.min(p.limit, 50)

    // Dense leg: metric top-legK per qid (codegen dot + partial top-k).
    val dense = TopK.perKey(denseScored.select("qid", "doc_id", "rawScore"),
        "qid", "rawScore", "doc_id", legK, desc = Knn.higherIsBetter(p.metric))
      .select(col("qid"), col("doc_id"), col("rawScore").as("dense_score"),
        col("rank").as("dense_rank"))

    // Sparse leg (gated by callers: only when query text present — H4). The
    // candidate restriction (partition targeting) limits which docs score,
    // never the df statistics (see Bm25.scoredCandidates).
    val sparse = sparseTopK
      .select(col("qid"), col("doc_id"), col("score").as("sparse_score"),
        col("rank").as("sparse_rank"))

    // RRF fusion: full outer rank join; two fixed-order addends → deterministic.
    val fused = dense.join(sparse, Seq("qid", "doc_id"), "full_outer")
      .withColumn("rrf_score",
        coalesce(lit(1.0) / (lit(RrfK.toDouble) + col("dense_rank")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(RrfK.toDouble) + col("sparse_rank")), lit(0.0)))

    // Dense-only threshold (sparse-only hits pass).
    val thresholded = p.scoreThreshold.fold(fused)(t =>
      fused.filter(col("dense_score").isNull || col("dense_score") >= t))

    val wf = Window.partitionBy("qid").orderBy(col("rrf_score").desc, col("doc_id").asc)
    thresholded
      .withColumn("rank", row_number().over(wf).cast("long"))
      .filter(col("rank") <= p.limit)
      .select("qid", "rank", "doc_id", "rrf_score", "dense_score", "sparse_score")
  }
}
