package graft

import graft.functions.Text

/** DuckDB oracle SQL for each SparkEntry query.
  *
  * Determinism contract (see SURVEY §2.10): every floating-point value the
  * driver hashes is either (a) derived from exact-integer sums through the
  * SAME chain of IEEE correctly-rounded ops (*, /, sqrt) in both engines —
  * bitwise equal; or (b) a decimal-cast aggregate — exact; or (c) rounded
  * after a log-based formula written with identical association (BM25).
  */
object Oracles {

  /** Synthetic data-vector component i for key expression `k` (must mirror
    * [[graft.core.Tables.synthVec]]).
    */
  private def dvc(k: String, i: String = "ix.i") = s"(($k)*131 + $i*313 + 7) % 97 - 48"
  /** Query-vector component for qid expression `q` (mirror of queryVec). */
  private def qvc(q: String, i: String = "ix.i") = dvc(s"($q)*997 + 1", i)

  private val ix = "(SELECT CAST(range AS BIGINT) AS i FROM range(64)) ix"

  /** Scored cross-join of `nq` synthetic queries × orders corpus:
    * per (qid, doc_id): dot, nq2 (query norm²), nd2 (doc norm²) — all exact
    * integers cast to double.
    */
  def ordersScores(nq: Int): String =
    s"""scores AS (
       |  SELECT q.qid, d.o_orderkey AS doc_id,
       |         CAST(SUM((${qvc("q.qid")}) * (${dvc("d.o_orderkey")})) AS DOUBLE) AS dot,
       |         CAST(SUM((${qvc("q.qid")}) * (${qvc("q.qid")})) AS DOUBLE) AS nq2,
       |         CAST(SUM((${dvc("d.o_orderkey")}) * (${dvc("d.o_orderkey")})) AS DOUBLE) AS nd2,
       |         CAST(SUM(((${qvc("q.qid")}) - (${dvc("d.o_orderkey")})) * ((${qvc("q.qid")}) - (${dvc("d.o_orderkey")}))) AS DOUBLE) AS l2sq
       |  FROM (SELECT CAST(range AS BIGINT) AS qid FROM range($nq)) q, orders d, $ix
       |  GROUP BY 1, 2)""".stripMargin

  val cosineExpr = "dot / (sqrt(nq2) * sqrt(nd2))"

  def knnCosine(nq: Int, k: Int): String =
    s"""WITH ${ordersScores(nq)}
       |SELECT qid, rank, doc_id, score FROM (
       |  SELECT qid, doc_id, $cosineExpr AS score,
       |         row_number() OVER (PARTITION BY qid ORDER BY $cosineExpr DESC, doc_id) AS rank
       |  FROM scores)
       |WHERE rank <= $k""".stripMargin

  def knnL2(nq: Int, k: Int): String =
    s"""WITH ${ordersScores(nq)}
       |SELECT qid, rank, doc_id, score FROM (
       |  SELECT qid, doc_id, sqrt(l2sq) AS score,
       |         row_number() OVER (PARTITION BY qid ORDER BY sqrt(l2sq) ASC, doc_id) AS rank
       |  FROM scores)
       |WHERE rank <= $k""".stripMargin

  def knnIp(nq: Int, k: Int): String =
    s"""WITH ${ordersScores(nq)}
       |SELECT qid, rank, doc_id, score FROM (
       |  SELECT qid, doc_id, dot AS score,
       |         row_number() OVER (PARTITION BY qid ORDER BY dot DESC, doc_id) AS rank
       |  FROM scores)
       |WHERE rank <= $k""".stripMargin

  /** Threshold + offset semantics: ANN rank cut at offset+limit, drop ranks
    * ≤ offset, then client-side score threshold, then re-rank (P2/A4/A5).
    */
  def knnThreshold(nq: Int, k: Int, offset: Int, t: Double): String =
    s"""WITH ${ordersScores(nq)},
       |ann AS (
       |  SELECT qid, doc_id, $cosineExpr AS score,
       |         row_number() OVER (PARTITION BY qid ORDER BY $cosineExpr DESC, doc_id) AS ann_rank
       |  FROM scores),
       |cut AS (
       |  SELECT * FROM ann WHERE ann_rank <= ${offset + k} AND ann_rank > $offset AND score >= $t)
       |SELECT qid, row_number() OVER (PARTITION BY qid ORDER BY ann_rank) AS rank,
       |       doc_id, score
       |FROM cut QUALIFY rank <= $k""".stripMargin

  /** Range search (A3): score band [lo, hi] applied pre-rank. */
  def knnRange(nq: Int, k: Int, lo: Double, hi: Double): String =
    s"""WITH ${ordersScores(nq)},
       |banded AS (
       |  SELECT qid, doc_id, $cosineExpr AS score FROM scores
       |  WHERE $cosineExpr >= $lo AND $cosineExpr <= $hi)
       |SELECT qid, rank, doc_id, score FROM (
       |  SELECT qid, doc_id, score,
       |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
       |  FROM banded)
       |WHERE rank <= $k""".stripMargin

  /** Meta-filter search over the orders corpus (P5/P6): JSON meta built the
    * same way as [[graft.core.Tables.ordersCorpus]], filtered by
    * case-insensitive substring on extracted keys AFTER the ANN cut.
    */
  def knnMeta(nq: Int, k: Int, fetchK: Int, priorityContains: String): String =
    s"""WITH ${ordersScores(nq)},
       |corpus AS (
       |  SELECT o_orderkey AS doc_id,
       |         to_json(struct_pack(status := o_orderstatus, priority := o_orderpriority)) AS meta
       |  FROM orders),
       |ann AS (
       |  SELECT s.qid, s.doc_id, $cosineExpr AS score, c.meta,
       |         row_number() OVER (PARTITION BY s.qid ORDER BY $cosineExpr DESC, s.doc_id) AS ann_rank
       |  FROM scores s JOIN corpus c ON s.doc_id = c.doc_id),
       |cut AS (
       |  SELECT * FROM ann WHERE ann_rank <= $fetchK
       |    AND json_extract_string(meta, '$$.priority') IS NOT NULL
       |    AND contains(lower(json_extract_string(meta, '$$.priority')), '${priorityContains.toLowerCase}'))
       |SELECT qid, row_number() OVER (PARTITION BY qid ORDER BY ann_rank) AS rank,
       |       doc_id, score, meta
       |FROM cut QUALIFY rank <= $k""".stripMargin

  /** Quantized-embedding scores over the documents⋈embeddings corpus:
    * queries are the first `nq` docs' embeddings. Mirrors
    * [[graft.core.Tables.docsCorpus]] / quantize.
    */
  def docScores(nq: Int): String =
    s"""qe AS (
       |  SELECT vec_id, i, round(CAST(e AS DOUBLE) * 1000) AS x
       |  FROM (SELECT vec_id, unnest(embedding) AS e,
       |               generate_subscripts(embedding, 1) AS i
       |        FROM embeddings)),
       |dscores AS (
       |  SELECT q.vec_id AS qid, d.vec_id AS doc_id,
       |         CAST(SUM(q.x * d.x) AS DOUBLE) AS dot,
       |         CAST(SUM(q.x * q.x) AS DOUBLE) AS nq2,
       |         CAST(SUM(d.x * d.x) AS DOUBLE) AS nd2
       |  FROM qe q JOIN qe d USING (i)
       |  WHERE q.vec_id < $nq
       |  GROUP BY 1, 2)""".stripMargin

  /** Text-filter search (P3/P4) over documents with quantized embeddings:
    * ANN top-(k+Δ) then keyword containment ≥ `need` of `words`, then
    * truncate to k.
    */
  def knnText(nq: Int, k: Int, overFetch: Int, words: Seq[String], minWords: Int): String = {
    val need = math.min(words.length, minWords)
    val hits = words
      .map(w => s"(CASE WHEN contains(lower(text), '$w') THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH ${docScores(nq)},
       |ann AS (
       |  SELECT s.qid, s.doc_id, $cosineExpr AS score, d.text,
       |         row_number() OVER (PARTITION BY s.qid ORDER BY $cosineExpr DESC, s.doc_id) AS ann_rank
       |  FROM dscores s JOIN documents d ON s.doc_id = d.doc_id),
       |cut AS (
       |  SELECT * FROM ann WHERE ann_rank <= ${k + overFetch} AND ($hits) >= $need)
       |SELECT qid, row_number() OVER (PARTITION BY qid ORDER BY ann_rank) AS rank,
       |       doc_id, score
       |FROM cut QUALIFY rank <= $k""".stripMargin
  }

  /** BM25 corpus-stats + fixed-point posting weights over `documents` —
    * mirrors [[graft.operators.Bm25]] expression-for-expression (same
    * association, same fixed-point 1e9 rounding), so scores are
    * order-independent and bit-exact.
    */
  val bm25Ctes: String =
    """toks AS (
      |  SELECT doc_id, t AS term FROM (
      |    SELECT doc_id,
      |           unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |                              x -> x <> '')) AS t
      |    FROM documents)),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      |dls AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
      |tdf AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |g AS (SELECT COUNT(*) AS n, SUM(dl) AS sumdl FROM dls),
      |post AS (
      |  SELECT tf.doc_id, tf.term,
      |         CAST(ROUND((ln(1.0 + (g.n - tdf.df + 0.5) / (tdf.df + 0.5))
      |                     * (tf.tf * 2.5)
      |                     / (tf.tf + 1.5 * (1.0 - 0.75 + 0.75 * (dls.dl / (CAST(g.sumdl AS DOUBLE) / g.n)))))
      |                    * 1000000000.0) AS BIGINT) AS ws
      |  FROM tf JOIN dls USING (doc_id) JOIN tdf USING (term) CROSS JOIN g)""".stripMargin

  private def tokenizeQuery(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).distinct.toSeq

  private def queryTermValues(queries: Seq[(Long, String)]): String =
    queries.flatMap { case (qid, t) => tokenizeQuery(t).map(term => s"($qid, '$term')") }
      .mkString(", ")

  /** Sparse BM25 top-k (A2/H1/H2). */
  def bm25TopK(queries: Seq[(Long, String)], k: Int): String =
    s"""WITH $bm25Ctes,
       |qt(qid, term) AS (SELECT CAST(c0 AS BIGINT), c1 FROM (VALUES ${queryTermValues(queries)}) v(c0, c1)),
       |sp AS (
       |  SELECT qt.qid, post.doc_id, CAST(SUM(ws) AS DOUBLE) / 1000000000.0 AS score
       |  FROM post JOIN qt USING (term) GROUP BY 1, 2)
       |SELECT qid, rank, doc_id, score FROM (
       |  SELECT qid, doc_id, score,
       |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
       |  FROM sp)
       |WHERE rank <= $k""".stripMargin

  /** Hybrid dense+sparse RRF (H3–H5): dense leg = quantized-embedding cosine
    * top-`legK`; sparse leg = BM25 top-`legK`; RRF k=60; threshold on dense
    * score only; truncate to `k`.
    */
  def hybridRrf(nq: Int, queries: Seq[(Long, String)], k: Int, threshold: Double): String = {
    val legK = math.min(k, 50)
    s"""WITH ${docScores(nq)},
       |dense AS (
       |  SELECT qid, doc_id, $cosineExpr AS dense_score,
       |         row_number() OVER (PARTITION BY qid ORDER BY $cosineExpr DESC, doc_id) AS dense_rank
       |  FROM dscores QUALIFY dense_rank <= $legK),
       |$bm25Ctes,
       |qt(qid, term) AS (SELECT CAST(c0 AS BIGINT), c1 FROM (VALUES ${queryTermValues(queries)}) v(c0, c1)),
       |sp AS (
       |  SELECT qt.qid, post.doc_id, CAST(SUM(ws) AS DOUBLE) / 1000000000.0 AS sparse_score
       |  FROM post JOIN qt USING (term) GROUP BY 1, 2),
       |sparse AS (
       |  SELECT qid, doc_id, sparse_score,
       |         row_number() OVER (PARTITION BY qid ORDER BY sparse_score DESC, doc_id) AS sparse_rank
       |  FROM sp QUALIFY sparse_rank <= $legK),
       |fused AS (
       |  SELECT COALESCE(d.qid, s.qid) AS qid, COALESCE(d.doc_id, s.doc_id) AS doc_id,
       |         COALESCE(1.0 / (60.0 + d.dense_rank), 0.0)
       |           + COALESCE(1.0 / (60.0 + s.sparse_rank), 0.0) AS rrf_score,
       |         d.dense_score, s.sparse_score
       |  FROM dense d FULL OUTER JOIN sparse s ON d.qid = s.qid AND d.doc_id = s.doc_id),
       |thresholded AS (
       |  SELECT * FROM fused WHERE dense_score IS NULL OR dense_score >= $threshold)
       |SELECT qid, row_number() OVER (PARTITION BY qid ORDER BY rrf_score DESC, doc_id) AS rank,
       |       doc_id, rrf_score, dense_score, sparse_score
       |FROM thresholded QUALIFY rank <= $k""".stripMargin
  }

  /** TPC-H Q1-style pricing summary with decimal-exact sums. */
  val q1Agg: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(COUNT(*) AS BIGINT) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Join+agg (TPC-H Q5-flavored): revenue by nation via customer⋈orders⋈lineitem. */
  val joinAgg: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  /** Window: top-3 orders per customer by totalprice (decimal compare). */
  val windowTop3: String =
    """SELECT o_custkey, rank, o_orderkey, CAST(price AS DOUBLE) AS price FROM (
      |  SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey) AS rank
      |  FROM orders)
      |WHERE rank <= 3""".stripMargin
}
