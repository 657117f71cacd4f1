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

  /** IVF probe with the deterministic seeded codebook (mirror of
    * [[graft.operators.Ivf.seededCentroids]]: center_j = synthVec(j*7919+13)).
    * Three stages, each tie-broken exactly like the Spark side:
    *  1. assignment — every doc to its best-cosine centroid (ties → lowest id);
    *  2. routing    — each query's top-`nprobe` centroids (ties → lowest id);
    *  3. scan       — exact cosine top-k over ONLY docs in routed cells.
    */
  def ivfKnn(nq: Int, nlist: Int, nprobe: Int, k: Int): String = {
    val cj = s"c.j*7919 + 13" // centroid key expression
    s"""WITH acs AS (
       |  SELECT d.o_orderkey AS doc_id, c.j AS centroid_id,
       |         CAST(SUM((${dvc("d.o_orderkey")}) * (${dvc(cj)})) AS DOUBLE) AS dot,
       |         CAST(SUM((${dvc("d.o_orderkey")}) * (${dvc("d.o_orderkey")})) AS DOUBLE) AS nd2,
       |         CAST(SUM((${dvc(cj)}) * (${dvc(cj)})) AS DOUBLE) AS nc2
       |  FROM orders d, (SELECT CAST(range AS BIGINT) AS j FROM range($nlist)) c, $ix
       |  GROUP BY 1, 2),
       |assigned AS (
       |  SELECT doc_id, centroid_id FROM (
       |    SELECT doc_id, centroid_id,
       |           row_number() OVER (PARTITION BY doc_id
       |             ORDER BY dot/(sqrt(nd2)*sqrt(nc2)) DESC, centroid_id) AS r
       |    FROM acs) WHERE r = 1),
       |rcs AS (
       |  SELECT q.qid, c.j AS centroid_id,
       |         CAST(SUM((${qvc("q.qid")}) * (${dvc(cj)})) AS DOUBLE) AS dot,
       |         CAST(SUM((${qvc("q.qid")}) * (${qvc("q.qid")})) AS DOUBLE) AS nq2,
       |         CAST(SUM((${dvc(cj)}) * (${dvc(cj)})) AS DOUBLE) AS nc2
       |  FROM (SELECT CAST(range AS BIGINT) AS qid FROM range($nq)) q,
       |       (SELECT CAST(range AS BIGINT) AS j FROM range($nlist)) c, $ix
       |  GROUP BY 1, 2),
       |routed AS (
       |  SELECT qid, centroid_id FROM (
       |    SELECT qid, centroid_id,
       |           row_number() OVER (PARTITION BY qid
       |             ORDER BY dot/(sqrt(nq2)*sqrt(nc2)) DESC, centroid_id) AS r
       |    FROM rcs) WHERE r <= $nprobe),
       |${ordersScores(nq)},
       |sel AS (
       |  SELECT s.qid, s.doc_id, $cosineExpr AS score
       |  FROM scores s
       |  JOIN assigned a ON s.doc_id = a.doc_id
       |  JOIN routed r ON r.qid = s.qid AND r.centroid_id = a.centroid_id)
       |SELECT qid, rank, doc_id, score FROM (
       |  SELECT qid, doc_id, score,
       |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
       |  FROM sel)
       |WHERE rank <= $k""".stripMargin
  }

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

  /** P8 round_decimal on top of threshold+offset: identical pipeline to
    * [[knnThreshold]] with the reported score rounded to `dec` places.
    */
  def knnRound(nq: Int, k: Int, offset: Int, t: Double, dec: Int): String =
    s"""WITH ${ordersScores(nq)},
       |ann AS (
       |  SELECT qid, doc_id, $cosineExpr AS score,
       |         row_number() OVER (PARTITION BY qid ORDER BY $cosineExpr DESC, doc_id) AS ann_rank
       |  FROM scores),
       |cut AS (
       |  SELECT * FROM ann WHERE ann_rank <= ${offset + k} AND ann_rank > $offset AND score >= $t)
       |SELECT qid, row_number() OVER (PARTITION BY qid ORDER BY ann_rank) AS rank,
       |       doc_id, round(score, $dec) AS score
       |FROM cut QUALIFY rank <= $k""".stripMargin

  /** Dynamic-field (extra map) filter: ANN cut then CI substring match on the
    * priority class digit (split of o_orderpriority), re-rank, truncate —
    * mirror of the q_extra_filter corpus construction.
    */
  def extraFilter(nq: Int, k: Int, contains: String): String =
    s"""WITH ${ordersScores(nq)},
       |corpus AS (
       |  SELECT o_orderkey AS doc_id, split_part(o_orderpriority, '-', 1) AS prio
       |  FROM orders),
       |ann AS (
       |  SELECT s.qid, s.doc_id, $cosineExpr AS score, c.prio,
       |         row_number() OVER (PARTITION BY s.qid ORDER BY $cosineExpr DESC, s.doc_id) AS ann_rank
       |  FROM scores s JOIN corpus c ON s.doc_id = c.doc_id),
       |cut AS (
       |  SELECT * FROM ann WHERE ann_rank <= $k
       |    AND prio IS NOT NULL AND contains(lower(prio), '${contains.toLowerCase}'))
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

  // ---------- dedup + text-analysis oracles ----------

  /** Tokens with 1-based positions over `documents` — mirror of
    * [[graft.operators.Dedup.tokenTable]].
    */
  val toksp: String =
    """toksp AS (
      |  SELECT doc_id, t AS term, CAST(pos AS BIGINT) AS pos FROM (
      |    SELECT doc_id, unnest(l) AS t, generate_subscripts(l, 1) AS pos
      |    FROM (SELECT doc_id,
      |                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS l
      |          FROM documents)))""".stripMargin

  private val tc  = Text.tokenCodeSql("term")
  private val P   = graft.operators.Dedup.P

  val dedupExact: String =
    s"""WITH $toksp,
       |fp AS (
       |  SELECT doc_id, CAST(SUM(pos * $tc) + COUNT(*) AS BIGINT) AS text_fp
       |  FROM toksp GROUP BY doc_id)
       |SELECT CAST(MIN(f.text_fp) AS BIGINT) AS text_fp, MIN(d.doc_id) AS keep_id,
       |       CAST(COUNT(*) AS BIGINT) AS n_rows
       |FROM documents d JOIN fp f USING (doc_id)
       |GROUP BY d.text""".stripMargin

  /** 3-token shingle ids CTE (requires toksp). Fully parenthesized to match
    * the Scala expression tree exactly.
    */
  val shinglesCte: String = {
    val tcA = Text.tokenCodeSql("a.term")
    val tcB = Text.tokenCodeSql("b.term")
    val tcC = Text.tokenCodeSql("c.term")
    s"""sh AS (
       |  SELECT a.doc_id,
       |         (((($tcA % $P) * 131 + ($tcB % $P)) % $P) * 131 + ($tcC % $P)) % $P AS shingle
       |  FROM toksp a
       |  JOIN toksp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       |  JOIN toksp c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2)""".stripMargin
  }

  private def minhashCols: Seq[String] = (0 until graft.operators.Dedup.NumHashes).map { j =>
    val a = 104729L * (j + 1) % P
    val b = 7919L * (j + 1) % P
    s"CAST(MIN((shingle * $a + $b) % $P) AS BIGINT) AS h$j"
  }

  val sigCte: String =
    s"""sig AS (
       |  SELECT doc_id, ${minhashCols.mkString(", ")}
       |  FROM sh GROUP BY doc_id)""".stripMargin

  val dedupMinhash: String =
    s"""WITH $toksp, $shinglesCte, $sigCte
       |SELECT doc_id, h0, h1, h2, h3, h4, h5, h6, h7 FROM sig""".stripMargin

  val dedupLshPairs: String = {
    val bandRows = (0 until 4)
      .map(bd => s"SELECT doc_id, $bd AS band, h${2 * bd} * $P + h${2 * bd + 1} AS bucket FROM sig")
      .mkString(" UNION ALL ")
    val m = (0 until 8)
      .map(j => s"(CASE WHEN a.h$j = b.h$j THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH $toksp, $shinglesCte, $sigCte,
       |bands AS ($bandRows),
       |pairs AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM bands l JOIN bands r
       |    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id)
       |SELECT doc_a, doc_b, CAST(($m) AS DOUBLE) / 8 AS est_sim
       |FROM pairs JOIN sig a ON doc_a = a.doc_id JOIN sig b ON doc_b = b.doc_id""".stripMargin
  }

  /** Incremental dedup ([[graft.sources.DedupIndex.queryBatch]]): LSH
    * candidates of the increment (doc_id % 5 = 0) against the stored
    * corpus (% 5 <> 0), query-first orientation, est_sim = signature
    * match fraction. The engine side answers from a persisted index built
    * in two upsert waves; the oracle recomputes from scratch — equality
    * proves the incremental build composes to the batch semantics.
    */
  val dedupIncr: String = {
    val bandRows = (0 until 4)
      .map(bd => s"SELECT doc_id, $bd AS band, h${2 * bd} * $P + h${2 * bd + 1} AS bucket FROM sig")
      .mkString(" UNION ALL ")
    val m = (0 until 8)
      .map(j => s"(CASE WHEN a.h$j = b.h$j THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH $toksp, $shinglesCte, $sigCte,
       |bands AS ($bandRows),
       |cands AS (
       |  SELECT DISTINCT q.doc_id AS query_id, s.doc_id AS match_id
       |  FROM bands q JOIN bands s ON q.band = s.band AND q.bucket = s.bucket
       |  WHERE q.doc_id % 5 = 0 AND s.doc_id % 5 <> 0)
       |SELECT query_id, match_id, CAST(($m) AS DOUBLE) / 8 AS est_sim
       |FROM cands JOIN sig a ON query_id = a.doc_id JOIN sig b ON match_id = b.doc_id""".stripMargin
  }

  /** Online dedup gate ([[graft.sources.DedupIndex.ingestDeduped]]): the
    * increment docs that survive — no stored-corpus match with est_sim ≥
    * the threshold.
    */
  def dedupGate(threshold: Double): String = {
    val bandRows = (0 until 4)
      .map(bd => s"SELECT doc_id, $bd AS band, h${2 * bd} * $P + h${2 * bd + 1} AS bucket FROM sig")
      .mkString(" UNION ALL ")
    val m = (0 until 8)
      .map(j => s"(CASE WHEN a.h$j = b.h$j THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH $toksp, $shinglesCte, $sigCte,
       |bands AS ($bandRows),
       |cands AS (
       |  SELECT DISTINCT q.doc_id AS query_id, s.doc_id AS match_id
       |  FROM bands q JOIN bands s ON q.band = s.band AND q.bucket = s.bucket
       |  WHERE q.doc_id % 5 = 0 AND s.doc_id % 5 <> 0),
       |dups AS (
       |  SELECT DISTINCT query_id FROM cands
       |  JOIN sig a ON query_id = a.doc_id JOIN sig b ON match_id = b.doc_id
       |  WHERE CAST(($m) AS DOUBLE) / 8 >= $threshold)
       |SELECT doc_id FROM documents
       |WHERE doc_id % 5 = 0 AND doc_id NOT IN (SELECT query_id FROM dups)""".stripMargin
  }

  /** CTE chain ending in `vp` = the LSH-verified near-dup pairs
    * (doc_a, doc_b, jaccard) — shared by the pair, component, and keep-set
    * oracles so all three verify the SAME pair derivation.
    */
  private def verifiedPairsCtes(threshold: Double): String = {
    val bandRows = (0 until 4)
      .map(bd => s"SELECT doc_id, $bd AS band, h${2 * bd} * $P + h${2 * bd + 1} AS bucket FROM sig")
      .mkString(" UNION ALL ")
    s"""$toksp, $shinglesCte, $sigCte,
       |bands AS ($bandRows),
       |cands AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM bands l JOIN bands r
       |    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
       |shd AS (SELECT DISTINCT doc_id, shingle FROM sh),
       |sz AS (SELECT doc_id, COUNT(*) AS sz FROM shd GROUP BY 1),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS i
       |  FROM cands c
       |  JOIN shd x ON c.doc_a = x.doc_id
       |  JOIN shd y ON c.doc_b = y.doc_id AND x.shingle = y.shingle
       |  GROUP BY 1, 2),
       |vp AS (
       |  SELECT doc_a, doc_b, jaccard FROM (
       |    SELECT doc_a, doc_b, CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) AS jaccard
       |    FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id)
       |  WHERE jaccard >= $threshold)""".stripMargin
  }

  def dedupMinhashVerified(threshold: Double): String =
    s"""WITH ${verifiedPairsCtes(threshold)}
       |SELECT doc_a, doc_b, jaccard FROM vp""".stripMargin

  /** Connected components over the verified-pairs graph: min reachable
    * doc_id per node via a recursive transitive closure (the pair graph is
    * tiny — closure is safe here; the Spark side uses label propagation).
    */
  private def componentsCtes(threshold: Double): String =
    s"""${verifiedPairsCtes(threshold)},
       |cedges AS (SELECT doc_a AS src, doc_b AS dst FROM vp
       |           UNION SELECT doc_b, doc_a FROM vp),
       |reach(node, r) AS (
       |  SELECT src, src FROM cedges
       |  UNION
       |  SELECT e.src, r.r FROM cedges e JOIN reach r ON e.dst = r.node),
       |comp AS (SELECT node AS doc_id, MIN(r) AS root FROM reach GROUP BY node)""".stripMargin

  def dedupComponents(threshold: Double): String =
    s"""WITH RECURSIVE ${componentsCtes(threshold)}
       |SELECT doc_id, root FROM comp""".stripMargin

  /** The kept corpus after near-dup removal: every doc except
    * non-representative component members.
    */
  def dedupKeep(threshold: Double): String =
    s"""WITH RECURSIVE ${componentsCtes(threshold)}
       |SELECT d.doc_id, d.lang, d.n_chars FROM documents d
       |WHERE d.doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> root)""".stripMargin

  /** Top-5 terms per language by corpus frequency (vocabulary stats). */
  val topTerms: String =
    s"""WITH $toksp
       |SELECT lang, rank, term, cnt FROM (
       |  SELECT d.lang, t.term, CAST(COUNT(*) AS BIGINT) AS cnt,
       |         row_number() OVER (PARTITION BY d.lang ORDER BY COUNT(*) DESC, t.term) AS rank
       |  FROM toksp t JOIN documents d USING (doc_id)
       |  GROUP BY d.lang, t.term)
       |WHERE rank <= 5""".stripMargin

  /** Contamination of the test split by the train split (3-token shingles),
    * with the split derived by the same multiplicative hash as [[split]].
    */
  def contamination(trainFrac: Double, validFrac: Double): String = {
    val trainCut = (trainFrac * 4294967296.0).toLong
    val validCut = ((trainFrac + validFrac) * 4294967296.0).toLong
    s"""WITH $toksp, $shinglesCte,
       |sp AS (
       |  SELECT doc_id,
       |         CASE WHEN (doc_id * 2654435761) % 4294967296 < $trainCut THEN 'train'
       |              WHEN (doc_id * 2654435761) % 4294967296 < $validCut THEN 'valid'
       |              ELSE 'test' END AS split
       |  FROM documents),
       |shd AS (SELECT DISTINCT s.doc_id, s.shingle, sp.split
       |        FROM sh s JOIN sp ON s.doc_id = sp.doc_id),
       |tr AS (SELECT DISTINCT shingle FROM shd WHERE split = 'train')
       |SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
       |       CAST(SUM(CASE WHEN tr.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_seen,
       |       CAST(SUM(CASE WHEN tr.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS contamination
       |FROM shd t LEFT JOIN tr ON t.shingle = tr.shingle
       |WHERE t.split = 'test'
       |GROUP BY t.doc_id""".stripMargin
  }

  val dedupSimhash: String = {
    val h = Text.tokenHash32Sql(tc)
    s"""WITH $toksp,
       |tfh AS (
       |  SELECT doc_id, term, COUNT(*) AS tf, $h AS h
       |  FROM toksp GROUP BY doc_id, term),
       |bits AS (SELECT CAST(range AS BIGINT) AS b, CAST(pow(2.0, range) AS BIGINT) AS bw FROM range(32)),
       |bs AS (
       |  SELECT doc_id, bw,
       |         SUM(tf * (CASE WHEN (h % (bw * 2)) >= bw THEN 1 ELSE -1 END)) AS s
       |  FROM tfh, bits GROUP BY doc_id, bw)
       |SELECT doc_id, CAST(SUM(CASE WHEN s > 0 THEN bw ELSE 0 END) AS BIGINT) AS simhash
       |FROM bs GROUP BY doc_id""".stripMargin
  }

  def dedupJaccard(threshold: Double): String =
    s"""WITH sets AS (
       |  SELECT DISTINCT doc_id, lang,
       |         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term
       |  FROM documents),
       |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sets GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
       |  FROM sets a JOIN sets b
       |    ON a.lang = b.lang AND a.term = b.term AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, jaccard FROM (
       |  SELECT doc_a, doc_b,
       |         CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) AS jaccard
       |  FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id)
       |WHERE jaccard >= $threshold""".stripMargin

  def dedupEmbed(threshold: Double): String =
    s"""WITH qe AS (
       |  SELECT vec_id, label, i, round(CAST(e AS DOUBLE) * 1000) AS x
       |  FROM (SELECT vec_id, label, unnest(embedding) AS e,
       |               generate_subscripts(embedding, 1) AS i
       |        FROM embeddings)),
       |p AS (
       |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
       |         CAST(SUM(a.x * b.x) AS DOUBLE) AS dot,
       |         CAST(SUM(a.x * a.x) AS DOUBLE) AS na,
       |         CAST(SUM(b.x * b.x) AS DOUBLE) AS nb
       |  FROM qe a JOIN qe b ON a.i = b.i AND a.label = b.label AND a.vec_id < b.vec_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, cos_sim FROM (
       |  SELECT doc_a, doc_b, dot / (sqrt(na) * sqrt(nb)) AS cos_sim FROM p)
       |WHERE cos_sim >= $threshold""".stripMargin

  /** SemDeDup kept set (mirror of [[graft.operators.Dedup.semanticDedup]]):
    * seeded-medoid assignment (centroids = quantized embeddings of vec_id
    * < k, argmax cosine, ties → lowest centroid id), then within each
    * cluster drop docs ≥ threshold cosine-similar to a lower id.
    */
  def semanticDedup(k: Int, threshold: Double): String =
    s"""WITH qe AS (
       |  SELECT vec_id, i, round(CAST(e AS DOUBLE) * 1000) AS x
       |  FROM (SELECT vec_id, unnest(embedding) AS e,
       |               generate_subscripts(embedding, 1) AS i
       |        FROM embeddings)),
       |cents AS (SELECT vec_id AS cid, i, x FROM qe WHERE vec_id < $k),
       |sims AS (
       |  SELECT q.vec_id AS doc_id, c.cid,
       |         CAST(SUM(q.x * c.x) AS DOUBLE) AS dot,
       |         CAST(SUM(q.x * q.x) AS DOUBLE) AS nd,
       |         CAST(SUM(c.x * c.x) AS DOUBLE) AS nc
       |  FROM qe q JOIN cents c ON q.i = c.i
       |  GROUP BY 1, 2),
       |assigned AS (
       |  SELECT doc_id, cluster FROM (
       |    SELECT doc_id, cid AS cluster,
       |           row_number() OVER (PARTITION BY doc_id
       |             ORDER BY dot / (sqrt(nd) * sqrt(nc)) DESC, cid) AS r
       |    FROM sims) WHERE r = 1),
       |dups AS (
       |  SELECT DISTINCT doc_id FROM (
       |    SELECT b.doc_id AS doc_id
       |    FROM assigned a JOIN assigned b
       |      ON a.cluster = b.cluster AND a.doc_id < b.doc_id
       |    JOIN qe qa ON qa.vec_id = a.doc_id
       |    JOIN qe qb ON qb.vec_id = b.doc_id AND qb.i = qa.i
       |    GROUP BY a.doc_id, b.doc_id
       |    HAVING CAST(SUM(qa.x * qb.x) AS DOUBLE) /
       |           (sqrt(CAST(SUM(qa.x * qa.x) AS DOUBLE)) *
       |            sqrt(CAST(SUM(qb.x * qb.x) AS DOUBLE))) >= $threshold))
       |SELECT a.doc_id, a.cluster FROM assigned a
       |WHERE a.doc_id NOT IN (SELECT doc_id FROM dups)""".stripMargin

  /** Per-source cap (mirror of [[graft.operators.TextAnalysis.sourceCap]]). */
  def sourceCap(cap: Int): String =
    s"""SELECT doc_id, source, n_chars, rk FROM (
       |  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
       |         CAST(row_number() OVER (PARTITION BY source
       |           ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rk
       |  FROM documents)
       |WHERE rk <= $cap""".stripMargin

  /** Deterministic shuffle shards (mirror of
    * [[graft.operators.TextAnalysis.shuffleShards]]): Knuth multiplicative
    * hash order, shard = h mod n, 1-based position within shard.
    */
  def shuffleShards(n: Int): String =
    s"""SELECT doc_id,
       |       CAST(h % $n AS BIGINT) AS shard,
       |       CAST(row_number() OVER (PARTITION BY h % $n
       |         ORDER BY h, doc_id) AS BIGINT) AS pos
       |FROM (SELECT doc_id, (doc_id * 2654435761) % 4294967296 AS h
       |      FROM documents)""".stripMargin

  val langId: String = {
    val scores = graft.operators.TextAnalysis.LangMarkers.map { case (l, ms) =>
      val set = ms.map(m => s"'$m'").mkString(", ")
      s"CAST(COALESCE(SUM(CASE WHEN term IN ($set) THEN 1 ELSE 0 END), 0) AS BIGINT) AS s_$l"
    }.mkString(",\n         ")
    val langs = graft.operators.TextAnalysis.LangMarkers.map(_._1)
    val cases = langs.dropRight(1).map { l =>
      val conds = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString("\n            ")
    val scoreCols = langs.map(l => s"s_$l").mkString(", ")
    s"""WITH $toksp,
       |scored AS (
       |  SELECT d.doc_id,
       |         $scores
       |  FROM documents d LEFT JOIN toksp t USING (doc_id)
       |  GROUP BY d.doc_id)
       |SELECT doc_id, $scoreCols,
       |       CASE $cases
       |            ELSE '${langs.last}' END AS pred_lang
       |FROM scored""".stripMargin
  }

  val quality: String = {
    val stopSet = Text.Stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH $toksp,
       |q AS (
       |  SELECT doc_id, COUNT(*) AS n_tokens,
       |         SUM(CASE WHEN term IN ($stopSet) THEN 1 ELSE 0 END) AS stop_cnt,
       |         SUM(length(term)) AS char_sum
       |  FROM toksp GROUP BY doc_id)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |       CAST(stop_cnt AS DOUBLE) / n_tokens AS stop_ratio,
       |       0.4 * least(1.0, n_tokens / 100.0)
       |         + 0.3 * (1.0 - CAST(stop_cnt AS DOUBLE) / n_tokens)
       |         + 0.3 * least(1.0, CAST(char_sum AS DOUBLE) / n_tokens / 8.0) AS quality
       |FROM q""".stripMargin
  }

  /** Curation pipeline: quality gate + exact-dedup keep + per-source stats
    * (fixed-point mean).
    */
  def curate(minQuality: Double): String =
    s"""WITH $toksp,
       |q AS (
       |  SELECT doc_id, COUNT(*) AS n_tokens,
       |         SUM(CASE WHEN term IN (${Text.Stopwords.map(w => s"'$w'").mkString(", ")}) THEN 1 ELSE 0 END) AS stop_cnt,
       |         SUM(length(term)) AS char_sum
       |  FROM toksp GROUP BY doc_id),
       |qual AS (
       |  SELECT doc_id,
       |         0.4 * least(1.0, n_tokens / 100.0)
       |           + 0.3 * (1.0 - CAST(stop_cnt AS DOUBLE) / n_tokens)
       |           + 0.3 * least(1.0, CAST(char_sum AS DOUBLE) / n_tokens / 8.0) AS quality
       |  FROM q),
       |keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
       |kept AS (
       |  SELECT d.source, CAST(ROUND(qual.quality * 1000000000.0) AS BIGINT) AS qs
       |  FROM documents d
       |  JOIN qual ON d.doc_id = qual.doc_id
       |  JOIN keep ON d.doc_id = keep.doc_id
       |  WHERE qual.quality >= $minQuality)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(qs) AS DOUBLE) / 1000000000.0 / COUNT(*) AS mean_quality
       |FROM kept GROUP BY source""".stripMargin

  val tokenCounts: String =
    """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(SUM(ws) AS BIGINT) AS total_ws,
      |       CAST(SUM(re) AS BIGINT) AS total_re,
      |       CAST(SUM(bpe) AS BIGINT) AS total_bpe
      |FROM (
      |  SELECT lang,
      |         len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS ws,
      |         len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 ]')) AS re,
      |         CAST(ceil(n_chars / 4.0) AS BIGINT) AS bpe
      |  FROM documents)
      |GROUP BY lang""".stripMargin

  val fingerprint: String =
    s"""WITH $toksp
       |SELECT doc_id, CAST(SUM(pos * $tc) + COUNT(*) AS BIGINT) AS fp
       |FROM toksp GROUP BY doc_id""".stripMargin

  /** meta_required (P6): corpus where every 3rd doc has meta, others "{}";
    * rows with empty meta are dropped AFTER the ANN cut.
    */
  def knnMetaRequired(nq: Int, k: Int): String =
    s"""WITH ${ordersScores(nq)},
       |corpus AS (
       |  SELECT o_orderkey AS doc_id,
       |         CASE WHEN o_orderkey % 3 = 0
       |              THEN to_json(struct_pack(status := o_orderstatus, priority := o_orderpriority))
       |              ELSE '{}' END AS meta
       |  FROM orders),
       |ann AS (
       |  SELECT s.qid, s.doc_id, $cosineExpr AS score, c.meta,
       |         row_number() OVER (PARTITION BY s.qid ORDER BY $cosineExpr DESC, s.doc_id) AS ann_rank
       |  FROM scores s JOIN corpus c ON s.doc_id = c.doc_id),
       |cut AS (SELECT * FROM ann WHERE ann_rank <= $k AND meta IS NOT NULL AND meta <> '{}')
       |SELECT qid, row_number() OVER (PARTITION BY qid ORDER BY ann_rank) AS rank,
       |       doc_id, score, meta
       |FROM cut QUALIFY rank <= $k""".stripMargin

  /** Hybrid gating fallback (H4): no query text => sparse leg empty, RRF
    * degrades to dense-only 1/(60+dense_rank).
    */
  def hybridDenseOnly(nq: Int, k: Int): String = {
    val legK = math.min(k, 50)
    s"""WITH ${docScores(nq)},
       |dense AS (
       |  SELECT qid, doc_id, $cosineExpr AS dense_score,
       |         row_number() OVER (PARTITION BY qid ORDER BY $cosineExpr DESC, doc_id) AS dense_rank
       |  FROM dscores QUALIFY dense_rank <= $legK)
       |SELECT qid, row_number() OVER (PARTITION BY qid ORDER BY rrf_score DESC, doc_id) AS rank,
       |       doc_id, rrf_score, dense_score,
       |       CAST(NULL AS DOUBLE) AS sparse_score
       |FROM (SELECT qid, doc_id, dense_score,
       |             COALESCE(1.0 / (60.0 + dense_rank), 0.0) + 0.0 AS rrf_score
       |      FROM dense)
       |QUALIFY rank <= $k""".stripMargin
  }

  /** Upsert readback (S1/Q-UPSERT): MERGE-by-key (updates + inserts) then a
    * decimal-exact aggregate over the merged table.
    */
  val upsert: String =
    """WITH cur AS (
      |  SELECT o_orderkey AS key, o_orderstatus AS status,
      |         CAST(o_totalprice AS DECIMAL(18,2)) AS price
      |  FROM orders),
      |upd AS (SELECT key, status, price + 100 AS price FROM cur WHERE key % 100 = 0),
      |ins AS (SELECT -key - 1 AS key, 'N' AS status, CAST(50.00 AS DECIMAL(18,2)) AS price
      |        FROM cur WHERE key % 97 = 0),
      |batch AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
      |merged AS (
      |  SELECT c.* FROM cur c LEFT JOIN batch b ON c.key = b.key WHERE b.key IS NULL
      |  UNION ALL SELECT * FROM batch)
      |SELECT status, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       CAST(SUM(price) AS DOUBLE) AS total_price
      |FROM merged GROUP BY status""".stripMargin

  /** INT64 auto_id round-trip (Q-INT64-PK): generated ids are the
    * deterministic 1-based insert order, and q_int64_pk inserts in
    * o_orderkey order — row_number() reproduces the store's id assignment.
    */
  val int64Pk: String =
    """SELECT row_number() OVER (ORDER BY o_orderkey) AS auto_id,
      |       CAST(o_orderkey AS VARCHAR) || ' ' || o_orderstatus AS chunk,
      |       o_orderpriority AS priority
      |FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 200)""".stripMargin

  /** S1 distributed ingest (insertDf): 150 keyed docs, doc_id<10 re-keyed
    * in the same batch with a "v2 " chunk — last arrival wins, meta JSON
    * round-trips through the stored table.
    */
  val insertDfRoundtrip: String =
    """SELECT 'k' || CAST(doc_id AS VARCHAR) AS key,
      |       CASE WHEN doc_id < 10 THEN 'v2 ' || text ELSE text END AS chunk,
      |       lang
      |FROM documents WHERE doc_id < 150""".stripMargin

  /** Brute-force cosine top-k over the real embedding column (quantized) —
    * the exact-ANN baseline of the similarity-search suite.
    */
  def annEmbedExact(nq: Int, k: Int): String =
    s"""WITH ${docScores(nq)}
       |SELECT qid, rank, doc_id, score FROM (
       |  SELECT qid, doc_id, $cosineExpr AS score,
       |         row_number() OVER (PARTITION BY qid ORDER BY $cosineExpr DESC, doc_id) AS rank
       |  FROM dscores)
       |WHERE rank <= $k""".stripMargin

  /** Multi-table random-hyperplane LSH ANN over quantized embeddings —
    * mirror of [[graft.operators.AnnLsh]]: plane p = t*np+j has seed
    * p*1000+3; plane component uses the 0-based element index (qe.i is
    * 1-based => i-1); candidates = union over tables of same-bucket pairs.
    *
    * `nPlanes` is the FLOOR, exactly as in [[graft.operators.AnnLsh.search]]:
    * the effective count np = GREATEST(nPlanes, ceil(log2(count/64))) is
    * computed IN SQL from the same corpus the Spark side counts, so the
    * oracle reproduces the auto-scaled bucketing at every SF. ceil(log2(x))
    * equals Scala's bit-twiddled ceilLog2 for every x ≥ 2 (log2 of exact
    * powers of two is exact in IEEE double), and the x ≤ 1 → 0 branch is
    * spelled out.
    */
  def annLsh(nq: Int, k: Int, nTables: Int = 4, nPlanes: Int = 6): String =
    s"""WITH eff AS (
       |  SELECT GREATEST($nPlanes,
       |           CASE WHEN x <= 1 THEN 0
       |                ELSE CAST(CEIL(LOG2(CAST(x AS DOUBLE))) AS BIGINT) END) AS np
       |  FROM (SELECT GREATEST(1, (SELECT COUNT(*) FROM embeddings) // 64) AS x)),
       |qe AS (
       |  SELECT vec_id, i, round(CAST(e AS DOUBLE) * 1000) AS x
       |  FROM (SELECT vec_id, unnest(embedding) AS e,
       |               generate_subscripts(embedding, 1) AS i
       |        FROM embeddings)),
       |pl AS (
       |  SELECT t, j, t * (SELECT np FROM eff) + j AS p
       |  FROM (SELECT CAST(range AS BIGINT) AS t FROM range($nTables))
       |  CROSS JOIN (SELECT CAST(range AS BIGINT) AS j FROM range(24))
       |  WHERE j < (SELECT np FROM eff)),
       |pd AS (
       |  SELECT vec_id, t, j,
       |         SUM(x * (((p*1000 + 3)*131 + (i - 1)*313 + 7) % 97 - 48)) AS pdot
       |  FROM qe CROSS JOIN pl
       |  GROUP BY vec_id, t, j),
       |bk AS (
       |  SELECT vec_id, t AS tbl,
       |         CAST(SUM(CASE WHEN pdot > 0 THEN CAST(pow(2.0, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM pd GROUP BY vec_id, t),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS qid, d.vec_id AS doc_id
       |  FROM bk q JOIN bk d ON q.tbl = d.tbl AND q.bucket = d.bucket
       |  WHERE q.vec_id < $nq),
       |sc AS (
       |  SELECT c.qid, c.doc_id,
       |         CAST(SUM(a.x * b.x) AS DOUBLE) AS dot,
       |         CAST(SUM(a.x * a.x) AS DOUBLE) AS nq2,
       |         CAST(SUM(b.x * b.x) AS DOUBLE) AS nd2
       |  FROM cand c
       |  JOIN qe a ON a.vec_id = c.qid
       |  JOIN qe b ON b.vec_id = c.doc_id AND a.i = b.i
       |  GROUP BY 1, 2)
       |SELECT qid, rank, doc_id, score FROM (
       |  SELECT qid, doc_id, $cosineExpr AS score,
       |         row_number() OVER (PARTITION BY qid ORDER BY $cosineExpr DESC, doc_id) AS rank
       |  FROM sc)
       |WHERE rank <= $k""".stripMargin

  /** Hourly tumbling-window aggregation over the events table. */
  val eventsHourly: String =
    """SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
      |       CAST(COUNT(*) AS BIGINT) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  /** Gap-based sessionization (30-min gap, ns-integer arithmetic). */
  def sessionize(gapNs: Long): String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS ts,
       |         CAST(value AS DECIMAL(18,2)) AS value
       |  FROM events),
       |flagged AS (
       |  SELECT *, CASE WHEN prev_ts IS NULL OR ts - prev_ts > $gapNs THEN 1 ELSE 0 END AS new_s
       |  FROM (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM e)),
       |assigned AS (
       |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                             ROWS UNBOUNDED PRECEDING) AS session_idx
       |  FROM flagged)
       |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       |       CAST(MIN(ts) AS BIGINT) AS session_start,
       |       CAST(COUNT(*) AS BIGINT) AS n_events,
       |       CAST(SUM(value) AS DOUBLE) AS total_value
       |FROM assigned GROUP BY user_id, session_idx""".stripMargin

  /** JSON property extraction + aggregation over events.props. */
  val eventsJson: String =
    """SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
      |       CAST(COUNT(*) AS BIGINT) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  /** Multimodal decode-stub features: byte stats of the utf-8 payload
    * (ascii text => bytes == codepoints), rolling checksum via list_reduce
    * with a prepended 0 seed matching the Scala fold.
    */
  val multimodal: String =
    """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
      |       CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte,
      |       CAST(list_reduce(
      |              list_prepend(0, list_transform(range(1, length(text) + 1),
      |                                             i -> ascii(substr(text, i, 1)))),
      |              (acc, x) -> (acc * 31 + x) % 997) AS BIGINT) AS checksum
      |FROM documents""".stripMargin

  /** Predicted decode of the synthesized PNG/BMP/WAV containers (mirror of
    * [[graft.operators.Multimodal.synthPng]]/`synthBmp`/`synthWav` size and
    * header formulas — PNG total = 68 fixed container bytes + the stored-
    * deflate scanline payload h*(1+3w)). The Spark side PARSES real bytes;
    * agreement here proves the parsers round-trip the containers correctly.
    */
  val mediaDecode: String =
    """SELECT doc_id,
      |       CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/bmp'
      |            ELSE 'audio/wav' END AS media_type,
      |       CAST(CASE doc_id % 3
      |         WHEN 0 THEN 68 + (2 + doc_id % 5) * (1 + 3 * (2 + doc_id % 11))
      |         WHEN 1 THEN 54 + (((4 + doc_id % 13) * 3 + 3) // 4) * 4 * (3 + doc_id % 7)
      |         ELSE 44 + (16 + doc_id % 32) * (1 + (doc_id // 2) % 2) * 2
      |       END AS BIGINT) AS n_bytes,
      |       CAST(CASE doc_id % 3 WHEN 0 THEN 2 + doc_id % 11
      |            WHEN 1 THEN 4 + doc_id % 13 END AS BIGINT) AS width,
      |       CAST(CASE doc_id % 3 WHEN 0 THEN 2 + doc_id % 5
      |            WHEN 1 THEN 3 + doc_id % 7 END AS BIGINT) AS height,
      |       CAST(CASE WHEN doc_id % 3 = 2 THEN 8000 + (doc_id % 5) * 4000 END AS BIGINT) AS sample_rate,
      |       CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + (doc_id // 2) % 2 END AS BIGINT) AS channels,
      |       CAST(CASE doc_id % 3 WHEN 0 THEN 8 WHEN 1 THEN 24 ELSE 16 END AS BIGINT) AS bit_depth
      |FROM documents""".stripMargin

  /** Predicted nearest-neighbor BMP downscale (mirror of
    * [[graft.operators.Multimodal.resizeBmp]] over `synthBmp` inputs):
    * source pixel byte (px,c,y) = (id + px·3 + c + y) mod 256; the resized
    * byte samples sx = px'·w/w2, sy = y'·h/h2. The Spark side re-parses its
    * own re-encoded output, so a wrong resizer OR encoder mismatches.
    */
  val mediaResize: String =
    """WITH dims AS (
      |  SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h,
      |         greatest(1, (4 + doc_id % 13) // 2) AS w2,
      |         greatest(1, (3 + doc_id % 7) // 2) AS h2
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, w, h, w2, h2, x.range AS px, y.range AS py, c.range AS c
      |  FROM dims, range(0, 8) x, range(0, 4) y, range(0, 3) c
      |  WHERE x.range < w2 AND y.range < h2)
      |SELECT doc_id, CAST(w2 AS BIGINT) AS width, CAST(h2 AS BIGINT) AS height,
      |       CAST(54 + ((w2*3+3)//4)*4*h2 AS BIGINT) AS n_bytes,
      |       CAST(SUM((doc_id + ((px*w)//w2)*3 + c + ((py*h)//h2)) % 256) AS BIGINT) AS pix_checksum
      |FROM px GROUP BY doc_id, w2, h2""".stripMargin

  /** Predicted every-4th-frame WAV sampling (mirror of
    * [[graft.operators.Multimodal.sampleWavFrames]] over `synthWav`):
    * sample i carries amplitude ((id + i) mod 64)·512, frame f spans
    * samples [f·ch, (f+1)·ch).
    */
  val mediaFrames: String =
    """WITH d AS (
      |  SELECT doc_id, 16 + doc_id % 32 AS n, 1 + (doc_id // 2) % 2 AS ch
      |  FROM documents),
      |fr AS (SELECT doc_id, n, ch, f.range AS f
      |       FROM d, range(0, 48) f WHERE f.range < n AND f.range % 4 = 0),
      |sm AS (SELECT doc_id, n, ch, f, j.range AS j
      |       FROM fr, range(0, 2) j WHERE j.range < ch)
      |SELECT doc_id, CAST(MIN(n) AS BIGINT) AS n_frames,
      |       CAST(COUNT(DISTINCT f) AS BIGINT) AS n_sampled,
      |       CAST(SUM(((doc_id + f*ch + j) % 64) * 512) AS BIGINT) AS amp_checksum
      |FROM sm GROUP BY doc_id""".stripMargin

  /** n-token shingle CTE via lead() windows (requires toksp) — the oracle
    * side of [[graft.operators.Dedup.shinglesN]]: same polynomial fold with
    * mod-P after every multiply-add past the first.
    */
  def shinglesNCte(n: Int): String = {
    val P = graft.operators.Dedup.P
    val leads = (1 until n).map(k => s"lead(term, $k) OVER w AS t$k")
      .mkString(",\n           ")
    def c(k: Int) = s"(${Text.tokenCodeSql(s"t$k")} % $P)"
    var acc = s"(${c(0)} * 131 + ${c(1)})"
    for (k <- 2 until n) acc = s"(($acc % $P) * 131 + ${c(k)})"
    s"""shn AS (
       |  SELECT doc_id, (($acc) % $P) AS shingle FROM (
       |    SELECT doc_id, term AS t0,
       |           $leads
       |    FROM toksp WINDOW w AS (PARTITION BY doc_id ORDER BY pos))
       |  WHERE t${n - 1} IS NOT NULL)""".stripMargin
  }

  /** Cross-doc 8-gram duplication per doc (mirror of Dedup.ngramOverlap). */
  def ngramOverlap(n: Int): String =
    s"""WITH $toksp, ${shinglesNCte(n)},
       |shd AS (SELECT DISTINCT doc_id, shingle FROM shn),
       |xdoc AS (SELECT shingle FROM shd GROUP BY shingle HAVING COUNT(*) > 1),
       |per AS (SELECT doc_id, COUNT(*) AS n_grams FROM shn GROUP BY doc_id),
       |dup AS (SELECT s.doc_id, COUNT(*) AS n_dup
       |        FROM shn s JOIN xdoc USING (shingle) GROUP BY s.doc_id)
       |SELECT p.doc_id, CAST(p.n_grams AS BIGINT) AS n_grams,
       |       CAST(COALESCE(d.n_dup, 0) AS BIGINT) AS n_dup,
       |       CAST(COALESCE(d.n_dup, 0) AS DOUBLE) / p.n_grams AS dup_frac
       |FROM per p LEFT JOIN dup d USING (doc_id)""".stripMargin

  /** n-token shingles WITH their 1-based start position (mirror of
    * Dedup.positionedShingles) — shinglesNCte keeping `pos`.
    */
  def positionedShinglesNCte(n: Int): String = {
    val P = graft.operators.Dedup.P
    val leads = (1 until n).map(k => s"lead(term, $k) OVER w AS t$k")
      .mkString(",\n           ")
    def c(k: Int) = s"(${Text.tokenCodeSql(s"t$k")} % $P)"
    var acc = s"(${c(0)} * 131 + ${c(1)})"
    for (k <- 2 until n) acc = s"(($acc % $P) * 131 + ${c(k)})"
    s"""shnp AS (
       |  SELECT doc_id, pos, (($acc) % $P) AS shingle FROM (
       |    SELECT doc_id, pos, term AS t0,
       |           $leads
       |    FROM toksp WINDOW w AS (PARTITION BY doc_id ORDER BY pos))
       |  WHERE t${n - 1} IS NOT NULL)""".stripMargin
  }

  /** Corpus-wide duplicated n-run start positions (requires toksp):
    * mirror of Dedup.dupStartPositions.
    */
  private def dupStartCte(n: Int): String =
    s"""${positionedShinglesNCte(n)},
       |dupsh AS (SELECT shingle FROM shnp GROUP BY shingle HAVING COUNT(*) > 1),
       |m AS (SELECT s.doc_id, s.pos FROM shnp s JOIN dupsh USING (shingle))""".stripMargin

  /** Exact-substring duplicated spans (mirror of Dedup.duplicatedSpans):
    * gaps-and-islands merge of [pos, pos+n-1] covers.
    */
  def substrSpans(n: Int): String =
    s"""WITH $toksp, ${dupStartCte(n)},
       |isl AS (
       |  SELECT doc_id, pos,
       |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= $n
       |              THEN 0 ELSE 1 END AS new_span
       |  FROM m),
       |sp AS (SELECT doc_id, pos,
       |              SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
       |       FROM isl)
       |SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
       |       CAST(MAX(pos) + ${n - 1} AS BIGINT) AS span_end,
       |       CAST(MAX(pos) + ${n - 1} - MIN(pos) + 1 AS BIGINT) AS span_tokens
       |FROM sp GROUP BY doc_id, span_id""".stripMargin

  /** Span-removed corpus (mirror of Dedup.dropDuplicatedSpans). */
  def substrClean(n: Int): String =
    s"""WITH $toksp, ${dupStartCte(n)},
       |cov AS (
       |  SELECT DISTINCT m.doc_id, m.pos + u.off AS pos
       |  FROM m CROSS JOIN (SELECT unnest(generate_series(0, ${n - 1})) AS off) u),
       |kept AS (
       |  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
       |         string_agg(t.term, ' ' ORDER BY t.pos) AS clean_text
       |  FROM toksp t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos
       |  WHERE c.pos IS NULL
       |  GROUP BY t.doc_id),
       |tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens
       |        FROM toksp GROUP BY doc_id)
       |SELECT tot.doc_id, tot.n_tokens,
       |       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
       |       CAST(tot.n_tokens - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed,
       |       COALESCE(k.clean_text, '') AS clean_text
       |FROM tot LEFT JOIN kept k ON tot.doc_id = k.doc_id""".stripMargin

  /** Gopher duplicate-n-gram character fraction (mirror of
    * Dedup.dupNgramCharFraction — intra-doc union coverage).
    */
  def gopherDup(n: Int): String =
    s"""WITH $toksp, ${positionedShinglesNCte(n)},
       |dupin AS (SELECT doc_id, shingle FROM shnp
       |          GROUP BY doc_id, shingle HAVING COUNT(*) > 1),
       |cov AS (
       |  SELECT DISTINCT s.doc_id, s.pos + u.off AS pos
       |  FROM shnp s JOIN dupin USING (doc_id, shingle)
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${n - 1})) AS off) u),
       |tk AS (SELECT doc_id, pos, length(term) AS clen FROM toksp),
       |tot AS (SELECT doc_id, SUM(clen) AS tok_chars FROM tk GROUP BY doc_id),
       |dupc AS (SELECT t.doc_id, SUM(t.clen) AS dup_chars
       |         FROM tk t JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos
       |         GROUP BY t.doc_id)
       |SELECT t.doc_id, CAST(t.tok_chars AS BIGINT) AS tok_chars,
       |       CAST(COALESCE(d.dup_chars, 0) AS BIGINT) AS dup_chars,
       |       CAST(COALESCE(d.dup_chars, 0) AS DOUBLE) / t.tok_chars AS dup_char_frac
       |FROM tot t LEFT JOIN dupc d ON t.doc_id = d.doc_id""".stripMargin

  /** Unigram-LM log-prob quality proxy (mirror of
    * TextAnalysis.unigramLogProb — add-one smoothing, fixed-point sums).
    */
  val lmScore: String =
    s"""WITH $toksp,
       |tf AS (SELECT term, COUNT(*) AS ctf FROM toksp GROUP BY term),
       |g AS (SELECT (SELECT COUNT(*) FROM toksp) AS t_total,
       |             (SELECT COUNT(*) FROM tf) AS v_size),
       |lp AS (
       |  SELECT t.doc_id,
       |         CAST(round(ln(CAST(f.ctf + 1 AS DOUBLE) /
       |              CAST(g.t_total + g.v_size AS DOUBLE)) * 1000000000.0) AS BIGINT) AS s
       |  FROM toksp t JOIN tf f USING (term), g)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |       CAST(SUM(s) AS DOUBLE) / 1000000000.0 / COUNT(*) AS avg_logprob
       |FROM lp GROUP BY doc_id""".stripMargin

  /** Bigram-LM conditional log-prob (mirror of TextAnalysis.bigramLogProb:
    * add-one over the unigram vocab, successor-counted contexts, fixed-point
    * ln sums).
    */
  val bigramLm: String =
    s"""WITH $toksp,
       |bi AS (SELECT a.doc_id, a.term AS prev, b.term AS cur
       |       FROM toksp a JOIN toksp b
       |         ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
       |cbi AS (SELECT prev, cur, COUNT(*) AS cbi FROM bi GROUP BY prev, cur),
       |cctx AS (SELECT prev, COUNT(*) AS cctx FROM bi GROUP BY prev),
       |g AS (SELECT COUNT(DISTINCT term) AS v_size FROM toksp),
       |lp AS (
       |  SELECT t.doc_id,
       |         CAST(round(ln(CAST(c.cbi + 1 AS DOUBLE) /
       |              CAST(x.cctx + g.v_size AS DOUBLE)) * 1000000000.0) AS BIGINT) AS s
       |  FROM bi t
       |  JOIN cbi c ON t.prev = c.prev AND t.cur = c.cur
       |  JOIN cctx x ON t.prev = x.prev, g)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |       CAST(SUM(s) AS DOUBLE) / 1000000000.0 / COUNT(*) AS avg_logprob
       |FROM lp GROUP BY doc_id""".stripMargin

  /** Stratified-sampling keep counts (mirror of TextAnalysis.stratifiedSample:
    * multiplicative doc_id hash vs per-stratum fraction of the 2^32 space).
    */
  def stratified(fracs: Map[String, Double], defaultFrac: Double): String = {
    val fexpr = fracs.foldLeft(defaultFrac.toString) { case (acc, (k, f)) =>
      s"CASE WHEN lang = '$k' THEN $f ELSE $acc END"
    }
    s"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept
       |FROM documents
       |WHERE CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) < ($fexpr) * 4294967296.0
       |GROUP BY lang""".stripMargin
  }

  /** Token-budget shard accounting (mirror of TextAnalysis.tokenShards:
    * per-lang doc_id-ordered cumsum, shard = floor(prev-total / bin)).
    */
  def tokenShards(bin: Long): String =
    s"""WITH $toksp,
       |tl AS (
       |  SELECT d.doc_id, d.lang AS grp,
       |         CAST(COALESCE(COUNT(t.term), 0) AS BIGINT) AS toks
       |  FROM documents d LEFT JOIN toksp t USING (doc_id)
       |  GROUP BY 1, 2),
       |c AS (
       |  SELECT grp, doc_id, toks,
       |         SUM(toks) OVER (PARTITION BY grp ORDER BY doc_id) AS cum
       |  FROM tl)
       |SELECT grp, CAST((cum - toks) // $bin AS BIGINT) AS shard_id,
       |       CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(toks) AS BIGINT) AS total_toks
       |FROM c GROUP BY 1, 2""".stripMargin

  /** Sequence packing (mirror of TextAnalysis.packSequences): two-phase
    * prefix sum — per-source running totals + a |sources|-row offset
    * cumsum — cut into seqLen-token training sequences.
    */
  def packSequences(seqLen: Long): String =
    s"""WITH $toksp,
       |tl AS (
       |  SELECT d.doc_id, d.source AS grp,
       |         CAST(COUNT(t.term) AS BIGINT) AS toks
       |  FROM documents d JOIN toksp t USING (doc_id)
       |  GROUP BY 1, 2),
       |c AS (
       |  SELECT doc_id, grp, toks,
       |         SUM(toks) OVER (PARTITION BY grp ORDER BY doc_id) AS cum_end
       |  FROM tl WHERE toks > 0),
       |offs AS (
       |  SELECT grp,
       |         CAST(COALESCE(SUM(gtoks) OVER (ORDER BY grp
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS goff
       |  FROM (SELECT grp, SUM(toks) AS gtoks FROM c GROUP BY grp))
       |SELECT c.doc_id, c.grp AS grp, c.toks,
       |       CAST(o.goff + c.cum_end - c.toks AS BIGINT) AS tok_start,
       |       CAST((o.goff + c.cum_end - c.toks) // $seqLen AS BIGINT) AS seq_first,
       |       CAST((o.goff + c.cum_end - 1) // $seqLen AS BIGINT) AS seq_last
       |FROM c JOIN offs o ON c.grp = o.grp""".stripMargin

  /** Temperature-scaled source balancing (mirror of
    * TextAnalysis.temperatureSample: sqrt(n_s/n_max) keep fraction,
    * Knuth-hash membership).
    */
  val temperatureSample: String =
    s"""WITH c AS (SELECT source AS grp, CAST(COUNT(*) AS BIGINT) AS n_docs
       |           FROM documents GROUP BY source),
       |mx AS (SELECT MAX(n_docs) AS n_max FROM c),
       |k AS (
       |  SELECT d.source AS grp, CAST(COUNT(*) AS BIGINT) AS n_kept
       |  FROM documents d JOIN c ON d.source = c.grp CROSS JOIN mx
       |  WHERE CAST((d.doc_id * 2654435761) % 4294967296 AS DOUBLE)
       |        < sqrt(CAST(c.n_docs AS DOUBLE) / mx.n_max) * 4294967296.0
       |  GROUP BY d.source)
       |SELECT c.grp, c.n_docs, CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
       |FROM c LEFT JOIN k ON c.grp = k.grp""".stripMargin

  /** Sliding-window chunking (mirror of TextAnalysis.chunkDocs): chunk c
    * covers positions [c·stride+1, c·stride+size]; a token at pos lands in
    * chunks firstC..lastC (integer arithmetic identical to the operator).
    */
  def chunkDocs(maxDoc: Long, size: Int, overlap: Int): String = {
    val stride = size - overlap
    s"""WITH $toksp,
       |tk AS (SELECT * FROM toksp WHERE doc_id < $maxDoc),
       |tc AS (
       |  SELECT doc_id, term, pos,
       |         CASE WHEN pos <= $size THEN 0
       |              ELSE (pos - $size + $stride - 1) // $stride END AS firstc,
       |         (pos - 1) // $stride AS lastc
       |  FROM tk),
       |ex AS (
       |  SELECT doc_id, term, pos, firstc + g.c AS chunk_id
       |  FROM tc CROSS JOIN (SELECT CAST(range AS BIGINT) AS c
       |                      FROM range(${(size + stride - 1) / stride + 1})) g
       |  WHERE firstc + g.c <= lastc)
       |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       |       string_agg(term, ' ' ORDER BY pos) AS chunk_text,
       |       CAST(COUNT(*) AS BIGINT) AS n_tokens
       |FROM ex GROUP BY 1, 2""".stripMargin
  }

  /** Intra-doc max 3-gram repetition share (mirror of Dedup.repetition). */
  val repetition: String =
    s"""WITH $toksp, $shinglesCte,
       |pc AS (SELECT doc_id, shingle, COUNT(*) AS c FROM sh GROUP BY 1, 2)
       |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
       |       CAST(MAX(c) AS BIGINT) AS max_rep,
       |       CAST(MAX(c) AS DOUBLE) / SUM(c) AS rep_ratio
       |FROM pc GROUP BY doc_id""".stripMargin

  /** PII scrub counts + redacted length over deterministically injected
    * email/phone strings (regex constants shared with TextAnalysis).
    */
  val piiScrub: String = {
    val em = graft.operators.TextAnalysis.EmailRe
    val ph = graft.operators.TextAnalysis.PhoneRe
    s"""WITH pii AS (
       |  SELECT doc_id, text || ' contact user' || doc_id || '@example.com or call 555-' ||
       |         lpad(CAST(doc_id * 7 % 1000 AS VARCHAR), 3, '0') || '-' ||
       |         lpad(CAST(doc_id * 13 % 10000 AS VARCHAR), 4, '0') AS t
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(t, '$em')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(t, '$ph')) AS BIGINT) AS n_phones,
       |  CAST(length(regexp_replace(regexp_replace(t, '$em', '<EMAIL>', 'g'),
       |       '$ph', '<PHONE>', 'g')) AS BIGINT) AS clean_len
       |FROM pii""".stripMargin
  }

  /** Deterministic split counts per (split, lang). */
  def split(trainFrac: Double, validFrac: Double): String = {
    val trainCut = (trainFrac * 4294967296.0).toLong
    val validCut = ((trainFrac + validFrac) * 4294967296.0).toLong
    s"""SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM (
       |  SELECT lang,
       |         CASE WHEN (doc_id * 2654435761) % 4294967296 < $trainCut THEN 'train'
       |              WHEN (doc_id * 2654435761) % 4294967296 < $validCut THEN 'valid'
       |              ELSE 'test' END AS split
       |  FROM documents)
       |GROUP BY 1, 2""".stripMargin
  }

  /** 100-char length histogram over documents. */
  val lenHist: String =
    """SELECT CAST(n_chars // 100 AS BIGINT) AS bucket,
      |       CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents GROUP BY 1""".stripMargin

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

  /** Gopher quality rules (mirror of TextAnalysis.gopherRules: same token
    * split, '#'/'...' symbol counts, line rules, required-stopword hits,
    * greatest(n,1) denominators, identical rule thresholds).
    */
  def gopherRules(minWords: Long, maxWords: Long): String = {
    val stopHits = graft.operators.TextAnalysis.GopherReqStops
      .map(w => s"CAST(list_contains(l, '$w') AS BIGINT)").mkString(" + ")
    s"""WITH base AS (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS l,
       |         list_filter(string_split(text, chr(10)), x -> x <> '') AS lines,
       |         CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS hash_cnt,
       |         CAST(length(text) - length(replace(text, '...', '')) AS BIGINT) // 3 AS ell_cnt
       |  FROM documents),
       |sig AS (
       |  SELECT doc_id,
       |         CAST(len(l) AS BIGINT) AS n_words,
       |         CAST(COALESCE(list_sum(list_transform(l, x -> length(x))), 0) AS BIGINT) AS char_sum,
       |         CAST(len(list_filter(l, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS alpha_words,
       |         hash_cnt + ell_cnt AS sym_cnt,
       |         CAST(len(lines) AS BIGINT) AS n_lines,
       |         CAST(len(list_filter(lines, x -> x LIKE '- %' OR x LIKE '* %')) AS BIGINT) AS bullet_lines,
       |         CAST(len(list_filter(lines, x -> x LIKE '%...')) AS BIGINT) AS ellipsis_lines,
       |         $stopHits AS stop_hits
       |  FROM base),
       |r AS (
       |  SELECT doc_id, n_words,
       |         CAST(char_sum AS DOUBLE) / greatest(n_words, 1) AS mean_word_len,
       |         CAST(alpha_words AS DOUBLE) / greatest(n_words, 1) AS alpha_frac,
       |         CAST(sym_cnt AS DOUBLE) / greatest(n_words, 1) AS symbol_ratio,
       |         CAST(bullet_lines AS DOUBLE) / greatest(n_lines, 1) AS bullet_frac,
       |         CAST(ellipsis_lines AS DOUBLE) / greatest(n_lines, 1) AS ellipsis_frac,
       |         stop_hits
       |  FROM sig)
       |SELECT doc_id, n_words, mean_word_len, alpha_frac, symbol_ratio,
       |       bullet_frac, ellipsis_frac, stop_hits,
       |       CAST(n_words >= $minWords AND n_words <= $maxWords
       |            AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
       |            AND symbol_ratio < 0.1
       |            AND bullet_frac < 0.9 AND ellipsis_frac < 0.3
       |            AND alpha_frac > 0.8
       |            AND stop_hits >= ${graft.operators.TextAnalysis.GopherMinStopHits}
       |            AS BIGINT) AS keep
       |FROM r""".stripMargin
  }

  /** C4 heuristic clean (mirror of TextAnalysis.c4Rules: same line split,
    * terminal-punct + word-count + javascript line keeps, sentence-ender
    * count, lorem/brace page gates, kept-lines char length).
    */
  def c4Rules(minLineWords: Int, minSentences: Int): String =
    s"""WITH base AS (
       |  SELECT doc_id, text,
       |         list_filter(string_split(text, chr(10)), x -> x <> '') AS lines
       |  FROM documents),
       |k AS (
       |  SELECT doc_id, text, lines,
       |         list_filter(lines, l ->
       |           (rtrim(l) LIKE '%.' OR rtrim(l) LIKE '%!'
       |              OR rtrim(l) LIKE '%?' OR rtrim(l) LIKE '%"')
       |           AND len(list_filter(string_split_regex(lower(l), '[^a-z0-9]+'),
       |                               x -> x <> '')) >= $minLineWords
       |           AND NOT contains(lower(l), 'javascript')) AS kept
       |  FROM base),
       |sig AS (
       |  SELECT doc_id,
       |         CAST(len(lines) AS BIGINT) AS n_lines,
       |         CAST(len(kept) AS BIGINT) AS n_kept_lines,
       |         CAST(length(text) - length(replace(replace(replace(text, '.', ''),
       |              '!', ''), '?', '')) AS BIGINT) AS n_sentences,
       |         CAST(contains(lower(text), 'lorem ipsum') AS BIGINT) AS has_lorem,
       |         CAST(contains(text, '{') AS BIGINT) AS has_brace,
       |         CAST(COALESCE(length(array_to_string(kept, chr(10))), 0) AS BIGINT) AS clean_chars
       |  FROM k)
       |SELECT doc_id, n_lines, n_kept_lines, n_sentences, has_lorem, has_brace,
       |       clean_chars,
       |       CAST(n_sentences >= $minSentences AND has_lorem = 0
       |            AND has_brace = 0 AND n_kept_lines >= 1 AS BIGINT) AS keep
       |FROM sig""".stripMargin

  /** Line-level boilerplate removal (mirror of Dedup.boilerplateLines over
    * the q_boilerplate synthetic multi-line corpus: text + a universal
    * footer + the 40-char prefix as three lines; a line in > maxDf distinct
    * docs is struck).
    */
  def boilerplate(maxDf: Long): String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |         text || chr(10) || 'all rights reserved footer'
       |              || chr(10) || substr(text, 1, 40) AS text
       |  FROM documents),
       |lines AS (
       |  SELECT doc_id,
       |         unnest(list_filter(string_split(text, chr(10)), x -> x <> '')) AS line
       |  FROM d),
       |boiler AS (
       |  SELECT line FROM lines GROUP BY line
       |  HAVING COUNT(DISTINCT doc_id) > $maxDf),
       |flagged AS (
       |  SELECT l.doc_id, l.line,
       |         CAST(b.line IS NOT NULL AS BIGINT) AS is_b
       |  FROM lines l LEFT JOIN boiler b ON l.line = b.line)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
       |       CAST(SUM(is_b) AS BIGINT) AS n_boiler,
       |       CAST(SUM(CASE WHEN is_b = 0 THEN length(line) ELSE 0 END)
       |            + greatest(SUM(CASE WHEN is_b = 0 THEN 1 ELSE 0 END) - 1, 0)
       |            AS BIGINT) AS clean_chars
       |FROM flagged GROUP BY doc_id""".stripMargin

  /** Cleaned-corpus twin of [[boilerplate]] (mirror of
    * Dedup.dropBoilerplateLines: same strike set, kept lines rejoined in
    * original order, fully-struck docs kept with empty text).
    */
  def boilerplateClean(maxDf: Long): String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |         text || chr(10) || 'all rights reserved footer'
       |              || chr(10) || substr(text, 1, 40) AS text
       |  FROM documents),
       |lx AS (
       |  SELECT doc_id, unnest(ls) AS line, generate_subscripts(ls, 1) AS pos
       |  FROM (SELECT doc_id,
       |               list_filter(string_split(text, chr(10)), x -> x <> '') AS ls
       |        FROM d)),
       |boiler AS (
       |  SELECT line FROM lx GROUP BY line
       |  HAVING COUNT(DISTINCT doc_id) > $maxDf),
       |kept AS (
       |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text
       |  FROM lx WHERE line NOT IN (SELECT line FROM boiler)
       |  GROUP BY doc_id)
       |SELECT dd.doc_id, COALESCE(k.clean_text, '') AS clean_text
       |FROM (SELECT DISTINCT doc_id FROM d) dd
       |LEFT JOIN kept k ON dd.doc_id = k.doc_id""".stripMargin

  /** Unicode NFC normalization (mirror of q_nfc_normalize's synthetic
    * mixed-form corpus; DuckDB's own nfc_normalize is the independent
    * implementation under compare — char counts and the normalized text
    * itself). chr(101)=e, chr(769)=U+0301 combining acute, chr(233)=é.
    */
  val nfcNormalize: String =
    """WITH d AS (
      |  SELECT doc_id,
      |         text || ' caf' || chr(101) || chr(769) || ' caf' || chr(233) AS text2
      |  FROM documents)
      |SELECT doc_id,
      |       CAST(length(text2) AS INT) AS raw_chars,
      |       CAST(length(nfc_normalize(text2)) AS INT) AS nfc_chars,
      |       nfc_normalize(text2) AS nfc_text
      |FROM d""".stripMargin

  /** CCNet perplexity terciles (mirror of TextAnalysis.perplexityBuckets:
    * the lmScore fixed-point scorer, then per-lang NTILE(3) ordered by
    * avg_logprob DESC with doc_id tie-break).
    */
  val perplexityBuckets: String =
    s"""WITH $toksp,
       |tf AS (SELECT term, COUNT(*) AS ctf FROM toksp GROUP BY term),
       |g AS (SELECT (SELECT COUNT(*) FROM toksp) AS t_total,
       |             (SELECT COUNT(*) FROM tf) AS v_size),
       |lpr AS (
       |  SELECT t.doc_id,
       |         CAST(round(ln(CAST(f.ctf + 1 AS DOUBLE) /
       |              CAST(g.t_total + g.v_size AS DOUBLE)) * 1000000000.0) AS BIGINT) AS s
       |  FROM toksp t JOIN tf f USING (term), g),
       |lp AS (SELECT doc_id,
       |              CAST(SUM(s) AS DOUBLE) / 1000000000.0 / COUNT(*) AS avg_logprob
       |       FROM lpr GROUP BY doc_id),
       |t AS (
       |  SELECT d.doc_id, d.lang, lp.avg_logprob,
       |         CAST(ntile(3) OVER (PARTITION BY d.lang
       |                             ORDER BY lp.avg_logprob DESC, d.doc_id) AS BIGINT) AS tercile
       |  FROM documents d JOIN lp USING (doc_id))
       |SELECT doc_id, lang, avg_logprob, tercile,
       |       CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
       |            ELSE 'tail' END AS bucket
       |FROM t""".stripMargin

  /** As-of join (TemporalJoin.asof): each purchase attributed to the most
    * recent view at-or-before it per user. Checked against DuckDB's NATIVE
    * `ASOF LEFT JOIN` — a fully independent implementation of the operator,
    * not a transliteration of the Spark plan. Right side deduped to unique
    * (user_id, ts) by max event_id so ties are well-defined in both engines;
    * null matches coalesced to −1 sentinels (driver compare is null-averse).
    */
  val asofJoin: String =
    """WITH l AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts
      |  FROM events WHERE event_type = 'purchase'),
      |r AS (
      |  SELECT user_id, epoch_us(ts) AS ts, MAX(event_id) AS view_event_id
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
      |SELECT l.event_id, l.user_id, l.ts,
      |       COALESCE(r.ts, -1) AS view_ts,
      |       COALESCE(r.view_event_id, -1) AS view_event_id,
      |       COALESCE(l.ts - r.ts, -1) AS gap_us
      |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin

  /** As-of with tolerance (pandas merge_asof semantics): a match farther
    * than `tolUs` behind is nulled, the left row kept. */
  def asofTolerance(tolUs: Long): String =
    s"""WITH l AS (
       |  SELECT event_id, user_id, epoch_us(ts) AS ts
       |  FROM events WHERE event_type = 'purchase'),
       |r AS (
       |  SELECT user_id, epoch_us(ts) AS ts, MAX(event_id) AS view_event_id
       |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
       |j AS (
       |  SELECT l.event_id, l.user_id, l.ts, r.ts AS m_ts, r.view_event_id
       |  FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts)
       |SELECT event_id, user_id, ts,
       |       COALESCE(CASE WHEN ts - m_ts <= $tolUs THEN m_ts END, -1) AS view_ts,
       |       COALESCE(CASE WHEN ts - m_ts <= $tolUs THEN view_event_id END, -1) AS view_event_id,
       |       COALESCE(CASE WHEN ts - m_ts <= $tolUs THEN ts - m_ts END, -1) AS gap_us
       |FROM j""".stripMargin

  /** Forward as-of: the EARLIEST view at-or-after each purchase (DuckDB
    * ASOF with the flipped inequality). */
  val asofForward: String =
    """WITH l AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts
      |  FROM events WHERE event_type = 'purchase'),
      |r AS (
      |  SELECT user_id, epoch_us(ts) AS ts, MAX(event_id) AS view_event_id
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
      |SELECT l.event_id, l.user_id, l.ts,
      |       COALESCE(r.ts, -1) AS view_ts,
      |       COALESCE(r.view_event_id, -1) AS view_event_id,
      |       COALESCE(r.ts - l.ts, -1) AS gap_us
      |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts""".stripMargin

  /** Range join (TemporalJoin.windowAgg): per purchase, activity of the same
    * user in the window [ts+lo, ts+hi) µs. The oracle is DuckDB's native
    * inequality join (IEJoin) — independent of the Spark side's bin-bucketed
    * equi-join rewrite. Decimal-summed value, zero-filled for empty windows.
    */
  def rangeJoinAgg(loUs: Long, hiUs: Long): String =
    s"""WITH e AS (
       |  SELECT event_id, user_id, epoch_us(ts) AS ts, event_type,
       |         CAST(value AS DECIMAL(18,2)) AS v
       |  FROM events),
       |l AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
       |j AS (
       |  SELECT l.event_id, COUNT(r.event_id) AS n_prior,
       |         COALESCE(CAST(SUM(r.v) AS DOUBLE), 0.0) AS prior_value
       |  FROM l LEFT JOIN e r
       |    ON l.user_id = r.user_id
       |   AND r.ts >= l.ts + $loUs AND r.ts < l.ts + $hiUs
       |  GROUP BY 1)
       |SELECT l.event_id, l.user_id, l.ts,
       |       CAST(j.n_prior AS BIGINT) AS n_prior, j.prior_value
       |FROM l JOIN j USING (event_id)""".stripMargin

  /** Point-in-interval join (TemporalJoin.intervalJoin): error events
    * attributed to their containing ≥minEvents session interval. The oracle
    * assigns events to sessions DIRECTLY (the sessionize window chain) —
    * independent of the Spark side's bin-exploded interval equi-join; the
    * two agree because a user's session intervals are disjoint.
    */
  def sessionAttrib(gapUs: Long, minEvents: Long): String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS ts, event_type FROM events),
       |flagged AS (
       |  SELECT *, CASE WHEN prev_ts IS NULL OR ts - prev_ts > $gapUs THEN 1 ELSE 0 END AS new_s
       |  FROM (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM e)),
       |assigned AS (
       |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                             ROWS UNBOUNDED PRECEDING) AS session_idx
       |  FROM flagged),
       |s AS (
       |  SELECT user_id, session_idx, MIN(ts) AS session_start,
       |         MAX(ts) AS session_end, COUNT(*) AS n_events
       |  FROM assigned GROUP BY 1, 2 HAVING COUNT(*) >= $minEvents)
       |SELECT a.event_id, a.user_id, a.ts,
       |       CAST(a.session_idx AS BIGINT) AS session_idx,
       |       s.session_start, s.session_end, CAST(s.n_events AS BIGINT) AS n_events
       |FROM assigned a JOIN s USING (user_id, session_idx)
       |WHERE a.event_type = 'error'""".stripMargin

  /** Exact per-group discrete quantiles (Quantiles.exactQuantiles): value
    * at 1-based rank floor(q·(n−1))+1 of the ascending per-group sort.
    * q forced to DOUBLE so both engines compute the identical IEEE product.
    */
  def quantiles(qs: Seq[Double]): String = {
    val vals = qs.map(q => s"(CAST($q AS DOUBLE))").mkString(",")
    s"""WITH r AS (
       |  SELECT lang, n_chars,
       |         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
       |         COUNT(*) OVER (PARTITION BY lang) AS n
       |  FROM documents)
       |SELECT lang, q, n_chars AS value
       |FROM r, (VALUES $vals) AS qs(q)
       |WHERE rn = CAST(FLOOR(q * (n - 1)) AS BIGINT) + 1""".stripMargin
  }

  /** Zero-sort binned quantiles (Quantiles.binnedQuantiles): fixed-width
    * histogram + cumulative pick. The approximation (answer = the ≤W-wide
    * bin holding the rank) is part of the CONTRACT, so the oracle computes
    * the identical bins and the compare is exact. Non-negative values. */
  def binnedQuantiles(qs: Seq[Double], w: Long): String = {
    val vals = qs.map(q => s"(CAST($q AS DOUBLE))").mkString(",")
    s"""WITH b AS (
       |  SELECT lang, n_chars // $w AS bin, COUNT(*) AS c
       |  FROM documents GROUP BY 1, 2),
       |cum AS (
       |  SELECT lang, bin, c,
       |         SUM(c) OVER (PARTITION BY lang ORDER BY bin
       |                      ROWS UNBOUNDED PRECEDING) AS cumc,
       |         SUM(c) OVER (PARTITION BY lang) AS n
       |  FROM b)
       |SELECT lang, q,
       |       CAST(bin * $w AS BIGINT) AS bin_lo,
       |       CAST(bin * $w + ${w - 1} AS BIGINT) AS bin_hi,
       |       CAST(n AS BIGINT) AS n
       |FROM cum, (VALUES $vals) AS qs(q)
       |WHERE cumc >= CAST(FLOOR(q * (n - 1)) AS BIGINT) + 1
       |  AND cumc - c < CAST(FLOOR(q * (n - 1)) AS BIGINT) + 1""".stripMargin
  }

  /** Exact heavy-hitter terms (TextAnalysis.heavyTerms): the oracle is the
    * NAIVE full group-by with a share threshold — the Spark side must reach
    * the identical set through its Misra-Gries candidate + broadcast
    * recount pipeline (sketch nondeterminism cancels in the verify pass).
    */
  def heavyHitters(minShare: Double): String =
    s"""WITH toks AS (
       |  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |         x -> x <> '')) AS term
       |  FROM documents),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM toks)
       |SELECT term, CAST(COUNT(*) AS BIGINT) AS n
       |FROM toks, tot
       |GROUP BY term, tot.n_total
       |HAVING CAST(COUNT(*) AS DOUBLE) > CAST(tot.n_total AS DOUBLE) * $minShare""".stripMargin

  /** Global KMV rollup: the oracle computes the k smallest distinct hashes
    * over the WHOLE corpus directly — the Spark side must reach the same
    * sketch by merging the per-language sketches (set identity: k-min of a
    * union of per-group k-mins = global k-min). */
  def kmvGlobal(k: Int): String = {
    val num = (k - 1).toDouble * 4294967296.0
    s"""WITH toks AS (
       |  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |         x -> x <> '')) AS term
       |  FROM documents),
       |h AS (SELECT DISTINCT ${Text.tokenHash32Sql(Text.tokenCodeSql("term"))} AS h
       |      FROM toks),
       |r AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn,
       |             COUNT(*) OVER () AS cnt FROM h)
       |SELECT CAST(LEAST(MIN(cnt), $k) AS BIGINT) AS sketch_size,
       |       CAST(MAX(h) FILTER (WHERE rn <= $k) AS BIGINT) AS kth_min,
       |       CASE WHEN MIN(cnt) < $k THEN CAST(MIN(cnt) AS DOUBLE)
       |            ELSE $num / CAST(MAX(h) FILTER (WHERE rn <= $k) AS DOUBLE)
       |       END AS est_distinct
       |FROM r""".stripMargin
  }

  /** Range join at PAIR granularity: DuckDB's native inequality join
    * emitting the raw (purchase, prior-event) pairs. */
  def rangePairs(loUs: Long, hiUs: Long): String =
    s"""WITH e AS (
       |  SELECT event_id, user_id, epoch_us(ts) AS ts, event_type FROM events),
       |l AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase')
       |SELECT l.event_id, r.event_id AS r_event_id, r.ts AS r_ts
       |FROM l JOIN e r
       |  ON l.user_id = r.user_id
       | AND r.ts >= l.ts + $loUs AND r.ts < l.ts + $hiUs""".stripMargin

  /** KMV distinct-vocabulary sketch (KmvSketch): per-language k-minimum
    * distinct token-code hashes. The oracle recomputes the k smallest
    * distinct Knuth hashes relationally; the estimator constant is the
    * exact double (k−1)·2³² written out so the one division matches
    * bit-for-bit. Estimates DISTINCT TOKEN CODES (the shared code folds
    * rare prefix collisions — identically in both engines).
    */
  def kmvVocab(k: Int): String = {
    val num = (k - 1).toDouble * 4294967296.0 // exactly representable
    s"""WITH toks AS (
       |  SELECT lang,
       |         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |                x -> x <> '')) AS term
       |  FROM documents),
       |h AS (SELECT DISTINCT lang, ${Text.tokenHash32Sql(Text.tokenCodeSql("term"))} AS h
       |      FROM toks),
       |r AS (SELECT lang, h,
       |             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h) AS rn,
       |             COUNT(*) OVER (PARTITION BY lang) AS cnt
       |      FROM h),
       |kth AS (SELECT lang, MAX(h) FILTER (WHERE rn <= $k) AS kth_min,
       |               MIN(cnt) AS cnt
       |        FROM r GROUP BY lang)
       |SELECT lang, CAST(LEAST(cnt, $k) AS BIGINT) AS sketch_size,
       |       CAST(kth_min AS BIGINT) AS kth_min,
       |       CASE WHEN cnt < $k THEN CAST(cnt AS DOUBLE)
       |            ELSE $num / CAST(kth_min AS DOUBLE) END AS est_distinct
       |FROM kth""".stripMargin
  }

  /** Fixed BPE merge table shared verbatim by the Spark query
    * (`Bpe.encodeTerms`) and the SQL oracle below — ONE list, two
    * renderings, so the gate can't drift. Includes cascading merges
    * (th+e</w> consumes the products of merges 1 and 3; an+d</w> of 2 and
    * 5; ing+</w> of 7 and 8) to exercise sequential application.
    */
  val BpeFixedMerges: Seq[(String, String)] = Seq(
    "e" -> "</w>", "d" -> "</w>", "t" -> "h", "th" -> "e</w>", "a" -> "n",
    "an" -> "d</w>", "i" -> "n", "in" -> "g", "ing" -> "</w>", "o" -> "r")

  /** BPE ENCODER oracle (Bpe.encodeTerms under [[BpeFixedMerges]]).
    *
    * SQL formulation: a symbol sequence is encoded as a string with DOUBLE
    * '.' separators between symbols and at both ends ("..t..h..e..</w>..").
    * One merge (a,b)→ab is then plain `replace(s, '.a..b.', '.ab.')`:
    *  - the single-dot flanks pin WHOLE symbols (tokens are [a-z0-9]+ and
    *    merged symbols never contain '.', so a '.x' prefix means a symbol
    *    starting with x and 'y.' means one ending with y);
    *  - each match consumes one dot of each bounding '..', leaving the
    *    invariant intact for the next scan position;
    *  - `replace`'s left-to-right non-overlapping scan (resume AFTER the
    *    replacement) is exactly mergeOnce's fold semantics: a freshly
    *    merged symbol is never the LEFT of another merge in the same pass.
    * Chaining ten replaces applies the merge list in training order; the
    * final string is unwrapped to space-joined pieces.
    */
  def bpeEncode: String = {
    val init = """'..' || regexp_replace(term, '(.)', '\1..', 'g') || '</w>..'"""
    val chained = BpeFixedMerges.foldLeft(init) { case (e, (a, b)) =>
      s"replace($e, '.$a..$b.', '.$a$b.')"
    }
    s"""WITH toks AS (
       |  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |         x -> x <> '')) AS term
       |  FROM documents),
       |terms AS (SELECT DISTINCT term FROM toks)
       |SELECT term, replace(trim($chained, '.'), '..', ' ') AS pieces
       |FROM terms""".stripMargin
  }

  /** First BPE merge pick (Bpe.pairCounts argmax over the initial
    * character vocab): one SQL query gating `train`'s scoring relation —
    * weighted adjacent-pair counts with the (c DESC, a, b) tie-break.
    */
  def bpeFirstMerge: String =
    s"""WITH toks AS (
       |  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |         x -> x <> '')) AS term
       |  FROM documents),
       |vocab AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term),
       |pairs AS (
       |  SELECT v.cnt, substring(v.term, u.i, 1) AS a,
       |         CASE WHEN u.i < length(v.term) THEN substring(v.term, u.i + 1, 1)
       |              ELSE '</w>' END AS b
       |  FROM vocab v, unnest(range(1, length(v.term) + 1)) AS u(i))
       |SELECT a, b, CAST(SUM(cnt) AS BIGINT) AS c
       |FROM pairs GROUP BY a, b ORDER BY c DESC, a, b LIMIT 1""".stripMargin

  /** FULL BPE training-loop oracle (Bpe.train, `numMerges` rounds): the two
    * already-green primitives composed `numMerges` times as chained CTEs.
    *
    * Round k (k = 1..n) over the evolving vocab v(k-1), held as the
    * double-separator symbol string of [[bpeEncode]] plus its word count:
    *  - s_k: split the string back into its symbol list;
    *  - p_k: weighted adjacent-pair counts (the [[bpeFirstMerge]] relation,
    *    but over the CURRENT symbols instead of raw characters);
    *  - m_k: the argmax row under train's exact (c DESC, a, b) tie-break —
    *    both engines compare ASCII strings bytewise, so ties agree;
    *  - v_k: one whole-symbol `replace('.a..b.', '.ab.')` per word (the
    *    [[bpeEncode]] merge step) via a CROSS JOIN against the 1-row m_k.
    * The final SELECT unions m_1..m_n with their literal ranks. Early
    * exhaustion agrees for free: an empty p_k makes m_k (and every later
    * round) empty, exactly where `train` breaks its loop.
    */
  def bpeMerges(numMerges: Int): String = {
    val init = """'..' || regexp_replace(term, '(.)', '\1..', 'g') || '</w>..'"""
    // v_k and m_k are each referenced twice (next round + final union):
    // MATERIALIZED pins one evaluation per round — inlining would expand
    // v0 2^n times and never finish
    val rounds = (1 to numMerges).map { k =>
      s"""s$k AS (SELECT list_filter(string_split(s, '..'), x -> x <> '') AS syms, cnt
         |        FROM v${k - 1}),
         |p$k AS (SELECT syms[u.i] AS a, syms[u.i + 1] AS b, SUM(cnt) AS c
         |        FROM s$k, unnest(range(1, len(syms))) AS u(i)
         |        GROUP BY 1, 2),
         |m$k AS MATERIALIZED (SELECT a, b, c FROM p$k ORDER BY c DESC, a, b LIMIT 1),
         |v$k AS MATERIALIZED (
         |        SELECT replace(v.s, '.' || m.a || '..' || m.b || '.',
         |                       '.' || m.a || m.b || '.') AS s, v.cnt AS cnt
         |        FROM v${k - 1} v CROSS JOIN m$k m)""".stripMargin
    }.mkString(",\n")
    val union = (1 to numMerges).map { k =>
      s"""SELECT CAST($k AS INT) AS rank, a, b, a || b AS merged,
         |       CAST(c AS BIGINT) AS pair_count FROM m$k""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH toks AS (
       |  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |         x -> x <> '')) AS term
       |  FROM documents),
       |v0 AS (SELECT $init AS s, COUNT(*) AS cnt FROM toks GROUP BY term),
       |$rounds
       |$union""".stripMargin
  }
}
