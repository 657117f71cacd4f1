package graft.operators

import graft.core.Tables
import graft.functions.VecExprs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-table random-hyperplane LSH approximate nearest neighbour over an
  * embedding column — the hash-bucketed alternative to IVF for the
  * similarity-search scale path.
  *
  * Standard construction: `nTables` independent hash tables, each bucketing
  * by `nPlanes` sign bits bucket_t(v) = Σ_j 2^j·[⟨v, p_{t,j}⟩ > 0];
  * candidates are the union over tables of same-bucket pairs (recall grows
  * with tables, candidate count with 1/2^nPlanes).
  *
  * The planes are the engine's deterministic synthetic vectors
  * ([[Tables.synthVec]], seed (t·nPlanes+j)·1000+3), so bucketing is exactly
  * reproducible by the DuckDB oracle — a hash-checkable ANN operator.
  *
  * Scale: bucketing is a per-row map; the candidate join is keyed on
  * (table, bucket) — at 100 TB the corpus is written partitioned by the
  * table-0 bucket and the other tables become cheap co-located re-hashes.
  */
object AnnLsh {

  def planeSeed(p: Int): Long = p * 1000L + 3L

  /** Default plane-count floor: with fewer planes than this, small corpora
    * degenerate to near-full scans (≤ 2^6 buckets).
    */
  val MinPlanes = 6

  /** Auto-scaled plane count: enough sign bits that the EXPECTED bucket
    * holds ~64 docs. A fixed plane count makes the candidate set a linear
    * FRACTION of the corpus (bucket size n/2^planes grows with n — the
    * same quadratic the HNSW bridge stage had, SCALE.md "AnnLsh plane-count
    * regime"); scaling planes with log2(n/64) holds candidate volume
    * ≈ nTables·n·64 — linear in n with a flat per-query term.
    */
  def autoPlanes(n: Long): Int =
    math.max(MinPlanes, ceilLog2(math.max(1L, n / 64)))

  private def ceilLog2(x: Long): Int =
    if (x <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(x - 1L)

  /** (id, qv) → (id, qv, table, bucket): one row per hash table, produced by
    * ONE scan — all tables' buckets are computed into an array per row and
    * exploded (vs a union of nTables selects, which scans the corpus
    * nTables×). Same rows, 1/nTables the input I/O.
    */
  def withBuckets(df: DataFrame, idCol: String, nTables: Int, nPlanes: Int,
      dim: Int): DataFrame = {
    val perTable = array((0 until nTables).map { t =>
      val bucket = (0 until nPlanes).map { j =>
        val plane = Tables.synthVec(lit(planeSeed(t * nPlanes + j)), dim)
        when(VecExprs.dot(col("qv"), plane) > 0, lit(1L << j)).otherwise(0L)
      }.reduce(_ + _)
      struct(lit(t).cast("long").as("table"), bucket.cast("long").as("bucket"))
    }: _*)
    df.select(col(idCol), col("qv"), explode(perTable).as("tb"))
      .select(col(idCol), col("qv"),
        col("tb.table").as("table"), col("tb.bucket").as("bucket"))
  }

  /** Approximate top-k: candidates = union over tables of docs sharing the
    * query's bucket. corpus/queries: (doc_id|qid, qv).
    * Returns (qid, rank, doc_id, score).
    *
    * `nPlanes = None` (the default) auto-scales the plane count with the
    * corpus ([[autoPlanes]] — floor [[MinPlanes]], growing as
    * ceil(log2(n/64)) so expected bucket size stays ~64 and the candidate
    * join stays linear in n); this costs one count() job, skipped when the
    * caller passes `corpusCount` (a persisted collection knows its size).
    * `Some(p)` uses exactly p planes — the explicit-knob override for
    * callers that computed their own regime (e.g. [[Hnsw.build]]'s bridge
    * stage, which calls [[withBuckets]] directly).
    */
  def search(corpus: DataFrame, queries: DataFrame, k: Int,
      nTables: Int = 4, nPlanes: Option[Int] = None, dim: Int = 64,
      corpusCount: Option[Long] = None): DataFrame = {
    val planes = nPlanes.getOrElse(
      autoPlanes(corpusCount.getOrElse(corpus.count())))
    val c = withBuckets(corpus, "doc_id", nTables, planes, dim)
    val q = withBuckets(queries, "qid", nTables, planes, dim)
      .withColumnRenamed("qv", "qqv")
    val cand = c.join(broadcast(q), Seq("table", "bucket"))
      .select("qid", "doc_id").distinct()
    val scored = cand
      .join(corpus.select(col("doc_id"), col("qv").as("dv"),
        VecExprs.norm2(col("qv")).as("nd2")), "doc_id")
      .join(broadcast(queries.select(col("qid"), col("qv"),
        VecExprs.norm2(col("qv")).as("nq2"))), "qid")
      .withColumn("dotp", VecExprs.dot(col("qv"), col("dv")))
      .withColumn("rawScore", Knn.rawScore("COSINE"))
      .select("qid", "doc_id", "rawScore")
    TopK.perKey(scored, "qid", "rawScore", "doc_id", k)
      .select(col("qid"), col("rank"), col("doc_id"), col("rawScore").as("score"))
  }
}
