package graft

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-9 curation operators: Bloom-prefiltered decontamination, SemDeDup
  * semantic dedup, per-source caps, deterministic shuffle shards.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // train docs share the "spark join window" shingles with test doc 10;
  // test doc 11 is fully novel. Lots of train-only shingles for the Bloom
  // prefilter to discard.
  private val docs = Seq(
    (0L, "spark join window merge data table scan filter"),
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "one two three four five six seven eight nine ten"),
    (10L, "spark join window about nothing else at all"),
    (11L, "entirely novel holdout content with fresh tokens"))
    .toDF("doc_id", "text")
  private val splitDf = Seq(
    (0L, "train"), (1L, "train"), (2L, "train"),
    (10L, "test"), (11L, "test")).toDF("doc_id", "split")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shingles"),
      r.getAs[Long]("n_seen"), r.getAs[Double]("contamination"))).toSet

  test("contaminationBloom is bit-identical to contamination at any fpp") {
    val exact = rows(Dedup.contamination(docs, splitDf))
    assert(exact.nonEmpty && exact.exists(_._3 > 0),
      "fixture must have real train/test overlap")
    // tight and deliberately FP-heavy filters must both reproduce the exact
    // operator: false positives survive the prefilter but match nothing in
    // the exact overlap join
    assert(rows(Dedup.contaminationBloom(docs, splitDf, fpp = 0.01)) == exact)
    assert(rows(Dedup.contaminationBloom(docs, splitDf, fpp = 0.5)) == exact)
  }

  test("semanticDedup drops intra-cluster near-dups, keeps across clusters") {
    // seeds: 0 -> (1000,0), 1 -> (0,1000). 2 is a near-copy of seed 0,
    // 3 of seed 1; 4 lands in cluster 0 but is far from everything there
    // at threshold 0.9.
    val emb = Seq(
      (0L, Array(1000.0, 0.0)),
      (1L, Array(0.0, 1000.0)),
      (2L, Array(999.0, 10.0)),
      (3L, Array(10.0, 999.0)),
      (4L, Array(700.0, -700.0)))
      .toDF("doc_id", "qv")
    val kept = Dedup.semanticDedup(emb, k = 2, threshold = 0.9).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    assert(kept == Map(0L -> 0L, 1L -> 1L, 4L -> 0L), s"got $kept")
  }

  test("semanticDedup assignment ties break to the lowest centroid id") {
    val emb = Seq(
      (0L, Array(1000.0, 0.0)),
      (1L, Array(0.0, 1000.0)),
      (5L, Array(500.0, 500.0))) // equal cosine to both seeds
      .toDF("doc_id", "qv")
    val kept = Dedup.semanticDedup(emb, k = 2, threshold = 0.99).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    assert(kept(5L) == 0L, s"tie must go to centroid 0, got ${kept(5L)}")
  }

  test("sourceCap keeps the cap longest docs per source, ties to low id") {
    val d = Seq(
      (1L, "web", 50L), (2L, "web", 90L), (3L, "web", 90L), (4L, "web", 10L),
      (5L, "book", 70L))
      .toDF("doc_id", "source", "n_chars")
    val got = TextAnalysis.sourceCap(d, cap = 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("rk"))).toSet
    assert(got == Set((2L, "web", 1L), (3L, "web", 2L), (5L, "book", 1L)),
      s"got $got")
  }

  test("shuffleShards covers every doc once with hash-ordered positions") {
    val d = (0L until 10L).toDF("doc_id")
    val got = TextAnalysis.shuffleShards(d, nShards = 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("pos")))
    assert(got.map(_._1).toSet == (0L until 10L).toSet)
    def h(id: Long) = (id * 2654435761L) % 4294967296L
    // shard assignment is the documented hash
    got.foreach { case (id, shard, _) => assert(shard == h(id) % 3) }
    // positions are 1..n_shard in hash order within each shard
    got.groupBy(_._2).foreach { case (_, rs) =>
      val byPos = rs.sortBy(_._3)
      assert(byPos.map(_._3).toSeq == (1L to rs.length).toSeq)
      assert(byPos.map(r => h(r._1)).toSeq == byPos.map(r => h(r._1)).sorted.toSeq)
    }
  }
}
