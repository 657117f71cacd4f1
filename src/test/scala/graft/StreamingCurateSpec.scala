package graft

import graft.streaming.CurateStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Online curation stream: PII scrub + quality gate + persisted near-dup
  * gate + bucketed commit, across micro-batches.
  */
class StreamingCurateSpec extends SparkSpec {
  import spark.implicits._

  private def goodText(tag: String) =
    // long, stopword-free, long-token text scores high on quality; the tag
    // LEADS each token because tokenCode only sees the first 3 chars +
    // length — a trailing tag would collide distinct fixtures
    (1 to 30).map(i => s"${tag}substantial$i").mkString(" ")

  test("curation stream scrubs, gates quality and near-dups, commits survivors") {
    implicit val sqlCtx = spark.sqlContext
    val idx = Files.createTempDirectory("graft_curate_idx").toString + "/idx"
    val tbl = Files.createTempDirectory("graft_curate_tbl").toString + "/tbl"
    val mem = MemoryStream[(Long, String, String)]
    val q = CurateStream.start(spark, mem.toDF().toDF("doc_id", "text", "src"),
      idx, tbl, minQuality = 0.5, threshold = 0.75)
    try {
      // batch 1: doc 1 good (with PII to scrub), doc 2 junk (one token)
      mem.addData(
        (1L, goodText("alpha") + " mail me alice@example.com", "s0"),
        (2L, "junk", "s0"))
      q.processAllAvailable()
      val after1 = spark.read.parquet(tbl)
      assert(after1.select("doc_id").as[Long].collect().toSet === Set(1L))
      val stored = after1.filter(col("doc_id") === 1L)
        .select("text").as[String].head()
      assert(stored.contains("<EMAIL>") && !stored.contains("alice@example.com"))

      // batch 2: doc 3 = near-copy of doc 1 (dropped by the index gate),
      // doc 4 novel good (kept)
      mem.addData(
        (3L, goodText("alpha") + " mail me bob@example.com", "s1"),
        (4L, goodText("beta"), "s1"))
      q.processAllAvailable()
      val after2 = spark.read.parquet(tbl)
      assert(after2.select("doc_id").as[Long].collect().toSet === Set(1L, 4L))
    } finally q.stop()
  }

  test("restarted pipeline keeps gating against the persisted index state") {
    val idx = Files.createTempDirectory("graft_curate_idx2").toString + "/idx"
    val tbl = Files.createTempDirectory("graft_curate_tbl2").toString + "/tbl"
    // first "run" commits doc 1
    CurateStream.curateBatch(spark,
      Seq((1L, goodText("gamma"), "s0")).toDF("doc_id", "text", "src"),
      idx, tbl, minQuality = 0.5, threshold = 0.75)
    // second "run" (fresh invocation, same stores): near-copy still dropped
    CurateStream.curateBatch(spark,
      Seq((5L, goodText("gamma"), "s1"),
          (6L, goodText("delta"), "s1")).toDF("doc_id", "text", "src"),
      idx, tbl, minQuality = 0.5, threshold = 0.75)
    val ids = spark.read.parquet(tbl).select("doc_id").as[Long].collect().toSet
    assert(ids === Set(1L, 6L))
  }

  test("gopher gate replaces the quality score when configured") {
    val idx = Files.createTempDirectory("graft_curate_idx3").toString + "/idx"
    val tbl = Files.createTempDirectory("graft_curate_tbl3").toString + "/tbl"
    // passes Gopher: 32 words, 2 required stopwords, mean word length in
    // range; the junk docs WOULD pass the score gate at minQuality=0 —
    // their rejection proves the Gopher path is the active gate
    def gopherText(tag: String) =
      "the and " + (1 to 30).map(i => s"${tag}doc$i").mkString(" ")
    CurateStream.curateBatch(spark,
      Seq((1L, gopherText("alpha"), "s0"),
          (2L, "no required stopwords here at all", "s0"),
          (3L, "junk", "s0")).toDF("doc_id", "text", "src"),
      idx, tbl, minQuality = 0.0, threshold = 0.75,
      gopherMinWords = Some(10L))
    // second run, same stores: near-copy gated by the persisted index,
    // novel doc admitted
    CurateStream.curateBatch(spark,
      Seq((4L, gopherText("alpha"), "s1"),
          (5L, gopherText("beta"), "s1")).toDF("doc_id", "text", "src"),
      idx, tbl, minQuality = 0.0, threshold = 0.75,
      gopherMinWords = Some(10L))
    val ids = spark.read.parquet(tbl).select("doc_id").as[Long].collect().toSet
    assert(ids === Set(1L, 5L))
  }
}
