package graft

import graft.api._
import graft.operators.Bm25
import graft.sources.{SparseIndex, VectorStoreCatalog}
import org.apache.spark.sql.functions._

import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Regressions for Spark 4's default `spark.sql.ansi.enabled=true` — the
  * mode this engine actually serves under (the shared test session leaves
  * the default on deliberately).
  *
  * r5 shipped a dictionary-delta commit whose content-address summed
  * `xxhash64(term, df)` over the batch vocabulary; sums of uniform longs
  * overflow with near-certainty beyond a few dozen terms, and ANSI mode
  * turns that into `SparkArithmeticException` — every steady-state insert
  * on a real-text collection crashed mid-commit. The suite only caught it
  * where specs happened to use real text; these specs push ≥1k distinct
  * (term, df) delta rows through BOTH write paths deterministically, so any
  * future long-arithmetic-over-hashes regression fails loudly here first.
  */
class AnsiSafetySpec extends SparkSpec {

  private def vec(seed: Int, dim: Int = 8): Seq[Double] =
    (0 until dim).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)

  /** `n` distinct synthetic terms for doc `i` of wave `w` — disjoint across
    * (w, i), so a k-doc batch carries k·n distinct dictionary rows.
    */
  private def terms(w: Int, i: Int, n: Int): String =
    (0 until n).map(j => s"t${w}_${i}_$j").mkString(" ")

  test("SparseIndex steady-state commits survive a 2k-term batch vocabulary") {
    import spark.implicits._
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true",
      "this spec must run under the ANSI default it guards")
    val dir = Files.createTempDirectory("graft_ansi_sparse").toString
    val base = (0L until 30L).map(i => (i, s"common anchor ${terms(0, i.toInt, 50)}"))
      .toDF("doc_id", "text")
    SparseIndex.write(Bm25.fit(base), dir, nBuckets = 4)

    // wave 1: 20 docs × 100 fresh terms = 2000 (term, +1) delta rows, plus
    // the replaced docs' (term, -1) rows — well past the ~dozen-term point
    // where the r5 content-hash sum overflowed. Steady state: this APPENDS
    // a dictionary delta (no fold on the first commit).
    val w1 = ((0L until 10L).map(i => (i, s"common ${terms(1, i.toInt, 100)}")) ++
      (30L until 40L).map(i => (i, s"fresh ${terms(1, i.toInt, 100)}")))
      .toDF("doc_id", "text")
    SparseIndex.upsert(spark, dir, w1, nBuckets = 4)
    // wave 2 exercises the commit against EXISTING pending deltas
    val w2 = (40L until 50L).map(i => (i, s"late ${terms(2, i.toInt, 100)}"))
      .toDF("doc_id", "text")
    SparseIndex.upsert(spark, dir, w2, nBuckets = 4)

    // stored stats equal a from-scratch refit over the merged corpus
    val merged = base.join(w1, Seq("doc_id"), "left_anti").unionByName(w1)
      .join(w2, Seq("doc_id"), "left_anti").unionByName(w2)
    val m = SparseIndex.read(spark, dir)
    val ref = Bm25.fit(merged)
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    assert(canon(m.termDf) == canon(ref.termDf), "dictionary != refit")
    assert(canon(m.global) == canon(ref.global), "globals != refit")
    val q = Seq(0L -> "common anchor t1_5_3")
    assert(canon(Bm25.searchTopK(m, q, 10)) == canon(Bm25.searchTopK(ref, q, 10)))
  }

  test("replaying a committed sparse batch converges: no duplicate delta, stats unchanged") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_replay").toString
    val base = (0L until 20L).map(i => (i, s"base doc$i shared words"))
      .toDF("doc_id", "text")
    SparseIndex.write(Bm25.fit(base), dir, nBuckets = 4)
    val batch = (15L until 25L).map(i => (i, s"updated doc$i fresh terms"))
      .toDF("doc_id", "text")
    SparseIndex.upsert(spark, dir, batch, nBuckets = 4)
    val deltaDir = java.nio.file.Paths.get(dir, "termdf_delta")
    def deltaCount = if (!Files.exists(deltaDir)) 0
      else Files.list(deltaDir).iterator().asScala.count(_.getFileName.toString.startsWith("d"))
    val after1 = deltaCount
    def stats = {
      val m = SparseIndex.read(spark, dir)
      (m.termDf.collect().map(_.toSeq).toSet, m.global.collect().map(_.toSeq).toSet)
    }
    val s1 = stats
    // the caller-contract idempotence claim: replaying an already-committed
    // batch (every removed posting re-added identically) must append NO
    // dictionary delta and leave every stat byte-identical — the seq-named
    // append stays convergent where the r5 content-name needed (and failed)
    // to guarantee it
    SparseIndex.upsert(spark, dir, batch, nBuckets = 4)
    assert(deltaCount == after1, "replay must not append a new dictionary delta")
    assert(stats == s1, "replay must not change dictionary or global stats")
  }

  test("facade inserts with ~1k-term batches commit repeatedly (r5 overflow path)") {
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_ansi_facade").toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8))
    // three consecutive inserts — the r5 bug passed the FIRST commit (fresh
    // index write) and threw on every one after; each wave here carries
    // 20 docs × 50 fresh terms = 1000 dictionary-delta rows
    for (w <- 1 to 3)
      cat.insert("t", "m", (0 until 20).map { i =>
        val key = if (w > 1 && i < 5) s"k1_$i" else s"k${w}_$i" // churn mix
        EmbeddedVector(key, s"wave $w ${terms(w, i, 50)}", "m", Map(), vec(w * 100 + i))
      })
    assert(cat.load("t", "m").count() == 50) // 20 + 15 + 15 fresh keys
    // the persisted sparse stats still serve searches over wave-3 terms
    val r = cat.search(SearchRequest("t", "m", vec(305), limit = 3,
      hybridSearch = true, textFilter = Some("wave t3_5_0")))
    assert(r.success && r.data.exists(_.content.contains("wave 3")))
  }

  test("position-weighted fingerprints stay exact at the max chunk-contract doc size") {
    import spark.implicits._
    // the worst long-sum case the 60k-char contract admits: ~30k
    // single-char tokens make Σ pos·code largest relative to doc length
    // (code is per-token-bounded; positions grow quadratically). The sums
    // in Dedup.exact / TextAnalysis.fingerprint must stay inside long —
    // ANSI mode turns any overflow into SparkArithmeticException.
    val worst = ("a " * 30000).trim
    val docs = Seq((1L, worst), (2L, "short control doc")).toDF("doc_id", "text")
    val fp = operators.Dedup.exact(docs).collect()
    assert(fp.length == 2 && fp.forall(_.getLong(0) > 0L))
    val tfp = operators.TextAnalysis.fingerprint(docs).collect()
    assert(tfp.length == 2)
  }

  test("a lazy searchDf plan survives an interleaved facade search (scoped release)") {
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_ansi_scope").toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8))
    cat.insert("t", "m", (0 until 30).map(i =>
      EmbeddedVector(s"k$i", s"plain doc $i words", "m", Map(), vec(i))))
    // unindexed collection => the fused scan registers a query broadcast at
    // plan-construction time on this thread
    val lazyPlan = cat.searchDf(SearchRequest("t", "m", vec(3), limit = 5))
    // an eager facade call on the SAME thread must release only ITS OWN
    // broadcasts — before the scoped release, this destroyed lazyPlan's
    // broadcast too, and the count() below failed with a destroyed-broadcast
    // SparkException
    val resp = cat.search(SearchRequest("t", "m", vec(7), limit = 5))
    assert(resp.success)
    assert(lazyPlan.count() == 5, "lazy plan must still evaluate")
    graft.operators.Knn.releaseFusedBroadcasts() // cleanup
  }
}
