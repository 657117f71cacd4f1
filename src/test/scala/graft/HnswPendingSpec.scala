package graft

import graft.api._
import graft.sources.VectorStoreCatalog
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** The HNSW growing-segment pending window (`hnsw_absorb_window`, default
  * 8): inserts append to a durable pending set served brute-force by
  * searches, and one BATCHED absorb folds the window when it fills —
  * per-insert latency drops from a full beam+prune+write cycle to a small
  * parquet append, and the cycle cost amortizes across the window (the
  * reference's backing engine serves growing segments the same way before
  * a seal). Everything here is checked for RESULT EQUALITY against a
  * `hnsw_absorb_window = 1` twin collection (the r15 absorb-per-insert
  * path) on identical insert waves.
  */
// Minutes-long race/crash-window sweeps: excluded from the default
// `sbt test` so the suite fits the driver budget (build.sbt); run with
// GRAFT_SLOW_TESTS=1.
@org.scalatest.tags.Slow
class HnswPendingSpec extends SparkSpec {

  private def mkCatalog(tag: String) = new VectorStoreCatalog(spark,
    Files.createTempDirectory(tag).toString)

  private def vec(seed: Int, dim: Int = 8): Seq[Double] =
    (0 until dim).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)

  private def row(key: String, seed: Int, m: String, tag: String = "v1") =
    EmbeddedVector(key, s"doc $key $tag spark data", m,
      Map("tag" -> tag), vec(seed))

  /** Full-beam facade search: ef past the corpus size makes the beam walk
    * exhaustive, so results are exact top-k and two exact engines must
    * agree bit-for-bit (the q_hnsw_knn oracle trick).
    */
  private def fullBeam(cat: VectorStoreCatalog, t: String, m: String,
      qseed: Int, k: Int = 10): Seq[(Long, Long, String, Double)] =
    cat.searchDfBatch(SearchRequest(t, m, vec(qseed), limit = k,
        ef = Some(8192)), Seq(vec(qseed)))
      .select("qid", "rank", "chunk", "score")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))

  private def pendingDir(cat: VectorStoreCatalog, t: String, m: String) =
    Paths.get(cat.hnswBaseDirOf(t, m)).resolve("_pending")

  /** Seeds + graph build + three 12-row churn waves (replacements with NEW
    * vectors + fresh keys) applied identically to both collections.
    */
  private def churned(cat: VectorStoreCatalog, t: String, m: String,
      window: String): Unit = {
    cat.generateSchema(SchemaSpec(t, m, dimension = 8, indexType = "HNSW",
      extraProps = Map("hnsw_absorb_window" -> window,
        "hnsw_max_absorbs" -> "100000")))
    cat.insert(t, m, (0 until 40).map(i => row(s"k$i", i, m)))
    cat.persistIndex(t, m)
    // replacement seeds 40+j/2 (40..57) and fresh seeds 58+j/2 (58..75):
    // all seeds stay DISTINCT mod 97 (vec collides exactly when seeds are
    // congruent mod 97), so no two stored vectors tie a score
    for (w <- 0 until 3)
      cat.insert(t, m, (0 until 12).map { i =>
        val j = w * 12 + i
        if (j % 2 == 0) row(s"k${j / 2}", 40 + j / 2, m, tag = "v2") // replace
        else row(s"n$j", 58 + j / 2, m) // fresh key, pending-only until fold
      })
  }

  test("pending-window search equals absorb-per-insert on identical churn") {
    val cat = mkCatalog("graft_hpend")
    churned(cat, "t", "w1", window = "1")
    churned(cat, "t", "w8", window = "8") // 3 waves < window: stays pending

    assert(!Files.exists(pendingDir(cat, "t", "w1")),
      "window=1 must keep the r15 absorb-per-insert path (no pending dir)")
    assert(Files.exists(pendingDir(cat, "t", "w8")),
      "window=8 with 3 queued waves must not have folded yet")

    // full-beam equality on: a seed key's neighborhood, a replaced key's
    // NEW vector (the graph twin absorbed it; the pending twin serves it
    // brute-force — seed 40 is k0's v2 vector), and a pending-only fresh
    // key's vector (59 is n3's — self-match)
    for (q <- Seq(3, 40, 59)) {
      val a = fullBeam(cat, "t", "w1", q)
      val b = fullBeam(cat, "t", "w8", q)
      assert(a == b, s"query seed $q diverged: $a vs $b")
    }
    // the pending-only fresh key is its own top hit at its current vector
    val self = fullBeam(cat, "t", "w8", 59)
    assert(self.head._3.contains("n3"), s"pending-only key findable: $self")
  }

  test("window fill folds in ONE batched absorb and clears the pending set") {
    val cat = mkCatalog("graft_hfold")
    churned(cat, "t", "w1", window = "1")
    churned(cat, "t", "w3", window = "3") // 3 waves = window: folds on wave 3

    // the fold is DETACHED (the triggering insert returns immediately;
    // the absorb runs on the rebuild executor) — drain it, the spec's
    // usual sync point
    cat.awaitRebuilds("t", "w3")
    assert(!Files.exists(pendingDir(cat, "t", "w3")),
      "window=3 after 3 waves must have folded and cleared pending")
    // the folded graph serves identically to the absorb-per-insert twin
    for (q <- Seq(3, 40, 59))
      assert(fullBeam(cat, "t", "w3", q) == fullBeam(cat, "t", "w1", q))

    // graph invariants after the batched fold: node set == table keys
    // (replaced keys deduped last-writer-wins, fresh keys present), edges
    // reference only live nodes
    val g = cat.loadHnsw("t", "w3")
    val nodeIds = g.nodes.select("doc_id").collect().map(_.getLong(0)).toSet
    val tableIds = cat.load("t", "w3")
      .select(xxhash64(col("flouds_vector_id"))).collect()
      .map(_.getLong(0)).toSet
    assert(nodeIds == tableIds, "folded node set equals the data table")
    val edgeEnds = g.edges.select("src").union(g.edges.select("dst"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(edgeEnds.subsetOf(nodeIds), "no edge references a dropped node")
  }

  test("hybrid search serves pending rows at their CURRENT vectors") {
    val cat = mkCatalog("graft_hpendhyb")
    churned(cat, "t", "w1", window = "1")
    churned(cat, "t", "w8", window = "8")
    def hybrid(m: String, qseed: Int) =
      cat.searchDfBatch(SearchRequest("t", m, vec(qseed), limit = 5,
          hybridSearch = true, textFilter = Some("spark data")),
          Seq(vec(qseed)))
        .select("qid", "rank", "chunk", "rrf_score")
        .collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    // the hybrid dense leg scores node vectors — the pending overlay must
    // hand it a replaced key's NEW vector and a fresh key's only vector
    for (q <- Seq(3, 40, 59))
      assert(hybrid("w8", q) == hybrid("w1", q), s"hybrid diverged at $q")
  }

  test("pending survives restart; a new instance serves and folds it") {
    val base = Files.createTempDirectory("graft_hpendcrash").toString
    val cat = new VectorStoreCatalog(spark, base)
    churned(cat, "t", "w8", window = "8")
    assert(Files.exists(pendingDir(cat, "t", "w8")))
    val before = fullBeam(cat, "t", "w8", 59)

    // process restart = a fresh catalog instance over the same store
    val cat2 = new VectorStoreCatalog(spark, base)
    assert(fullBeam(cat2, "t", "w8", 59) == before,
      "restarted instance serves the durable pending set")
    // five more waves cross the window (3 queued + 5 = 8) → fold
    for (w <- 3 until 8)
      cat2.insert("t", "w8", (0 until 12).map(i =>
        row(s"x${w * 12 + i}", 300 + w * 12 + i, "w8")))
    cat2.awaitRebuilds("t", "w8") // the fold is detached — drain it
    assert(!Files.exists(pendingDir(cat2, "t", "w8")),
      "crossing the window after restart folds the whole queue")
    val g = cat2.loadHnsw("t", "w8")
    val nodeIds = g.nodes.select("doc_id").collect().map(_.getLong(0)).toSet
    val tableIds = cat2.load("t", "w8")
      .select(xxhash64(col("flouds_vector_id"))).collect()
      .map(_.getLong(0)).toSet
    assert(nodeIds == tableIds, "fold after restart converged the graph")
  }

  test("detached fold: appends and searches racing the fold stay correct; result equals the sync twin") {
    // The fold is detached (r16 verdict #1): park it at its start
    // (RebuildHooks.holdGate), land two more churn waves and run searches
    // while it is parked, then release and drain — every stage must equal
    // the window=1 absorb-per-insert twin on identical churn.
    val cat = mkCatalog("graft_hfoldrace")
    def extraWave(m: String, w: Int): Unit =
      cat.insert("t", m, (0 until 12).map { i =>
        val j = w * 12 + i
        if (j % 2 == 0) row(s"k${j / 2}", 200 + j, m, tag = "v3")
        else row(s"x$j", 300 + j, m)
      })
    churned(cat, "t", "w1", window = "1")
    val gate = new java.util.concurrent.CountDownLatch(1)
    graft.sources.RebuildHooks.holdGate = Some(gate)
    try {
      churned(cat, "t", "w3", window = "3") // wave 3 schedules the fold → parked
      for (w <- 3 until 5) { extraWave("w1", w); extraWave("w3", w) }
      // while the fold is parked, the raced appends serve from pending
      for (q <- Seq(3, 40, 203, 311))
        assert(fullBeam(cat, "t", "w3", q) == fullBeam(cat, "t", "w1", q),
          s"parked-fold search diverged at $q")
    } finally {
      gate.countDown()
      graft.sources.RebuildHooks.holdGate = None
    }
    cat.awaitRebuilds("t", "w3")
    // the fold absorbed its captured window; the raced appends stay queued
    assert(Files.exists(pendingDir(cat, "t", "w3")),
      "appends that raced the fold must remain pending")
    for (q <- Seq(3, 40, 203, 311))
      assert(fullBeam(cat, "t", "w3", q) == fullBeam(cat, "t", "w1", q),
        s"post-fold search diverged at $q")
  }

  test("cross-instance drop/recreate racing a parked fold: the stale fold aborts, the new collection is untouched") {
    // Instance A schedules a fold and parks; instance B (no view of A's
    // in-flight map — the reader-replica shape) drops and recreates the
    // collection and inserts fresh data. A's fold must abort on the
    // creation-epoch/generation guard and leave B's collection exactly as
    // B built it.
    val base = Files.createTempDirectory("graft_hfolddrop").toString
    val catA = new VectorStoreCatalog(spark, base)
    val gate = new java.util.concurrent.CountDownLatch(1)
    graft.sources.RebuildHooks.holdGate = Some(gate)
    try {
      churned(catA, "t", "w3", window = "3") // fold scheduled → parked
      val catB = new VectorStoreCatalog(spark, base)
      catB.dropCollection("t", "w3") // B's drain sees no fold (per-instance)
      catB.generateSchema(SchemaSpec("t", "w3", dimension = 8,
        indexType = "HNSW", extraProps = Map("hnsw_absorb_window" -> "8",
          "hnsw_max_absorbs" -> "100000")))
      catB.insert("t", "w3", (0 until 20).map(i => row(s"f$i", 700 + i, "w3")))
      catB.persistIndex("t", "w3")
      val before = fullBeam(catB, "t", "w3", 705)
      gate.countDown()
      graft.sources.RebuildHooks.holdGate = None
      catA.awaitRebuilds("t", "w3") // stale fold runs to completion (abort)
      assert(fullBeam(catB, "t", "w3", 705) == before,
        "stale fold must not mutate the recreated collection")
      val g = catB.loadHnsw("t", "w3")
      val nodeIds = g.nodes.select("doc_id").collect().map(_.getLong(0)).toSet
      val tableIds = catB.load("t", "w3")
        .select(xxhash64(col("flouds_vector_id"))).collect()
        .map(_.getLong(0)).toSet
      assert(nodeIds == tableIds,
        "recreated collection's graph must contain exactly its own keys")
    } finally {
      gate.countDown()
      graft.sources.RebuildHooks.holdGate = None
    }
  }

  test("pending last-writer-wins survives a reboot-skewed seq") {
    // The pending dir is durable across machine reboots, and nanoTime has
    // an arbitrary per-boot origin: a pre-reboot batch could carry a LARGER
    // seq than a post-reboot replacement, making `_seq desc` serve and fold
    // the stale vector. The append derives seq from the live listing, so a
    // forged batch with a nanoTime-sized seq must still LOSE to the next
    // API append of the same key.
    val base = Files.createTempDirectory("graft_hpendseq").toString
    val cat = new VectorStoreCatalog(spark, base)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, indexType = "HNSW",
      extraProps = Map("hnsw_absorb_window" -> "8",
        "hnsw_max_absorbs" -> "100000")))
    cat.insert("t", "m", (0 until 40).map(i => row(s"k$i", i, "m")))
    cat.persistIndex("t", "m")
    // forge the "pre-reboot" pending batch: key k0 at a STALE vector,
    // stamped with a nanoTime-sized seq (what the pre-fix code wrote)
    val dir = pendingDir(cat, "t", "m")
    Files.createDirectories(dir)
    import spark.implicits._
    val k0Id = Seq("k0").toDF("k").select(xxhash64(col("k")))
      .head.getLong(0)
    val hugeSeq = 1500000000000000000L
    Seq((k0Id, vec(77), hugeSeq)).toDF("doc_id", "dv", "_seq")
      .write.parquet(dir.resolve(s"b${hugeSeq}_r1").toString)
    // "post-reboot": a fresh instance replaces k0 at a NEW vector
    val cat2 = new VectorStoreCatalog(spark, base)
    cat2.insert("t", "m", Seq(row("k0", 60, "m", tag = "v3")))
    val hit = fullBeam(cat2, "t", "m", 60)
    assert(hit.head._3.contains("k0") && hit.head._4 > 0.9999,
      s"replacement must out-order the reboot-skewed stale batch: $hit")
    // ... and the stale vector must no longer score as k0's current vector
    val stale = fullBeam(cat2, "t", "m", 77)
    assert(!(stale.head._3.contains("k0") && stale.head._4 > 0.9999),
      s"stale vector still served for k0: $stale")
  }

  test("synchronous persistIndex clears the pending window it just indexed") {
    val cat = mkCatalog("graft_hpendddl")
    churned(cat, "t", "w8", window = "8")
    assert(Files.exists(pendingDir(cat, "t", "w8")))
    val before = fullBeam(cat, "t", "w8", 40)
    cat.persistIndex("t", "w8") // full rebuild from the CURRENT table
    assert(!Files.exists(pendingDir(cat, "t", "w8")),
      "the full build covers every pending row — the window is clear")
    assert(fullBeam(cat, "t", "w8", 40) == before,
      "full-beam results identical before and after the seal")
  }

  test("junk hnsw knobs degrade to defaults instead of failing the insert") {
    val cat = mkCatalog("graft_hjunk")
    cat.generateSchema(SchemaSpec("t", "junk", dimension = 8,
      indexType = "HNSW", extraProps = Map(
        "hnsw_absorb_window" -> "not-a-number",
        "hnsw_connect_hops" -> "-3",
        "hnsw_pending_max_rows" -> "")))
    cat.insert("t", "junk", (0 until 30).map(i => row(s"k$i", i, "junk")))
    cat.persistIndex("t", "junk")
    // junk window → default 8 → this lands pending; junk hops/rows must
    // not throw when the fold eventually runs the absorb
    cat.insert("t", "junk", Seq(row("k1", 50, "junk", tag = "v2")))
    assert(Files.exists(pendingDir(cat, "t", "junk")))
    val hit = fullBeam(cat, "t", "junk", 50)
    assert(hit.head._3.contains("k1 v2"), s"replacement served: $hit")
    cat.flush("t", "junk") // flush never folds the graph window
    assert(Files.exists(pendingDir(cat, "t", "junk")))
  }

  test("search straddling a fold commit never misses folded rows (r18 snapshot ordering)") {
    // The straddle transient (r17 verdict #6): a fold commits its absorb,
    // then deletes the folded pending batches. A lock-free search that read
    // the two sides in the wrong order — graph resolved BEFORE the commit,
    // pending read (lazily, ignoreMissingFiles) AFTER the deletes — served
    // NEITHER copy of the folded rows for that one request. The fix is
    // reader-side ordering: the pending rows are MATERIALIZED first
    // (validated snapshot), the graph resolved after; fold order is
    // commit-then-delete, so one side always has every row.
    val cat = mkCatalog("graft_hstraddle")
    churned(cat, "t", "w1", window = "1")
    val arrived = new java.util.concurrent.CountDownLatch(1)
    val gate = new java.util.concurrent.CountDownLatch(1)
    graft.sources.RebuildHooks.foldCommitArrived = Some(arrived)
    graft.sources.RebuildHooks.foldCommitGate = Some(gate)
    val lazyPend = try {
      churned(cat, "t", "w3", window = "3") // wave 3 schedules the fold
      // fold parked BETWEEN its absorb commit and the batch deletes —
      // graph already contains the folded rows, pending dirs still live.
      // NOTE: no facade search can be issued inside this window — the
      // commit intent is armed until the fold's commit scope exits, so a
      // NEW request's healIfTorn probe serializes behind the lock (that
      // probe is why only requests whose probe PREDATES the arm can
      // straddle — exactly the readers the snapshot ordering protects).
      assert(arrived.await(120, java.util.concurrent.TimeUnit.SECONDS),
        "fold never reached the commit/delete window")
      // the OLD reader shape, captured inside the window exactly as a
      // pre-arm request would have: a lazy ignoreMissingFiles scan over
      // the listed batch dirs (what pendingHnswVecs served before r18's
      // materialized snapshot)
      val parts = VectorStoreCatalog.listChildren(pendingDir(cat, "t", "w3"))
        .filter(_.getFileName.toString.startsWith("b"))
      spark.read.option("ignoreMissingFiles", "true")
        .schema("doc_id LONG, dv ARRAY<DOUBLE>, _seq LONG")
        .parquet(parts.map(_.toString): _*)
    } finally {
      gate.countDown()
      graft.sources.RebuildHooks.foldCommitArrived = None
      graft.sources.RebuildHooks.foldCommitGate = None
    }
    cat.awaitRebuilds("t", "w3") // deletes ran; pending set is folded away
    // the old lazy shape silently loses every folded row after the deletes
    // — the demonstrated miss mechanism the snapshot ordering closes
    assert(lazyPend.count() == 0,
      "expected the lazily-read pending leg to lose its rows post-delete")
    // ... while the facade (snapshot-then-graph) still serves everything
    for (q <- Seq(3, 40, 59))
      assert(fullBeam(cat, "t", "w3", q) == fullBeam(cat, "t", "w1", q),
        s"post-fold search diverged at $q")
  }
}
