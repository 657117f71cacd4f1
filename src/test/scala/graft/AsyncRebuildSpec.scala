package graft

import graft.api._
import graft.sources.{RebuildHooks, VectorStoreCatalog}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import java.util.concurrent.CountDownLatch

/** The r12 async rebuild contract (r11 verdict item 2 + the staged-publish
  * advice): crossing `ivf_max_absorbs` / `hnsw_max_absorbs` SCHEDULES the
  * full rebuild instead of inlining it in the triggering insert's commit
  * scope. Asserted here:
  *  - the triggering insert returns while the build is provably not even
  *    started (parked at [[RebuildHooks.holdGate]]) — the O(batch) claim
  *    without a flaky timing assertion;
  *  - inserts that land while the build runs keep the OLD generation exact
  *    (served immediately) and are replayed from the backlog into the NEW
  *    generation before its publish — including key REPLACEMENTS, with no
  *    duplicate doc_ids surviving;
  *  - rebuild state (marker, backlog) is cleared on publish and the absorb
  *    counter restarts at the number of replayed batches;
  *  - a concurrent lock-free reader crossing the whole retrain publish
  *    never crashes (the r11 verdict's racing-searcher gap).
  */
class AsyncRebuildSpec extends SparkSpec {

  private def avec(seed: Int): Seq[Double] =
    (0 until 8).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
  private def bvec(seed: Int): Seq[Double] = avec(seed).map(_ + 1000.0)

  test("IVF: triggering insert returns with the build held; backlog replays into the published index") {
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_async_ivf").toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, nlist = 4,
      extraProps = Map("ivf_max_absorbs" -> "1")))
    cat.insert("t", "m", (0 until 100).map(i =>
      EmbeddedVector(s"a$i", s"adoc $i", "m", Map(), avec(i))))
    cat.persistIndex("t", "m")
    val centroidsBefore = cat.loadIndex("t", "m").centroids.collect()
      .map(r => r.getSeq[Double](r.fieldIndex("center")).toVector).toSet

    val gate = new CountDownLatch(1)
    RebuildHooks.holdGate = Some(gate)
    try {
      // absorb 1 (counter -> 1), then the threshold crossing: the insert
      // must RETURN while the build is still parked at the gate
      cat.insert("t", "m", (0 until 10).map(i =>
        EmbeddedVector(s"b$i", s"bdoc $i", "m", Map(), bvec(i))))
      cat.insert("t", "m", (10 until 20).map(i =>
        EmbeddedVector(s"b$i", s"bdoc $i", "m", Map(), bvec(i))))
      assert(cat.ivfAbsorbCount("t", "m") == 0,
        "threshold crossing must schedule + reset, not inline the retrain")
      // the triggering batch serves from the old generation immediately
      val pre = cat.search(SearchRequest("t", "m", bvec(15), limit = 1))
      assert(pre.success && pre.data.head.content == "bdoc 15")

      // churn WHILE the build is held: a fresh key and a REPLACEMENT of a
      // key the build's snapshot will also contain. Seeds 50/60: the avec
      // lattice has period 97 in seed space (131·Δseed ≡ 0 mod 97 ⇔
      // Δseed ≡ 0 mod 97), so any seed ≡ 0..39 (mod 97) would DUPLICATE an
      // existing vector and tie at cosine 1.0
      cat.insert("t", "m", Seq(
        EmbeddedVector("c0", "cdoc 0", "m", Map(), bvec(50)),
        EmbeddedVector("b5", "bdoc 5 v2", "m", Map(), bvec(60))))
      val mid = cat.search(SearchRequest("t", "m", bvec(60), limit = 1))
      assert(mid.success && mid.data.head.content == "bdoc 5 v2",
        "backlogged churn must serve from the old generation right away")
    } finally {
      gate.countDown()
      RebuildHooks.holdGate = None
    }
    cat.awaitRebuilds("t", "m")

    // the retrain actually re-ran KMeans over the merged distribution
    val centroidsAfter = cat.loadIndex("t", "m").centroids.collect()
      .map(r => r.getSeq[Double](r.fieldIndex("center")).toVector).toSet
    assert(centroidsAfter != centroidsBefore, "retrain must move centroids")

    // backlog landed in the NEW index: fresh key, replaced key at its new
    // vector, and no duplicate doc_ids anywhere
    val fresh = cat.search(SearchRequest("t", "m", bvec(50), limit = 1))
    assert(fresh.success && fresh.data.head.content == "cdoc 0")
    val repl = cat.search(SearchRequest("t", "m", bvec(60), limit = 1))
    assert(repl.success && repl.data.head.content == "bdoc 5 v2")
    val dupes = cat.loadIndex("t", "m").clustered
      .groupBy("doc_id").agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    assert(dupes == 0, "backlog replay must not leave duplicate doc_ids")

    // rebuild state cleared; counter = replayed batches (1)
    assert(cat.ivfAbsorbCount("t", "m") == 1,
      "replayed backlog batches are residual absorb debt")
    val idxDir = Paths.get(cat.tableDir("t", "m").toString, "index")
    assert(!Files.exists(idxDir.resolve("_retrain_inflight.json")))
    assert(!Files.exists(idxDir.resolve("_retrain_backlog")))

    // the detached build ran in the low-weight fair-scheduler pool (the
    // hook captured the rebuild THREAD's pool property; under the test
    // session's FIFO mode the property is set but inert)
    assert(RebuildHooks.observedPool.contains("graftRebuild"),
      s"rebuild ran outside the graftRebuild pool: ${RebuildHooks.observedPool}")
  }

  test("HNSW: detached rebuild absorbs the backlog into the staged graph before publish") {
    def vec(seed: Int): Seq[Double] = avec(seed)
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_async_hnsw").toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, indexType = "HNSW",
      // window=1: these tests pin the ABSORB/REBUILD machinery per insert;
      // the r16 growing-segment default regime is HnswPendingSpec
      extraProps = Map("hnsw_max_absorbs" -> "1", "hnsw_absorb_window" -> "1")))
    cat.insert("t", "m", (0 until 40).map(i =>
      EmbeddedVector(s"k$i", s"chunk $i", "m", Map(), vec(i))))
    cat.persistIndex("t", "m")

    val gate = new CountDownLatch(1)
    RebuildHooks.holdGate = Some(gate)
    try {
      cat.insert("t", "m", Seq(EmbeddedVector("n0", "new 0", "m", Map(), vec(50))))
      // threshold crossing: schedules, returns with the build parked
      cat.insert("t", "m", Seq(EmbeddedVector("n1", "new 1", "m", Map(), vec(51))))
      val pre = cat.search(SearchRequest("t", "m", vec(51), limit = 3))
      assert(pre.success && pre.data.head.content == "new 1",
        "triggering batch must serve from the old graph immediately")
      // backlog churn: fresh key + replacement
      // seed 60: ≢ any existing seed mod 97 (the lattice's seed period)
      cat.insert("t", "m", Seq(
        EmbeddedVector("n2", "new 2", "m", Map(), vec(52)),
        EmbeddedVector("k7", "chunk 7 v2", "m", Map(), vec(60))))
      val mid = cat.search(SearchRequest("t", "m", vec(60), limit = 3))
      assert(mid.success && mid.data.head.content == "chunk 7 v2")
    } finally {
      gate.countDown()
      RebuildHooks.holdGate = None
    }
    cat.awaitRebuilds("t", "m")

    // the published graph serves the backlog (fresh + replaced at new vec)
    val fresh = cat.search(SearchRequest("t", "m", vec(52), limit = 3))
    assert(fresh.success && fresh.data.head.content == "new 2")
    val repl = cat.search(SearchRequest("t", "m", vec(60), limit = 3))
    assert(repl.success && repl.data.head.content == "chunk 7 v2")
    val d = Paths.get(cat.hnswBaseDirOf("t", "m"))
    assert(!Files.exists(d.resolve("_rebuild_inflight.json")))
    assert(!Files.exists(d.resolve("_rebuild_backlog")))
    // one replayed batch of residual debt
    val counter = """"count"\s*:\s*"(\d+)"""".r
      .findFirstMatchIn(Files.readString(d.resolve("_absorbs.json")))
      .map(_.group(1).toInt).getOrElse(-1)
    assert(counter == 1, s"replayed backlog batches are residual debt, got $counter")
  }

  /** r13 (advisor, high) / r14 (verdict task 2): phase 1 used to read the
    * LIVE data table with `ignoreMissingFiles` — files listed then unlinked
    * by concurrent bucket swaps / delta folds were silently skipped, so
    * bystander rows (present at schedule time, absent from the backlog)
    * vanished from the published generation. The build input is now a
    * FILE-MANIFEST pin taken under the collection lock at schedule time,
    * with deferred deletes: a commit that retires a pinned bucket
    * generation keeps its aside alive (zero copies) and the pinned reader
    * resolves through the relocation. Simulated at the adversarial worst:
    * while the build is parked, ENGINE churn rewrites EVERY bucket (so
    * every pinned generation is retired to an aside), then every
    * still-live data file is raw-deleted — only the pin's retained
    * generations keep the schedule-time rows readable.
    */
  import scala.jdk.CollectionConverters._

  /** Raw-delete live parquet under `root`, sparing `_aside_*` trees — those
    * are the pin's retained generations (deleting them would simulate a
    * storage FAULT, which the loud-abort contract covers, not churn).
    */
  private def deleteLiveParquetUnder(root: java.nio.file.Path): Unit = {
    val s = Files.walk(root)
    try s.iterator().asScala.toList
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet") &&
        !p.toString.contains("_aside_"))
      .foreach(Files.delete(_))
    finally s.close()
  }

  /** One fresh key per `_bucket` (driver-side hash twin), so an insert of
    * these rewrites EVERY bucket directory.
    */
  private def allBucketKeys(cat: VectorStoreCatalog, prefix: String,
      nBuckets: Int): Seq[String] =
    (0L until nBuckets.toLong).map { b =>
      Iterator.from(0).map(i => s"$prefix$i")
        .find(k => cat.bucketOfKey(k, nBuckets) == b).get
    }

  test("IVF: the rebuild input is pinned — full-bucket churn + vanished live files cannot drop bystander rows") {
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_snap_ivf").toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, nlist = 4,
      extraProps = Map("ivf_max_absorbs" -> "1")))
    cat.insert("t", "m", (0 until 100).map(i =>
      EmbeddedVector(s"a$i", s"adoc $i", "m", Map(), avec(i))))
    cat.persistIndex("t", "m")
    val gate = new CountDownLatch(1)
    RebuildHooks.holdGate = Some(gate)
    try {
      cat.insert("t", "m", (0 until 10).map(i =>
        EmbeddedVector(s"b$i", s"bdoc $i", "m", Map(), bvec(i))))
      cat.insert("t", "m", (10 until 20).map(i =>
        EmbeddedVector(s"b$i", s"bdoc $i", "m", Map(), bvec(i))))
      val td = cat.tableDir("t", "m")
      val snapRoot = Files.list(td).iterator().asScala
        .find(_.getFileName.toString.startsWith("_tmp_snap_"))
      assert(snapRoot.isDefined, "schedule must pin a snapshot of the row storage")
      assert(Files.exists(snapRoot.get.resolve("manifest.json")),
        "the pin records a file manifest, not copied bytes")
      // churn EVERY bucket through the engine (each pinned generation is
      // retired to its aside), then unlink every still-live data file
      val keys = allBucketKeys(cat, "z", 16)
      cat.insert("t", "m", keys.zipWithIndex.map { case (k, i) =>
        EmbeddedVector(k, s"zdoc $i", "m", Map(), bvec(100 + i)) })
      deleteLiveParquetUnder(td.resolve("data"))
    } finally {
      gate.countDown()
      RebuildHooks.holdGate = None
    }
    cat.awaitRebuilds("t", "m")
    val ids = cat.loadIndex("t", "m").clustered.select("doc_id").distinct().count()
    assert(ids == 136,
      s"published generation must hold all 120 schedule-time rows + 16 backlog rows, got $ids")
    val leftovers = Files.walk(cat.tableDir("t", "m")).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("_tmp_snap_") || n.startsWith("_retained_") ||
        n.startsWith("_aside_"))
      .toList
    assert(leftovers.isEmpty,
      s"pin storage must be released after the rebuild, found $leftovers")
  }

  test("HNSW: the rebuild input is pinned — full-bucket churn + vanished live files cannot drop bystander nodes") {
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_snap_hnsw").toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, indexType = "HNSW",
      // window=1: these tests pin the ABSORB/REBUILD machinery per insert;
      // the r16 growing-segment default regime is HnswPendingSpec
      extraProps = Map("hnsw_max_absorbs" -> "1", "hnsw_absorb_window" -> "1")))
    cat.insert("t", "m", (0 until 40).map(i =>
      EmbeddedVector(s"k$i", s"chunk $i", "m", Map(), avec(i))))
    cat.persistIndex("t", "m")
    val gate = new CountDownLatch(1)
    RebuildHooks.holdGate = Some(gate)
    try {
      cat.insert("t", "m", Seq(EmbeddedVector("n0", "new 0", "m", Map(), avec(50))))
      cat.insert("t", "m", Seq(EmbeddedVector("n1", "new 1", "m", Map(), avec(51))))
      val keys = allBucketKeys(cat, "z", 16)
      cat.insert("t", "m", keys.zipWithIndex.map { case (k, i) =>
        EmbeddedVector(k, s"zdoc $i", "m", Map(), avec(60 + i)) })
      deleteLiveParquetUnder(cat.tableDir("t", "m").resolve("data"))
    } finally {
      gate.countDown()
      RebuildHooks.holdGate = None
    }
    cat.awaitRebuilds("t", "m")
    val nodes = cat.loadHnsw("t", "m").nodes.select("doc_id").distinct().count()
    assert(nodes == 58,
      s"published graph must hold all 42 schedule-time nodes + 16 backlog nodes, got $nodes")
  }

  test("dropCollection drains an in-flight rebuild; the dropped dir stays gone") {
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_drop_rebuild").toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, nlist = 4,
      extraProps = Map("ivf_max_absorbs" -> "1")))
    cat.insert("t", "m", (0 until 60).map(i =>
      EmbeddedVector(s"a$i", s"adoc $i", "m", Map(), avec(i))))
    cat.persistIndex("t", "m")
    val gate = new CountDownLatch(1)
    RebuildHooks.holdGate = Some(gate)
    try {
      cat.insert("t", "m", (0 until 5).map(i =>
        EmbeddedVector(s"b$i", s"bdoc $i", "m", Map(), bvec(i))))
      cat.insert("t", "m", (5 until 10).map(i =>
        EmbeddedVector(s"b$i", s"bdoc $i", "m", Map(), bvec(i))))
      // drop while the rebuild is parked: it must DRAIN (block) rather than
      // delete under a build whose publish would resurrect index dirs
      val dropper = new Thread(() => cat.dropCollection("t", "m"), "dropper")
      dropper.start()
      dropper.join(1500)
      assert(dropper.isAlive, "drop must drain the in-flight rebuild first")
      gate.countDown()
      dropper.join(120000)
      assert(!dropper.isAlive, "drop must complete once the rebuild drains")
    } finally {
      gate.countDown()
      RebuildHooks.holdGate = None
    }
    assert(!Files.exists(cat.tableDir("t", "m")),
      "no ghost index/graph dirs may survive a drop that raced a rebuild")
  }

  test("backlog pressure gate: an over-threshold backlog makes the next insert await") {
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_backpressure").toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, nlist = 4,
      extraProps = Map("ivf_max_absorbs" -> "2")))
    cat.insert("t", "m", (0 until 60).map(i =>
      EmbeddedVector(s"a$i", s"adoc $i", "m", Map(), avec(i))))
    cat.persistIndex("t", "m")
    val backlog = Paths.get(cat.tableDir("t", "m").toString,
      "index", "_retrain_backlog")
    def backlogBatches: Int =
      if (!Files.exists(backlog)) 0
      else Files.list(backlog).iterator().asScala
        .count(_.getFileName.toString.startsWith("b"))
    val gate = new CountDownLatch(1)
    RebuildHooks.holdGate = Some(gate)
    try {
      (0 until 3).foreach(j => cat.insert("t", "m", (0 until 4).map(i =>
        EmbeddedVector(s"b${j}_$i", s"bdoc $j $i", "m", Map(), bvec(j * 4 + i)))))
      // rebuild parked; two more batches land in the backlog = the threshold
      (3 until 5).foreach(j => cat.insert("t", "m", (0 until 4).map(i =>
        EmbeddedVector(s"b${j}_$i", s"bdoc $j $i", "m", Map(), bvec(j * 4 + i)))))
      assert(backlogBatches == 2, s"expected 2 backlogged batches, got $backlogBatches")
      // the NEXT insert is over the gate: it must await the rebuild (release
      // the gate from the side so the await can finish)
      new Thread(() => { Thread.sleep(500); gate.countDown() }, "releaser").start()
      cat.insert("t", "m", Seq(
        EmbeddedVector("c0", "cdoc 0", "m", Map(), bvec(40))))
      assert(backlogBatches == 0,
        "the gated insert must have awaited the rebuild (backlog consumed)")
    } finally {
      gate.countDown()
      RebuildHooks.holdGate = None
    }
    cat.awaitRebuilds("t", "m")
    val hit = cat.search(SearchRequest("t", "m", bvec(40), limit = 1))
    assert(hit.success && hit.data.head.content == "cdoc 0")
  }

  test("backlog_pressure_mode = reject answers with flow control instead of blocking") {
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_backpressure429").toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, nlist = 4,
      extraProps = Map("ivf_max_absorbs" -> "2",
        "backlog_pressure_mode" -> "reject")))
    cat.insert("t", "m", (0 until 60).map(i =>
      EmbeddedVector(s"a$i", s"adoc $i", "m", Map(), avec(i))))
    cat.persistIndex("t", "m")
    val gate = new CountDownLatch(1)
    RebuildHooks.holdGate = Some(gate)
    try {
      (0 until 3).foreach(j => cat.insert("t", "m", (0 until 4).map(i =>
        EmbeddedVector(s"b${j}_$i", s"bdoc $j $i", "m", Map(), bvec(j * 4 + i)))))
      (3 until 5).foreach(j => cat.insert("t", "m", (0 until 4).map(i =>
        EmbeddedVector(s"b${j}_$i", s"bdoc $j $i", "m", Map(), bvec(j * 4 + i)))))
      // over the gate: the insert must NOT block on the parked rebuild —
      // it answers back-pressure immediately (429/retry_after shape)
      val t0 = System.nanoTime()
      val e = intercept[graft.api.BacklogPressureException] {
        cat.insert("t", "m", Seq(
          EmbeddedVector("c0", "cdoc 0", "m", Map(), bvec(40))))
      }
      assert((System.nanoTime() - t0) / 1e9 < 5.0,
        "reject mode must answer immediately, not await the rebuild")
      assert(e.family == "ivf" && e.retryAfterSec > 0)
    } finally {
      gate.countDown()
      RebuildHooks.holdGate = None
    }
    // after the rebuild drains, the same insert goes through
    cat.awaitRebuilds("t", "m")
    cat.insert("t", "m", Seq(
      EmbeddedVector("c0", "cdoc 0", "m", Map(), bvec(40))))
    val hit = cat.search(SearchRequest("t", "m", bvec(40), limit = 1))
    assert(hit.success && hit.data.head.content == "cdoc 0")
  }

  /** r13 advisor (medium): a rebuild scheduled between dropCollection's
    * drain and its locked delete survives the drop; if the collection is
    * recreated under the same name, a bare existence check passes and the
    * stale rebuild would publish a generation built against the OLD
    * incarnation into the new collection (destroying its fresh index and
    * resetting its counters). Phase 2 now matches the creation epoch
    * captured at schedule time. Simulated at the exact window: the rebuild
    * is parked BETWEEN phase 1 and phase 2, the table dir is deleted (the
    * racing drop's locked delete, observationally), and the collection is
    * recreated with fresh rows + a fresh index before the publish resumes.
    */
  test("a same-name recreated collection never receives a stale rebuild's publish") {
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_epoch_guard").toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, nlist = 4,
      extraProps = Map("ivf_max_absorbs" -> "1")))
    cat.insert("t", "m", (0 until 100).map(i =>
      EmbeddedVector(s"a$i", s"adoc $i", "m", Map(), avec(i))))
    cat.persistIndex("t", "m")
    val arrived = new CountDownLatch(1)
    val gate = new CountDownLatch(1)
    RebuildHooks.publishArrived = Some(arrived)
    RebuildHooks.publishGate = Some(gate)
    try {
      cat.insert("t", "m", (0 until 10).map(i =>
        EmbeddedVector(s"b$i", s"bdoc $i", "m", Map(), bvec(i))))
      cat.insert("t", "m", (10 until 20).map(i =>
        EmbeddedVector(s"b$i", s"bdoc $i", "m", Map(), bvec(i))))
      assert(arrived.await(120, java.util.concurrent.TimeUnit.SECONDS),
        "rebuild must reach the publish window")
      // the racing drop's locked delete, then a same-name recreation
      VectorStoreCatalog.deleteRec(cat.tableDir("t", "m"))
      cat.generateSchema(SchemaSpec("t", "m", dimension = 8, nlist = 4))
      cat.insert("t", "m", (0 until 50).map(i =>
        EmbeddedVector(s"f$i", s"fresh $i", "m", Map(), avec(i))))
      cat.persistIndex("t", "m")
    } finally {
      gate.countDown()
      RebuildHooks.publishArrived = None
      RebuildHooks.publishGate = None
    }
    cat.awaitRebuilds("t", "m")
    // the recreated collection's index is intact: exactly its own 50 rows,
    // served correctly — the stale generation was never published into it
    val ids = cat.loadIndex("t", "m").clustered.select("doc_id").distinct().count()
    assert(ids == 50,
      s"recreated collection must keep its own 50-row index, got $ids")
    val hit = cat.search(SearchRequest("t", "m", avec(7), limit = 1))
    assert(hit.success && hit.data.head.content == "fresh 7")
  }

  test("a lock-free reader searching across the whole retrain publish never crashes") {
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_async_race").toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, nlist = 4,
      extraProps = Map("ivf_max_absorbs" -> "1")))
    cat.insert("t", "m", (0 until 100).map(i =>
      EmbeddedVector(s"a$i", s"adoc $i", "m", Map(), avec(i))))
    cat.persistIndex("t", "m")

    @volatile var stop = false
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    var served = 0
    val reader = new Thread(() => {
      while (!stop)
        try {
          val r = cat.search(SearchRequest("t", "m", avec(3), limit = 1))
          // r14 (generation pointer): an index publish is ONE atomic
          // pointer PUT and a request resolves the root once, so a reader
          // racing the publish sees exactly one COMPLETE generation — and
          // both generations are exact for key a3, so every successful
          // response must return the true nearest hit ("adoc 3"), never a
          // mixed-generation score. (Pre-pointer this spec only asserted
          // "never crashes".) The DATA table's lock-free bucket-swap
          // windows can still surface a transient undercount as the
          // reference's "No vectors found" response.
          assert(r.success ||
            r.message == "No vectors found for the given query.", r.message)
          if (r.success) {
            assert(r.data.head.content == "adoc 3",
              s"mixed-generation read: got '${r.data.head.content}'")
            served += 1
          }
        } catch { case t: Throwable => failures.add(t); stop = true }
    }, "racing-searcher")
    reader.start()
    try {
      // drift churn crossing the threshold (async retrain + publish), then
      // two explicit synchronous retrains — the reader crosses the staged
      // publish's rename windows in both modes
      cat.insert("t", "m", (0 until 20).map(i =>
        EmbeddedVector(s"b$i", s"bdoc $i", "m", Map(), bvec(i))))
      cat.insert("t", "m", (20 until 40).map(i =>
        EmbeddedVector(s"b$i", s"bdoc $i", "m", Map(), bvec(i))))
      cat.awaitRebuilds("t", "m")
      cat.persistIndex("t", "m")
      cat.persistIndex("t", "m")
    } finally {
      stop = true
      reader.join(30000)
    }
    assert(failures.isEmpty, s"reader crashed across a publish: ${failures.peek()}")
    assert(served > 0, "the reader must actually have raced the publishes")
    // settled state: exact again
    val hit = cat.search(SearchRequest("t", "m", bvec(25), limit = 1))
    assert(hit.success && hit.data.head.content == "bdoc 25")
  }

  /** r14 (verdict finding 4 / r15 task 3): pin lifetime on daemon crash.
    * Pins are instance-scoped BY DESIGN — a crashed rebuild daemon takes
    * its in-memory pins with it, leaving `_tmp_snap_*` manifest roots,
    * `_retained_*` delta slots and kept `_aside_*` generations on disk.
    * This was argued (VectorStoreCatalog snapshot scaladoc: all three are
    * debris classes vacuum/healAsides already sweep) but never specced.
    * Asserted here end-to-end: a restarted catalog (fresh instance, no
    * live pins) sweeps ALL crashed-pin debris, every committed row keeps
    * serving, a subsequent explicit rebuild runs clean over the swept
    * state — and if the crashed daemon's parked build ever resumes, the
    * vanished-pinned-file contract aborts it LOUDLY instead of letting it
    * publish from a partial snapshot.
    */
  test("crashed-pin debris is swept on restart; live table and the next rebuild are unharmed") {
    val dir = Files.createTempDirectory("graft_pin_crash").toString
    val cat = new VectorStoreCatalog(spark, dir)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, nlist = 4,
      extraProps = Map("ivf_max_absorbs" -> "1", "ingest_mode" -> "delta")))
    cat.insert("t", "m", (0 until 100).map(i =>
      EmbeddedVector(s"a$i", s"adoc $i", "m", Map(), avec(i))))
    cat.persistIndex("t", "m")
    val gate = new CountDownLatch(1)
    RebuildHooks.holdGate = Some(gate)
    val td = cat.tableDir("t", "m")
    def debris(): List[String] = {
      val s = Files.walk(td)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("_tmp_snap_") || n.startsWith("_retained_") ||
          n.startsWith("_aside_")).toList
      finally s.close()
    }
    try {
      // two absorbed batches cross ivf_max_absorbs=1: the second SCHEDULES
      // the detached retrain, which pins the manifest and parks at the gate
      cat.insert("t", "m", (0 until 10).map(i =>
        EmbeddedVector(s"b$i", s"bdoc $i", "m", Map(), bvec(i))))
      cat.insert("t", "m", (10 until 20).map(i =>
        EmbeddedVector(s"b$i", s"bdoc $i", "m", Map(), bvec(i))))
      // fold the pinned delta commits → `_retained_*` slots; the fold's
      // bucket rewrites retire pinned bucket generations to kept asides
      cat.flush("t", "m")
      val before = debris()
      assert(before.exists(_.startsWith("_tmp_snap_")),
        s"schedule must have pinned a snapshot root, got $before")
      assert(before.exists(_.startsWith("_retained_")),
        s"the fold must have retained the pinned delta dirs, got $before")
      // "crash": the daemon and its in-memory pins die; a fresh catalog
      // over the same directory is the restarted process
      val cat2 = new VectorStoreCatalog(spark, dir)
      cat2.vacuum("t", "m")
      assert(debris().isEmpty,
        s"restart vacuum must sweep crashed-pin debris, found ${debris()}")
      // live table unharmed: rows from every committed batch still serve
      val hitA = cat2.search(SearchRequest("t", "m", avec(7), limit = 1))
      assert(hitA.success && hitA.data.head.content == "adoc 7", s"got $hitA")
      val hitB = cat2.search(SearchRequest("t", "m", bvec(15), limit = 1))
      assert(hitB.success && hitB.data.head.content == "bdoc 15", s"got $hitB")
      // a fresh explicit rebuild over the swept state runs clean and exact
      cat2.persistIndex("t", "m")
      val ids = cat2.loadIndex("t", "m").clustered
        .select("doc_id").distinct().count()
      assert(ids == 120, s"rebuilt index must hold all 120 rows, got $ids")
    } finally {
      gate.countDown()
      RebuildHooks.holdGate = None
    }
    // the crashed daemon's parked build resumes against the swept debris:
    // its pinned files are gone, and the loud-abort contract must hold —
    // a silent publish from a partial snapshot is the failure mode
    intercept[RuntimeException] { cat.awaitRebuilds("t", "m") }
    // the abort discarded its staged state without touching the live index
    val cat3 = new VectorStoreCatalog(spark, dir)
    val hit3 = cat3.search(SearchRequest("t", "m", avec(7), limit = 1))
    assert(hit3.success && hit3.data.head.content == "adoc 7", s"got $hit3")
  }
}
