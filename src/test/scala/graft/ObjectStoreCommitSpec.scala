package graft

import graft.api._
import graft.sources.{AtomicFs, CrashHooks, FsOps, ObjectStoreSimFs, SparseIndex, VectorStoreCatalog}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path}

/** Object-store commit safety (r9 verdict item 4).
  *
  * Object stores have NO atomic directory rename: a "move" is per-object
  * copy-then-delete, and only a single-object PUT is atomic. The catalog's
  * commit protocols therefore run behind the [[FsOps]] seam with a
  * publish-marker discipline (markers written last, deleted first), and
  * [[VectorStoreCatalog.healAsides]] restores the last complete generation
  * of any slot whose swap tore.
  *
  * Coverage strategy, two layers:
  *  - EXHAUSTIVE at the protocol level: swapDir / moveAndPublish under
  *    [[ObjectStoreSimFs]] crashed at EVERY object-op window (file trees
  *    only — no Spark jobs — so all windows run in milliseconds). After
  *    each crash + heal, the slot holds exactly the old or the new
  *    generation, published, with no debris.
  *  - END-TO-END through the catalog: a real insert (data buckets + BM25
  *    sparse commit [+ IVF cells]) crashed at sampled windows across the
  *    whole schedule, then the `_commit_intent` heal + at-least-once
  *    replay must converge to the crash-free twin. Windows are sampled
  *    because each carries multiple Spark jobs; the protocol beneath every
  *    window is the exhaustively-swept one above.
  */
// Minutes-long race/crash-window sweeps: excluded from the default
// `sbt test` so the suite fits the driver budget (build.sbt); run with
// GRAFT_SLOW_TESTS=1.
@org.scalatest.tags.Slow
class ObjectStoreCommitSpec extends SparkSpec {

  private def withFs[T](f: FsOps)(body: => T): T = {
    val was = VectorStoreCatalog.fs
    VectorStoreCatalog.fs = f
    try body finally VectorStoreCatalog.fs = was
  }

  // ---- protocol-level exhaustive sweeps ----

  private def mkTree(dir: Path, tag: String, publish: Boolean): Unit = {
    Files.createDirectories(dir)
    Seq("a.parquet", "b.parquet").foreach(f =>
      Files.write(dir.resolve(f), s"$tag/$f".getBytes("UTF-8")))
    if (publish) Files.write(dir.resolve("_pub"), Array.emptyByteArray)
  }

  private def content(dir: Path): Set[String] =
    VectorStoreCatalog.listChildren(dir)
      .filterNot(_.getFileName.toString.startsWith("_"))
      .map(p => new String(Files.readAllBytes(p), "UTF-8")).toSet

  test("swapDir: crash at EVERY object-op window -> heal restores old or new generation, published, no debris") {
    // measure the clean schedule length first
    val countRoot = Files.createTempDirectory("oss_count")
    val counter = new ObjectStoreSimFs()
    withFs(counter) {
      mkTree(countRoot.resolve("slot"), "old", publish = true)
      mkTree(countRoot.resolve("slot_tmp"), "new", publish = false)
      VectorStoreCatalog.swapDir(countRoot.resolve("slot_tmp"), countRoot.resolve("slot"))
    }
    val n = counter.ops
    assert(n > 6, s"schedule suspiciously short ($n ops)")

    var rollbacks = 0; var completions = 0
    for (b <- 0L until n) {
      val root = Files.createTempDirectory(s"oss_swap_$b")
      val slot = root.resolve("slot"); val tmp = root.resolve("slot_tmp")
      mkTree(slot, "old", publish = true)
      mkTree(tmp, "new", publish = false)
      withFs(new ObjectStoreSimFs(budget = b)) {
        intercept[CrashHooks.InjectedCrash] {
          VectorStoreCatalog.swapDir(tmp, slot)
        }
      }
      withFs(new ObjectStoreSimFs()) { // heal under object-store semantics too
        VectorStoreCatalog.healAsides(root)
      }
      val c = content(slot)
      val old = Set("old/a.parquet", "old/b.parquet")
      val neu = Set("new/a.parquet", "new/b.parquet")
      assert(c == old || c == neu, s"window $b: torn slot content $c")
      if (c == old) rollbacks += 1 else completions += 1
      assert(AtomicFs.isPublished(slot), s"window $b: healed slot unpublished")
      assert(!VectorStoreCatalog.listChildren(root).exists(
        _.getFileName.toString.startsWith("_aside_")),
        s"window $b: aside debris survived the heal")
    }
    // both outcomes must actually occur across the schedule
    assert(rollbacks > 0 && completions > 0,
      s"sweep degenerate: $rollbacks rollbacks, $completions completions over $n windows")
  }

  test("swapDir under POSIX renames: the between-renames crash window restores via the published aside") {
    // atomic mode's one multi-op sequence: publish(dst), move dst->aside,
    // move src->dst, publish(dst), delete aside. Crash between the two
    // moves used to strand the old generation in a vacuum-doomed aside.
    val root = Files.createTempDirectory("oss_posix")
    val slot = root.resolve("slot"); val tmp = root.resolve("slot_tmp")
    mkTree(slot, "old", publish = true)
    mkTree(tmp, "new", publish = false)
    val aside = slot.resolveSibling("_aside_slot_12345")
    Files.move(slot, aside) // the state exactly between the two renames
    VectorStoreCatalog.healAsides(root)
    assert(content(slot) == Set("old/a.parquet", "old/b.parquet"),
      "stranded published aside must roll back in")
    assert(AtomicFs.isPublished(slot))
  }

  test("moveAndPublish: crash at every window leaves the commit invisible to readers") {
    val countRoot = Files.createTempDirectory("oss_mp_count")
    val counter = new ObjectStoreSimFs()
    withFs(counter) {
      mkTree(countRoot.resolve("tmp"), "new", publish = false)
      counter.ops // force init
      VectorStoreCatalog.fs.moveAndPublish(countRoot.resolve("tmp"), countRoot.resolve("d000001"))
    }
    val n = counter.ops
    for (b <- 0L until n) {
      val root = Files.createTempDirectory(s"oss_mp_$b")
      mkTree(root.resolve("tmp"), "new", publish = false)
      withFs(new ObjectStoreSimFs(budget = b)) {
        intercept[CrashHooks.InjectedCrash] {
          VectorStoreCatalog.fs.moveAndPublish(root.resolve("tmp"), root.resolve("d000001"))
        }
      }
      val fin = root.resolve("d000001")
      assert(!AtomicFs.isPublished(fin),
        s"window $b: torn append visible as published")
    }
    // the clean run IS published
    assert(AtomicFs.isPublished(countRoot.resolve("d000001")))
  }

  // ---- end-to-end catalog scenarios ----

  private def vec(seed: Int): Seq[Double] =
    (0 until 4).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)

  private def docs(r: Range): Seq[EmbeddedVector] = r.map(i =>
    EmbeddedVector(s"k$i", s"alpha beta doc$i tail${i % 5}", "m",
      Map("g" -> s"c${i % 3}"), vec(i)))

  private def mkCat(dir: Path): VectorStoreCatalog = {
    val cat = new VectorStoreCatalog(spark, dir.toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 4, nlist = 2,
      extraProps = Map("n_buckets" -> "2")))
    cat
  }

  private def rows(cat: VectorStoreCatalog): Set[(String, String)] =
    cat.load("t", "m").select("flouds_vector_id", "chunk").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet

  private def assertSparseMatchesData(cat: VectorStoreCatalog): Unit = {
    val stored = SparseIndex.read(spark, cat.sparseDirOf("t", "m"))
    val exp = graft.operators.Bm25.fit(cat.load("t", "m").select(
      xxhash64(col("flouds_vector_id")).as("doc_id"), col("chunk").as("text")))
    def s(df: org.apache.spark.sql.DataFrame, cs: String*) =
      df.select(cs.map(col): _*).collect().map(_.toSeq).toSet
    assert(s(stored.tf, "doc_id", "term", "tf") == s(exp.tf, "doc_id", "term", "tf"))
    assert(s(stored.global, "n", "sumdl") == s(exp.global, "n", "sumdl"))
  }

  /** Crash an overlapping second insert at object-op window `b`, then heal
    * + replay and compare against the crash-free twin.
    */
  private def e2eWindow(b: Long, indexed: Boolean): Unit = {
    val cat = mkCat(Files.createTempDirectory(s"oss_e2e_$b"))
    withFs(new ObjectStoreSimFs()) {
      cat.insert("t", "m", docs(0 until 12))
      if (indexed) cat.persistIndex("t", "m")
    }
    val crashed = withFs(new ObjectStoreSimFs(budget = b)) {
      try { cat.insert("t", "m", docs(8 until 20)); false }
      catch { case _: CrashHooks.InjectedCrash => true }
    }
    withFs(new ObjectStoreSimFs()) {
      if (crashed) {
        // consistency BEFORE replay: reads heal and serve; every surviving
        // row is a valid old or new version (at-least-once partial batch)
        val r = rows(cat)
        val valid = (docs(0 until 12) ++ docs(8 until 20)).map(d => (d.key, d.chunk)).toSet
        assert(r.subsetOf(valid), s"window $b: read served rows outside old∪new: ${r -- valid}")
        assert(docs(0 until 8).forall(d => r.contains((d.key, d.chunk))),
          s"window $b: rows outside the crashed batch were lost")
        assert(!Files.exists(cat.commitIntentPath("t", "m")),
          s"window $b: read did not heal the torn commit")
        assertSparseMatchesData(cat)
      }
      cat.insert("t", "m", docs(8 until 20)) // at-least-once replay
      if (indexed) {
        // clustered table must equal assign(data, stored centroids)
        val idx = cat.loadIndex("t", "m")
        val expected = graft.operators.Ivf.assign(
          cat.load("t", "m").select(xxhash64(col("flouds_vector_id")).as("doc_id"),
            col("vector").as("dv")), idx.centroids, idx.metric)
        def s(df: org.apache.spark.sql.DataFrame) =
          df.select("doc_id", "centroid_id").collect().map(_.toSeq).toSet
        assert(s(idx.clustered) == s(expected), s"window $b: clustered != assign(data)")
      }
    }
    val twinDir = Files.createTempDirectory(s"oss_twin_$b")
    val twin = mkCat(twinDir)
    twin.insert("t", "m", docs(0 until 12))
    if (indexed) twin.persistIndex("t", "m")
    twin.insert("t", "m", docs(8 until 20))
    assert(rows(cat) == rows(twin), s"window $b: healed+replayed state diverges from twin")
    val q = SearchRequest("t", "m", vec(9), limit = 6, hybridSearch = true,
      textFilter = Some("alpha"))
    assert(cat.search(q).data.map(_.content) == twin.search(q).data.map(_.content),
      s"window $b: search results diverge from twin")
  }

  test("e2e: merge-mode insert crashed across the object-op schedule heals and converges") {
    // measure the schedule, then sample windows across all of it: the very
    // first op, early/mid/late spread, and the last two ops
    val probeCat = mkCat(Files.createTempDirectory("oss_probe"))
    val probe = new ObjectStoreSimFs()
    withFs(probe) {
      probeCat.insert("t", "m", docs(0 until 12))
      val before = probe.ops
      probeCat.insert("t", "m", docs(8 until 20))
      val n = probe.ops - before
      assert(n > 10, s"schedule suspiciously short ($n)")
      info(s"merge-mode commit schedule: $n object ops")
      val windows = Set(0L, 1L, n / 5, 2 * n / 5, n / 2, 3 * n / 5, 4 * n / 5,
        n - 2, n - 1).filter(b => b >= 0 && b < n)
      withFs(AtomicFs) { windows.toSeq.sorted.foreach(b => e2eWindow(b, indexed = false)) }
    }
  }

  test("e2e: IVF-indexed insert crashed mid-schedule keeps cells consistent after heal+replay") {
    val probeCat = mkCat(Files.createTempDirectory("oss_probe_ivf"))
    val probe = new ObjectStoreSimFs()
    withFs(probe) {
      probeCat.insert("t", "m", docs(0 until 12))
      probeCat.persistIndex("t", "m")
      val before = probe.ops
      probeCat.insert("t", "m", docs(8 until 20))
      val n = probe.ops - before
      info(s"indexed commit schedule: $n object ops")
      withFs(AtomicFs) {
        Seq(1L, n / 2, n - 1).foreach(b => e2eWindow(b, indexed = true))
      }
    }
  }

  test("lock-free readers never fail during copy-then-delete commit churn; state converges") {
    // the ConcurrentServingSpec claim under OBJECT-STORE semantics, where
    // the reader-visible swap window is wider (per-object deletes + copies
    // instead of two renames): `ignoreMissingFiles` still turns every race
    // into a transient undercount, never an exception, and a reader that
    // stats an armed intent marker blocks on the collection lock until the
    // commit finishes (then finds nothing to heal)
    import scala.jdk.CollectionConverters._
    val cat = mkCat(Files.createTempDirectory("oss_conc"))
    withFs(new ObjectStoreSimFs()) {
      cat.insert("t", "m", docs(0 until 24))
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      @volatile var stop = false
      val readers = (0 until 2).map { r =>
        new Thread(() => {
          while (!stop) {
            try {
              val n = cat.load("t", "m").count()
              assert(n >= 0 && n <= 32)
              val resp = cat.search(SearchRequest("t", "m", vec(3 + r),
                limit = 3, hybridSearch = true, textFilter = Some("alpha")))
              assert(resp != null)
            } catch { case t: Throwable => errors.add(t); stop = true }
          }
        }, s"oss-reader-$r")
      }
      readers.foreach(_.start())
      for (i <- 0 until 6)
        cat.insert("t", "m", docs((i % 3) * 4 until (i % 3) * 4 + 12))
      stop = true
      readers.foreach(_.join(30000))
      assert(errors.isEmpty,
        s"reader failures under object-store churn: ${errors.asScala.take(3).map(_.toString)}")
      assert(rows(cat) == docs(0 until 24).map(d => (d.key, d.chunk)).toSet)
    }
  }

  test("legacy pre-marker delta commits are backfill-published, not dropped or vacuumed") {
    // a delta dir written by pre-r10 code has no _pub marker; under POSIX
    // renames it is COMPLETE — readers must backfill-publish it (silently
    // dropping it would lose rows, and vacuum would then delete them)
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("oss_legacy").toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 4, nlist = 2,
      extraProps = Map("n_buckets" -> "2", "ingest_mode" -> "delta")))
    cat.insert("t", "m", docs(0 until 6))
    // simulate the legacy on-disk state: strip the publish markers
    val deltaRoot = cat.tableDir("t", "m").resolve("_delta")
    val pending = VectorStoreCatalog.listChildren(deltaRoot)
      .filter(Files.isDirectory(_))
    assert(pending.nonEmpty)
    pending.foreach(d => Files.deleteIfExists(d.resolve("_pub")))
    assert(rows(cat).size == 6, "legacy unpublished delta rows must surface")
    assert(pending.forall(AtomicFs.isPublished),
      "reader must backfill-publish complete legacy commits")
    cat.vacuum("t", "m")
    assert(rows(cat).size == 6, "vacuum must not sweep backfilled commits")
  }

  test("vacuum preserves a published aside whose canonical slot is unpublished (heal input)") {
    val cat = mkCat(Files.createTempDirectory("oss_vacuum"))
    cat.insert("t", "m", docs(0 until 6))
    // fabricate the torn-swap state on a real slot: canonical unpublished
    // (torn copy), aside published (the last complete generation)
    val dataRoot = cat.tableDir("t", "m").resolve("data")
    val part = VectorStoreCatalog.listChildren(dataRoot)
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("part="))
      .head
    val slot = VectorStoreCatalog.listChildren(part)
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("_bucket="))
      .head
    val aside = slot.resolveSibling("_aside_" + slot.getFileName + "_99")
    AtomicFs.copyTree(slot, aside)
    AtomicFs.publish(aside)
    Files.deleteIfExists(slot.resolve("_pub"))
    cat.vacuum("t", "m")
    assert(Files.exists(aside),
      "vacuum deleted the only complete generation of a torn slot")
    // the heal then restores it
    VectorStoreCatalog.healAsides(cat.tableDir("t", "m"))
    assert(!Files.exists(aside) && AtomicFs.isPublished(slot))
    assert(rows(cat).size == 6)
    // once the canonical is published again, a stale aside IS debris
    val debris = slot.resolveSibling("_aside_" + slot.getFileName + "_100")
    AtomicFs.copyTree(slot, debris)
    assert(cat.vacuum("t", "m") >= 1)
    assert(!Files.exists(debris))
  }

  test("e2e dedup index: upsert crashed mid-schedule under copy-then-delete heals and converges") {
    import org.apache.spark.sql.DataFrame
    import graft.sources.DedupIndex
    def corpus(r: Range): DataFrame = {
      import spark.implicits._
      r.map(i => (i.toLong, s"shared words alpha beta doc$i tail${i % 4}")).toDF("doc_id", "text")
    }
    def sigRows(dir: String): Set[Seq[Any]] =
      spark.read.parquet(s"$dir/sig").drop("_bucket")
        .collect().map(_.toSeq).toSet
    // measure the upsert schedule
    val probeDir = Files.createTempDirectory("oss_dd_probe").toString
    val probe = new ObjectStoreSimFs()
    val n = withFs(probe) {
      DedupIndex.build(corpus(0 until 24), probeDir, nBuckets = 4)
      val before = probe.ops
      DedupIndex.upsert(spark, probeDir, corpus(20 until 32), nBuckets = 4)
      probe.ops - before
    }
    info(s"dedup upsert schedule: $n object ops")
    for (b <- Seq(0L, n / 3, 2 * n / 3, n - 1).filter(_ >= 0).distinct) {
      val dir = Files.createTempDirectory(s"oss_dd_$b").toString
      withFs(new ObjectStoreSimFs()) {
        DedupIndex.build(corpus(0 until 24), dir, nBuckets = 4)
      }
      val crashed = withFs(new ObjectStoreSimFs(budget = b)) {
        try { DedupIndex.upsert(spark, dir, corpus(20 until 32), nBuckets = 4); false }
        catch { case _: CrashHooks.InjectedCrash => true }
      }
      withFs(new ObjectStoreSimFs()) {
        // a read heals (torn swaps restored, bands re-derived) and serves
        DedupIndex.queryBatch(spark, dir, corpus(100 until 104), nBuckets = 4).collect()
        if (crashed) DedupIndex.upsert(spark, dir, corpus(20 until 32), nBuckets = 4)
      }
      val twinDir = Files.createTempDirectory(s"oss_ddtwin_$b").toString
      DedupIndex.build(corpus(0 until 24), twinDir, nBuckets = 4)
      DedupIndex.upsert(spark, twinDir, corpus(20 until 32), nBuckets = 4)
      assert(sigRows(dir) == sigRows(twinDir),
        s"window $b: healed+replayed sig table diverges from twin")
      def q(d: String) = DedupIndex.queryBatch(spark, d, corpus(28 until 36), nBuckets = 4)
        .select("query_id", "match_id").collect().map(_.toSeq).toSet
      assert(q(dir) == q(twinDir), s"window $b: query results diverge from twin")
    }
  }

  test("e2e delta mode: every append window leaves the commit invisible; replay converges") {
    val probeCat = {
      val cat = new VectorStoreCatalog(spark,
        Files.createTempDirectory("oss_delta_probe").toString)
      cat.generateSchema(SchemaSpec("t", "m", dimension = 4, nlist = 2,
        extraProps = Map("n_buckets" -> "2", "ingest_mode" -> "delta")))
      cat
    }
    val probe = new ObjectStoreSimFs()
    val n = withFs(probe) {
      probeCat.insert("t", "m", docs(0 until 10))
      probeCat.flush("t", "m")
      val before = probe.ops
      probeCat.insert("t", "m", docs(8 until 16))
      probe.ops - before
    }
    info(s"delta append schedule: $n object ops")
    // the append protocol itself is exhaustively swept at the unit level
    // (moveAndPublish test above); here sample the WHOLE-insert schedule —
    // data append + sparse commit interleavings — at spread windows, each
    // asserting the reader-visibility property end to end
    val windows = (Set(0L, 1L, n - 2, n - 1) ++
      (0L until n by math.max(1L, n / 8))).filter(b => b >= 0 && b < n)
    for (b <- windows.toSeq.sorted) {
      val cat = new VectorStoreCatalog(spark,
        Files.createTempDirectory(s"oss_delta_$b").toString)
      cat.generateSchema(SchemaSpec("t", "m", dimension = 4, nlist = 2,
        extraProps = Map("n_buckets" -> "2", "ingest_mode" -> "delta")))
      withFs(new ObjectStoreSimFs()) {
        cat.insert("t", "m", docs(0 until 10))
        cat.flush("t", "m")
      }
      val crashed = withFs(new ObjectStoreSimFs(budget = b)) {
        try { cat.insert("t", "m", docs(8 until 16)); false }
        catch { case _: CrashHooks.InjectedCrash => true }
      }
      withFs(new ObjectStoreSimFs()) {
        if (crashed) {
          val r = rows(cat)
          val preOnly = docs(0 until 10).map(d => (d.key, d.chunk)).toSet
          val post = (docs(0 until 8) ++ docs(8 until 16)).map(d => (d.key, d.chunk)).toSet
          // delta commits are all-or-nothing for READERS: the batch is one
          // published dir — either entirely invisible or entirely applied
          // (stronger than merge mode's per-bucket tearing)
          assert(r == preOnly || r == post,
            s"window $b: delta append partially visible: $r")
        }
        cat.insert("t", "m", docs(8 until 16))
        val expect = (docs(0 until 8) ++ docs(8 until 16)).map(d => (d.key, d.chunk)).toSet
        assert(rows(cat) == expect, s"window $b: replay did not converge")
      }
    }
  }

  test("e2e HNSW pending append: crash across the move windows is all-or-nothing; replay converges") {
    // The pending append is tmp-write + moveAndPublish: a torn
    // copy-then-delete move must leave the WHOLE batch invisible to the
    // brute-force pending overlay (never a partial file subset), and
    // at-least-once replay converges. Windows are swept from the op count
    // at the `hnsw.beforePendingMove` hook (everything earlier is the
    // data/sparse schedule, covered by the merge-mode e2e).
    def mkPend(dir: Path): VectorStoreCatalog = {
      val cat = new VectorStoreCatalog(spark, dir.toString)
      cat.generateSchema(SchemaSpec("t", "m", dimension = 4, nlist = 2,
        indexType = "HNSW", extraProps = Map("n_buckets" -> "2",
          "hnsw_absorb_window" -> "8", "hnsw_max_absorbs" -> "100000")))
      cat
    }
    // replacement batch: k0/k1 at NEW vectors (seeds 60/61 — distinct mod
    // 97 from every seed vector, so a 1.0-cosine hit at newVec(i) proves
    // the pending overlay serves that key's new vector)
    def newBatch = Seq(
      EmbeddedVector("k0", "alpha beta doc0 tail0", "m", Map("g" -> "c0"), vec(60)),
      EmbeddedVector("k1", "alpha beta doc1 tail1", "m", Map("g" -> "c1"), vec(61)))
    def servedAtNew(cat: VectorStoreCatalog): Seq[Boolean] =
      Seq(("k0", 60), ("k1", 61)).map { case (k, s) =>
        val top = cat.searchDfBatch(SearchRequest("t", "m", vec(s), limit = 1,
            ef = Some(8192)), Seq(vec(s)))
          .select("chunk", "score").collect().head
        top.getString(0).contains(k.replace("k", "doc")) && top.getDouble(1) > 0.9999
      }
    // probe: op count at the append hook
    val probeCat = mkPend(Files.createTempDirectory("oss_pend_probe"))
    val probe = new ObjectStoreSimFs()
    val hookOps = withFs(probe) {
      probeCat.insert("t", "m", docs(0 until 12))
      probeCat.persistIndex("t", "m")
      CrashHooks.arm("hnsw.beforePendingMove")
      try { probeCat.insert("t", "m", newBatch); fail("hook did not fire") }
      catch { case _: CrashHooks.InjectedCrash => () }
      CrashHooks.disarm()
      probe.ops
    }
    info(s"pending-append hook at object op $hookOps")
    var pastSchedule = false
    for (b <- hookOps until (hookOps + 10) if !pastSchedule) {
      val cat = mkPend(Files.createTempDirectory(s"oss_pend_$b"))
      withFs(new ObjectStoreSimFs()) {
        cat.insert("t", "m", docs(0 until 12))
        cat.persistIndex("t", "m")
      }
      val crashed = withFs(new ObjectStoreSimFs(budget = b)) {
        try { cat.insert("t", "m", newBatch); false }
        catch { case _: CrashHooks.InjectedCrash => true }
      }
      if (!crashed) pastSchedule = true
      else withFs(new ObjectStoreSimFs()) {
        val served = servedAtNew(cat)
        assert(served == Seq(true, true) || served == Seq(false, false),
          s"window $b: pending append partially visible: $served")
        cat.insert("t", "m", newBatch) // at-least-once replay
        assert(servedAtNew(cat) == Seq(true, true),
          s"window $b: replay did not converge")
      }
    }
    assert(pastSchedule, "budget sweep never ran past the append schedule")
  }

  test("racing writers on two collections sharing a tenant dir: crash, heal, both converge") {
    // Two mutators on DIFFERENT collections take different locks, so their
    // commit protocols genuinely interleave on the shared object store (one
    // global op counter). A crash kills the whole process — both writers —
    // at a nondeterministic point of the combined schedule; after heal +
    // at-least-once replay BOTH collections must equal their crash-free
    // twins, and a collection whose writer finished before the crash must
    // already be correct pre-replay (no cross-collection corruption).
    def docsFor(m: String, r: Range): Seq[EmbeddedVector] = r.map(i =>
      EmbeddedVector(s"$m-k$i", s"alpha beta $m doc$i tail${i % 5}", m,
        Map("g" -> s"c${i % 3}"), vec(i + (if (m == "m2") 40 else 0))))
    def mkCat2(dir: Path): VectorStoreCatalog = {
      val cat = new VectorStoreCatalog(spark, dir.toString)
      Seq("m1", "m2").foreach(m => cat.generateSchema(SchemaSpec("t", m,
        dimension = 4, nlist = 2, extraProps = Map("n_buckets" -> "2"))))
      cat
    }
    def rowsOf(cat: VectorStoreCatalog, m: String): Set[(String, String)] =
      cat.load("t", m).select("flouds_vector_id", "chunk").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    def raceInsert(cat: VectorStoreCatalog): Map[String, Boolean] = {
      val crashed = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
      val threads = Seq("m1", "m2").map { m =>
        new Thread(() => {
          try { cat.insert("t", m, docsFor(m, 6 until 16)); crashed.put(m, false) }
          catch { case _: CrashHooks.InjectedCrash => crashed.put(m, true) }
        }, s"racer-$m")
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      import scala.jdk.CollectionConverters._
      crashed.asScala.toMap
    }
    // probe the combined two-writer schedule length
    val probe = new ObjectStoreSimFs()
    val n = withFs(probe) {
      val cat = mkCat2(Files.createTempDirectory("oss_race_probe"))
      Seq("m1", "m2").foreach(m => cat.insert("t", m, docsFor(m, 0 until 10)))
      val before = probe.ops
      raceInsert(cat)
      probe.ops - before
    }
    info(s"racing two-writer schedule: $n object ops")
    assert(n > 10, s"combined schedule suspiciously short ($n)")
    val twins: Map[String, Set[(String, String)]] = {
      val twin = mkCat2(Files.createTempDirectory("oss_race_twin"))
      Seq("m1", "m2").map { m =>
        twin.insert("t", m, docsFor(m, 0 until 10))
        twin.insert("t", m, docsFor(m, 6 until 16))
        m -> rowsOf(twin, m)
      }.toMap
    }
    for (b <- Seq(1L, n / 4, n / 2, 3 * n / 4, n - 1).distinct.filter(_ >= 0)) {
      val cat = mkCat2(Files.createTempDirectory(s"oss_race_$b"))
      withFs(new ObjectStoreSimFs()) {
        Seq("m1", "m2").foreach(m => cat.insert("t", m, docsFor(m, 0 until 10)))
      }
      val crashed = withFs(new ObjectStoreSimFs(budget = b)) { raceInsert(cat) }
      withFs(new ObjectStoreSimFs()) {
        Seq("m1", "m2").foreach { m =>
          if (crashed.get(m).contains(false))
            // this writer committed before the shared-store crash: its
            // collection must already be complete — the OTHER collection's
            // torn commit must not have touched it
            assert(rowsOf(cat, m) == twins(m),
              s"window $b: uncrashed $m corrupted by the other writer's crash")
          else {
            // crashed mid-commit: surviving rows are valid old∪new versions
            // and reads heal (marker cleared by first access)
            val r = rowsOf(cat, m)
            val valid = (docsFor(m, 0 until 10) ++ docsFor(m, 6 until 16))
              .map(d => (d.key, d.chunk)).toSet
            assert(r.subsetOf(valid), s"window $b: $m rows outside old∪new")
            assert(docsFor(m, 0 until 6).forall(d => r.contains((d.key, d.chunk))),
              s"window $b: $m lost rows outside the crashed batch")
          }
          cat.insert("t", m, docsFor(m, 6 until 16)) // at-least-once replay
          assert(rowsOf(cat, m) == twins(m),
            s"window $b: $m diverges from its crash-free twin after replay")
          assert(!Files.exists(cat.commitIntentPath("t", m)),
            s"window $b: $m left an armed intent after heal+replay")
        }
      }
    }
  }

  /** r14 (verdict task 2): the rebuild's input pin must hold under
    * object-store semantics too — the r13 hard-link snapshot bypassed the
    * [[FsOps]] seam and would have byte-copied the whole table here. The
    * manifest pin's retention (kept asides for retired bucket generations,
    * `_retained_*` slots for folded pinned deltas) runs entirely through
    * the seam: this scenario churns BOTH — delta-mode inserts fold pending
    * (pinned) delta commits and rewrite (pinned) bucket dirs while the
    * build is parked — and the published generation must still hold every
    * schedule-time row plus the backlog.
    */
  test("rebuild pin under object-store semantics: bucket + delta-fold churn during the build") {
    def vec(seed: Int): Seq[Double] =
      (0 until 8).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
    withFs(new ObjectStoreSimFs()) {
      val cat = new VectorStoreCatalog(spark,
        Files.createTempDirectory("oss_pin").toString)
      cat.generateSchema(SchemaSpec("t", "m", dimension = 8, nlist = 4,
        extraProps = Map("ivf_max_absorbs" -> "3", "ingest_mode" -> "delta",
          "max_delta_files" -> "2")))
      // seed in three delta commits — the auto-fold leaves bucket dirs AND
      // a pending-delta mix behind, both of which the pin must list
      for (g <- 0 until 3)
        cat.insert("t", "m", (0 until 20).map(i =>
          EmbeddedVector(s"a${g}_$i", s"adoc $g $i", "m", Map(),
            vec(g * 20 + i))))
      cat.persistIndex("t", "m")
      val gate = new java.util.concurrent.CountDownLatch(1)
      graft.sources.RebuildHooks.holdGate = Some(gate)
      try {
        // three absorbs reach the threshold; the fourth schedules (pin
        // taken under ITS commit scope, with its delta still pending)
        for (g <- 0 until 4)
          cat.insert("t", "m", (0 until 5).map(i =>
            EmbeddedVector(s"b${g}_$i", s"bdoc $g $i", "m", Map(),
              vec(500 + g * 5 + i))))
        // churn while parked: two more delta commits push pending past
        // max_delta_files — the fold rewrites pinned bucket dirs (retired
        // to kept asides) and retires the pinned pending deltas
        // c seeds 860..867 ≡ 84..91 (mod 97) — the vec lattice has period
        // 97 in seed space, and residues 84..91 collide with no a/b seed,
        // so the exact-match spot check below cannot tie across keys
        for (g <- 0 until 2)
          cat.insert("t", "m", (0 until 4).map(i =>
            EmbeddedVector(s"c${g}_$i", s"cdoc $g $i", "m", Map(),
              vec(860 + g * 4 + i))))
      } finally {
        gate.countDown()
        graft.sources.RebuildHooks.holdGate = None
      }
      cat.awaitRebuilds("t", "m")
      val ids = cat.loadIndex("t", "m").clustered
        .select("doc_id").distinct().count()
      assert(ids == 88,
        s"published generation must hold 60 seed + 20 absorbed + 8 backlog rows, got $ids")
      // pin storage fully released
      import scala.jdk.CollectionConverters._
      val leftovers = Files.walk(cat.tableDir("t", "m")).iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("_tmp_snap_") || n.startsWith("_retained_"))
        .toList
      assert(leftovers.isEmpty, s"pin storage must be released, found $leftovers")
      // and the merged view itself is exact
      val hit = cat.search(SearchRequest("t", "m", vec(863), limit = 1))
      assert(hit.success && hit.data.head.content == "cdoc 0 3")
    }
  }

  /** r14 (verdict task 3): an index publish is ONE atomic pointer PUT —
    * there are no longer per-table renames to crash between. The remaining
    * windows are around the flip itself: crash BEFORE it leaves the old
    * generation current and the staged one as vacuum-sweepable `gen_*`
    * debris; crash AFTER it (mid-cleanup) leaves the NEW generation
    * current with old generations as debris. Both under copy-then-delete
    * object-store semantics, both must keep readers exact and converge on
    * the next explicit build.
    */
  test("generation publish: crash before/after the pointer flip leaves readers on one complete generation") {
    def vec(seed: Int): Seq[Double] =
      (0 until 8).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
    withFs(new ObjectStoreSimFs()) {
      val cat = new VectorStoreCatalog(spark,
        Files.createTempDirectory("oss_genflip").toString)
      cat.generateSchema(SchemaSpec("t", "m", dimension = 8, nlist = 4))
      cat.insert("t", "m", (0 until 50).map(i =>
        EmbeddedVector(s"a$i", s"adoc $i", "m", Map(), vec(i))))
      cat.persistIndex("t", "m") // legacy -> gen flip (clean)
      def served(): Unit = {
        val r = cat.search(SearchRequest("t", "m", vec(7), limit = 1))
        assert(r.success && r.data.head.content == "adoc 7", s"got $r")
      }
      served()
      for (point <- Seq("gen.beforeFlip", "gen.afterFlip")) {
        CrashHooks.arm(point)
        try intercept[CrashHooks.InjectedCrash] { cat.persistIndex("t", "m") }
        finally CrashHooks.disarm()
        // whichever side of the flip crashed, reads resolve ONE complete
        // generation and stay exact
        served()
        // convergence: the next build publishes cleanly and vacuum clears
        // every unreferenced generation
        cat.persistIndex("t", "m")
        served()
        cat.vacuum("t", "m")
        import scala.jdk.CollectionConverters._
        val base = cat.tableDir("t", "m").resolve("index")
        val gens = Files.list(base).iterator().asScala
          .map(_.getFileName.toString).filter(_.startsWith("gen_")).toList
        assert(gens.size <= 2,
          s"$point: vacuum must clear unreferenced generations, found $gens")
      }
    }
  }

  /** r14 (verdict finding 3 / r15 task 6): retention kept exactly
    * current+prev, so a reader that resolved the pointer and then
    * straddled TWO publishes read deleted files. With the
    * `spark.graft.gen.retention.ms` floor set, the grandparent is
    * demote-stamped at flip time instead of deleted, stays fully readable
    * for a long-tail reader holding its resolved root, survives vacuum
    * inside the window, and is swept once it ages out.
    */
  test("generation retention floor: a resolved root survives two publishes") {
    def vec(seed: Int): Seq[Double] =
      (0 until 8).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("gen_retention").toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, nlist = 4))
    cat.insert("t", "m", (0 until 40).map(i =>
      EmbeddedVector(s"a$i", s"adoc $i", "m", Map(), vec(i))))
    spark.conf.set("spark.graft.gen.retention.ms", "3600000")
    try {
      cat.persistIndex("t", "m") // legacy → gen A
      val rootA = cat.denseRoot("t", "m") // the long-tail reader's resolved root
      assert(rootA.getFileName.toString.startsWith("gen_"), s"got $rootA")
      cat.persistIndex("t", "m") // gen B (A = prev, still pointer-referenced)
      cat.persistIndex("t", "m") // gen C (A = grandparent → stamped, retained)
      assert(cat.denseRoot("t", "m") != rootA)
      // the straddling reader's generation is intact and readable
      assert(Files.exists(rootA.resolve("_demoted.json")),
        "inside the floor the grandparent must be demote-stamped, not deleted")
      val n = spark.read
        .schema("centroid_id INT, doc_id LONG, dv ARRAY<DOUBLE>")
        .parquet(rootA.resolve("clustered").toString).count()
      assert(n == 40, s"retained generation must stay readable, got $n rows")
      // vacuum honors the floor...
      cat.vacuum("t", "m")
      assert(Files.exists(rootA.resolve("centroids")),
        "vacuum must not sweep a generation inside its retention window")
      // ...and sweeps once the window passes (floor dropped to 0)
      spark.conf.set("spark.graft.gen.retention.ms", "0")
      cat.vacuum("t", "m")
      assert(!Files.exists(rootA), "aged-out demoted generation must be swept")
      // serving never blinked
      val hit = cat.search(SearchRequest("t", "m", vec(7), limit = 1))
      assert(hit.success && hit.data.head.content == "adoc 7")
    } finally spark.conf.unset("spark.graft.gen.retention.ms")
  }

  /** r15 advisor (medium): the generation-pointer cache is per-INSTANCE,
    * and a second catalog over the same basePath (the reader-replica
    * shape) has no hook into the writer's flip. After two flips the
    * reader's cached root names a DELETED gen dir, and
    * `ignoreMissingFiles` would turn that into silently EMPTY results.
    * The cache therefore re-validates two ways: a TTL
    * (`spark.graft.gen.cache.ttl.ms`) bounds ordinary staleness, and a
    * missing-root fallback re-reads the pointer IMMEDIATELY when the
    * resolved dir is gone. This test pins the fallback with the TTL
    * maxed out (the cache alone must not save the reader), then the TTL
    * path with ttl=0 (pre-cache behavior: every resolution re-reads).
    */
  test("genCache cross-instance: reader observes another instance's flips; vanished cached root never serves empty") {
    def vec(seed: Int): Seq[Double] =
      (0 until 8).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
    val base = Files.createTempDirectory("gen_xinst").toString
    val writer = new VectorStoreCatalog(spark, base)
    writer.generateSchema(SchemaSpec("t", "m", dimension = 8, nlist = 4))
    writer.insert("t", "m", (0 until 40).map(i =>
      EmbeddedVector(s"a$i", s"adoc $i", "m", Map(), vec(i))))
    def served(cat: VectorStoreCatalog): Unit = {
      val r = cat.search(SearchRequest("t", "m", vec(7), limit = 1))
      assert(r.success && r.data.head.content == "adoc 7", s"got $r")
    }
    spark.conf.set("spark.graft.gen.cache.ttl.ms", Long.MaxValue.toString)
    try {
      writer.persistIndex("t", "m") // legacy → gen A
      val reader = new VectorStoreCatalog(spark, base)
      served(reader) // reader caches gen A
      writer.persistIndex("t", "m") // gen B (A = prev, on disk)
      writer.persistIndex("t", "m") // gen C (A DELETED)
      // reader's cached root is gone — the fallback must re-read the
      // pointer and serve, not return an empty result set
      served(reader)
      assert(reader.denseRoot("t", "m") == writer.denseRoot("t", "m"),
        "after the fallback both instances resolve the same generation")
      // ttl=0 = re-read every resolution: ONE flip (old root still on
      // disk as prev, so the fallback never fires) is observed at once
      spark.conf.set("spark.graft.gen.cache.ttl.ms", "0")
      writer.persistIndex("t", "m") // gen D (C = prev, still on disk)
      assert(reader.denseRoot("t", "m") == writer.denseRoot("t", "m"),
        "ttl=0 reader must observe a flip whose old root still exists")
      served(reader)
    } finally spark.conf.unset("spark.graft.gen.cache.ttl.ms")
  }

  /** r15 advisor (low): demote-stamped generations were only swept by an
    * explicit vacuum() — with a retention floor set and no periodic
    * vacuum, stamped gen dirs (full index copies) accumulated unboundedly
    * across rebuilds. Flips now sweep aged-out stamped generations
    * opportunistically. Also pins the stamp-before-PUT ordering: a crash
    * exactly between the pointer PUT and any post-PUT stamping would
    * leave the grandparent unstamped-unreferenced (vacuum bait inside the
    * floor) — so the stamp must land BEFORE the flip becomes visible.
    */
  test("flip-time sweep of aged-out stamped generations; stamp lands before the pointer PUT") {
    def vec(seed: Int): Seq[Double] =
      (0 until 8).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("gen_flipsweep").toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, nlist = 4))
    cat.insert("t", "m", (0 until 40).map(i =>
      EmbeddedVector(s"a$i", s"adoc $i", "m", Map(), vec(i))))
    import scala.jdk.CollectionConverters._
    def gens: List[String] = {
      val base = cat.tableDir("t", "m").resolve("index")
      Files.list(base).iterator().asScala
        .map(_.getFileName.toString).filter(_.startsWith("gen_")).toList
    }
    spark.conf.set("spark.graft.gen.retention.ms", "3600000")
    try {
      cat.persistIndex("t", "m") // gen A
      val rootA = cat.denseRoot("t", "m")
      cat.persistIndex("t", "m") // gen B
      // crash AFTER the pointer PUT of flip 3: the stamp protecting gen A
      // must ALREADY be on disk (stamp-before-PUT), else a restart vacuum
      // sweeps A inside the floor
      CrashHooks.arm("gen.afterFlip")
      try intercept[CrashHooks.InjectedCrash] { cat.persistIndex("t", "m") }
      finally CrashHooks.disarm()
      assert(Files.exists(rootA.resolve("_demoted.json")),
        "grandparent must be demote-stamped BEFORE the pointer PUT")
      cat.vacuum("t", "m")
      assert(Files.exists(rootA.resolve("centroids")),
        "restart vacuum honors the pre-PUT stamp inside the floor")
      // stamped generations accumulate while the floor holds...
      cat.persistIndex("t", "m")
      assert(gens.size > 2, s"floor retains stamped generations: $gens")
      // ...and the NEXT FLIP (no vacuum call) sweeps the aged-out ones
      spark.conf.set("spark.graft.gen.retention.ms", "0")
      cat.persistIndex("t", "m")
      assert(gens.size <= 2,
        s"flip must sweep aged-out stamped generations, found $gens")
      val hit = cat.search(SearchRequest("t", "m", vec(7), limit = 1))
      assert(hit.success && hit.data.head.content == "adoc 7")
    } finally spark.conf.unset("spark.graft.gen.retention.ms")
  }
}
