package graft

import graft.api._
import graft.operators.Bm25
import graft.sources.{CrashHooks, SparseIndex, VectorStoreCatalog}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Hard-crash consistency of the commit protocols (r5 verdict follow-up).
  *
  * The jobs-then-renames discipline makes Spark-JOB failures clean aborts;
  * what it cannot make atomic locally is the rename SEQUENCE itself. These
  * specs inject a crash at each rename window (CrashHooks — observationally
  * identical to `kill -9` at that instant), then assert the catalog's
  * `_commit_intent` protocol: the torn state is detected on the next access,
  * healed by rebuilding every derived structure from the data table, and a
  * replay of the crashed batch converges to the clean-run state.
  */
// Minutes-long race/crash-window sweeps: excluded from the default
// `sbt test` so the suite fits the driver budget (build.sbt); run with
// GRAFT_SLOW_TESTS=1.
@org.scalatest.tags.Slow
class CrashRecoverySpec extends SparkSpec {

  private def vec(seed: Int, dim: Int = 8): Seq[Double] =
    (0 until dim).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)

  private def docs(r: Range): Seq[EmbeddedVector] = r.map(i =>
    EmbeddedVector(s"k$i", s"alpha beta doc$i shared words tail${i % 7}", "m",
      Map("g" -> s"c${i % 3}"), vec(i)))

  private def mkCat(extraProps: Map[String, String] = Map.empty,
      indexType: String = "IVF_FLAT"): VectorStoreCatalog = {
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_crash").toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, nlist = 4,
      indexType = indexType, extraProps = extraProps))
    cat
  }

  private def rows(df: DataFrame, cols: String*): Set[Seq[Any]] =
    df.select(cols.map(col): _*).collect().map(_.toSeq).toSet

  /** The post-heal invariant: every stored sparse table equals a refit of
    * the CURRENT data table (the ground truth) — bit-exact, including after
    * a heal that ran against a partially applied batch.
    */
  private def assertSparseMatchesData(cat: VectorStoreCatalog): Unit = {
    val stored = SparseIndex.read(spark, cat.sparseDirOf("t", "m"))
    val exp = Bm25.fit(cat.load("t", "m").select(
      xxhash64(col("flouds_vector_id")).as("doc_id"), col("chunk").as("text")))
    assert(rows(stored.tf, "doc_id", "term", "tf") ==
      rows(exp.tf, "doc_id", "term", "tf"), "tf != fit(data)")
    assert(rows(stored.docLen, "doc_id", "dl") ==
      rows(exp.docLen, "doc_id", "dl"), "doclen != fit(data)")
    assert(rows(stored.termDf, "term", "df") ==
      rows(exp.termDf, "term", "df"), "termdf != fit(data)")
    assert(rows(stored.global, "n", "sumdl") ==
      rows(exp.global, "n", "sumdl"), "global != fit(data)")
  }

  private def marker(cat: VectorStoreCatalog) =
    cat.commitIntentPath("t", "m")

  /** Crash an insert at `point`, assert detection + heal + replay
    * convergence, and compare the end state against a crash-free twin.
    */
  private def sparseCrashScenario(point: String): Unit = {
    val cat = mkCat()
    cat.insert("t", "m", docs(0 until 24))
    CrashHooks.arm(point)
    try intercept[CrashHooks.InjectedCrash] {
      // overlapping key range: the batch REPLACES docs (exercises the
      // removed-terms side of the dictionary delta)
      cat.insert("t", "m", docs(20 until 40))
    } finally CrashHooks.disarm()
    assert(Files.exists(marker(cat)), s"$point: marker must be armed")

    // the next read detects the torn commit and heals before serving
    val resp = cat.search(SearchRequest("t", "m", vec(3), limit = 5,
      hybridSearch = true, textFilter = Some("alpha")))
    assert(resp.success, s"$point: post-heal search must serve")
    assert(!Files.exists(marker(cat)), s"$point: heal must clear the marker")
    assertSparseMatchesData(cat)

    // at-least-once replay of the crashed batch converges...
    cat.insert("t", "m", docs(20 until 40))
    assertSparseMatchesData(cat)

    // ...to exactly the crash-free state (content sequence in rank order)
    val twin = mkCat()
    twin.insert("t", "m", docs(0 until 24))
    twin.insert("t", "m", docs(20 until 40))
    val q = SearchRequest("t", "m", vec(7), limit = 8,
      hybridSearch = true, textFilter = Some("alpha"))
    assert(cat.search(q).data.map(_.content) == twin.search(q).data.map(_.content),
      s"$point: healed+replayed state diverges from the crash-free twin")
    assert(rows(cat.load("t", "m"), "flouds_vector_id", "chunk", "meta") ==
      rows(twin.load("t", "m"), "flouds_vector_id", "chunk", "meta"),
      s"$point: data table diverges from the crash-free twin")
  }

  test("phase-1 abort of EVERY sub-commit arms nothing — no spurious rebuild") {
    // delta mode so the data commit has a pre-rename crash point too: only
    // when NO sub-commit reached a rename is the abort marker-free (a lone
    // sparse phase-1 failure still sees the concurrent data commit land —
    // covered by the sparse scenarios above)
    val cat = mkCat(extraProps = Map("ingest_mode" -> "delta"))
    cat.insert("t", "m", docs(0 until 24))
    CrashHooks.arm("sparse.beforeJobs")
    CrashHooks.arm("data.beforeDeltaMove")
    try intercept[CrashHooks.InjectedCrash] {
      cat.insert("t", "m", docs(20 until 40))
    } finally CrashHooks.disarm()
    assert(!Files.exists(marker(cat)),
      "a failure before any rename must not arm the recovery marker")
    assert(cat.load("t", "m").count() == 24, "clean abort must apply nothing")
    assertSparseMatchesData(cat) // untouched — still consistent, no heal ran
    cat.insert("t", "m", docs(20 until 40)) // replay
    assert(cat.load("t", "m").count() == 40)
    assertSparseMatchesData(cat)
  }

  test("phase-1 sparse failure with a landed data commit arms the marker and heals") {
    val cat = mkCat()
    cat.insert("t", "m", docs(0 until 24))
    CrashHooks.arm("sparse.beforeJobs")
    try intercept[CrashHooks.InjectedCrash] {
      cat.insert("t", "m", docs(20 until 40))
    } finally CrashHooks.disarm()
    // the concurrent merge-mode data commit renamed its buckets, so the
    // sparse tables now LAG the data table — exactly what the marker flags
    assert(Files.exists(marker(cat)))
    assert(cat.healTornCommit("t", "m"))
    assertSparseMatchesData(cat) // refitted to the landed batch
    cat.insert("t", "m", docs(20 until 40)) // replay
    assertSparseMatchesData(cat)
  }

  test("crash before the first sparse rename heals and converges") {
    sparseCrashScenario("sparse.beforeRenames")
  }

  test("crash after the dictionary-delta move (counts would double-apply on replay)") {
    sparseCrashScenario("sparse.afterDeltaMove")
  }

  test("crash mid tf/doclen bucket swaps (torn per-doc tables)") {
    sparseCrashScenario("sparse.midTfSwap")
  }

  test("crash mid data bucket swaps: partial batch survives, heal re-aligns the index") {
    sparseCrashScenario("data.midBucketSwap")
  }

  test("delta mode: data commit aborts after the sparse commit landed — heal refits to surviving data") {
    val cat = mkCat(extraProps = Map("ingest_mode" -> "delta"))
    cat.insert("t", "m", docs(0 until 24))
    CrashHooks.arm("data.beforeDeltaMove")
    try intercept[CrashHooks.InjectedCrash] {
      cat.insert("t", "m", docs(20 until 40))
    } finally CrashHooks.disarm()
    // the sparse commit (concurrent, completed) armed the marker; the data
    // delta move never happened — batch 2 is NOT in the data table
    assert(Files.exists(marker(cat)))
    assert(cat.healTornCommit("t", "m"), "heal must report a torn commit")
    assert(cat.load("t", "m").count() == 24, "aborted delta batch must not surface")
    assertSparseMatchesData(cat) // ghost docs refitted away
    cat.insert("t", "m", docs(20 until 40)) // replay
    assert(cat.load("t", "m").count() == 40)
    assertSparseMatchesData(cat)
  }

  test("IVF: crash mid cell swaps heals the clustered table against stored centroids") {
    val cat = mkCat()
    cat.insert("t", "m", docs(0 until 30))
    cat.persistIndex("t", "m")
    CrashHooks.arm("ivf.midCellSwap")
    try intercept[CrashHooks.InjectedCrash] {
      cat.insert("t", "m", docs(25 until 45))
    } finally CrashHooks.disarm()
    assert(Files.exists(marker(cat)))
    assert(cat.healTornCommit("t", "m"))
    assert(!Files.exists(marker(cat)))

    // invariant: clustered == assign(data, STORED centroids) — no stale
    // replaced vectors, no duplicate doc_ids, no missing rows
    val idx = cat.loadIndex("t", "m")
    val expected = graft.operators.Ivf.assign(
      cat.load("t", "m").select(xxhash64(col("flouds_vector_id")).as("doc_id"),
        col("vector").as("dv")),
      idx.centroids, idx.metric)
    assert(rows(idx.clustered, "doc_id", "centroid_id") ==
      rows(expected, "doc_id", "centroid_id"),
      "clustered table inconsistent with data after heal")

    cat.insert("t", "m", docs(25 until 45)) // replay stays consistent
    val idx2 = cat.loadIndex("t", "m")
    val expected2 = graft.operators.Ivf.assign(
      cat.load("t", "m").select(xxhash64(col("flouds_vector_id")).as("doc_id"),
        col("vector").as("dv")),
      idx2.centroids, idx2.metric)
    assert(rows(idx2.clustered, "doc_id", "centroid_id") ==
      rows(expected2, "doc_id", "centroid_id"))
    // and the facade still self-matches through the healed index
    val resp = cat.search(SearchRequest("t", "m", vec(40), limit = 3, nprobe = 4))
    assert(resp.success && resp.data.head.content.contains("doc40"))
  }

  test("vacuum removes commit debris, respects retention, never touches live tables") {
    val cat = mkCat()
    cat.insert("t", "m", docs(0 until 24))
    val before = rows(cat.load("t", "m"), "flouds_vector_id", "chunk")

    val table = cat.commitIntentPath("t", "m").getParent
    // manufactured debris of every species the commit protocols can leave
    Files.createDirectories(table.resolve("data_tmp_123"))
    Files.createDirectories(table.resolve("data").resolve("_aside_456"))
    Files.createDirectories(table.resolve("index").resolve("bm25")
      .resolve("tf_tmp_789"))
    Files.createDirectories(table.resolve("data").resolve("_temporary"))
    Files.write(table.resolve("_schema.json._tmp42"), "x".getBytes)
    val young = table.resolve("data_tmp_young")
    Files.createDirectories(young)

    // retention keeps the young dir (another process could own it)…
    assert(cat.vacuum("t", "m", olderThanMs = 60000) == 0)
    assert(Files.exists(young))
    // …flush (retention 0, lock held) sweeps everything
    cat.flush("t", "m")
    assert(!Files.exists(table.resolve("data_tmp_123")))
    assert(!Files.exists(table.resolve("data").resolve("_aside_456")))
    assert(!Files.exists(table.resolve("index").resolve("bm25").resolve("tf_tmp_789")))
    assert(!Files.exists(table.resolve("data").resolve("_temporary")))
    assert(!Files.exists(table.resolve("_schema.json._tmp42")))
    assert(!Files.exists(young))
    // live state untouched
    assert(rows(cat.load("t", "m"), "flouds_vector_id", "chunk") == before)
    assertSparseMatchesData(cat)
  }

  test("heal vacuums the crashed commit's phase-1 leftovers") {
    val cat = mkCat()
    cat.insert("t", "m", docs(0 until 24))
    CrashHooks.arm("sparse.beforeRenames")
    try intercept[CrashHooks.InjectedCrash] {
      cat.insert("t", "m", docs(20 until 40))
    } finally CrashHooks.disarm()
    assert(cat.healTornCommit("t", "m"))
    val table = cat.commitIntentPath("t", "m").getParent
    val leftover = Files.walk(table).iterator()
    val debris = new scala.collection.mutable.ArrayBuffer[String]
    while (leftover.hasNext) {
      val n = leftover.next().getFileName.toString
      if (n.contains("_tmp_") || n.startsWith("_aside_")) debris += n
    }
    assert(debris.isEmpty, s"debris survived heal: $debris")
  }

  test("corrupt dictionary delta-seq reservation recovers instead of wedging inserts") {
    val cat = mkCat()
    cat.insert("t", "m", docs(0 until 24))
    cat.insert("t", "m", docs(24 until 30)) // incremental: reserves a delta seq
    val seq = java.nio.file.Paths.get(cat.sparseDirOf("t", "m"), "termdf_delta_seq")
    assert(Files.exists(seq), "fixture must have reserved a delta seq")

    // torn write (garbage bytes): the next reservation must recover as
    // max(existing d*)+1 — inserts keep working, counts stay exact
    Files.write(seq, Array[Byte](0x67, 0x61, 0x72, 0x62, 0x00, 0x7f))
    cat.insert("t", "m", docs(30 until 40))
    assertSparseMatchesData(cat)

    // truncate-to-empty mid-flight: same recovery
    Files.write(seq, Array.emptyByteArray)
    cat.insert("t", "m", docs(40 until 50))
    assertSparseMatchesData(cat)

    // stale-but-parseable counter (lagging the delta dir) also heals: a
    // reused name would silently overwrite a live delta's counts
    Files.write(seq, "1".getBytes("UTF-8"))
    cat.insert("t", "m", docs(50 until 60))
    assertSparseMatchesData(cat)
  }

  test("corrupt data delta-seq counter recovers past the live pending deltas") {
    val cat = mkCat(extraProps = Map("ingest_mode" -> "delta"))
    cat.insert("t", "m", docs(0 until 24))
    cat.insert("t", "m", docs(24 until 30)) // pending delta d1
    val seq = cat.commitIntentPath("t", "m").getParent.resolve("_delta_seq.json")
    assert(Files.exists(seq))
    Files.write(seq, Array[Byte](0x7b, 0x00, 0x01)) // torn json
    cat.insert("t", "m", docs(30 until 40)) // must not wedge or collide
    // stale-but-parseable (lags the live delta files): same recovery —
    // a reused name would make Files.move throw or shadow a commit
    Files.writeString(seq, """{"next":"1"}""")
    cat.insert("t", "m", docs(40 until 50))
    assert(cat.load("t", "m").count() == 50)
    assertSparseMatchesData(cat)
    // merge-on-read still resolves last-wins per key after recovery
    cat.insert("t", "m", docs(45 until 55)) // replaces 45-49
    assert(cat.load("t", "m").count() == 55)
    assertSparseMatchesData(cat)
  }

  test("corrupt auto_id counter re-derives from the stored PKs, never reusing ids") {
    val cat = mkCat()
    cat.generateSchema(SchemaSpec("t", "auto", dimension = 8, nlist = 4,
      indexType = "IVF_FLAT", primaryKeyDataType = "INT64"))
    def autoDocs(n: Int) = (0 until n).map(i =>
      EmbeddedVector("", s"auto doc $i", "auto", Map(), vec(i)))
    cat.insert("t", "auto", autoDocs(20)) // ids 1..20
    val ctr = cat.commitIntentPath("t", "auto").getParent.resolve("_autoid.json")
    assert(Files.exists(ctr))

    Files.write(ctr, "not json at all".getBytes("UTF-8"))
    cat.insert("t", "auto", autoDocs(5)) // must continue at 21, not restart at 1
    val ids = cat.load("t", "auto").select("flouds_vector_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (1L to 25L), s"ids reused or lost after recovery: $ids")

    // a DELETED counter with live data must also re-derive, not restart
    Files.deleteIfExists(ctr)
    cat.insert("t", "auto", autoDocs(3))
    val ids2 = cat.load("t", "auto").select("flouds_vector_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids2 == (1L to 28L), s"lost counter replaced rows: $ids2")
  }

  test("HNSW: crash mid node-bucket swaps heals the graph from the data table") {
    // window=1: the midNodeSwap hook fires inside the absorb COMMIT — this
    // test pins that path per insert (pending-regime crash story is
    // HnswPendingSpec's restart test)
    val cat = mkCat(indexType = "HNSW",
      extraProps = Map("hnsw_absorb_window" -> "1"))
    cat.insert("t", "m", docs(0 until 30))
    cat.persistIndex("t", "m")
    CrashHooks.arm("hnsw.midNodeSwap")
    try intercept[CrashHooks.InjectedCrash] {
      cat.insert("t", "m", docs(25 until 45))
    } finally CrashHooks.disarm()
    assert(Files.exists(marker(cat)))
    assert(cat.healTornCommit("t", "m"))

    // graph invariants against the ground truth: node set == data docs,
    // every edge endpoint is a live node
    val g = cat.loadHnsw("t", "m")
    val dataIds = rows(cat.load("t", "m")
      .select(xxhash64(col("flouds_vector_id")).as("doc_id")), "doc_id")
    assert(rows(g.nodes, "doc_id") == dataIds, "healed node set != data docs")
    val nodeIds = g.nodes.select("doc_id").collect().map(_.getLong(0)).toSet
    val endpoints = g.edges.select("src", "dst").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(endpoints.subsetOf(nodeIds), "healed graph has dangling edges")

    cat.insert("t", "m", docs(25 until 45)) // replay
    val resp = cat.search(SearchRequest("t", "m", vec(42), limit = 3))
    assert(resp.success && resp.data.head.content.contains("doc42"))
  }
}
