package graft

import graft.core.Tables
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-round benchmark: headline operators on SPARK_GRAFT_SF_DIR (sf0.1 by
  * default), one JSON line on stdout (driver contract).
  *
  * Headline set mirrors BASELINE.md's derived targets: B1 exact KNN (64
  * queries), B2 filtered KNN, B3 BM25, B4 hybrid RRF, B5 IVF build+probe,
  * B6 upsert, plus dedup (minhash+LSH) and the relational q1/join anchors.
  */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC") // NTZ ts read as UTC instants
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // FAIR + classpath fairscheduler.xml: background index rebuilds run
      // in the low-weight graftRebuild pool so serving keeps ~4/5 of slots
      .config("spark.scheduler.mode", "FAIR")
      // the cleaner only drops dead checkpoint/broadcast/shuffle blocks
      // after a DRIVER GC proves the refs dead; with a large heap that GC
      // can be minutes away while the block manager fills with zombies —
      // ask for it periodically (production guidance: same knob, SCALE.md)
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def ordersCorpus = Tables.ordersCorpus(spark, sfDir)
    def docs         = Tables.load(spark, sfDir, "documents")
    def docsCorpus   = Tables.docsCorpus(spark, sfDir)
    val q64          = Tables.queryBatch(spark, 64)

    // iteration aid: SPARK_GRAFT_BENCH_ONLY=b15_pq_probe_decode,b15b_pq_probe_adc
    // times just those benches AND builds only their fixtures. The driver
    // leaves it unset — every `need(...)` below is then true and the full
    // prep runs exactly as before.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    // every name a fixture gate mentions, recorded so the benches list can
    // cross-check them below — a renamed bench whose gate still says the old
    // name would otherwise silently skip fixture prep and die on a missing
    // parquet path only when the bench itself runs
    val gateNames = scala.collection.mutable.LinkedHashSet[String]()
    def need(names: String*): Boolean = {
      gateNames ++= names
      only.forall(sel => names.exists(sel.contains))
    }
    def need1(name: String): Boolean = { gateNames += name; only.forall(_.contains(name)) }

    // ---- untimed prep: persist the indexes the serving-path benches read,
    //      so build cost and query cost are reported SEPARATELY (a serving
    //      query against a built index is the production hot path).
    //      Each fixture family is gated on the benches that read it. ----
    val prepDir = java.nio.file.Files.createTempDirectory("graft_bench").toString
    if (need("b3b_bm25_persisted", "b4b_hybrid_persisted", "b4c_hybrid_indexed",
        "b4d_hybrid_indexed_dim384"))
      graft.sources.SparseIndex.write(
        Bm25.fit(docs), s"$prepDir/bm25", nBuckets = 16)
    // incremental-dedup fixture: persisted LSH index over 80% of the docs;
    // b7b queries the remaining 20% "crawl increment" against it
    if (need("b7b_dedup_incr", "b7c_dedup_incr_small"))
      graft.sources.DedupIndex.build(
        docs.select("doc_id", "text").filter(col("doc_id") % 5 =!= 0),
        s"$prepDir/dedupidx", nBuckets = 16)
    lazy val prepIdx = Ivf.build(ordersCorpus.select("doc_id", "dv"), nlist = 256, maxIter = 5)
    if (need("b5b_ivf_probe_persisted")) {
      prepIdx.clustered.repartition(col("centroid_id"))
        .write.mode("overwrite").partitionBy("centroid_id")
        .parquet(s"$prepDir/ivf/clustered")
      prepIdx.centroids.write.mode("overwrite").parquet(s"$prepDir/ivf/centroids")
    }
    // second persisted IVF over the embedding-backed corpus — the dense leg
    // of the indexed hybrid (b4c), same collection as the BM25 sparse leg
    if (need("b4c_hybrid_indexed")) {
      val prepDocsIdx = Ivf.build(
        docsCorpus.select(col("doc_id"), col("qv").as("dv")), nlist = 256, maxIter = 5)
      prepDocsIdx.clustered.repartition(col("centroid_id"))
        .write.mode("overwrite").partitionBy("centroid_id")
        .parquet(s"$prepDir/ivf_docs/clustered")
      prepDocsIdx.centroids.write.mode("overwrite").parquet(s"$prepDir/ivf_docs/centroids")
    }
    def persistedDocsIvf = Ivf.Index(
      spark.read.parquet(s"$prepDir/ivf_docs/centroids"),
      spark.read.parquet(s"$prepDir/ivf_docs/clustered"), "COSINE")
    lazy val prepPq = Ivf.quantizePq(prepIdx, mSub = 8, ksub = 64, maxIter = 3)
    if (need("b15_pq_probe_decode", "b15b_pq_probe_adc"))
      prepPq.clustered.write.mode("overwrite").parquet(s"$prepDir/pq/clustered")
    def persistedPq = Ivf.Pq(prepIdx.centroids,
      spark.read.parquet(s"$prepDir/pq/clustered"), prepPq.codebooks, "COSINE")
    def persistedIvf = Ivf.Index(
      spark.read.parquet(s"$prepDir/ivf/centroids"),
      spark.read.parquet(s"$prepDir/ivf/clustered"), "COSINE")
    def persistedBm25 = graft.sources.SparseIndex.read(spark, s"$prepDir/bm25")

    // dim-scaling fixtures (realistic widths): the reference's default
    // vector width is 384 (appsettings default_dimension; cap 4096,
    // input_validator.py:156-167) while the synthetic benches run dim 64 —
    // b1d/b5d/b15c validate the codegen dot kernels, IVF routing, and the
    // PQ-ADC lookup at production widths. The dim-1024 PQ point runs over
    // a 1-in-8 slice: it validates kernel width, not corpus scale.
    // materialized to parquet first: production vectors are STORED, and an
    // in-plan synthVec (interpreted transform over a 384-element sequence
    // per row) would dominate the timing and hide the kernel under test
    if (need("b1d_knn_dim384", "b5d_ivf_probe_dim384"))
      Tables.load(spark, sfDir, "orders").select(
          col("o_orderkey").as("doc_id"),
          Tables.synthVec(col("o_orderkey"), 384).as("dv"))
        .write.mode("overwrite").parquet(s"$prepDir/orders384")
    def orders384 = spark.read.parquet(s"$prepDir/orders384")
    val q384  = Tables.queryBatch(spark, 64, 384)
    val q1024 = Tables.queryBatch(spark, 64, 1024)
    if (need("b5d_ivf_probe_dim384")) {
      val prep384 = Ivf.build(orders384, nlist = 64, maxIter = 3)
      prep384.clustered.repartition(col("centroid_id"))
        .write.mode("overwrite").partitionBy("centroid_id")
        .parquet(s"$prepDir/ivf384/clustered")
      prep384.centroids.write.mode("overwrite").parquet(s"$prepDir/ivf384/centroids")
    }
    def persistedIvf384 = Ivf.Index(
      spark.read.parquet(s"$prepDir/ivf384/centroids"),
      spark.read.parquet(s"$prepDir/ivf384/clustered"), "COSINE")
    lazy val orders1024 = {
      Tables.load(spark, sfDir, "orders")
        .filter(col("o_orderkey") % 8 === 0)
        .select(col("o_orderkey").as("doc_id"),
          Tables.synthVec(col("o_orderkey"), 1024).as("dv"))
        .write.mode("overwrite").parquet(s"$prepDir/orders1024")
      spark.read.parquet(s"$prepDir/orders1024")
    }
    // clamp cluster counts to the slice size (tiny sf smoke runs would
    // otherwise hand KMeans more centers than points)
    lazy val k1024 = math.max(2, math.min(32L, orders1024.count() / 8).toInt)
    lazy val prepIdx1024 = Ivf.build(orders1024, nlist = k1024, maxIter = 2)
    lazy val prepPq1024  = Ivf.quantizePq(prepIdx1024, mSub = 16, ksub = k1024, maxIter = 2)
    if (need("b15c_pq_adc_dim1024"))
      prepPq1024.clustered.write.mode("overwrite").parquet(s"$prepDir/pq1024/clustered")
    def persistedPq1024 = Ivf.Pq(prepIdx1024.centroids,
      spark.read.parquet(s"$prepDir/pq1024/clustered"), prepPq1024.codebooks, "COSINE")

    // dim-384 GRAPH + HYBRID width points (b14c/b4d): the same docs corpus
    // b14/b4c serve, vectors widened to the reference's default width 384
    // (appsettings default_dimension) — corpus size and query count are
    // held constant, so the delta vs b14/b4c isolates kernel width in the
    // beam-search and probe paths. Materialized to parquet first (stored
    // vectors, not an in-plan transform), like orders384.
    if (need("b14c_hnsw_search_dim384", "b4d_hybrid_indexed_dim384"))
      docsCorpus.select(col("doc_id"),
          Tables.synthVec(col("doc_id"), 384).as("dv"))
        .write.mode("overwrite").parquet(s"$prepDir/docs384")
    def docs384 = spark.read.parquet(s"$prepDir/docs384")
    if (need("b14c_hnsw_search_dim384")) {
      val g384 = Hnsw.build(docs384, m = 8)
      g384.nodes.write.mode("overwrite").parquet(s"$prepDir/hnsw384/nodes")
      g384.edges.write.mode("overwrite").parquet(s"$prepDir/hnsw384/edges")
      g384.entries.write.mode("overwrite").parquet(s"$prepDir/hnsw384/entries")
    }
    def hnsw384 = Hnsw.Graph(
      spark.read.parquet(s"$prepDir/hnsw384/nodes"),
      spark.read.parquet(s"$prepDir/hnsw384/edges"),
      spark.read.parquet(s"$prepDir/hnsw384/entries"), "COSINE")
    if (need("b4d_hybrid_indexed_dim384")) {
      val prepDocs384Idx = Ivf.build(docs384, nlist = 256, maxIter = 5)
      prepDocs384Idx.clustered.repartition(col("centroid_id"))
        .write.mode("overwrite").partitionBy("centroid_id")
        .parquet(s"$prepDir/ivf_docs384/clustered")
      prepDocs384Idx.centroids.write.mode("overwrite")
        .parquet(s"$prepDir/ivf_docs384/centroids")
    }
    def persistedDocsIvf384 = Ivf.Index(
      spark.read.parquet(s"$prepDir/ivf_docs384/centroids"),
      spark.read.parquet(s"$prepDir/ivf_docs384/clustered"), "COSINE")

    // streaming-curation fixture (b22): a persisted dedup index seeded with
    // 80% of the corpus + an initially-empty curated table; each iteration
    // pushes a fresh-keyed 20% "crawl increment" through scrub → quality
    // gate → near-dup gate → bucketed merge (CurateStream.curateBatch —
    // the per-trigger body of the streaming pipeline). Separate from
    // b7b's index: ingestDeduped MUTATES its index.
    if (need("b22_curate_batch"))
      graft.sources.DedupIndex.build(
        docs.select("doc_id", "text").filter(col("doc_id") % 5 =!= 0),
        s"$prepDir/curidx", nBuckets = 16)

    // b14/b14b read the graph b13 persists; when they are selected without
    // b13 (iteration aid), build it here untimed instead
    if (!need1("b13_hnsw_build") &&
        need("b14_hnsw_search", "b14b_hnsw_search_bulk")) {
      val g = Hnsw.build(docsCorpus.select(col("doc_id"), col("qv").as("dv")), m = 8)
      g.edges.write.mode("overwrite").parquet(s"$prepDir/hnsw/edges")
      g.nodes.write.mode("overwrite").parquet(s"$prepDir/hnsw/nodes")
      g.entries.write.mode("overwrite").parquet(s"$prepDir/hnsw/entries")
    }

    // facade-insert fixtures (b6b/b6c): one collection data-only, one with a
    // persisted IVF index, both seeded with the same 1000 rows (untimed)
    val benchCat = new graft.sources.VectorStoreCatalog(spark, s"$prepDir/cat")
    def benchVec(seed: Int): Seq[Double] =
      (0 until 64).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
    def upsertBatch(gen: Int, m: String): Seq[graft.api.EmbeddedVector] =
      (0 until 500).map { i =>
        // i<250 replaces a seed key (old-cell rewrite), i>=250 is fresh
        val key = if (i < 250) s"seed$i" else s"g${gen}_n$i"
        graft.api.EmbeddedVector(key, s"bench doc $gen $i lorem ipsum", m,
          Map("g" -> gen.toString), benchVec(gen * 1000 + i))
      }
    val modeBench = Map("plain" -> "b6b_upsert_data",
      "indexed" -> "b6c_upsert_indexed", "deltam" -> "b6d_upsert_delta")
    for (m <- Seq("plain", "indexed", "deltam") if need(modeBench(m))) {
      benchCat.generateSchema(graft.api.SchemaSpec("bench", m, dimension = 64,
        extraProps = if (m == "deltam") Map("ingest_mode" -> "delta") else Map.empty))
      benchCat.insert("bench", m, (0 until 1000).map(i =>
        graft.api.EmbeddedVector(s"seed$i", s"seed doc $i lorem ipsum", m,
          Map("g" -> "0"), benchVec(i))))
    }
    if (need("b6c_upsert_indexed")) benchCat.persistIndex("bench", "indexed")
    if (need("b6d_upsert_delta"))
      benchCat.flush("bench", "deltam") // fold the seed wave (untimed)
    // b6e fixture: a delta-mode collection held at a FIXED pending-delta
    // count (4 small request-sized commits over a folded 1000-row base —
    // below the fold threshold, so the merge-on-read view is stable across
    // iterations). b6d times the delta COMMIT; this collection exists to
    // time what the mode costs READERS: window over ≤N+1 delta batches +
    // broadcast anti-join against the base scan.
    if (need("b6e_search_pending_deltas")) {
      benchCat.generateSchema(graft.api.SchemaSpec("bench", "deltaread",
        dimension = 64, extraProps = Map("ingest_mode" -> "delta")))
      benchCat.insert("bench", "deltaread", (0 until 1000).map(i =>
        graft.api.EmbeddedVector(s"seed$i", s"seed doc $i lorem ipsum", "deltaread",
          Map("g" -> "0"), benchVec(i))))
      benchCat.flush("bench", "deltaread")
      for (g <- 1 to 4)
        benchCat.insert("bench", "deltaread", (0 until 50).map { i =>
          val key = if (i < 25) s"seed${g * 100 + i}" else s"p${g}_n$i"
          graft.api.EmbeddedVector(key, s"pending doc $g $i lorem ipsum",
            "deltaread", Map("g" -> g.toString), benchVec(g * 7000 + i))
        })
    }
    // ... and its CONTROL: the identical collection, folded — b6f minus
    // b6e's number is the read-side cost of 4 pending deltas specifically
    // (request overhead and corpus scan are common to both)
    if (need("b6f_search_folded_control")) {
      benchCat.generateSchema(graft.api.SchemaSpec("bench", "deltafold",
        dimension = 64, extraProps = Map("ingest_mode" -> "delta")))
      benchCat.insert("bench", "deltafold", (0 until 1000).map(i =>
        graft.api.EmbeddedVector(s"seed$i", s"seed doc $i lorem ipsum", "deltafold",
          Map("g" -> "0"), benchVec(i))))
      for (g <- 1 to 4)
        benchCat.insert("bench", "deltafold", (0 until 50).map { i =>
          val key = if (i < 25) s"seed${g * 100 + i}" else s"p${g}_n$i"
          graft.api.EmbeddedVector(key, s"pending doc $g $i lorem ipsum",
            "deltafold", Map("g" -> g.toString), benchVec(g * 7000 + i))
        })
      benchCat.flush("bench", "deltafold")
    }
    // churned-vs-rebuilt HNSW serving pair (b14d/b14e): the same final
    // corpus reached two ways — "hnswchurn" absorbed 12 upsert batches
    // through absorbIntoHnsw (degree re-prune + stale-edge drop active),
    // "hnswfresh" was built ONCE from the final state. The pair bounds what
    // the absorb path's residual edge debt costs at serving time: the two
    // rows should stay close (the r10 verdict's unbounded-growth finding
    // would have shown up as churn >> fresh here).
    def hnswChurnBatch(gen: Int, m: String): Seq[graft.api.EmbeddedVector] =
      (0 until 100).map { i =>
        val key = if (i < 50) s"seed${(gen * 83 + i * 7) % 1000}" else s"g${gen}_n$i"
        graft.api.EmbeddedVector(key, s"bench doc $gen $i lorem ipsum", m,
          Map("g" -> gen.toString), benchVec(gen * 1000 + i + 211))
      }
    val churnBench = Map("hnswchurn" -> "b14d_hnsw_search_churned",
      "hnswfresh" -> "b14e_hnsw_search_rebuilt")
    for (m <- Seq("hnswchurn", "hnswfresh") if need(churnBench(m))) {
      // hnsw_absorb_window=1: absorb-per-insert, PINNED — this pair is a
      // controlled experiment on absorb edge debt (12 real absorbs vs one
      // fresh build of the same corpus), so the r16 growing-segment
      // default (batched folds + a brute-force pending leg) must not
      // change what it measures; the default regime has its own row (b6j)
      benchCat.generateSchema(graft.api.SchemaSpec("bench", m, dimension = 64,
        indexType = "HNSW", extraProps = Map("hnsw_max_absorbs" -> "1000",
          "hnsw_absorb_window" -> "1")))
      benchCat.insert("bench", m, (0 until 1000).map(i =>
        graft.api.EmbeddedVector(s"seed$i", s"seed doc $i lorem ipsum", m,
          Map("g" -> "0"), benchVec(i))))
    }
    if (need("b14d_hnsw_search_churned")) {
      benchCat.persistIndex("bench", "hnswchurn") // graph exists -> churn absorbs
      for (g <- 1 to 12)
        benchCat.insert("bench", "hnswchurn", hnswChurnBatch(g, "hnswchurn"))
    }
    if (need("b14e_hnsw_search_rebuilt")) {
      for (g <- 1 to 12) // data-only until the one-shot build below
        benchCat.insert("bench", "hnswfresh", hnswChurnBatch(g, "hnswfresh"))
      benchCat.persistIndex("bench", "hnswfresh")
    }
    // insert-at-threshold fixture (b6g): an indexed collection held ONE
    // absorb away from its drift threshold (`ivf_max_absorbs = 1`), so the
    // first timed insert crosses it. Pre-r12 that insert paid the full
    // KMeans retrain inline; now it only schedules the detached rebuild —
    // the row's claim is that its wall stays at b6c's O(batch) level, not
    // b5's build level. Iterations alternate the two production shapes
    // under rebuild pressure: threshold-crossing (schedule) and
    // rebuild-in-flight (backlog append); both must be O(batch).
    if (need("b6g_upsert_at_threshold")) {
      benchCat.generateSchema(graft.api.SchemaSpec("bench", "thresh",
        dimension = 64, extraProps = Map("ivf_max_absorbs" -> "1")))
      benchCat.insert("bench", "thresh", (0 until 1000).map(i =>
        graft.api.EmbeddedVector(s"seed$i", s"seed doc $i lorem ipsum", "thresh",
          Map("g" -> "0"), benchVec(i))))
      benchCat.persistIndex("bench", "thresh")
      benchCat.insert("bench", "thresh", upsertBatch(999, "thresh")) // counter -> 1
    }
    var b6gGen = 2000
    // ... and the HNSW twin (b6h) with its below-threshold CONTROL (b6i):
    // the graph rebuild is the pricier wall (b13-class), so the
    // detached-rebuild claim matters most here. Both collections take the
    // same 100-row churn batch (the b14d shape — an HNSW absorb's cost is
    // the per-batch beam search, so batch size sets the row's floor);
    // b6h crosses `hnsw_max_absorbs = 1` every iteration, b6i never
    // crosses — their DELTA is what the threshold costs the insert. Both
    // pin `hnsw_absorb_window = 1` (absorb-per-insert): the pair measures
    // the ABSORB CYCLE's cost and stays comparable to pre-r16 rounds. The
    // r16 serving DEFAULT — the growing-segment pending window (append +
    // brute-force serve, one batched fold per window) — is its own row,
    // b6j: the per-insert latency a caller actually sees, with the fold
    // visible as the every-8th-iteration spike in the per-iteration
    // stderr trace (min-of-N reports the steady state by design).
    val hnswThreshBench = Map("hthresh" -> "b6h_upsert_hnsw_at_threshold",
      "hplain" -> "b6i_upsert_hnsw_control",
      "hpend" -> "b6j_upsert_hnsw_pending")
    for (m <- Seq("hthresh", "hplain", "hpend") if need(hnswThreshBench(m))) {
      benchCat.generateSchema(graft.api.SchemaSpec("bench", m,
        dimension = 64, indexType = "HNSW",
        extraProps = Map("hnsw_max_absorbs" ->
          (if (m == "hthresh") "1" else "100000")) ++
          (if (m == "hpend") Map.empty[String, String]
           else Map("hnsw_absorb_window" -> "1"))))
      benchCat.insert("bench", m, (0 until 1000).map(i =>
        graft.api.EmbeddedVector(s"seed$i", s"seed doc $i lorem ipsum", m,
          Map("g" -> "0"), benchVec(i))))
      benchCat.persistIndex("bench", m)
      benchCat.insert("bench", m, hnswChurnBatch(999, m)) // counter -> 1
    }
    var b6hGen = 3000
    var b6iGen = 4000
    var b6jGen = 5000

    // Applied to EVERY timed query at the timing site: counting a query
    // lets Catalyst prune whatever the count does not need (the as-of lost
    // its whole window; the Gopher/C4 gates and q1's sums degenerated to
    // bare scan counts). Numbers before r9 under-measure projection-ending
    // queries — SCALE.md "measurement-honesty" note.
    def consume(df: DataFrame): DataFrame = Tables.checksumAll(df)

    // hot-key as-of fixture (b20d/b20e): 20M left + 10M right rows, ONE
    // key, deterministic hash-scattered timestamps over a fixed span —
    // big enough that a single partition's sort is the visible cost
    val HotSpanUs = 3600000000L // 1h of microseconds
    def hotTs = (col("id") * 2654435761L) % HotSpanUs
    def hotLeft = spark.range(20000000)
      .select(lit(1L).as("k"), hotTs.as("ts"), col("id").as("event_id"))
    def hotRight = spark.range(10000000)
      .select(lit(1L).as("k"), ((col("id") * 40503L + 7) % HotSpanUs).as("ts"),
        col("id").as("rid"))

    // per-iteration generation counters for the insert benches (see b6b/b6c)
    var b6bGen = 0
    var b6cGen = 0
    var b6dGen = 0
    var b22Gen = 0

    val benches: Seq[(String, () => DataFrame)] = Seq(
      "b1_knn_cos_64q" -> (() => Knn.search(ordersCorpus, q64,
        SearchParams(limit = 10, outputFields = Nil))),
      "b2_knn_filtered" -> (() => Knn.search(ordersCorpus, q64,
        SearchParams(limit = 10, scoreThreshold = Some(0.1),
          metaFilter = Map("priority" -> "URGENT"), outputFields = Seq("meta")))),
      "b3_bm25" -> (() => Bm25.searchTopK(Bm25.fit(docs),
        (0L until 8L).map(_ -> "spark join window merge data"), 10)),
      "b4_hybrid_rrf" -> (() => {
        val corpus  = docsCorpus.select(col("doc_id"), col("qv").as("dv"))
        val queries = docsCorpus.filter(col("doc_id") < 8)
          .select(col("doc_id").as("qid"), col("qv"))
        Hybrid.search(corpus, queries, Bm25.fit(docs),
          (0L until 8L).map(_ -> "spark join window merge data"),
          SearchParams(limit = 10))
      }),
      "b5_ivf_build_probe" -> (() => {
        val idx = Ivf.build(ordersCorpus.select("doc_id", "dv"), nlist = 256, maxIter = 5)
        Ivf.probe(idx, q64, nprobe = 16, k = 10)
      }),
      // serving-path split: query cost WITHOUT the build, against the
      // persisted tables (partition-pruned IVF scan / stored BM25 postings)
      "b5b_ivf_probe_persisted" -> (() =>
        Ivf.probePersisted(persistedIvf, q64, nprobe = 16, k = 10)),
      "b3b_bm25_persisted" -> (() => Bm25.searchTopK(persistedBm25,
        (0L until 8L).map(_ -> "spark join window merge data"), 10)),
      "b4b_hybrid_persisted" -> (() => {
        val corpus  = docsCorpus.select(col("doc_id"), col("qv").as("dv"))
        val queries = docsCorpus.filter(col("doc_id") < 8)
          .select(col("doc_id").as("qid"), col("qv"))
        Hybrid.search(corpus, queries, persistedBm25,
          (0L until 8L).map(_ -> "spark join window merge data"),
          SearchParams(limit = 10))
      }),
      // the 100 TB hybrid: BOTH legs index-pruned (persisted-IVF dense leg,
      // persisted-BM25 sparse leg). At sf0.1 this RUNS SLOWER than b4b's
      // exact dense leg — the probe's routing+pruning job chain is pure
      // fixed latency over a 2k-doc corpus — which is exactly why both are
      // benched: b4b is the small-corpus request shape, b4c the shape whose
      // cost stays flat when the corpus doesn't fit a scan (measured
      // ScaleBench slopes 0.11 at 10×, 0.018 at 100× vs b1's ~0.7 linear).
      "b4c_hybrid_indexed" -> (() => {
        val queries = docsCorpus.filter(col("doc_id") < 8)
          .select(col("doc_id").as("qid"), col("qv"))
        val dense = Ivf.probePersisted(persistedDocsIvf, queries, nprobe = 16, k = 50)
          .select(col("qid"), col("doc_id"), col("score").as("rawScore"))
        Hybrid.searchScored(dense, persistedBm25,
          (0L until 8L).map(_ -> "spark join window merge data"),
          SearchParams(limit = 10))
      }),
      "b6_upsert" -> (() => {
        val cur = Tables.load(spark, sfDir, "orders").select(
          col("o_orderkey").as("key"), col("o_orderstatus").as("status"),
          col("o_totalprice").cast("decimal(18,2)").as("price"))
        val batch = cur.filter(col("key") % 100 === 0)
          .withColumn("price", col("price") + 100)
        Upsert.merge(cur, batch, "key")
          .groupBy("status").agg(count(lit(1)).as("n"), sum("price").as("p"))
      }),
      // facade insert, attributable: a 500-row batch with the SAME mix
      // every iteration — 250 replaced seed keys + 250 gen-FRESH keys (gen
      // increments per call, so iteration N never re-inserts iteration
      // N-1's fresh keys as replacements; min-of-N measures one stable
      // workload) — into a data-only collection vs one carrying an IVF
      // index: the delta IS the index-maintenance cost (cell rewrites for
      // old+new assignments). Prep (collection + 1000 seed rows + index
      // build) is untimed.
      "b6b_upsert_data" -> (() => {
        b6bGen += 1
        benchCat.insert("bench", "plain", upsertBatch(b6bGen, "plain"))
        spark.range(1).toDF("ok")
      }),
      "b6c_upsert_indexed" -> (() => {
        b6cGen += 1
        benchCat.insert("bench", "indexed", upsertBatch(b6cGen, "indexed"))
        spark.range(1).toDF("ok")
      }),
      // the same 500-row mix into a merge-on-read (`ingest_mode = delta`)
      // collection: the commit appends ONE delta file instead of rewriting
      // the touched buckets — the b6b delta is the data-merge cost that
      // append-only ingest avoids (deltas fold on flush, untimed here)
      "b6d_upsert_delta" -> (() => {
        b6dGen += 1
        benchCat.insert("bench", "deltam", upsertBatch(b6dGen, "deltam"))
        spark.range(1).toDF("ok")
      }),
      // the merge-on-read READ path: 8-query batch search against the
      // deltaread collection's 4 pending delta commits (b6d's commit-side
      // win is only a win if this stays near the folded-base read cost)
      "b6e_search_pending_deltas" -> (() =>
        benchCat.searchDfBatch(graft.api.SearchRequest("bench", "deltaread",
          benchVec(3), limit = 10), (0 until 8).map(benchVec))),
      "b6f_search_folded_control" -> (() =>
        benchCat.searchDfBatch(graft.api.SearchRequest("bench", "deltafold",
          benchVec(3), limit = 10), (0 until 8).map(benchVec))),
      "b7_dedup_minhash_lsh" -> (() =>
        Dedup.lshCandidatePairs(Dedup.minhashSignatures(docs))),
      // the incremental path b7 exists to avoid at scale: dedup a 20%
      // increment against the stored index — signatures computed for the
      // increment only, corpus side read band/bucket-pruned
      "b7b_dedup_incr" -> (() =>
        graft.sources.DedupIndex.queryBatch(spark, s"$prepDir/dedupidx",
          docs.select("doc_id", "text").filter(col("doc_id") % 5 === 0),
          nBuckets = 16)),
      // request-sized increment (512 docs): the latency shape, where the
      // band read actually prunes to the batch's (band, bucket) dirs
      "b7c_dedup_incr_small" -> (() =>
        graft.sources.DedupIndex.queryBatch(spark, s"$prepDir/dedupidx",
          docs.select("doc_id", "text")
            .filter(col("doc_id") % 5 === 0 && col("doc_id") < 2560),
          nBuckets = 16)),
      "b8_q1_agg" -> (() => SparkEntry.queries("q1_agg")(spark, sfDir)),
      "b9_join_agg" -> (() => SparkEntry.queries("q_join_agg")(spark, sfDir)),
      "b11_ann_lsh" -> (() => {
        val corpus  = docsCorpus.select(col("doc_id"), col("qv"))
        val queries = docsCorpus.filter(col("doc_id") < 64)
          .select(col("doc_id").as("qid"), col("qv"))
        // footer-metadata corpus count — no count() job on the serving path
        AnnLsh.search(corpus, queries, k = 10,
          corpusCount = Some(Tables.parquetRowCount(spark, s"$sfDir/embeddings.parquet")))
      }),
      "b10_ann_embed" -> (() => {
        val corpus  = docsCorpus.select(col("doc_id"), col("qv").as("dv"))
        val queries = docsCorpus.filter(col("doc_id") < 64)
          .select(col("doc_id").as("qid"), col("qv"))
        Knn.search(corpus, queries, SearchParams(limit = 10, outputFields = Nil))
      }),
      "b12_media_decode" -> (() => Multimodal.extractMediaFeatures(docs)),
      "b12b_media_resize" -> (() => Multimodal.resizeImages(docs)),
      "b12c_media_frames" -> (() => Multimodal.sampleFrames(docs)),
      // PQ scoring paths over one prebuilt index: decode-then-dot vs the
      // ADC table-lookup kernel (same candidates, mSub reads per pair)
      "b15_pq_probe_decode" -> (() =>
        Ivf.probePq(persistedPq, q64, nprobe = 16, k = 10)),
      "b15b_pq_probe_adc" -> (() =>
        Ivf.probePqAdc(persistedPq, q64, nprobe = 16, k = 10)),
      // graph ANN: build over the real-embedding corpus, then beam search —
      // reported separately (build is an offline DDL step, search the hot path)
      "b13_hnsw_build" -> (() => {
        val corpus = docsCorpus.select(col("doc_id"), col("qv").as("dv"))
        val g = Hnsw.build(corpus, m = 8)
        // independent derivations of the same lazy graph — overlap the
        // small nodes/entries writes with the edge chain (the same
        // concurrency buildHnswTo uses; identical outputs)
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        import scala.concurrent.duration.Duration
        val fs = Seq(
          Future(g.edges.write.mode("overwrite").parquet(s"$prepDir/hnsw/edges")),
          Future(g.nodes.write.mode("overwrite").parquet(s"$prepDir/hnsw/nodes")),
          Future(g.entries.write.mode("overwrite").parquet(s"$prepDir/hnsw/entries")))
        fs.foreach(Await.result(_, Duration.Inf))
        spark.read.parquet(s"$prepDir/hnsw/edges")
      }),
      "b14_hnsw_search" -> (() => {
        val g = Hnsw.Graph(
          spark.read.parquet(s"$prepDir/hnsw/nodes"),
          spark.read.parquet(s"$prepDir/hnsw/edges"),
          spark.read.parquet(s"$prepDir/hnsw/entries"), "COSINE")
        val queries = docsCorpus.filter(col("doc_id") < 8)
          .select(col("doc_id").as("qid"), col("qv"))
        Hnsw.search(g, queries, k = 10, ef = 64)
      }),
      // bulk graph search: 512 queries through the shuffle-join query
      // attach — hops amortize across the whole query set (per-query cost
      // must fall ~an order of magnitude vs b14's 8-query request shape)
      "b14b_hnsw_search_bulk" -> (() => {
        val g = Hnsw.Graph(
          spark.read.parquet(s"$prepDir/hnsw/nodes"),
          spark.read.parquet(s"$prepDir/hnsw/edges"),
          spark.read.parquet(s"$prepDir/hnsw/entries"), "COSINE")
        val queries = docsCorpus.filter(col("doc_id") < 512)
          .select(col("doc_id").as("qid"), col("qv"))
        Hnsw.searchBulk(g, queries, k = 10, ef = 64)
      }),
      // decontamination pair: the exact operator distincts + shuffles the
      // full train shingle set; the bloom variant prunes the train side
      // map-side behind a broadcast filter of the (small) test shingles and
      // must return the identical rows (shared oracle)
      "b16_contam_exact" -> (() => SparkEntry.queries("q_contamination")(spark, sfDir)),
      "b16b_contam_bloom" -> (() => SparkEntry.queries("q_contam_bloom")(spark, sfDir)),
      // SemDeDup: seeded-medoid clustering + intra-cluster cosine drop —
      // the pair join is bounded by cluster size, never corpus²
      "b17_semantic_dedup" -> (() => SparkEntry.queries("q_semantic_dedup")(spark, sfDir)),
      // named corpus filters: Gopher + C4 are pure map-side scans (the
      // curation throughput floor — cost is tokenize-bound); CCNet buckets
      // add the LM-score joins + one per-lang window
      "b18_gopher_c4" -> (() =>
        SparkEntry.queries("q_gopher_rules")(spark, sfDir)
          .join(SparkEntry.queries("q_c4_rules")(spark, sfDir)
            // both gates emit a `keep` verdict; disambiguate for the
            // all-columns materialization checksum
            .withColumnRenamed("keep", "c4_keep"), "doc_id")),
      "b18b_ppx_buckets" -> (() => SparkEntry.queries("q_ppx_buckets")(spark, sfDir)),
      // BPE training: one corpus groupBy + 12 vocab-table merge rounds
      // (argmax row per round is the only driver traffic)
      "b19_bpe_train" -> (() => SparkEntry.queries("q_bpe_merges")(spark, sfDir)),
      // temporal joins: one-shuffle window as-of vs the bin-bucketed range
      // join (both would be nested-loop inequality joins in naive SQL);
      // the KMV sketch is the bounded-state distinct-count path
      "b20_asof_join" -> (() => SparkEntry.queries("q_asof_join")(spark, sfDir)),
      "b20b_range_join" -> (() => SparkEntry.queries("q_range_join")(spark, sfDir)),
      "b20c_kmv_vocab" -> (() => SparkEntry.queries("q_kmv_vocab")(spark, sfDir)),
      // candidate-verify heavy hitters (two scans, no term-universe
      // shuffle) and the one-window exact quantile pass
      "b21_heavy_hitters" -> (() => SparkEntry.queries("q_heavy_hitters")(spark, sfDir)),
      "b21b_quantiles" -> (() => SparkEntry.queries("q_quantiles")(spark, sfDir)),
      // interval-join composition: error events attributed to their
      // containing session (two windows + the binned interval join)
      "b20f_session_attrib" -> (() => SparkEntry.queries("q_session_attrib")(spark, sfDir)),
      // production vector widths: exact-KNN kernel at dim 384, persisted
      // IVF probe at dim 384, PQ-ADC at dim 1024 (16 subspaces)
      "b1d_knn_dim384" -> (() => Knn.search(orders384, q384,
        SearchParams(limit = 10, outputFields = Nil))),
      "b5d_ivf_probe_dim384" -> (() =>
        Ivf.probePersisted(persistedIvf384, q384, nprobe = 8, k = 10)),
      "b15c_pq_adc_dim1024" -> (() =>
        Ivf.probePqAdc(persistedPq1024, q1024, nprobe = 8, k = 10)),
      // graph + hybrid at width 384 (same corpus/queries as b14/b4c — the
      // delta is the kernel width through the beam hops / probe legs)
      "b14c_hnsw_search_dim384" -> (() => {
        val queries = docs384.filter(col("doc_id") < 8)
          .select(col("doc_id").as("qid"), col("dv").as("qv"))
        Hnsw.search(hnsw384, queries, k = 10, ef = 64)
      }),
      "b4d_hybrid_indexed_dim384" -> (() => {
        val queries = docs384.filter(col("doc_id") < 8)
          .select(col("doc_id").as("qid"), col("dv").as("qv"))
        val dense = Ivf.probePersisted(persistedDocsIvf384, queries,
          nprobe = 16, k = 50)
          .select(col("qid"), col("doc_id"), col("score").as("rawScore"))
        Hybrid.searchScored(dense, persistedBm25,
          (0L until 8L).map(_ -> "spark join window merge data"),
          SearchParams(limit = 10))
      }),
      // churn-debt serving pair: beam search over the 12×-absorbed graph vs
      // the one-shot rebuild of the same corpus (see fixture comment)
      "b14d_hnsw_search_churned" -> (() =>
        Hnsw.search(benchCat.loadHnsw("bench", "hnswchurn"),
          Tables.queryBatch(spark, 8, 64), k = 10, ef = 64)),
      "b14e_hnsw_search_rebuilt" -> (() =>
        Hnsw.search(benchCat.loadHnsw("bench", "hnswfresh"),
          Tables.queryBatch(spark, 8, 64), k = 10, ef = 64)),
      // streaming curation throughput: one micro-batch of the curate
      // pipeline (PII scrub → quality gate → LSH near-dup gate against the
      // persisted index → bucketed merge). Fresh keys per iteration: the
      // index grows like a live crawl; the gate work (band-pruned LSH
      // query) is the dominant, corpus-size-independent term.
      "b22_curate_batch" -> (() => {
        b22Gen += 1
        // 1e9-spaced offsets above 1e12: disjoint from corpus ids at any sf
        val inc = docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + lit(1000000000000L + b22Gen * 1000000000L))
            .as("doc_id"), col("text"))
        graft.streaming.CurateStream.curateBatch(spark, inc,
          s"$prepDir/curidx", s"$prepDir/curated",
          minQuality = 0.3, threshold = 0.75, nBuckets = 16)
        spark.range(1).toDF("ok")
      }),
      // LAST in the run order: its detached rebuild may still be running
      // when the bench ends (by design — that is the row's whole claim),
      // and trailing it keeps that background work from polluting other
      // rows' timings
      "b6g_upsert_at_threshold" -> (() => {
        b6gGen += 1
        benchCat.insert("bench", "thresh", upsertBatch(b6gGen, "thresh"))
        spark.range(1).toDF("ok")
      }),
      "b6h_upsert_hnsw_at_threshold" -> (() => {
        b6hGen += 1
        benchCat.insert("bench", "hthresh", hnswChurnBatch(b6hGen, "hthresh"))
        spark.range(1).toDF("ok")
      }),
      "b6i_upsert_hnsw_control" -> (() => {
        b6iGen += 1
        benchCat.insert("bench", "hplain", hnswChurnBatch(b6iGen, "hplain"))
        spark.range(1).toDF("ok")
      }),
      // the serving-default insert: growing-segment append (window=8) —
      // folds appear as every-8th-iteration spikes in the stderr trace
      "b6j_upsert_hnsw_pending" -> (() => {
        b6jGen += 1
        benchCat.insert("bench", "hpend", hnswChurnBatch(b6jGen, "hpend"))
        spark.range(1).toDF("ok")
      }),
    ) ++ (if (sys.env.contains("SPARK_GRAFT_BENCH_HOTKEY")) Seq[(String, () => DataFrame)](
      // OPT-IN (minutes-long by design): the skew case the chunked as-of
      // exists for — 30M events on ONE key. Plain as-of serializes the key
      // into a single partition's window sort (measured 141 s); the chunked
      // form splits it across 64 time chunks (14.6 s, 9.7x — SCALE.md).
      // Results are bit-equal (TemporalJoinSpec). Excluded from the default
      // set so the per-round bench stays fast.
      "b20d_asof_hotkey" -> (() => TemporalJoin.asof(
        hotLeft, hotRight, Seq("k"), "ts", rightTie = Some("rid"))),
      "b20e_asof_hotkey_chunked" -> (() => TemporalJoin.asofChunked(
        hotLeft, hotRight, Seq("k"), "ts", rightTie = Some("rid"),
        chunkUs = HotSpanUs / 64)),
    ) else Seq.empty)

    // Each bench: best of `iters` timed runs. Measured single-shot swings
    // of 2–10× on identical code from JVM/host state (block-manager debt,
    // JIT, burst-throttled disk); min-of-N reports the operator, not the
    // noise. Per-iteration times go to stderr for transparency.
    // A FAILED iteration contributes NO time: r5's harness let a crashed
    // bench's time-to-exception enter `min`, so three red benches published
    // as fast numbers. Failures now surface per-bench in an `errors` JSON
    // field (+ an error_count), and a bench with zero successful iterations
    // reports no timing at all.
    // Fail fast on name drift BEFORE any timing: (a) a fixture gate naming a
    // bench that no longer exists (rename without updating the gate), and
    // (b) a SPARK_GRAFT_BENCH_ONLY entry that matches nothing (typo — the
    // selected bench would otherwise just be silently absent from results).
    // The hotkey pair is opt-in via env, so its names count as known even
    // when the Seq above excluded them.
    val knownNames = benches.map(_._1).toSet ++
      Set("b20d_asof_hotkey", "b20e_asof_hotkey_chunked")
    val staleGates = gateNames.toSet -- knownNames
    require(staleGates.isEmpty,
      s"fixture gate references unknown bench(es): ${staleGates.mkString(", ")}")
    only.foreach { sel =>
      val unknown = sel -- knownNames
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names unknown bench(es): ${unknown.mkString(", ")}")
    }

    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    val results = benches.filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
        val runs: Seq[Either[String, Double]] = (1 to iters).map { _ =>
          // isolate benches from each other's JVM debt: the heavy ones swing
          // up to 10× when they inherit a block manager full of predecessors'
          // dead localCheckpoint blocks (only a driver GC lets the
          // ContextCleaner drop them). All prep state is parquet, so clearing
          // the cache between benches drops nothing a bench needs.
          spark.catalog.clearCache()
          System.gc()
          Thread.sleep(1000) // the cleaner applies GC'd refs asynchronously
          val t0 = System.nanoTime()
          try {
            consume(fn()).count()
            Right((System.nanoTime() - t0) / 1e9)
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e")
            Left(e.toString.take(300))
          }
        }
        System.err.println(s"[bench] $name iters: " + runs.map {
          case Right(t) => f"$t%.2f"
          case Left(_)  => "ERROR"
        }.mkString(", "))
        (name, runs.collect { case Right(t) => t },
          runs.collect { case Left(m) => m })
      }
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val ok = results.collect { case (n, ts, _) if ts.nonEmpty => n -> ts.min }
    val failed = results.collect { case (n, _, errs) if errs.nonEmpty => n -> errs.head }
    val qs = ok.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errs = failed.map { case (k, m) => "\"" + k + "\":\"" + esc(m) + "\"" }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""errors":$errs,"error_count":${failed.size},"sf":"$sfDir"}"""
    // BENCH_r09 arrived with "parsed": null — the JSON line was buried in
    // sbt's interleaved stderr stream. Two fixes: (a) persist the line to
    // bench.json in the working directory (a machine-readable artifact no
    // log interleaving can corrupt), and (b) print it LAST, after
    // spark.stop(), so no trailing Spark shutdown logs follow it on the
    // combined stream.
    java.nio.file.Files.write(java.nio.file.Paths.get("bench.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // NOT exiting non-zero on bench errors: the driver must still receive
    // the JSON line (with its errors/error_count fields) — an artifact
    // dropped on exit status is exactly the silent-red failure mode r5 had
    spark.stop()
    println(json)
    System.out.flush()
  }
}
