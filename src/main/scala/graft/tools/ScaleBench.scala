package graft.tools

import graft.core.Tables
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second scale point for the serving headliners (b1, b5b, b14, b3b): the
  * driver testdata tops out at sf0.1, so this tool replicates it `factor`×
  * with perturbed PRIMARY KEYS (key' = key·factor + r) — every copy gets
  * distinct keys, and the key-derived synthetic vectors (Tables.synthVec)
  * therefore differ per copy, so the scaled corpus is not `factor`
  * identical clusters. Embedding-backed tables keep their float vectors
  * (10 near-duplicate shells — conservative for IVF balance: real data
  * would spread MORE evenly). Index builds are untimed prep, as in Bench.
  *
  * Prints one JSON line per query: sf0.1 seconds, scaled seconds, and the
  * slope (scaled / sf0.1 / factor — 1.0 = perfectly linear, <1 =
  * sublinear). SCALE.md tables the results.
  */
object ScaleBench {

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    // The dedup pair runs two regimes. At factor ≤ 10 the replicated corpus
    // keeps the TEXT of each copy identical (only keys perturbed), so
    // duplicate density — and with it LSH candidate-pair volume — grows
    // with the factor itself: the worst case, isolating the
    // index-vs-recompute gap. Past 10× that "slope" would measure the
    // quadratic dup-density blowup by construction, so the incremental
    // query instead runs against a CONSTANT-DENSITY replica
    // (documents_cd: every non-zero copy's tokens are replica-prefixed, so
    // cross-replica similarity is 0 and dups-per-doc stays at the base
    // rate whatever the factor) — the realistic corpus-growth regime.
    val withDedup = factor <= 10
    val constDensityDedup = factor > 10
    val src    = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out    = args.drop(1).headOption.getOrElse("target/sfx10")
    val cpus   = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- replicate (idempotent: skip when the output exists) ----
    def replicate(name: String, keyCols: Seq[String]): Unit = {
      val dst = s"$out/$name.parquet"
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(dst))) return
      val base = Tables.load(spark, src, name)
      val copies = spark.range(factor).select(col("id").as("_r"))
      var df = base.crossJoin(copies)
      for (k <- keyCols)
        df = df.withColumn(k, col(k) * factor + col("_r"))
      df.drop("_r").write.mode("overwrite").parquet(dst)
    }
    replicate("orders", Seq("o_orderkey"))
    replicate("documents", Seq("doc_id"))
    replicate("embeddings", Seq("vec_id"))
    // events: perturb user_id too — factor× the users at constant per-user
    // event density (the realistic growth regime for an event stream; the
    // temporal-join windows then stay constant-size per key and the slope
    // measures row volume, not per-key pileup)
    replicate("events", Seq("event_id", "user_id"))

    // Constant-density dedup corpus: same replication, but copy r>0 has
    // every token prefixed with its replica id ("z<r>w<token>") — shingle
    // sets are disjoint across replicas, so the only near-dups are each
    // replica's own base-rate dups: dup density is scale-invariant.
    // Written separately so the text change never touches the BM25/HNSW
    // headliners' corpus.
    if (constDensityDedup &&
        !java.nio.file.Files.exists(java.nio.file.Paths.get(s"$out/documents_cd.parquet"))) {
      val base = Tables.load(spark, src, "documents")
      val copies = spark.range(factor).select(col("id").as("_r"))
      base.crossJoin(copies)
        .withColumn("text", when(col("_r") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("([A-Za-z0-9]+)"),
            concat(lit("z"), col("_r"), lit("w$1")))))
        .withColumn("doc_id", col("doc_id") * factor + col("_r"))
        .drop("_r")
        .write.mode("overwrite").parquet(s"$out/documents_cd.parquet")
    }

    // ---- untimed prep at BOTH scales (persisted serving state) ----
    // per-index THUNKS: with SPARK_GRAFT_SCALE_ONLY restricted to queries
    // that never touch an index family, that family's build/load never runs
    // (a b22-only 100x run must not require the 100x HNSW graph)
    case class Prep(ivf: () => Ivf.Index, ivfDocs: () => Ivf.Index,
      bmDir: () => String, g: () => Hnsw.Graph, ddDir: () => String,
      curDir: () => String)
    def loadIvf(dir: String): Ivf.Index = Ivf.Index(
      spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/clustered"), "COSINE")
    def buildIvf(dir: String, corpus: DataFrame): Unit =
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dir))) {
        val idx = Ivf.build(corpus, nlist = 256, maxIter = 5)
        idx.clustered.repartition(col("centroid_id"))
          .write.mode("overwrite").partitionBy("centroid_id")
          .parquet(s"$dir/clustered")
        idx.centroids.write.mode("overwrite").parquet(s"$dir/centroids")
      }
    def prep(sfDir: String, tag: String): Prep = {
      lazy val ivfDir = {
        val d = s"$out/prep_$tag/ivf"
        buildIvf(d, Tables.ordersCorpus(spark, sfDir).select("doc_id", "dv"))
        d
      }
      // second IVF over the embedding-backed corpus: the dense leg of the
      // indexed hybrid (b4b) — same collection as the sparse leg's corpus
      lazy val ivfDocsDir = {
        val d = s"$out/prep_$tag/ivf_docs"
        buildIvf(d, Tables.docsCorpus(spark, sfDir)
          .select(col("doc_id"), col("qv").as("dv")))
        d
      }
      lazy val bmDir = {
        val d = s"$out/prep_$tag/bm25"
        if (!graft.sources.SparseIndex.exists(d))
          graft.sources.SparseIndex.write(
            Bm25.fit(Tables.load(spark, sfDir, "documents")), d, nBuckets = 16)
        d
      }
      lazy val g = {
        val hnswDir = s"$out/prep_$tag/hnsw"
        // completeness check on ALL THREE tables: a killed prior build can
        // strand nodes without edges/entries — rebuild rather than crash
        val whole = Seq("nodes", "edges", "entries").forall(t =>
          java.nio.file.Files.exists(java.nio.file.Paths.get(s"$hnswDir/$t")))
        if (!whole) {
          val built = Hnsw.build(Tables.docsCorpus(spark, sfDir)
            .select(col("doc_id"), col("qv").as("dv")), m = 8)
          built.nodes.write.mode("overwrite").parquet(s"$hnswDir/nodes")
          built.edges.write.mode("overwrite").parquet(s"$hnswDir/edges")
          built.entries.write.mode("overwrite").parquet(s"$hnswDir/entries")
        }
        Hnsw.Graph(
          spark.read.parquet(s"$hnswDir/nodes"),
          spark.read.parquet(s"$hnswDir/edges"),
          spark.read.parquet(s"$hnswDir/entries"), "COSINE")
      }
      // Dedup index corpus: worst-case identical-text replica at ≤10×;
      // constant-density replica at >10× — there the exclusion removes the
      // increment docs' r=0 content twins, so BOTH scales' queries see the
      // same base-rate candidate set and the slope isolates corpus-size
      // cost (band-partition reads) from candidate volume.
      lazy val ddDir = {
        val d =
          if (constDensityDedup) s"$out/prep_$tag/dedupidx_cd"
          else s"$out/prep_$tag/dedupidx"
        if (!graft.sources.DedupIndex.exists(d)) {
          val ddDocs =
            if (!constDensityDedup || sfDir == src)
              Tables.load(spark, sfDir, "documents").select("doc_id", "text")
                .filter(col("doc_id") % 5 =!= 0)
            else
              spark.read.parquet(s"$out/documents_cd.parquet")
                .select("doc_id", "text")
                .filter(!(col("doc_id") % factor === 0 &&
                  expr(s"doc_id DIV $factor") % 5 === 0))
          graft.sources.DedupIndex.build(ddDocs, d, nBuckets = 16)
        }
        d
      }
      // streaming-curation index: SEPARATE from ddDir (curateBatch MUTATES
      // its index via ingestDeduped) — built over the same 80% split
      lazy val curDir = {
        val d = s"$out/prep_$tag/curidx"
        if (!graft.sources.DedupIndex.exists(d))
          graft.sources.DedupIndex.build(
            Tables.load(spark, sfDir, "documents").select("doc_id", "text")
              .filter(col("doc_id") % 5 =!= 0), d, nBuckets = 16)
        d
      }
      Prep(() => loadIvf(ivfDir), () => loadIvf(ivfDocsDir), () => bmDir,
        () => g, () => ddDir, () => curDir)
    }

    // full-materialization guard, applied at the timing site (see Bench)
    def consume(df: DataFrame): DataFrame = Tables.checksumAll(df)

    val q64 = Tables.queryBatch(spark, 64)
    // FIXED 512-doc increment for the dedup pair, same at both scales
    // (from the base table, so the query side is scale-invariant; its ids
    // are disjoint-enough from either corpus split)
    val dedupIncrement = Tables.load(spark, src, "documents")
      .select("doc_id", "text")
      .filter(col("doc_id") % 5 === 0 && col("doc_id") < 2560)
    // b22 iteration counter (fresh keys per timed call). The curidx fixture
    // is cached across ScaleBench runs and curateBatch MUTATES it: each
    // timed call grows the accepted corpus by ≤512 docs — negligible drift
    // vs the 50k/500k bases, and every call ingests genuinely new keys.
    var b22Gen = 0
    // Decontamination fixture: the "protected benchmark suite" (test split)
    // is FIXED at the base corpus's test docs while the train corpus grows
    // with the factor — the asymmetry contaminationBloom is built for. At
    // the scaled dir only r=0 copies are split-eligible (their BASE id
    // decides, same hash as TextAnalysis.split); every r>0 copy is train.
    // Past 10× the corpus is the constant-density replica, where the bloom
    // prune rate itself falls ~1/factor (cross-replica shingles are
    // disjoint from the fixed test set) — exact must shuffle the whole
    // train shingle stream either way.
    def contamFixture(sfDir: String): (DataFrame, DataFrame) = {
      val scaledRun = sfDir != src
      val docsDf =
        if (scaledRun && constDensityDedup)
          spark.read.parquet(s"$out/documents_cd.parquet")
        else Tables.load(spark, sfDir, "documents")
      val trainCut = (0.8 * 4294967296.0).toLong
      val validCut = (0.9 * 4294967296.0).toLong
      def splitOf(id: org.apache.spark.sql.Column) = {
        val h = (id * 2654435761L) % 4294967296L
        when(h < trainCut, "train").when(h < validCut, "valid").otherwise("test")
      }
      val split =
        if (!scaledRun)
          docsDf.select(col("doc_id"), splitOf(col("doc_id")).as("split"))
        else docsDf.select(col("doc_id"),
          when(col("doc_id") % factor === 0,
            splitOf(expr(s"doc_id DIV $factor"))).otherwise("train").as("split"))
      (docsDf, split)
    }
    def headliners(sfDir: String, tag: String): Seq[(String, () => DataFrame)] = {
      // lazy: with SPARK_GRAFT_SCALE_ONLY restricted to queries that read
      // no persisted index (e.g. the map-side curation filters), the index
      // prep never runs at all
      lazy val p = prep(sfDir, tag)
      Seq(
        "b1_knn_cos_64q" -> (() => Knn.search(Tables.ordersCorpus(spark, sfDir),
          q64, SearchParams(limit = 10, outputFields = Nil))),
        "b5b_ivf_probe_persisted" -> (() =>
          Ivf.probePersisted(p.ivf(), q64, nprobe = 16, k = 10)),
        // LSH ANN with the AUTO-SCALED plane count (r12): fixed planes made
        // the per-query candidate set a linear fraction of the corpus
        // (bucket size n/2^planes); auto planes hold bucket size ~64, so
        // only the corpus bucketing scan grows with n and the slope falls
        "b11_ann_lsh" -> (() => {
          val c = Tables.docsCorpus(spark, sfDir)
          AnnLsh.search(c.select(col("doc_id"), col("qv")),
            c.filter(col("doc_id") < 64).select(col("doc_id").as("qid"), col("qv")),
            k = 10,
            corpusCount = Some(Tables.parquetRowCount(spark, s"$sfDir/embeddings.parquet")))
        }),
        "b14_hnsw_search" -> (() => {
          val queries = Tables.docsCorpus(spark, sfDir).filter(col("doc_id") < 8)
            .select(col("doc_id").as("qid"), col("qv"))
          Hnsw.search(p.g(), queries, k = 10, ef = 64)
        }),
        // graph BUILD at scale: the claim is linear shuffle volume (keyed
        // cell/bucket joins, per-node top-m) with no quadratic term — the
        // timed DAG is the full edge construction incl. the coarse KMeans
        "b13_hnsw_build" -> (() =>
          Hnsw.build(Tables.docsCorpus(spark, sfDir)
            .select(col("doc_id"), col("qv").as("dv")), m = 8).edges),
        "b3b_bm25_persisted" -> (() => Bm25.searchTopK(
          graft.sources.SparseIndex.read(spark, p.bmDir()),
          (0L until 8L).map(_ -> "spark join window merge data"), 10)),
        // the reference's signature operator in its 100 TB form: dense leg
        // from the persisted IVF (cell-pruned partition reads), sparse leg
        // from the persisted BM25, RRF fusion over two top-≤50 legs — the
        // facade's haveIndex hybrid branch as a bulk plan
        "b4b_hybrid_indexed" -> (() => {
          val queries = Tables.docsCorpus(spark, sfDir).filter(col("doc_id") < 8)
            .select(col("doc_id").as("qid"), col("qv"))
          val dense = Ivf.probePersisted(p.ivfDocs(), queries, nprobe = 16, k = 50)
            .select(col("qid"), col("doc_id"), col("score").as("rawScore"))
          Hybrid.searchScored(dense,
            graft.sources.SparseIndex.read(spark, p.bmDir()),
            (0L until 8L).map(_ -> "spark join window merge data"),
            SearchParams(limit = 10))
        }),
        // dedup pair: the full recompute scales with the corpus, the index
        // query only with the (fixed) increment + candidate volume — the
        // slope GAP is what the persisted index buys. At ≤10× the replica
        // keeps copy text identical (candidate-volume worst case); past
        // 10× the full recompute is dropped (quadratic by construction)
        // and the incremental query runs the constant-density regime
        // (see prep) so its slope measures corpus scaling alone.
        "b7_dedup_full_recompute" -> (() => Dedup.lshCandidatePairs(
          Dedup.minhashSignatures(Tables.load(spark, sfDir, "documents")))),
        "b7c_dedup_incr_query" -> (() => graft.sources.DedupIndex.queryBatch(
          spark, p.ddDir(), dedupIncrement, nBuckets = 16)),
        // curation throughput floor: the Gopher+C4 map-side gates over the
        // whole corpus — linear by design (every doc is read once); the
        // claim under measure is constant PER-DOC cost (slope ≈ 1/f · t1/t0
        // stays ~flat) with no shuffle at any scale
        // decontamination pair: exact distincts + shuffles every train
        // (doc, shingle) pair; bloom prunes the train side MAP-SIDE against
        // the fixed test set's broadcast filter before its first exchange.
        // The slope gap is what the probe buys when the protected suite
        // stays small and the corpus grows.
        "b16_contam_exact" -> (() => {
          val (d, s) = contamFixture(sfDir)
          Dedup.contamination(d, s)
        }),
        "b16b_contam_bloom" -> (() => {
          val (d, s) = contamFixture(sfDir)
          Dedup.contaminationBloom(d, s)
        }),
        "b18_gopher_c4" -> (() =>
          graft.SparkEntry.queries("q_gopher_rules")(spark, sfDir)
            .join(graft.SparkEntry.queries("q_c4_rules")(spark, sfDir)
              .withColumnRenamed("keep", "c4_keep"), "doc_id")),
        // CCNet bucketing: corpus-wide LM-score joins + a per-lang window —
        // the cheapest curation stage that is NOT purely map-side
        "b18b_ppx_buckets" -> (() =>
          graft.SparkEntry.queries("q_ppx_buckets")(spark, sfDir)),
        // BPE training: the corpus pass scales with the data; the 12 merge
        // rounds scale with the VOCAB (fixed here), so the slope isolates
        // the corpus-pass share
        "b19_bpe_train" -> (() =>
          graft.SparkEntry.queries("q_bpe_merges")(spark, sfDir)),
        // temporal joins over the replicated event stream (factor× users at
        // constant per-user density): as-of is one shuffle + per-key window
        // — linear rows, constant per-key window; the range join's shuffle
        // carries ≤2 bins per left row — both claims are "no superlinear
        // term", the slope should read ≈ scan-bound linear or below
        "b20_asof_join" -> (() =>
          graft.SparkEntry.queries("q_asof_join")(spark, sfDir)),
        "b20b_range_join" -> (() =>
          graft.SparkEntry.queries("q_range_join")(spark, sfDir)),
        // KMV sketch: identical-text replicas keep the true vocabulary
        // CONSTANT while the token stream grows factor× — the sketch's
        // shuffle stays k·|langs|·|partitions| longs at any factor, so the
        // slope isolates the irreducible token-scan term
        "b20c_kmv_vocab" -> (() =>
          graft.SparkEntry.queries("q_kmv_vocab")(spark, sfDir)),
        // candidate-verify heavy hitters: two token scans, the exchange is
        // ≤2k (term,count) partials + candidate rows — never the term
        // universe; quantiles: one spillable window sort
        "b21_heavy_hitters" -> (() =>
          graft.SparkEntry.queries("q_heavy_hitters")(spark, sfDir)),
        "b21b_quantiles" -> (() =>
          graft.SparkEntry.queries("q_quantiles")(spark, sfDir)),
        // streaming-curation micro-batch (b22): the FIXED 512-doc increment
        // through scrub → quality gate → LSH near-dup gate against the
        // persisted index → bucketed merge. The request is scale-invariant;
        // the slope measures how micro-batch cost depends on the ACCEPTED
        // CORPUS size behind the index — band/bucket-pruned reads + a
        // touched-buckets-only merge should keep it near-flat. Fresh keys
        // per call (counter-offset) so timed iterations ingest, not no-op.
        "b22_curate_batch" -> (() => {
          // monotonic 1e9-spaced key offsets above 1e12: disjoint from any
          // replicated corpus id (≤ ~5e8 even at 100×) and from every other
          // iteration — nanoTime-derived offsets collided at 1e6 spacing
          b22Gen += 1
          val inc = dedupIncrement.select(
            (col("doc_id") + lit(1000000000000L + b22Gen * 1000000000L))
              .as("doc_id"), col("text"))
          graft.streaming.CurateStream.curateBatch(spark, inc,
            p.curDir(), s"$out/prep_$tag/curated",
            minQuality = 0.3, threshold = 0.75, nBuckets = 16)
          spark.range(1).toDF("ok")
        }),
      ).filter { case (name, _) => withDedup || name != "b7_dedup_full_recompute" }
    }

    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    def time(fn: () => DataFrame): Double = {
      val ts = (1 to iters).map { _ =>
        spark.catalog.clearCache(); System.gc(); Thread.sleep(1000)
        val t0 = System.nanoTime()
        consume(fn()).count()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(s"[scale] iters: ${ts.map(t => f"$t%.2f").mkString(", ")}")
      ts.min
    }

    // iteration aid (mirrors Bench's SPARK_GRAFT_BENCH_ONLY): time just the
    // named queries — combined with the lazy prep this lets cheap map-side
    // rows be measured at factors whose index prep would cost hours
    val onlySet = sys.env.get("SPARK_GRAFT_SCALE_ONLY").map(_.split(",").toSet)
    val base   = headliners(src, "sf01").toMap
    val scaled = headliners(out, s"sfx$factor").toMap
    val rows = base.keys.toSeq.sorted
      .filter(name => onlySet.forall(_.contains(name)))
      .map { name =>
      val t0 = time(base(name))
      val t1 = time(scaled(name))
      val slope = t1 / t0 / factor
      System.err.println(f"[scale] $name%-24s sf0.1 $t0%6.2f s  x$factor $t1%6.2f s  slope $slope%.3f")
      s""""$name":{"sf01":$t0,"x$factor":$t1,"slope":${"%.4f".format(slope)}}"""
    }
    println(s"""{"metric":"scale_slopes","factor":$factor,"queries":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
