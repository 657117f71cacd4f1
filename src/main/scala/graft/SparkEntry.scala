package graft

import graft.core.Tables
import graft.operators.{AnnLsh, Bm25, Bpe, Dedup, Hnsw, Hybrid, Ivf, Knn, Multimodal, SearchParams, Sessionize, TemporalJoin, TextAnalysis, Upsert}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exact cosine KNN with threshold + meta filter over the orders corpus —
    * the reference's core search path (SURVEY §2.2/§2.4) end-to-end.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val c = Tables.docsCorpus(spark, dir)
    Hybrid.search(
      c.select(col("doc_id"), col("qv").as("dv")),
      c.filter(col("doc_id") < 4).select(col("doc_id").as("qid"), col("qv")),
      Bm25.fit(Tables.load(spark, dir, "documents")),
      (0L until 4L).map(_ -> "spark join window merge data"),
      SearchParams(metric = "COSINE", limit = 10))
  }

  private def dec(c: String) = col(c).cast("decimal(18,2)")

  /** Shared query texts for the sparse/hybrid queries (2 qids, same text). */
  val HybridQueryTexts: Seq[(Long, String)] =
    Seq(0L -> "spark join window merge data", 1L -> "spark join window merge data")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- A1 exact top-k dense search, three metrics ----
    "q_knn_cosine" -> ((s, dir) =>
      Knn.search(Tables.ordersCorpus(s, dir), Tables.queryBatch(s, 8),
        SearchParams(metric = "COSINE", limit = 10, outputFields = Nil))),
    "q_knn_l2" -> ((s, dir) =>
      Knn.search(Tables.ordersCorpus(s, dir), Tables.queryBatch(s, 8),
        SearchParams(metric = "L2", limit = 10, outputFields = Nil))),
    "q_knn_ip" -> ((s, dir) =>
      Knn.search(Tables.ordersCorpus(s, dir), Tables.queryBatch(s, 8),
        SearchParams(metric = "IP", limit = 10, outputFields = Nil))),

    // ---- P2 threshold + A5 offset ----
    "q_knn_threshold" -> ((s, dir) =>
      Knn.search(Tables.ordersCorpus(s, dir), Tables.queryBatch(s, 8),
        SearchParams(metric = "COSINE", limit = 10, offset = 5,
          scoreThreshold = Some(0.15), outputFields = Nil))),

    // ---- P8 round_decimal on top of threshold+offset (oracle-covers the
    //      score rounding path, search_request.py:70-75) ----
    "q_knn_round" -> ((s, dir) =>
      Knn.search(Tables.ordersCorpus(s, dir), Tables.queryBatch(s, 8),
        SearchParams(metric = "COSINE", limit = 10, offset = 5,
          scoreThreshold = Some(0.15), roundDecimal = 4, outputFields = Nil))),

    // ---- dynamic-field filter over the `extra` map (enable_dynamic_field
    //      parity, base_milvus.py:996,1071) ----
    "q_extra_filter" -> ((s, dir) => {
      val corpus = Tables.ordersCorpus(s, dir)
        .withColumn("extra", map(
          lit("priority"), expr("split(get_json_object(meta, '$.priority'), '-')[0]"),
          lit("status"), get_json_object(col("meta"), "$.status")))
      Knn.search(corpus, Tables.queryBatch(s, 8),
        SearchParams(metric = "COSINE", limit = 10,
          extraFilter = Map("priority" -> "2"), outputFields = Nil))
    }),

    // ---- A3 range search ----
    "q_knn_range" -> ((s, dir) =>
      Knn.search(Tables.ordersCorpus(s, dir), Tables.queryBatch(s, 8),
        SearchParams(metric = "COSINE", limit = 10,
          rangeFilter = Some((0.05, 0.3)), outputFields = Nil))),

    // ---- P5/P7 meta filter over JSON metadata ----
    "q_knn_meta" -> ((s, dir) =>
      Knn.search(Tables.ordersCorpus(s, dir), Tables.queryBatch(s, 8),
        SearchParams(metric = "COSINE", limit = 10,
          metaFilter = Map("priority" -> "URGENT"), outputFields = Seq("meta")))),

    // ---- P3/P4 text filter with over-fetch over documents corpus ----
    "q_knn_text" -> ((s, dir) => {
      val corpus = Tables.docsCorpus(s, dir)
        .select(col("doc_id"), col("qv").as("dv"), col("text").as("chunk"))
      val queries = Tables.docsCorpus(s, dir).filter(col("doc_id") < 4)
        .select(col("doc_id").as("qid"), col("qv"))
      Knn.search(corpus, queries,
        SearchParams(metric = "COSINE", limit = 10,
          textFilter = Some("the spark join window"), minimumWordsMatch = 2,
          increaseLimitForTextSearch = 10, outputFields = Nil))
    }),

    // ---- A2/H1/H2: sparse BM25 top-k over documents ----
    "q_bm25_topk" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Bm25.searchTopK(Bm25.fit(docs), HybridQueryTexts, 10)
    }),

    // ---- D4 persisted sparse index + incremental upsert: build with STALE
    //      text for every 10th doc, incrementally replace via
    //      SparseIndex.upsert, search from the stored tables. The oracle is a
    //      from-scratch BM25 over the TRUE corpus — proving the persisted
    //      incremental path (removeDocs + mergeStats on storage) equals a
    //      full refit, bit-exact.
    "q_bm25_persisted" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
      val stale = docs.withColumn("text",
        when(col("doc_id") % 10 === 0, lit("stale placeholder text"))
          .otherwise(col("text")))
      val tmp = java.nio.file.Files.createTempDirectory("graft_sparse_idx").toString
      graft.sources.SparseIndex.write(Bm25.fit(stale), tmp, nBuckets = 8)
      graft.sources.SparseIndex.upsert(s, tmp,
        docs.filter(col("doc_id") % 10 === 0), nBuckets = 8)
      Bm25.searchTopK(graft.sources.SparseIndex.read(s, tmp), HybridQueryTexts, 10)
    }),

    // ---- H3-H5: hybrid dense+sparse RRF fusion ----
    "q_hybrid_rrf" -> ((s, dir) => {
      val corpus = Tables.docsCorpus(s, dir)
        .select(col("doc_id"), col("qv").as("dv"))
      val queries = Tables.docsCorpus(s, dir).filter(col("doc_id") < 2)
        .select(col("doc_id").as("qid"), col("qv"))
      val docs = Tables.load(s, dir, "documents")
      Hybrid.search(corpus, queries, Bm25.fit(docs), HybridQueryTexts,
        SearchParams(metric = "COSINE", limit = 10, scoreThreshold = Some(0.0)))
    }),
    // Bulk hybrid: the SAME request through [[Hybrid.searchDf]] — query
    // text rides the query DataFrame (distributed tokenization via
    // Bm25.searchTopKDf) instead of a driver Seq. Same oracle as
    // q_hybrid_rrf: the bulk plan must reproduce the Seq path bit-for-bit.
    "q_hybrid_bulk" -> ((s, dir) => {
      val corpus = Tables.docsCorpus(s, dir)
        .select(col("doc_id"), col("qv").as("dv"))
      val queries = Tables.docsCorpus(s, dir).filter(col("doc_id") < 2)
        .select(col("doc_id").as("qid"), col("qv"),
          lit("spark join window merge data").as("text"))
      val docs = Tables.load(s, dir, "documents")
      Hybrid.searchDf(corpus, queries, Bm25.fit(docs),
        SearchParams(metric = "COSINE", limit = 10, scoreThreshold = Some(0.0)))
    }),

    // ---- dedup family over documents (training-data pipeline ops) ----
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exact(Tables.load(s, dir, "documents"))),
    "q_dedup_minhash" -> ((s, dir) =>
      Dedup.minhashSignatures(Tables.load(s, dir, "documents"))),
    "q_dedup_lsh_pairs" -> ((s, dir) =>
      Dedup.lshCandidatePairs(Dedup.minhashSignatures(Tables.load(s, dir, "documents")))),
    "q_dedup_verified" -> ((s, dir) =>
      Dedup.minhashVerifiedPairs(Tables.load(s, dir, "documents"), 0.7)),
    // INCREMENTAL dedup: a crawl increment (doc_id % 5 == 0) queried
    // against a PERSISTED LSH index over the rest of the corpus — the
    // index is built in two incremental waves so the oracle checks the
    // upsert-composed stored state, and the query never recomputes corpus
    // signatures (sources/DedupIndex).
    "q_dedup_incr" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
      val tmp = java.nio.file.Files.createTempDirectory("graft_dedup_idx").toString
      graft.sources.DedupIndex.build(corpus.filter(col("doc_id") % 2 === 1),
        tmp, nBuckets = 8)
      graft.sources.DedupIndex.upsert(s, tmp,
        corpus.filter(col("doc_id") % 2 === 0), nBuckets = 8)
      graft.sources.DedupIndex.queryBatch(s, tmp,
        docs.filter(col("doc_id") % 5 === 0), nBuckets = 8)
    }),
    // the SAME increment forced down the over-cap path (maxBroadcast=4):
    // query signatures stay distributed, only band keys reach the driver —
    // the plan the index serves when an increment outgrows a broadcast.
    // Shares q_dedup_incr's oracle: the two physical paths must agree with
    // DuckDB independently.
    "q_dedup_incr_big" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
      val tmp = java.nio.file.Files.createTempDirectory("graft_dedup_idxb").toString
      graft.sources.DedupIndex.build(corpus.filter(col("doc_id") % 2 === 1),
        tmp, nBuckets = 8)
      graft.sources.DedupIndex.upsert(s, tmp,
        corpus.filter(col("doc_id") % 2 === 0), nBuckets = 8)
      graft.sources.DedupIndex.queryBatch(s, tmp,
        docs.filter(col("doc_id") % 5 === 0), nBuckets = 8, maxBroadcast = 4)
    }),
    // the ONLINE dedup gate over the same split: the increment's survivors
    // after dropping est_sim ≥ 0.5 matches against the stored corpus
    "q_dedup_gate" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
      val tmp = java.nio.file.Files.createTempDirectory("graft_dedup_gate").toString
      graft.sources.DedupIndex.build(docs.filter(col("doc_id") % 5 =!= 0),
        tmp, nBuckets = 8)
      graft.sources.DedupIndex.ingestDeduped(s, tmp,
          docs.filter(col("doc_id") % 5 === 0), threshold = 0.5, nBuckets = 8)
        .select("doc_id")
    }),
    // pairs → GROUPS: connected components by label propagation (root = min
    // doc_id per near-dup cluster), then the kept corpus after dropping
    // non-representative members — the end-to-end dedup materialization.
    "q_dedup_components" -> ((s, dir) =>
      Dedup.components(
        Dedup.minhashVerifiedPairs(Tables.load(s, dir, "documents"), 0.7))),
    "q_dedup_keep" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Dedup.dropNearDuplicates(docs,
          Dedup.minhashVerifiedPairs(docs, 0.7))
        .select("doc_id", "lang", "n_chars")
    }),
    "q_top_terms" -> ((s, dir) => {
      val toks = Dedup.tokenTable(Tables.load(s, dir, "documents"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("cnt").desc, col("term").asc)
      toks.join(Tables.load(s, dir, "documents").select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "term").agg(count(lit(1)).as("cnt"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select("lang", "rank", "term", "cnt")
    }),
    "q_dedup_simhash" -> ((s, dir) =>
      Dedup.simhash(Tables.load(s, dir, "documents"))),
    "q_dedup_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(Tables.load(s, dir, "documents"), "lang", 0.8)),
    "q_dedup_embed" -> ((s, dir) =>
      Dedup.embeddingPairs(Tables.docsCorpus(s, dir), "label", 0.4)),
    // SemDeDup (Abbas et al. 2023): seeded-medoid clusters, intra-cluster
    // cosine near-dup drop, kept set — the pair join never leaves a cluster.
    "q_semantic_dedup" -> ((s, dir) =>
      Dedup.semanticDedup(
        Tables.load(s, dir, "embeddings")
          .select(col("vec_id").as("doc_id"),
            Tables.quantize(col("embedding")).as("qv")),
        k = 16, threshold = 0.4)),

    // ---- text analysis over documents ----
    "q_lang_id" -> ((s, dir) =>
      TextAnalysis.langId(Tables.load(s, dir, "documents"))),
    "q_quality" -> ((s, dir) =>
      TextAnalysis.quality(Tables.load(s, dir, "documents"))),
    "q_token_counts" -> ((s, dir) =>
      TextAnalysis.tokenCounts(Tables.load(s, dir, "documents"))),
    "q_split" -> ((s, dir) =>
      TextAnalysis.split(Tables.load(s, dir, "documents"), "doc_id", 0.8, 0.1)
        .groupBy("split", "lang").agg(count(lit(1)).as("n_docs"))),
    "q_len_hist" -> ((s, dir) =>
      TextAnalysis.lengthHistogram(Tables.load(s, dir, "documents"))),
    "q_contamination" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Dedup.contamination(docs,
        TextAnalysis.split(docs, "doc_id", 0.8, 0.1).select("doc_id", "split"))
    }),
    // Bloom-prefiltered decontamination: bit-identical output to
    // q_contamination (same oracle SQL) — the train side is pruned map-side
    // by a broadcast Bloom filter of the test shingles before any shuffle.
    "q_contam_bloom" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Dedup.contaminationBloom(docs,
        TextAnalysis.split(docs, "doc_id", 0.8, 0.1).select("doc_id", "split"))
    }),
    // Per-source cap: no source may contribute more than N docs to the mix.
    "q_source_cap" -> ((s, dir) =>
      TextAnalysis.sourceCap(Tables.load(s, dir, "documents"), cap = 10)),
    // Deterministic global shuffle into training shards.
    "q_shuffle_shards" -> ((s, dir) =>
      TextAnalysis.shuffleShards(Tables.load(s, dir, "documents"), nShards = 8)),
    "q_curation" -> ((s, dir) =>
      TextAnalysis.curate(Tables.load(s, dir, "documents"), 0.5)),

    // ---- unigram-LM quality proxy (fixed-point log-prob accumulation) ----
    "q_lm_score" -> ((s, dir) =>
      TextAnalysis.unigramLogProb(Tables.load(s, dir, "documents"))),

    // ---- bigram-LM conditional log-prob (transition perplexity proxy) ----
    "q_bigram_lm" -> ((s, dir) =>
      TextAnalysis.bigramLogProb(Tables.load(s, dir, "documents"))),

    // ---- data mixing: deterministic stratified sampling by language ----
    "q_stratified" -> ((s, dir) =>
      TextAnalysis.stratifiedSample(Tables.load(s, dir, "documents"), "lang",
          Map("en" -> 0.5, "de" -> 0.25), defaultFrac = 0.1)
        .groupBy("lang").agg(count(lit(1)).as("n_kept"))),

    // ---- sequence packing: contiguous token-budget shards per language ----
    "q_token_shards" -> ((s, dir) =>
      TextAnalysis.tokenShards(Tables.load(s, dir, "documents"), "lang", 2000L)
        .groupBy("grp", "shard_id")
        .agg(count(lit(1)).as("n_docs"), sum("toks").as("total_toks"))),

    // ---- sequence packing: concat-and-chunk into 512-token training
    //      sequences via a two-phase (per-source, then offsets) prefix sum ----
    "q_pack_seqs" -> ((s, dir) =>
      TextAnalysis.packSequences(Tables.load(s, dir, "documents"), seqLen = 512L)),

    // ---- temperature-scaled source balancing (sqrt flattening) ----
    "q_temperature" -> ((s, dir) =>
      TextAnalysis.temperatureSample(Tables.load(s, dir, "documents"))),

    // ---- Gopher quality-rule gate (word/line/symbol/stopword heuristics;
    //      minWords lowered to the corpus's scale so the gate splits it) ----
    "q_gopher_rules" -> ((s, dir) =>
      TextAnalysis.gopherRules(Tables.load(s, dir, "documents"), minWords = 20L)),

    // ---- CCNet perplexity terciles (per-lang head/middle/tail cut) ----
    "q_ppx_buckets" -> ((s, dir) =>
      TextAnalysis.perplexityBuckets(Tables.load(s, dir, "documents"))),

    // ---- C4 heuristic clean (line keeps + lorem/brace/sentence gates) ----
    "q_c4_rules" -> ((s, dir) =>
      TextAnalysis.c4Rules(Tables.load(s, dir, "documents"))),

    // ---- Unicode NFC normalization (custom codegen Expression; oracle is
    //      DuckDB's independent nfc_normalize). The corpus is ASCII, so the
    //      query appends a decomposed (e + U+0301) and a precomposed é to
    //      every doc — the normalized text itself is hash-checked ----
    "q_nfc_normalize" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" caf"), lit("e\u0301"), lit(" caf\u00e9"))
          .as("text2"))
      d.select(col("doc_id"),
        length(col("text2")).as("raw_chars"),
        length(graft.functions.Normalize.nfc(col("text2"))).as("nfc_chars"),
        graft.functions.Normalize.nfc(col("text2")).as("nfc_text"))
    }),

    // ---- BPE tokenizer training (Sennrich merges over the corpus vocab).
    //      The merge count is fixed (12), so the loop IS SQL-expressible:
    //      the oracle chains 12 CTE rounds, each composing the argmax
    //      primitive of q_bpe_first_merge with the whole-symbol replace of
    //      q_bpe_encode (Oracles.bpeMerges) ----
    "q_bpe_merges" -> ((s, dir) => {
      import s.implicits._
      Bpe.train(Tables.load(s, dir, "documents"), numMerges = 12)
        .toDF("rank", "a", "b", "merged", "pair_count")
    }),

    // ---- BPE ENCODER under a fixed merge table (Oracles.BpeFixedMerges,
    //      one shared list): segmentation of every distinct corpus term,
    //      hash-compared against DuckDB's chained whole-symbol replaces ----
    "q_bpe_encode" -> ((s, dir) => {
      val terms = Dedup.tokenTable(Tables.load(s, dir, "documents"))
        .select("term").distinct()
      Bpe.encodeTerms(terms, Oracles.BpeFixedMerges)
        .select(col("term"), concat_ws(" ", col("pieces")).as("pieces"))
    }),

    // ---- first training merge pick: the argmax over Bpe.pairCounts of the
    //      initial character vocab IS one SQL query — gates train's scoring
    //      relation (the iterative loop itself stays spec-pinned) ----
    "q_bpe_first_merge" -> ((s, dir) =>
      Bpe.pairCounts(Bpe.vocab(Tables.load(s, dir, "documents")))
        .orderBy(col("c").desc, col("a"), col("b")).limit(1)),

    // ---- line-level boilerplate strike (CCNet/RefinedWeb paragraph-hash
    //      dedup). The corpus is single-line, so the query synthesizes the
    //      multi-line shape: doc text + a universal footer (df = |corpus|,
    //      always struck) + the doc's 40-char prefix (df > 2 exactly where
    //      near-dup docs share openings) ----
    "q_boilerplate" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents").select(col("doc_id"),
        concat_ws("\n", col("text"), lit("all rights reserved footer"),
          substring(col("text"), 1, 40)).as("text"))
      Dedup.boilerplateLines(d, maxDf = 2L)
    }),
    // ---- the cleaned corpus itself (same strike set, text hash-checked) ----
    "q_boilerplate_clean" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents").select(col("doc_id"),
        concat_ws("\n", col("text"), lit("all rights reserved footer"),
          substring(col("text"), 1, 40)).as("text"))
      Dedup.dropBoilerplateLines(d, maxDf = 2L)
    }),

    // ---- sliding-window chunking (size 32, overlap 8): the ingestion step
    //      that turns long docs into overlapping retrieval units ----
    "q_chunk" -> ((s, dir) =>
      TextAnalysis.chunkDocs(Tables.load(s, dir, "documents")
        .filter(col("doc_id") < 40), size = 32, overlap = 8)),

    // ---- span-level cross-doc duplication (8-gram overlap, Lee et al.) ----
    "q_ngram_overlap" -> ((s, dir) =>
      Dedup.ngramOverlap(Tables.load(s, dir, "documents"), n = 8)),

    // ---- intra-doc repetition ratio (Gopher-style quality signal) ----
    "q_repetition" -> ((s, dir) =>
      Dedup.repetition(Tables.load(s, dir, "documents"))),

    // ---- exact-substring span dedup (Lee et al. 2022 ExactSubstr,
    //      relational form): corpus-duplicated 4-token runs merged into
    //      maximal per-doc spans, and the span-removed corpus ----
    "q_substr_spans" -> ((s, dir) =>
      Dedup.duplicatedSpans(Tables.load(s, dir, "documents"), n = 4)),
    "q_substr_clean" -> ((s, dir) =>
      Dedup.dropDuplicatedSpans(Tables.load(s, dir, "documents"), n = 4)),

    // ---- Gopher duplicate-n-gram character fraction (union coverage of
    //      intra-doc repeated 2-grams; n scaled to the corpus' doc sizes) ----
    "q_gopher_dup" -> ((s, dir) =>
      Dedup.dupNgramCharFraction(Tables.load(s, dir, "documents"), n = 2)),

    // ---- PII scrub: deterministic synthetic PII injected, then counted
    //      and redacted (regex parity Spark <-> DuckDB) ----
    "q_pii_scrub" -> ((s, dir) => {
      val withPii = Tables.load(s, dir, "documents").withColumn("text",
        concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com or call "),
          lit("555-"), lpad((col("doc_id") * 7 % 1000).cast("string"), 3, "0"),
          lit("-"), lpad((col("doc_id") * 13 % 10000).cast("string"), 4, "0")))
      TextAnalysis.scrubPii(withPii).drop("clean")
    }),
    "q_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprint(Tables.load(s, dir, "documents"))),

    // ---- S1 upsert (MERGE-by-key) with decimal-exact readback ----
    "q_upsert" -> ((s, dir) => {
      val cur = Tables.load(s, dir, "orders").select(
        col("o_orderkey").as("key"), col("o_orderstatus").as("status"),
        dec("o_totalprice").as("price"))
      val upd = cur.filter(col("key") % 100 === 0)
        .withColumn("price", col("price") + 100)
      val ins = cur.filter(col("key") % 97 === 0).select(
        (-col("key") - 1).as("key"), lit("N").as("status"),
        lit(BigDecimal("50.00")).cast("decimal(18,2)").as("price"))
      val merged = Upsert.merge(cur, upd.unionByName(ins), "key")
      merged.groupBy("status").agg(
        count(lit(1)).as("n_rows"),
        sum("price").cast("double").as("total_price"))
    }),

    // ---- D3 variant: HNSW graph ANN, driven at FULL beam width so the
    //      oracle gate is hash-exact (the q_ivf_knn trick: nprobe=nlist).
    //      With ef ≥ corpus the beam never truncates, and the graph is
    //      connected by construction (every node ↔ its cell medoid, medoid
    //      set kNN-connected, seeds = all medoids), so the walk visits every
    //      node and the result IS exact brute-force KNN — same oracle as
    //      q_ann_embed. The approximate regime (ef=64) is spec-asserted in
    //      HnswSpec (recall ≥ 0.8). ----
    "q_hnsw_knn" -> ((s, dir) => {
      val corpus = Tables.docsCorpus(s, dir)
        .select(col("doc_id"), col("qv").as("dv"))
      val queries = Tables.docsCorpus(s, dir).filter(col("doc_id") < 8)
        .select(col("doc_id").as("qid"), col("qv"))
      val g = Hnsw.build(corpus, m = 8)
      Hnsw.search(g, queries, k = 10, ef = 8192)
    }),
    // Sharded graph at full beam: [[Hnsw.buildSharded]]'s union graph is
    // per-shard connected and every shard's medoids seed each query, so an
    // exhaustive walk covers the whole corpus — bit-exact vs brute force,
    // same oracle as q_hnsw_knn. shardTarget 64 puts the verify SFs in the
    // genuinely-sharded regime (sf0.01's ~200 docs → 4 shards).
    "q_hnsw_sharded" -> ((s, dir) => {
      val corpus = Tables.docsCorpus(s, dir)
        .select(col("doc_id"), col("qv").as("dv"))
      val queries = Tables.docsCorpus(s, dir).filter(col("doc_id") < 8)
        .select(col("doc_id").as("qid"), col("qv"))
      val g = Hnsw.buildSharded(corpus, m = 8, shardTarget = 64)
      Hnsw.search(g, queries, k = 10, ef = 8192)
    }),
    // Bulk graph search at full beam: [[Hnsw.searchBulk]] (shuffle-join
    // query attach) walks the same connected graph exhaustively, so it too
    // must equal exact brute-force KNN — same oracle as q_hnsw_knn.
    "q_hnsw_bulk" -> ((s, dir) => {
      val corpus = Tables.docsCorpus(s, dir)
        .select(col("doc_id"), col("qv").as("dv"))
      val queries = Tables.docsCorpus(s, dir).filter(col("doc_id") < 8)
        .select(col("doc_id").as("qid"), col("qv"))
      val g = Hnsw.build(corpus, m = 8)
      Hnsw.searchBulk(g, queries, k = 10, ef = 8192)
    }),
    // Growing-segment serving through the FACADE (r16): the corpus is
    // split — 80% graph-indexed, 20% inserted after the build in
    // sub-window batches that stay PENDING (hnsw_absorb_window default 8,
    // served brute-force ∪ beam, the Milvus growing-segment shape). At
    // full beam both legs are exact, so the union must equal brute-force
    // KNN over the WHOLE corpus — same oracle as q_hnsw_knn. Keys/chunks
    // carry the numeric doc_id so the facade result maps back to the
    // oracle's id space.
    "q_hnsw_pending" -> ((s, dir) => {
      val cat = new graft.sources.VectorStoreCatalog(s,
        java.nio.file.Files.createTempDirectory("graft_hnswpend").toString)
      val corpus = Tables.docsCorpus(s, dir)
        .select(col("doc_id"), col("qv")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toIndexedSeq))
        .sortBy(_._1)
      val dim = corpus.head._2.length
      cat.generateSchema(graft.api.SchemaSpec("verify", "hpend",
        dimension = dim, indexType = "HNSW"))
      val cut = corpus(corpus.length * 4 / 5)._1
      def rows(sel: Long => Boolean) = corpus.filter(c => sel(c._1)).map {
        case (id, v) =>
          graft.api.EmbeddedVector(id.toString, id.toString, "hpend", Map(), v)
      }
      rows(_ < cut).grouped(1000).toSeq
        .foreach(b => cat.insert("verify", "hpend", b))
      cat.persistIndex("verify", "hpend")
      rows(_ >= cut).grouped(40).toSeq // a few batches, all under the window
        .foreach(b => cat.insert("verify", "hpend", b))
      val qs = corpus.filter(_._1 < 8).map(_._2: Seq[Double]).toSeq
      cat.searchDfBatch(graft.api.SearchRequest("verify", "hpend", qs.head,
          limit = 10, ef = Some(8192)), qs)
        .select(col("qid"), col("rank"),
          col("chunk").cast("long").as("doc_id"), col("score"))
    }),

    // ---- D2 variant: INT64 / auto_id primary keys (base_milvus.py:895-917,
    //      1019-1030: dtype INT64 ⇒ auto_id, store-generated PKs). The id
    //      counter is deterministic (1,2,3,… in insert order), so the whole
    //      catalog round-trip — schema, id generation, bucketed storage,
    //      readback — is oracle-checkable.
    "q_int64_pk" -> ((s, dir) => {
      val cat = new graft.sources.VectorStoreCatalog(s,
        java.nio.file.Files.createTempDirectory("graft_int64").toString)
      cat.generateSchema(graft.api.SchemaSpec("oracle", "pk-int64", dimension = 8,
        primaryKeyDataType = "INT64"))
      val src = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
        .orderBy("o_orderkey").limit(200).collect()
      src.grouped(100).foreach { b =>
        cat.insert("oracle", "pk-int64", b.toSeq.map { r =>
          graft.api.EmbeddedVector("", s"${r.getLong(0)} ${r.getString(1)}",
            "pk-int64", Map("priority" -> r.getString(2)),
            (0 until 8).map(i => ((r.getLong(0) * 131 + i * 313 + 7) % 97 - 48).toDouble))
        })
      }
      cat.load("oracle", "pk-int64").select(
        col("flouds_vector_id").as("auto_id"), col("chunk"),
        get_json_object(col("meta"), "$.priority").as("priority"))
    }),

    // ---- S1 distributed variant: the large-stream insertDf commit — the
    //      whole DataFrame-in path (distributed validation, last-arrival
    //      key dedup on a single partition = exact arrival order, bucketed
    //      storage, meta JSON round-trip) checked against DuckDB.
    "q_insert_df" -> ((s, dir) => {
      val cat = new graft.sources.VectorStoreCatalog(s,
        java.nio.file.Files.createTempDirectory("graft_insdf").toString)
      cat.generateSchema(graft.api.SchemaSpec("oracle", "ins-df", dimension = 8))
      def asRows(df: org.apache.spark.sql.DataFrame) = df.select(
        concat(lit("k"), col("doc_id")).as("key"),
        col("text").as("chunk"),
        map(lit("lang"), col("lang")).as("metadata"),
        Tables.synthVec(col("doc_id"), 8).as("vector"))
      val src = asRows(Tables.load(s, dir, "documents").filter(col("doc_id") < 150))
      // a second wave re-keys doc_id < 10 with an updated chunk; last
      // arrival must win within the batch
      val upd = asRows(Tables.load(s, dir, "documents").filter(col("doc_id") < 10))
        .withColumn("chunk", concat(lit("v2 "), col("chunk")))
      cat.insertDf("oracle", "ins-df", src.unionByName(upd).coalesce(1))
      cat.load("oracle", "ins-df").select(
        col("flouds_vector_id").as("key"), col("chunk"),
        get_json_object(col("meta"), "$.lang").as("lang"))
    }),

    // ---- S1 merge-on-read variant: the SAME ingest against an
    //      `ingest_mode = delta` collection, with the re-key wave in a
    //      SEPARATE commit and no fold — the read must resolve last-wins
    //      across two pending delta files (VectorStoreCatalog.loadRaw).
    //      Same oracle as q_insert_df: the view is commit-structure-free.
    "q_insert_delta" -> ((s, dir) => {
      val cat = new graft.sources.VectorStoreCatalog(s,
        java.nio.file.Files.createTempDirectory("graft_insdelta").toString)
      cat.generateSchema(graft.api.SchemaSpec("oracle", "ins-delta", dimension = 8,
        extraProps = Map("ingest_mode" -> "delta")))
      def asRows(df: org.apache.spark.sql.DataFrame) = df.select(
        concat(lit("k"), col("doc_id")).as("key"),
        col("text").as("chunk"),
        map(lit("lang"), col("lang")).as("metadata"),
        Tables.synthVec(col("doc_id"), 8).as("vector"))
      cat.insertDf("oracle", "ins-delta",
        asRows(Tables.load(s, dir, "documents").filter(col("doc_id") < 150)))
      cat.insertDf("oracle", "ins-delta",
        asRows(Tables.load(s, dir, "documents").filter(col("doc_id") < 10))
          .withColumn("chunk", concat(lit("v2 "), col("chunk"))))
      cat.load("oracle", "ins-delta").select(
        col("flouds_vector_id").as("key"), col("chunk"),
        get_json_object(col("meta"), "$.lang").as("lang"))
    }),

    // ---- D3/A1-approx: IVF index build + nprobe-routed search. The codebook
    //      is a DETERMINISTIC seeded one (Ivf.seededCentroids) so assignment,
    //      routing, and the cell-pruned scan are all DuckDB-replicable —
    //      q_ivf_knn is hash-checked end-to-end. (The production KMeans build
    //      shares the identical assign/probe mechanics; its recall is
    //      spec-tested since trained centroids aren't oracle-replicable.)
    "q_ivf_knn" -> ((s, dir) => {
      val idx = Ivf.buildWithCentroids(
        Tables.ordersCorpus(s, dir).select("doc_id", "dv"),
        Ivf.seededCentroids(s, nlist = 16), metric = "COSINE")
      Ivf.probe(idx, Tables.queryBatch(s, 8), nprobe = 4, k = 10)
    }),

    // ---- similarity search over the real embedding column ----
    "q_ann_embed" -> ((s, dir) => {
      val c = Tables.docsCorpus(s, dir)
      val corpus  = c.select(col("doc_id"), col("qv").as("dv"))
      val queries = c.filter(col("doc_id") < 4).select(col("doc_id").as("qid"), col("qv"))
      Knn.search(corpus, queries,
        SearchParams(metric = "COSINE", limit = 10, outputFields = Nil))
    }),

    // ---- LSH-bucketed ANN over embeddings (deterministic hyperplanes) ----
    "q_ann_lsh" -> ((s, dir) => {
      val c = Tables.docsCorpus(s, dir)
      // corpusCount from parquet footer metadata (docsCorpus is 1:1 with
      // embeddings — the same COUNT(*) the oracle's plane-scaling uses), so
      // serving pays no count() job before the search itself
      AnnLsh.search(c.select(col("doc_id"), col("qv")),
        c.filter(col("doc_id") < 4).select(col("doc_id").as("qid"), col("qv")),
        k = 10,
        corpusCount = Some(Tables.parquetRowCount(s, s"$dir/embeddings.parquet")))
    }),

    // ---- events: tumbling-window agg + JSON props ----
    "q_events_hourly" -> ((s, dir) =>
      Tables.tsMicros(Tables.load(s, dir, "events")) // ts -> epoch us, any physical type
        .groupBy(col("event_type"),
          expr("ts DIV 3600000000").as("hour_bucket"))
        .agg(count(lit(1)).as("n_events"),
          sum(dec("value")).cast("double").as("total_value"))),
    "q_events_json" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(col("event_type"),
          (get_json_object(col("props"), "$.k").cast("long") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n_events"),
          sum(dec("value")).cast("double").as("total_value"))),

    // ---- P6 meta_required over a corpus with empty metas ----
    "q_knn_meta_required" -> ((s, dir) => {
      val corpus = Tables.load(s, dir, "orders").select(
        col("o_orderkey").as("doc_id"),
        Tables.synthVec(col("o_orderkey")).as("dv"),
        when(col("o_orderkey") % 3 === 0,
          to_json(struct(col("o_orderstatus").as("status"),
            col("o_orderpriority").as("priority")))).otherwise("{}").as("meta"))
      Knn.search(corpus, Tables.queryBatch(s, 8),
        SearchParams(limit = 10, metaRequired = true, outputFields = Seq("meta")))
    }),

    // ---- H4 gating: hybrid without query text degrades to dense-only ----
    "q_hybrid_dense_only" -> ((s, dir) => {
      val c = Tables.docsCorpus(s, dir)
      Hybrid.search(c.select(col("doc_id"), col("qv").as("dv")),
        c.filter(col("doc_id") < 2).select(col("doc_id").as("qid"), col("qv")),
        Bm25.fit(Tables.load(s, dir, "documents")), Seq.empty,
        SearchParams(limit = 10))
    }),

    // ---- P3 with include_stop_words=true ----
    "q_knn_text_stop" -> ((s, dir) => {
      val corpus = Tables.docsCorpus(s, dir)
        .select(col("doc_id"), col("qv").as("dv"), col("text").as("chunk"))
      val queries = Tables.docsCorpus(s, dir).filter(col("doc_id") < 4)
        .select(col("doc_id").as("qid"), col("qv"))
      Knn.search(corpus, queries,
        SearchParams(limit = 10, textFilter = Some("the spark join"),
          minimumWordsMatch = 2, includeStopWords = true, outputFields = Nil))
    }),

    // ---- multimodal plumbing: binary payload -> partition-batched decode ----
    "q_multimodal" -> ((s, dir) =>
      Multimodal.extractFeatures(Tables.load(s, dir, "documents"))
        .select("doc_id", "n_bytes", "first_byte", "checksum")),

    // ---- REAL container decode: synthesized BMP/WAV files parsed by
    //      genuine header decoders; the oracle predicts the decoded fields
    //      from the synthesis formulas, so a wrong parser hash-mismatches ----
    "q_media_decode" -> ((s, dir) =>
      Multimodal.extractMediaFeatures(Tables.load(s, dir, "documents"))),

    // ---- REAL media transforms: BMP nearest-neighbor resize (parse →
    //      sample pixels → re-encode → re-parse own output) and WAV
    //      every-4th-frame sampling (fmt/data-chunk parse) ----
    "q_media_resize" -> ((s, dir) =>
      Multimodal.resizeImages(Tables.load(s, dir, "documents"))),
    "q_media_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(Tables.load(s, dir, "documents"))),

    // ---- gap-based sessionization over the event stream ----
    "q_sessionize" -> ((s, dir) =>
      // DuckDB timestamps are us-precision: compare in microseconds
      Sessionize.sessions(
        Tables.tsMicros(Tables.load(s, dir, "events")),
        gapNs = 30L * 60 * 1000000L)),

    // ---- as-of join: purchases attributed to the last view ≤ ts per user
    //      (TemporalJoin.asof — one shuffle, window formulation; oracle is
    //      DuckDB's NATIVE ASOF LEFT JOIN) ----
    "q_asof_join" -> ((s, dir) => {
      val e = Tables.tsMicros(Tables.load(s, dir, "events"))
      val l = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val r = e.filter(col("event_type") === "view")
        .groupBy("user_id", "ts").agg(max("event_id").as("view_event_id"))
      TemporalJoin.asof(l, r, Seq("user_id"), "ts",
          rightTie = Some("view_event_id"))
        .select(col("event_id"), col("user_id"), col("ts"),
          coalesce(col("asof_ts"), lit(-1L)).as("view_ts"),
          coalesce(col("view_event_id"), lit(-1L)).as("view_event_id"),
          coalesce(col("ts") - col("asof_ts"), lit(-1L)).as("gap_us"))
    }),
    // ---- as-of with tolerance: matches farther than 1h behind are nulled
    //      (pandas merge_asof tolerance semantics) ----
    "q_asof_tolerance" -> ((s, dir) => {
      val e = Tables.tsMicros(Tables.load(s, dir, "events"))
      val l = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val r = e.filter(col("event_type") === "view")
        .groupBy("user_id", "ts").agg(max("event_id").as("view_event_id"))
      TemporalJoin.asof(l, r, Seq("user_id"), "ts",
          rightTie = Some("view_event_id"),
          toleranceUs = Some(3600000000L))
        .select(col("event_id"), col("user_id"), col("ts"),
          coalesce(col("asof_ts"), lit(-1L)).as("view_ts"),
          coalesce(col("view_event_id"), lit(-1L)).as("view_event_id"),
          coalesce(col("ts") - col("asof_ts"), lit(-1L)).as("gap_us"))
    }),

    // ---- skew-chunked as-of: SAME oracle as q_asof_join — the two-level
    //      plan (per-(user, 1h-chunk) windows + carry-in summary) must
    //      reproduce the plain as-of bit-for-bit ----
    "q_asof_chunked" -> ((s, dir) => {
      val e = Tables.tsMicros(Tables.load(s, dir, "events"))
      val l = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val r = e.filter(col("event_type") === "view")
        .groupBy("user_id", "ts").agg(max("event_id").as("view_event_id"))
      TemporalJoin.asofChunked(l, r, Seq("user_id"), "ts",
          rightTie = Some("view_event_id"), chunkUs = 3600000000L)
        .select(col("event_id"), col("user_id"), col("ts"),
          coalesce(col("asof_ts"), lit(-1L)).as("view_ts"),
          coalesce(col("view_event_id"), lit(-1L)).as("view_event_id"),
          coalesce(col("ts") - col("asof_ts"), lit(-1L)).as("gap_us"))
    }),

    // ---- forward as-of: the NEXT view at-or-after each purchase ----
    "q_asof_forward" -> ((s, dir) => {
      val e = Tables.tsMicros(Tables.load(s, dir, "events"))
      val l = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val r = e.filter(col("event_type") === "view")
        .groupBy("user_id", "ts").agg(max("event_id").as("view_event_id"))
      TemporalJoin.asof(l, r, Seq("user_id"), "ts",
          rightTie = Some("view_event_id"), direction = "forward")
        .select(col("event_id"), col("user_id"), col("ts"),
          coalesce(col("asof_ts"), lit(-1L)).as("view_ts"),
          coalesce(col("view_event_id"), lit(-1L)).as("view_event_id"),
          coalesce(col("asof_ts") - col("ts"), lit(-1L)).as("gap_us"))
    }),

    // ---- range join: per purchase, same-user activity in the preceding
    //      10 minutes (TemporalJoin.windowAgg — bin-bucketed equi-join, no
    //      inequality join in the plan; oracle is DuckDB's native IEJoin) ----
    "q_range_join" -> ((s, dir) => {
      val e = Tables.tsMicros(Tables.load(s, dir, "events"))
      val l = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val r = e.select(col("user_id"), col("ts"),
        col("event_id").as("r_event_id"), col("value"))
      TemporalJoin.windowAgg(l, Seq("event_id"), r, Seq("user_id"), "ts",
        lo = -600000000L, hi = 0L,
        fill = Map("n_prior" -> lit(0L), "prior_value" -> lit(0.0)))(
        "n_prior" -> count(lit(1)),
        "prior_value" -> sum(col("value").cast("decimal(18,2)")).cast("double"))
    }),

    // ---- interval join: error events attributed to their containing
    //      ≥3-event session (TemporalJoin.intervalJoin — intervals explode
    //      to time bins, points equi-join one bin; sessions-per-user are
    //      disjoint so attribution is unique) ----
    "q_session_attrib" -> ((s, dir) => {
      val e = Tables.tsMicros(Tables.load(s, dir, "events"))
      val gapUs = 240L * 60 * 1000000L // 4h sessions: selective but non-trivial
      val sess = Sessionize.sessionBounds(e, gapNs = gapUs)
        .filter(col("n_events") >= 3)
      val points = e.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts")
      TemporalJoin.intervalJoin(points, sess, Seq("user_id"), "ts",
        startCol = "session_start", endCol = "session_end", binWidth = gapUs)
        .select("event_id", "user_id", "ts", "session_idx",
          "session_start", "session_end", "n_events")
    }),

    // ---- range join, raw pair form (windowAgg's input relation — the
    //      bin-bucketed equi-join checked at pair granularity) ----
    "q_range_pairs" -> ((s, dir) => {
      val e = Tables.tsMicros(Tables.load(s, dir, "events"))
      val l = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val r = e.select(col("user_id"), col("ts"),
        col("event_id").as("r_event_id"))
      TemporalJoin.rangePairs(l, r, Seq("user_id"), "ts",
          lo = -86400000000L, hi = 0L) // 24h window: 4267 pairs at sf0.01
        .select("event_id", "r_event_id", "r_ts")
    }),

    // ---- KMV distinct-count sketch: per-language vocabulary estimate via
    //      bounded k-minimum-values aggregate (map-side combinable; the
    //      sketch set is order/partitioning independent → bit-exact) ----
    "q_kmv_vocab" -> ((s, dir) => {
      val k = 64
      Tables.load(s, dir, "documents")
        .select(col("lang"),
          explode(graft.functions.Text.tokens(col("text"))).as("term"))
        .withColumn("h", graft.functions.Text.tokenHash32(
          graft.functions.Text.tokenCode(col("term"))))
        .groupBy("lang")
        .agg(graft.functions.KmvSketch.kmvArray(col("h"), k).as("sk"))
        .select(col("lang"),
          least(size(col("sk")), lit(k)).cast("long").as("sketch_size"),
          element_at(col("sk"), size(col("sk"))).as("kth_min"),
          graft.functions.KmvSketch.estimate(col("sk"), k).as("est_distinct"))
    }),

    // ---- sketch ROLLUP: the per-language KMV sketches merge relationally
    //      (explode + re-sketch) into the exact global sketch — the k
    //      smallest of a union of per-group k-smallest sets IS the global
    //      k-smallest. This is how per-shard sketches aggregate at 100 TB
    //      without touching the raw data again. ----
    "q_kmv_global" -> ((s, dir) => {
      val k = 64
      val perLang = Tables.load(s, dir, "documents")
        .select(col("lang"),
          explode(graft.functions.Text.tokens(col("text"))).as("term"))
        .withColumn("h", graft.functions.Text.tokenHash32(
          graft.functions.Text.tokenCode(col("term"))))
        .groupBy("lang")
        .agg(graft.functions.KmvSketch.kmvArray(col("h"), k).as("sk"))
      perLang.select(explode(col("sk")).as("h"))
        .agg(graft.functions.KmvSketch.kmvArray(col("h"), k).as("sk"))
        .select(
          least(size(col("sk")), lit(k)).cast("long").as("sketch_size"),
          element_at(col("sk"), size(col("sk"))).as("kth_min"),
          graft.functions.KmvSketch.estimate(col("sk"), k).as("est_distinct"))
    }),

    // ---- exact distributed quantiles: per-language n_chars percentiles
    //      (one window sort, all quantiles in a single pass) ----
    "q_quantiles" -> ((s, dir) =>
      graft.operators.Quantiles.exactQuantiles(
        Tables.load(s, dir, "documents"), Seq("lang"), "n_chars",
        Seq(0.5, 0.9, 0.99))),

    // ---- zero-sort approximate quantiles (binned histogram — the
    //      map-side-combinable scale path next to the exact sort) ----
    "q_binned_quantiles" -> ((s, dir) =>
      graft.operators.Quantiles.binnedQuantiles(
        Tables.load(s, dir, "documents"), Seq("lang"), "n_chars",
        Seq(0.5, 0.9, 0.99), binWidth = 32L)),

    // ---- exact heavy hitters via Misra-Gries candidates + broadcast
    //      recount: equals the naive HAVING-threshold group-by without
    //      ever shuffling the term universe ----
    "q_heavy_hitters" -> ((s, dir) =>
      TextAnalysis.heavyTerms(Tables.load(s, dir, "documents"),
        k = 1024, minShare = 0.002)),

    // ---- relational coverage: agg / join / window ----
    "q1_agg" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec("l_quantity")).cast("double").as("sum_qty"),
          sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
          sum(dec("l_extendedprice") * (lit(1) - dec("l_discount"))).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))),

    "q_join_agg" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val o  = Tables.load(s, dir, "orders")
      val c  = Tables.load(s, dir, "customer")
      val n  = Tables.load(s, dir, "nation")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          sum(dec("l_extendedprice") * (lit(1) - dec("l_discount"))).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    "q_window_top3" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(dec("o_totalprice").desc, col("o_orderkey").asc)
      Tables.load(s, dir, "orders")
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("o_custkey"), col("rank"), col("o_orderkey"),
          dec("o_totalprice").cast("double").as("price"))
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_knn_cosine"    -> Oracles.knnCosine(8, 10),
    "q_knn_l2"        -> Oracles.knnL2(8, 10),
    "q_knn_ip"        -> Oracles.knnIp(8, 10),
    "q_knn_threshold" -> Oracles.knnThreshold(8, 10, 5, 0.15),
    "q_knn_round"     -> Oracles.knnRound(8, 10, 5, 0.15, 4),
    "q_extra_filter"  -> Oracles.extraFilter(8, 10, "2"),
    "q_knn_range"     -> Oracles.knnRange(8, 10, 0.05, 0.3),
    "q_knn_meta"      -> Oracles.knnMeta(8, 10, fetchK = 10, priorityContains = "URGENT"),
    "q_knn_text"      -> Oracles.knnText(4, 10, 10,
      graft.functions.Text.filterWords("the spark join window", includeStopWords = false),
      minWords = 2),
    "q_bm25_topk"     -> Oracles.bm25TopK(HybridQueryTexts, 10),
    // Same oracle as q_bm25_topk: the persisted+incremental index must give
    // exactly the answers of a from-scratch fit over the true corpus.
    "q_bm25_persisted" -> Oracles.bm25TopK(HybridQueryTexts, 10),
    "q_hybrid_rrf"    -> Oracles.hybridRrf(2, HybridQueryTexts, 10, 0.0),
    "q_hybrid_bulk"   -> Oracles.hybridRrf(2, HybridQueryTexts, 10, 0.0),
    "q_dedup_exact"   -> Oracles.dedupExact,
    "q_dedup_minhash" -> Oracles.dedupMinhash,
    "q_dedup_lsh_pairs" -> Oracles.dedupLshPairs,
    "q_dedup_verified" -> Oracles.dedupMinhashVerified(0.7),
    "q_dedup_incr"    -> Oracles.dedupIncr,
    "q_dedup_incr_big" -> Oracles.dedupIncr,
    "q_dedup_gate"    -> Oracles.dedupGate(0.5),
    "q_dedup_components" -> Oracles.dedupComponents(0.7),
    "q_dedup_keep"    -> Oracles.dedupKeep(0.7),
    "q_top_terms"     -> Oracles.topTerms,
    "q_dedup_simhash" -> Oracles.dedupSimhash,
    "q_dedup_jaccard" -> Oracles.dedupJaccard(0.8),
    "q_dedup_embed"   -> Oracles.dedupEmbed(0.4),
    "q_semantic_dedup" -> Oracles.semanticDedup(16, 0.4),
    "q_lang_id"       -> Oracles.langId,
    "q_quality"       -> Oracles.quality,
    "q_token_counts"  -> Oracles.tokenCounts,
    "q_split"         -> Oracles.split(0.8, 0.1),
    "q_len_hist"      -> Oracles.lenHist,
    "q_contamination" -> Oracles.contamination(0.8, 0.1),
    "q_contam_bloom"  -> Oracles.contamination(0.8, 0.1),
    "q_source_cap"    -> Oracles.sourceCap(10),
    "q_shuffle_shards" -> Oracles.shuffleShards(8),
    "q_curation"      -> Oracles.curate(0.5),
    "q_lm_score"      -> Oracles.lmScore,
    "q_bigram_lm"     -> Oracles.bigramLm,
    "q_stratified"    -> Oracles.stratified(Map("en" -> 0.5, "de" -> 0.25), 0.1),
    "q_token_shards"  -> Oracles.tokenShards(2000L),
    "q_chunk"         -> Oracles.chunkDocs(40L, 32, 8),
    "q_pack_seqs"     -> Oracles.packSequences(512L),
    "q_temperature"   -> Oracles.temperatureSample,
    "q_gopher_rules"  -> Oracles.gopherRules(20L, 100000L),
    "q_ppx_buckets"   -> Oracles.perplexityBuckets,
    "q_c4_rules"      -> Oracles.c4Rules(5, 3),
    "q_boilerplate"   -> Oracles.boilerplate(2L),
    "q_boilerplate_clean" -> Oracles.boilerplateClean(2L),
    "q_nfc_normalize" -> Oracles.nfcNormalize,
    "q_bpe_encode"    -> Oracles.bpeEncode,
    "q_bpe_first_merge" -> Oracles.bpeFirstMerge,
    "q_bpe_merges"    -> Oracles.bpeMerges(12),
    "q_ngram_overlap" -> Oracles.ngramOverlap(8),
    "q_repetition"    -> Oracles.repetition,
    "q_substr_spans"  -> Oracles.substrSpans(4),
    "q_substr_clean"  -> Oracles.substrClean(4),
    "q_gopher_dup"    -> Oracles.gopherDup(2),
    "q_pii_scrub"     -> Oracles.piiScrub,
    "q_fingerprint"   -> Oracles.fingerprint,
    "q_upsert"        -> Oracles.upsert,
    "q_int64_pk"      -> Oracles.int64Pk,
    "q_insert_df"     -> Oracles.insertDfRoundtrip,
    "q_insert_delta"  -> Oracles.insertDfRoundtrip,
    "q_ivf_knn"       -> Oracles.ivfKnn(8, 16, 4, 10),
    "q_ann_embed"     -> Oracles.annEmbedExact(4, 10),
    // full-width beam (ef ≥ corpus) over a connected graph == exact KNN
    "q_hnsw_knn"      -> Oracles.annEmbedExact(8, 10),
    "q_hnsw_bulk"     -> Oracles.annEmbedExact(8, 10),
    "q_hnsw_sharded"  -> Oracles.annEmbedExact(8, 10),
    "q_hnsw_pending"  -> Oracles.annEmbedExact(8, 10),
    "q_ann_lsh"       -> Oracles.annLsh(4, 10),
    "q_sessionize"    -> Oracles.sessionize(30L * 60 * 1000000L), // us gap, matches query
    "q_asof_join"     -> Oracles.asofJoin,
    "q_asof_tolerance" -> Oracles.asofTolerance(3600000000L),
    "q_asof_forward"  -> Oracles.asofForward,
    "q_asof_chunked"  -> Oracles.asofJoin, // chunked ≡ plain, same oracle
    "q_range_join"    -> Oracles.rangeJoinAgg(-600000000L, 0L),
    "q_range_pairs"   -> Oracles.rangePairs(-86400000000L, 0L),
    "q_session_attrib" -> Oracles.sessionAttrib(240L * 60 * 1000000L, 3L),
    "q_kmv_vocab"     -> Oracles.kmvVocab(64),
    "q_kmv_global"    -> Oracles.kmvGlobal(64),
    "q_quantiles"     -> Oracles.quantiles(Seq(0.5, 0.9, 0.99)),
    "q_binned_quantiles" -> Oracles.binnedQuantiles(Seq(0.5, 0.9, 0.99), 32L),
    "q_heavy_hitters" -> Oracles.heavyHitters(0.002),
    "q_events_hourly" -> Oracles.eventsHourly,
    "q_events_json"   -> Oracles.eventsJson,
    "q_knn_meta_required" -> Oracles.knnMetaRequired(8, 10),
    "q_hybrid_dense_only" -> Oracles.hybridDenseOnly(2, 10),
    "q_knn_text_stop" -> Oracles.knnText(4, 10, 10,
      graft.functions.Text.filterWords("the spark join", includeStopWords = true),
      minWords = 2),
    "q_multimodal"    -> Oracles.multimodal,
    "q_media_decode"  -> Oracles.mediaDecode,
    "q_media_resize"  -> Oracles.mediaResize,
    "q_media_frames"  -> Oracles.mediaFrames,
    "q1_agg"          -> Oracles.q1Agg,
    "q_join_agg"      -> Oracles.joinAgg,
    "q_window_top3"   -> Oracles.windowTop3,
  )
}
