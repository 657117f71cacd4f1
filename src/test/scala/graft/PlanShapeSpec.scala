package graft

import graft.api.{EmbeddedVector, SchemaSpec}
import graft.core.Tables
import graft.operators._
import graft.sources.VectorStoreCatalog
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Regression locks on the performance-critical physical plan shapes
  * (SCALE.md claims, verified): column pruning, broadcast joins, the custom
  * partial-top-k operator, and partition pruning on persisted IVF probes.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q1_agg scan is column-pruned to exactly the 5 needed columns") {
    val p = plan(SparkEntry.queries("q1_agg")(spark, Sf))
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    val cols = read.split(",").map(_.split(":")(0).trim).toSet
    assert(cols == Set("l_quantity", "l_extendedprice", "l_discount",
      "l_returnflag", "l_linestatus"), s"got $cols")
  }

  test("join_agg broadcasts the dimension tables") {
    val p = plan(SparkEntry.queries("q_join_agg")(spark, Sf))
    assert(p.contains("BroadcastHashJoin"), "dimension joins must broadcast")
    assert(!p.contains("SortMergeJoin"), "no sort-merge join expected at this shape")
  }

  test("KNN BNLJ plan uses the custom PartialTopKExec and codegen vec kernels") {
    val was = Knn.fusedScan
    Knn.fusedScan = false
    try {
      val df = Knn.search(Tables.ordersCorpus(spark, Sf), Tables.queryBatch(spark, 2),
        SearchParams(limit = 5, outputFields = Nil))
      val p = plan(df)
      assert(p.contains("PartialTopK"), "custom physical operator missing")
      assert(p.contains("vecdot"), "codegen dot kernel missing")
      assert(p.contains("BroadcastNestedLoopJoin"), "queries must broadcast")
    } finally Knn.fusedScan = was
  }

  test("KNN fused default: no pair-row join anywhere in the scan plan") {
    assert(Knn.fusedScan, "fused scan should be the default")
    val df = Knn.search(Tables.ordersCorpus(spark, Sf), Tables.queryBatch(spark, 2),
      SearchParams(limit = 5, outputFields = Nil))
    val p = plan(df)
    // the corpus streams through one mapPartitions pass: no join operator
    // of any kind before the final window over ≤ k·|q|·partitions rows
    assert(!p.contains("Join"), s"fused scan still joins pair rows:\n$p")
    assert(p.contains("MapPartitions"), "fused mapPartitions scan missing")
  }

  test("late materialization prunes the payload to what the request touches") {
    val corpus = Tables.ordersCorpus(spark, Sf) // (doc_id, dv, meta, chunk)
    val q = Tables.queryBatch(spark, 2)
    val was = Knn.fusedScan
    Knn.fusedScan = false // assert the BNLJ path's late-materialization shape
    try {
      // no filters, no output fields: the payload pass must vanish — exactly
      // one join (the scoring BNLJ), no second corpus scan
      val bare = plan(Knn.search(corpus, q, SearchParams(limit = 5, outputFields = Nil)))
      assert(bare.contains("BroadcastNestedLoopJoin"), "scoring BNLJ missing")
      assert(!bare.contains("BroadcastHashJoin") && !bare.contains("SortMergeJoin") &&
        !bare.contains("ShuffledHashJoin"),
        s"payload join present in a payload-free search:\n$bare")
      // meta-only request: payload joined back, but chunk never read — the
      // payload scan's projection excludes the chunk source column
      val metaOnly = plan(Knn.search(corpus, q,
        SearchParams(limit = 5, metaFilter = Map("priority" -> "URGENT"),
          outputFields = Seq("meta"))))
      assert(metaOnly.contains("BroadcastHashJoin"), "payload join must broadcast winners")
      val reads = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(metaOnly)
        .map(_.group(1)).toSeq
      assert(reads.exists(r => r.contains("o_orderstatus")),
        s"payload scan missing: $reads")
      assert(!metaOnly.contains("chunk"), "chunk materialized for a meta-only request")
    } finally Knn.fusedScan = was
  }

  test("shingle generation is shuffle-free (no Exchange below the first aggregate)") {
    import spark.implicits._
    val docs = Seq((0L, "a b c d e f g h i")).toDF("doc_id", "text")
    // shingles themselves: scan -> project/explode only, zero exchanges
    val p = plan(Dedup.shingles(docs))
    assert(!p.contains("Exchange"), s"shingles plan shuffles:\n$p")
    // and the whole minhash signature needs exactly ONE shuffle (the groupBy)
    val pSig = plan(Dedup.minhashSignatures(docs))
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(pSig).length
    assert(exchanges == 1, s"minhash should shuffle once, saw $exchanges")
  }

  test("BM25 search joins query terms before computing weights (broadcast first)") {
    import spark.implicits._
    val docs = (0L until 50L).map(i => (i, s"alpha beta doc$i")).toDF("doc_id", "text")
    val p = plan(Bm25.searchTopK(Bm25.fit(docs), Seq(0L -> "alpha doc3"), 5))
    // the query-term join must be a broadcast, and no sort-merge join may
    // process the full postings before that filter
    assert(p.contains("BroadcastHashJoin"), "query-term join must broadcast")
  }

  test("facade indexed search is index-bounded: no un-pruned base-table scan") {
    import graft.api.SearchRequest
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_idxbound").toString)
    def vec(seed: Int): Seq[Double] =
      (0 until 8).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, nlist = 8))
    cat.insert("t", "m", (0 until 200).map(i =>
      EmbeddedVector(s"k$i", s"chunk $i", "m", Map(), vec(i))))
    cat.persistIndex("t", "m")
    val req = SearchRequest("t", "m", vec(5), limit = 5, nprobe = 4)

    // candidate generation scans ONLY the probed cells of the INDEX table
    import spark.implicits._
    val queries = Seq((0L, vec(5))).toDF("qid", "qv")
    val cand = cat.indexedCandidates(req, cat.loadIndex("t", "m"),
      cat.denseRoot("t", "m"), queries, None, None)
    val pc = plan(cand)
    val cpf = "PartitionFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(pc).map(_.group(1))
    assert(cpf.exists(_.contains("centroid_id")),
      s"candidate scan not cell-pruned: $cpf")

    // the final search plan touches the BASE table only through _bucket
    // point lookups: every file scan in it carries a partition filter
    val df = cat.searchDf(req)
    val pfs = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan(df)).map(_.group(1)).toSeq
    assert(pfs.nonEmpty, "no file scans found in indexed search plan")
    assert(pfs.forall(f => f.contains("_bucket") || f.contains("part")),
      s"un-pruned base scan in indexed search plan: $pfs")
    // the winner PAIRS stay distributed: the plan holds them as a
    // checkpointed RDD scan, never as a driver-collected LocalRelation
    // (only the queries themselves may be local)
    val opt = df.queryExecution.optimizedPlan
    val localPairs = opt.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation
        if l.output.exists(_.name == "doc_id") => l
    }
    assert(localPairs.isEmpty,
      "winner pairs were collected to the driver and re-localized")
    val ckptPairs = opt.collect {
      case p if p.getClass.getSimpleName == "LogicalRDD" &&
        p.output.exists(_.name == "doc_id") &&
        p.output.exists(_.name == "qid") => p
    }
    assert(ckptPairs.nonEmpty,
      "no distributed (qid, doc_id) winner materialization in the plan")

    // and the result is still the exact answer: the synthetic vectors repeat
    // with period 97, so chunks 5/102/199 are exact cosine-1 ties at the top
    // (ordered among themselves by doc_id hash)
    val hits = df.orderBy("rank").select("chunk").collect().map(_.getString(0))
    assert(hits.take(3).toSet == Set("chunk 5", "chunk 102", "chunk 199"),
      s"got ${hits.toSeq}")
  }

  test("BM25 df source follows the model: stored dictionary broadcasts, refit windows") {
    import spark.implicits._
    val docs = (0L until 60L).map(i => (i, s"alpha beta doc$i word${i % 7}"))
      .toDF("doc_id", "text")
    // persisted model: df comes from the stored term dictionary via broadcast
    // joins — the candidate postings are NEVER exchanged/sorted by term
    // (the r3 b4b_hybrid_persisted regression shape)
    val dir = Files.createTempDirectory("graft_bm25plan").toString
    graft.sources.SparseIndex.write(Bm25.fit(docs), dir, nBuckets = 4)
    val m = graft.sources.SparseIndex.read(spark, dir)
    val pStored = plan(Bm25.searchTopK(m, Seq(0L -> "alpha word3"), 5))
    assert(!pStored.contains("windowspecdefinition(term"),
      s"stored-stats serving plan windows candidates by term:\n$pStored")
    // refit model: candidate-derived df (single scan, window over candidates)
    // — no corpus-wide termDf re-aggregation in the plan
    val pRefit = plan(Bm25.searchTopK(Bm25.fit(docs), Seq(0L -> "alpha word3"), 5))
    assert(pRefit.contains("windowspecdefinition(term"),
      "refit serving plan should derive df from the candidate window")
  }

  test("stored dictionary lookup prunes to the query terms' _tbucket dirs") {
    import spark.implicits._
    val docs = (0L until 80L).map(i => (i, s"alpha beta doc$i word${i % 9}"))
      .toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft_tdprune").toString
    graft.sources.SparseIndex.write(Bm25.fit(docs), dir, nBuckets = 4)
    val m = graft.sources.SparseIndex.read(spark, dir)
    // AQE wraps subplans in query stages that TreeNode.collect does not
    // descend into — plan-shape asserts need the static plan (the
    // executedPlan is materialized lazily, so AQE must stay off until the
    // scan collection below has run)
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Bm25.searchTopK(m, Seq(0L -> "alpha word3"), 5)
      // the dictionary scan in the executed plan must carry a _tbucket
      // partition filter (the pruned read), not scan the whole vocabulary
      val scans = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("termdf")) => s
      }
      assert(scans.nonEmpty, "no termdf scan in the serving plan")
      scans.foreach { s =>
        assert(s.partitionFilters.exists(_.references.exists(_.name == "_tbucket")),
          s"termdf scan lacks a _tbucket partition filter: ${s.metadata}")
        // and the filter actually prunes: ≤ 2 distinct buckets for 2 terms
        assert(s.selectedPartitions.partitionCount <= 2,
          s"dictionary read touched ${s.selectedPartitions.partitionCount} dirs for 2 terms")
      }
      // results identical to a full-dictionary (pruner-less) model
      val mFull = m.copy(termDfPruned = None)
      assert(df.orderBy("qid", "rank").collect().map(_.toString).toSeq ==
        Bm25.searchTopK(mFull, Seq(0L -> "alpha word3"), 5)
          .orderBy("qid", "rank").collect().map(_.toString).toSeq,
        "pruned dictionary changes results")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  test("PQ ADC serving plan: broadcast probe join, nd2 below the join, narrow pairs") {
    val corpus  = Tables.ordersCorpus(spark, Sf).select("doc_id", "dv")
    val queries = Tables.queryBatch(spark, 4)
    val pq = Ivf.buildPq(corpus, nlist = 8, mSub = 8, ksub = 16, maxIter = 2)
    val df = Ivf.probePqAdc(pq, queries, nprobe = 4, k = 5)
    val p = plan(df)
    // the candidate ⋈ probe join must broadcast the probe side: the wide
    // per-query LUT rows live only inside the broadcast and the candidate
    // code stream is never shuffled for the pairing
    assert(p.contains("BroadcastHashJoin"), "probe join must broadcast")
    assert(!p.contains("SortMergeJoin"), s"candidate codes sort-merge-joined:\n$p")
    // query-independent ‖decoded‖² is computed BELOW the pair join (once per
    // candidate row): the streamed side of the centroid_id join carries a
    // pqadc over the constant norm LUT
    val probeJoin = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.condition.exists(_.references.exists(_.name == "centroid_id")) => j
    }
    assert(probeJoin.nonEmpty, "centroid_id probe join missing from plan")
    assert(probeJoin.exists(j => j.left.toString.toLowerCase.contains("pqadc") ||
        j.right.toString.toLowerCase.contains("pqadc")),
      "per-doc nd2 (pqadc over the norm LUT) not computed below the pair join")
  }

  test("persisted IVF probe prunes partitions (centroid_id IN pushed to scan)") {
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_prune").toString)
    def vec(seed: Int): Seq[Double] =
      (0 until 8).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, nlist = 8))
    cat.insert("t", "m", (0 until 200).map(i =>
      EmbeddedVector(s"k$i", s"text $i", "m", Map(), vec(i))))
    cat.persistIndex("t", "m")
    val idx = cat.loadIndex("t", "m")
    import spark.implicits._
    val queries = Seq((0L, vec(5))).toDF("qid", "qv")
    val res = Ivf.probePersisted(idx, queries, nprobe = 1, k = 3)
    val p = plan(res)
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(p).map(_.group(1))
    assert(pf.exists(_.contains("centroid_id")), s"partition filter missing: $pf")
    assert(res.count() == 3)

    // Bulk path: routing stays a join — the plan carries NO collected
    // centroid_id IN-list (proof no driver collect built one), and results
    // match probePersisted row-for-row on many queries.
    val qs = spark.range(40).select(col("id").as("qid"),
      graft.core.Tables.synthVec(col("id") * 7 + 3, 8).as("qv"))
    val bulk = Ivf.probeBulk(idx, qs, nprobe = 2, k = 3)
    val pb = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan(bulk)).map(_.group(1)).toSeq
    assert(!pb.exists(_.contains("centroid_id IN")),
      s"bulk probe has a collected IN-list: $pb")
    val a = bulk.collect().map(_.toSeq).toSet
    val b = Ivf.probePersisted(idx, qs, nprobe = 2, k = 3).collect().map(_.toSeq).toSet
    assert(a == b, "bulk probe diverges from probePersisted")
  }

  test("indexed hybrid keeps the dense leg cell-pruned through the fusion plan") {
    // the b4c/ScaleBench shape: persisted-IVF dense leg + BM25 sparse leg
    // fused by searchScored — RRF fusion must not defeat the dense leg's
    // centroid_id partition pruning
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_hybprune").toString)
    def vec(seed: Int): Seq[Double] =
      (0 until 8).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, nlist = 8))
    cat.insert("t", "m", (0 until 200).map(i =>
      EmbeddedVector(s"k$i", s"alpha beta doc$i common words", "m", Map(), vec(i))))
    cat.persistIndex("t", "m")
    val idx = cat.loadIndex("t", "m")
    import spark.implicits._
    val queries = Seq((0L, vec(5))).toDF("qid", "qv")
    val dense = Ivf.probePersisted(idx, queries, nprobe = 1, k = 50)
      .select(col("qid"), col("doc_id"), col("score").as("rawScore"))
    val fused = graft.operators.Hybrid.searchScored(dense,
      graft.operators.Bm25.fit(cat.load("t", "m").select(
        org.apache.spark.sql.functions.xxhash64(col("flouds_vector_id")).as("doc_id"),
        col("chunk").as("text"))),
      Seq(0L -> "alpha doc5"), SearchParams(limit = 10))
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan(fused)).map(_.group(1)).toSeq
    assert(pf.exists(_.contains("centroid_id")),
      s"dense leg lost cell pruning inside the fused plan: $pf")
    assert(fused.count() > 0, "fixture must fuse at least one hit")
  }

  test("bloom decontamination probes via codegen might_contain, not a UDF") {
    // the tree's last UDF was the broadcast-bloom long-probe; it is now
    // Catalyst's BloomFilterMightContain over a binary literal — assert the
    // probe shows up natively and that no ScalaUDF remains in the plan
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "beta gamma delta epsilon"),
      (3L, "zeta eta theta iota")).toDF("doc_id", "text")
    val split = Seq((1L, "train"), (2L, "test"), (3L, "test")).toDF("doc_id", "split")
    val df = Dedup.contaminationBloom(docs, split)
    val p = plan(df)
    assert(p.contains("might_contain"), s"expected native bloom probe in plan:\n$p")
    assert(!p.contains("UDF"), s"no ScalaUDF expected in the bloom plan:\n$p")
  }

  test("bloom decontamination prunes the train side BEFORE its first shuffle") {
    // the r11 restructure's contract: the might_contain filter must sit
    // below every Exchange on the train branch — the whole point is that
    // pruned rows never reach an exchange (at 100 TB the saved shuffle IS
    // the operator). Walk the physical tree: the bloom-probe filter's
    // subtree must be exchange-free.
    import spark.implicits._
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "beta gamma delta epsilon"),
      (3L, "zeta eta theta iota")).toDF("doc_id", "text")
    val split = Seq((1L, "train"), (2L, "test"), (3L, "test")).toDF("doc_id", "split")
    // AQE wraps finished stages in leaf QueryStageExec nodes that hide the
    // subtree from collect(); a static plan keeps the whole tree walkable
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Dedup.contaminationBloom(docs, split)
      val bloomFilters = df.queryExecution.executedPlan.collect {
        case f: FilterExec if f.condition.toString.contains("might_contain") => f
      }
      assert(bloomFilters.nonEmpty, "bloom-probe FilterExec not found")
      for (f <- bloomFilters) {
        val shufflesBelow = f.collect { case s: ShuffleExchangeLike => s }
        assert(shufflesBelow.isEmpty,
          s"bloom probe must prune before any exchange, found:\n$f")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  test("bulk hybrid sparse leg is plan-resident: query texts come from a scan") {
    // q_hybrid_bulk's shape: queries (qid, qv, text) derive from parquet —
    // the Df-native sparse leg must tokenize INSIDE the plan (a scan under
    // the qTerms explode), never collapse the query side to a driver-built
    // LocalTableScan (that is the Seq path's shape, capped at request size)
    val docs = Tables.load(spark, Sf, "documents").select("doc_id", "text")
    val queries = Tables.docsCorpus(spark, Sf).filter(col("doc_id") < 2)
      .select(col("doc_id").as("qid"), lit("spark join window").as("text"))
    val sparse = Bm25.searchTopKDf(Bm25.fit(docs), queries, 10)
    val p = plan(sparse)
    assert(!p.contains("LocalTableScan"),
      s"bulk sparse leg materialized its query side on the driver:\n$p")
    assert(p.contains("Scan parquet") || p.contains("FileScan"),
      "bulk sparse leg lost its file-scan query source")
  }

  test("facade hybrid keeps the _tbucket dictionary prune on the Df-native leg") {
    // the facade's sparse leg now rides Hybrid.searchScoredDf → Bm25
    // .searchTopKDf with knownTerms from the request's text_filter — the
    // stored-dictionary partition prune (≤ |terms| _tbucket dirs) must
    // survive the Df form. The facade localCheckpoints the fused result
    // (its final plan is a checkpoint scan), so the plan-shape assert
    // runs on the same searchScoredDf composition the facade builds; the
    // facade END RESULT is asserted for parity right after.
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_hybdf").toString)
    def vec(seed: Int): Seq[Double] =
      (0 until 8).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8))
    cat.insert("t", "m", (0 until 60).map(i =>
      EmbeddedVector(s"k$i", s"alpha beta doc$i word${i % 9}", "m", Map(), vec(i))))
    cat.ensureSparseIndex("t", "m")
    val m = graft.sources.SparseIndex.read(spark,
      cat.sparseDirOf("t", "m"))
    import spark.implicits._
    val queries = Seq((0L, vec(5)), (1L, vec(7))).toDF("qid", "qv")
    val corpus = cat.load("t", "m").select(
      xxhash64(col("flouds_vector_id")).as("doc_id"), col("vector").as("dv"))
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val fused = Hybrid.searchScoredDf(
        Knn.scored(corpus, queries, "COSINE"), m,
        queries.select(col("qid"), lit("alpha word3").as("text")),
        SearchParams(limit = 10), knownTerms = Some(Seq("alpha", "word3")))
      val scans = fused.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("termdf")) => s
      }
      assert(scans.nonEmpty, "no termdf scan in the Df-native hybrid plan")
      scans.foreach { s =>
        assert(s.partitionFilters.exists(_.references.exists(_.name == "_tbucket")),
          s"Df-native sparse leg lost the dictionary prune: ${s.metadata}")
        assert(s.selectedPartitions.partitionCount <= 2,
          s"dictionary read touched ${s.selectedPartitions.partitionCount} dirs for 2 terms")
      }
      assert(fused.count() > 0, "fixture must fuse at least one hit")
      // the facade end-to-end returns the same fused winners for qid 0
      val req = graft.api.SearchRequest("t", "m", vec(5), limit = 10,
        hybridSearch = true, textFilter = Some("alpha word3"))
      val viaFacade = cat.searchDfBatch(req, Seq(vec(5), vec(7)))
        .filter(col("qid") === 0L).select("doc_id").collect()
        .map(_.getLong(0)).toSet
      val direct = fused.filter(col("qid") === 0L).select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(viaFacade == direct,
        s"facade hybrid winners diverged from the direct Df-native plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }
}
