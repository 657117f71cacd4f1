package graft

import graft.api._
import graft.operators.Multimodal
import graft.sources.VectorStoreCatalog
import graft.streaming.Ingest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

class CatalogSpec extends SparkSpec {

  private def mkCatalog = new VectorStoreCatalog(spark,
    Files.createTempDirectory("graft_cat").toString)

  private def vec(seed: Int, dim: Int = 8): Seq[Double] =
    (0 until dim).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)

  test("generate_schema -> insert -> search lifecycle (D1/D2/S1/S4/S5/A1)") {
    val cat = mkCatalog
    cat.generateSchema(SchemaSpec("master", "all-MiniLM-L6-v2", dimension = 8))
    assert(cat.collectionExists("master", "all-MiniLM-L6-v2"))
    assert(cat.dimension("master", "all-MiniLM-L6-v2") == 8)
    assert(cat.tableName("master", "all-MiniLM-L6-v2") ==
      "vector_store_schema_for_master_all_minilm_l6_v2")

    val rows = (0 until 20).map(i => EmbeddedVector(s"k$i", s"chunk number $i spark data",
      "all-MiniLM-L6-v2", Map("cat" -> s"c${i % 3}"), vec(i)))
    val n = cat.insert("master", "all-MiniLM-L6-v2", rows)
    assert(n == 20)

    // upsert: same key replaces
    cat.insert("master", "all-MiniLM-L6-v2",
      Seq(EmbeddedVector("k0", "replaced chunk", "all-MiniLM-L6-v2", Map(), vec(0))))
    assert(cat.load("master", "all-MiniLM-L6-v2").count() == 20)

    val resp = cat.search(SearchRequest("master", "all-MiniLM-L6-v2", vec(3),
      limit = 5, metricType = "COSINE"))
    assert(resp.success && resp.data.nonEmpty)
    assert(resp.data.head.content.contains("3")) // self-match first

    // meta filter via facade
    val filt = cat.search(SearchRequest("master", "all-MiniLM-L6-v2", vec(3),
      limit = 5, metaFilter = Map("cat" -> "c1")))
    assert(filt.data.forall(_.meta.get("cat").contains("c1")))

    // empty result envelope: success=false (vector_store_service.py:430-435)
    val none = cat.search(SearchRequest("master", "all-MiniLM-L6-v2", vec(3),
      limit = 5, metaFilter = Map("cat" -> "zzz")))
    assert(!none.success)
  }

  test("adversarial names cannot escape the catalog root (path_validator.py parity)") {
    // the reference adds a path layer rejecting `..`/`~`/`$` patterns
    // (app/utils/path_validator.py:20-50). This catalog is structurally
    // confined instead: tenant names allow no dot/slash at validation
    // (TenantRe), and tableName substitutes [-.] -> _ under a constant
    // prefix, so no accepted (tenant, model) pair can name a parent or
    // sibling directory. Assert that with the nastiest names validation
    // accepts, plus that the classic traversal strings are rejected.
    val root = Files.createTempDirectory("graft_cat_safe")
    val cat = new VectorStoreCatalog(spark, root.toString)
    // model "..." is all-dots and passes the reference's model regex too
    for (m <- Seq("...", "-..-", "a.b-c")) {
      cat.generateSchema(SchemaSpec("master", m, dimension = 8))
      val dir = cat.tableDir("master", m).toAbsolutePath.normalize
      assert(dir.startsWith(root.toAbsolutePath.normalize),
        s"model '$m' escaped the catalog root: $dir")
      cat.insert("master", m, Seq(
        EmbeddedVector("k1", "safe chunk", m, Map(), vec(1))))
      assert(cat.load("master", m).count() == 1)
    }
    // names with separators or traversal characters are rejected up front
    for (t <- Seq("../x", "a/b", "~root", "a$b", ".."))
      intercept[IllegalArgumentException](
        cat.generateSchema(SchemaSpec(t, "m", dimension = 8)))
    for (m <- Seq("../x", "a/b", "a~b", "a$b"))
      intercept[IllegalArgumentException](
        cat.generateSchema(SchemaSpec("master", m, dimension = 8)))
  }

  test("response envelope echoes every request knob (search_base.py:12-95 parity)") {
    val cat = mkCatalog
    cat.generateSchema(SchemaSpec("master", "echo-model", dimension = 8))
    cat.insert("master", "echo-model", (0 until 12).map(i =>
      EmbeddedVector(s"k$i", s"chunk number $i", "echo-model",
        Map("cat" -> "c"), vec(i))))
    // every knob of the reference's shared base model, set to a non-default
    val req = SearchRequest("master", "echo-model", vec(3),
      limit = 7, offset = 2, nprobe = 12, roundDecimal = 4,
      scoreThreshold = Some(-0.5), metricType = "IP",
      outputFields = Seq("chunk", "meta"), metaRequired = true,
      textFilter = Some("chunk"), minimumWordsMatch = 1,
      includeStopWords = true, increaseLimitForTextSearch = 20,
      hybridSearch = false, consistencyLevel = "Session")
    val expect = Map(
      "model" -> "echo-model", "limit" -> "7", "offset" -> "2",
      "nprobe" -> "12", "round_decimal" -> "4",
      "consistency_level" -> "Session", "output_fields" -> "chunk,meta",
      "score_threshold" -> "-0.5", "meta_required" -> "true",
      "metric_type" -> "IP", "text_filter" -> "chunk",
      "minimum_words_match" -> "1", "include_stop_words" -> "true",
      "increase_limit_for_text_search" -> "20", "hybrid_search" -> "false")
    val resp = cat.search(req)
    expect.foreach { case (k, v) =>
      assert(resp.params.get(k).contains(v), s"knob $k: got ${resp.params.get(k)}")
    }
    // ...and nothing else: the knob set IS the reference's field list
    // (non-HNSW collection, so no engine `ef` addendum here)
    assert(resp.params.keySet == expect.keySet,
      s"stray/missing echo fields: ${resp.params.keySet.diff(expect.keySet)} / " +
        s"${expect.keySet.diff(resp.params.keySet)}")
    // optional knobs stay absent when the request leaves them unset
    val dflt = cat.search(SearchRequest("master", "echo-model", vec(3)))
    assert(!dflt.params.contains("score_threshold"))
    assert(!dflt.params.contains("text_filter"))
    assert(dflt.params("limit") == "10" && dflt.params("hybrid_search") == "false")
    // an empty-result (success=false) envelope carries the echo too
    val none = cat.search(SearchRequest("master", "echo-model", vec(3),
      metaFilter = Map("cat" -> "zzz")))
    assert(!none.success && none.params("model") == "echo-model")
  }

  test("driver-side bucket twin matches pmod(xxhash64(key), n) exactly") {
    import spark.implicits._
    val cat = mkCatalog
    val stringKeys = Seq("k0", "seed17", "", "Ünïcôdé-键", "a" * 256)
    val longKeys   = Seq(1L, 42L, -7L, Long.MaxValue, Long.MinValue + 1)
    for (n <- Seq(8, 16, 64)) {
      val sparkStr = stringKeys.toDF("k")
        .select(pmod(xxhash64(col("k")), lit(n.toLong))).as[Long].collect().toSeq
      assert(sparkStr == stringKeys.map(cat.bucketOfKey(_, n)),
        s"string bucket twin diverges at n=$n")
      val sparkLong = longKeys.toDF("k")
        .select(pmod(xxhash64(col("k")), lit(n.toLong))).as[Long].collect().toSeq
      assert(sparkLong == longKeys.map(cat.bucketOfKey(_, n)),
        s"long bucket twin diverges at n=$n")
    }
    // and the dictionary's term-bucket twin (SparseIndex._tbucket pruning)
    val terms = Seq("alpha", "word3", "spark", "Ünïcôdé", "")
    val sparkT = terms.toDF("term")
      .select(pmod(xxhash64(col("term")),
        lit(graft.sources.SparseIndex.TermBuckets.toLong))).as[Long].collect().toSeq
    assert(sparkT == terms.map(graft.sources.SparseIndex.termBucketOf),
      "term bucket twin diverges")
  }

  test("dimension mismatch and invalid rows are rejected (input_validator parity)") {
    val cat = mkCatalog
    cat.generateSchema(SchemaSpec("t1", "m1", dimension = 8))
    intercept[IllegalArgumentException] {
      cat.insert("t1", "m1", Seq(EmbeddedVector("k", "c", "m1", Map(), vec(1, dim = 4))))
    }
    intercept[IllegalArgumentException] { // dup keys in batch
      cat.insert("t1", "m1", Seq(
        EmbeddedVector("k", "c", "m1", Map(), vec(1)),
        EmbeddedVector("k", "d", "m1", Map(), vec(2))))
    }
    intercept[IllegalArgumentException] { // search against missing collection
      cat.search(SearchRequest("t1", "missing", vec(1)))
    }
    intercept[IllegalArgumentException] { // bad schema spec
      SchemaSpec("t1", "m1", dimension = 5000)
    }
  }

  test("batch search: one request, N vectors, rank parity with N single requests") {
    val cat = mkCatalog
    cat.generateSchema(SchemaSpec("tb", "m1", dimension = 8, nlist = 8))
    cat.insert("tb", "m1", (0 until 90).map(i =>
      EmbeddedVector(s"k$i", s"chunk $i", "m1", Map("i" -> s"$i"), vec(i))))

    def parity(note: String): Unit = {
      val vs = Seq(vec(3), vec(17), vec(55))
      val req = SearchRequest("tb", "m1", vs.head, limit = 5, nprobe = 4)
      val batch = cat.searchBatch(req, vs)
      val singles = vs.map(v => cat.search(req.copy(vector = v)))
      assert(batch.size == 3)
      batch.zip(singles).zipWithIndex.foreach { case ((b, s), i) =>
        assert(b.success == s.success, s"[$note] q$i success mismatch")
        assert(b.data.map(_.content) == s.data.map(_.content),
          s"[$note] q$i: batch ${b.data.map(_.content)} vs single ${s.data.map(_.content)}")
      }
    }
    parity("full scan")          // no index yet
    cat.persistIndex("tb", "m1")
    parity("index-bounded")      // per-query probed cells, point lookups

    // hybrid batch parity (persisted postings + per-query dense cells)
    val vs = Seq(vec(3), vec(17))
    val hreq = SearchRequest("tb", "m1", vs.head, limit = 5, nprobe = 8,
      hybridSearch = true, textFilter = Some("chunk 17"))
    val hb = cat.searchBatch(hreq, vs)
    val hs = vs.map(v => cat.search(hreq.copy(vector = v)))
    hb.zip(hs).foreach { case (b, s) =>
      assert(b.data.map(_.content) == s.data.map(_.content), "hybrid batch parity")
    }

    // quantized (SQ8) collection: same per-query candidate masking + refine
    // margin, so batch still equals N single requests
    val cat2 = mkCatalog
    cat2.generateSchema(SchemaSpec("tq", "m1", dimension = 8, nlist = 8,
      indexType = "IVF_SQ8"))
    cat2.insert("tq", "m1", (0 until 90).map(i =>
      EmbeddedVector(s"k$i", s"chunk $i", "m1", Map(), vec(i))))
    cat2.persistIndex("tq", "m1")
    val qreq = SearchRequest("tq", "m1", vs.head, limit = 5, nprobe = 4)
    val qb = cat2.searchBatch(qreq, vs)
    val qsgl = vs.map(v => cat2.search(qreq.copy(vector = v)))
    qb.zip(qsgl).foreach { case (b, s) =>
      assert(b.data.map(_.content) == s.data.map(_.content), "SQ8 batch parity")
    }
  }

  test("INT64 auto_id collection: generated long PKs, append-only, searchable") {
    val cat = mkCatalog
    cat.generateSchema(SchemaSpec("t8", "m1", dimension = 8,
      primaryKeyDataType = "INT64"))
    assert(cat.autoId("t8", "m1"))
    // caller keys are ignored on an auto_id collection (reference parity)
    cat.insert("t8", "m1", (0 until 20).map(i =>
      EmbeddedVector("", s"auto chunk $i", "m1", Map(), vec(i))))
    val ids = cat.load("t8", "m1").select("flouds_vector_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (1L to 20L), s"got $ids")
    // append-only: the next batch reserves fresh ids, nothing is replaced
    cat.insert("t8", "m1",
      Seq(EmbeddedVector("", "auto chunk 20", "m1", Map(), vec(42))))
    assert(cat.load("t8", "m1").count() == 21)
    assert(cat.load("t8", "m1").agg(max("flouds_vector_id")).head().getLong(0) == 21L)
    // search round-trip over the long-PK store
    val hit = cat.search(SearchRequest("t8", "m1", vec(3), limit = 3))
    assert(hit.success && hit.data.head.content == "auto chunk 3")
  }

  test("metadata_length is enforced on ingest (VARCHAR(metadata_length) parity)") {
    val cat = mkCatalog
    cat.generateSchema(SchemaSpec("t9", "m1", dimension = 8, metadataLength = 256))
    // {"k":"<v>"} serializes to 8 + len(v) chars: 248 -> exactly 256, passes
    cat.insert("t9", "m1", Seq(EmbeddedVector("a", "c", "m1",
      Map("k" -> "x" * 248), vec(1))))
    assert(cat.load("t9", "m1").count() == 1)
    // 249 -> 257, one past the boundary: rejected
    val ex = intercept[IllegalArgumentException] {
      cat.insert("t9", "m1", Seq(EmbeddedVector("b", "c", "m1",
        Map("k" -> "x" * 249), vec(2))))
    }
    assert(ex.getMessage.contains("metadata_length"))
    assert(cat.load("t9", "m1").count() == 1)
  }

  test("partition targeting restricts search (S6); config KV round-trips (D8)") {
    val cat = mkCatalog
    cat.generateSchema(SchemaSpec("t2", "m1", dimension = 8))
    cat.insert("t2", "m1", Seq(EmbeddedVector("a", "alpha", "m1", Map(), vec(1))),
      partition = Some("p1"))
    cat.insert("t2", "m1", Seq(EmbeddedVector("b", "beta", "m1", Map(), vec(2))),
      partition = Some("p2"))
    val only = cat.search(SearchRequest("t2", "m1", vec(1), limit = 10,
      partitionName = Some("p2")))
    assert(only.data.map(_.content) == Seq("beta"))

    cat.configSet("t2", "cors", "https://x.example")
    assert(cat.configGet("t2", "cors").contains("https://x.example"))
    cat.configDelete("t2", "cors")
    assert(cat.configGet("t2", "cors").isEmpty)
  }

  test("BM25 sparse vectors are stored on insert (H1 / sparse_vector column)") {
    val cat = mkCatalog
    cat.generateSchema(SchemaSpec("t3", "m1", dimension = 8, dropRatioBuild = 0.0))
    cat.insert("t3", "m1", (0 until 5).map(i =>
      EmbeddedVector(s"k$i", s"alpha beta doc$i", "m1", Map(), vec(i))))
    val sv = cat.load("t3", "m1").select("sparse_vector").collect()
    assert(sv.forall(r => r.getMap[Int, Float](0).nonEmpty))
  }
}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming ingest merges micro-batches by key (foreachBatch MERGE)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val dir = Files.createTempDirectory("graft_stream").resolve("tbl").toString
    val q = Ingest.start(spark,
      mem.toDF().toDF("key", "v", "seq"), dir, "key")
    try {
      mem.addData((1L, "a", 1L), (2L, "b", 1L))
      q.processAllAvailable()
      mem.addData((2L, "B", 2L), (3L, "c", 2L), (3L, "c2", 3L))
      q.processAllAvailable()
      val out = spark.read.parquet(dir).collect()
        .map(r => r.getAs[Long]("key") -> r.getAs[String]("v")).toMap
      assert(out == Map(1L -> "a", 2L -> "B", 3L -> "c2"))
    } finally q.stop()
  }

  test("micro-batch commit rewrites only the buckets it touches") {
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft_stream_b").resolve("tbl")
    def bucketOf(k: Long): Int = spark.range(1)
      .select(pmod(xxhash64(lit(k.toString)), lit(16L)).cast("int")).head().getInt(0)
    def snapshot(): Map[String, Long] =
      Files.walk(dir).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        .map(p => dir.relativize(p).toString -> Files.getLastModifiedTime(p).toMillis)
        .toMap

    // seed: 20 keys spread across buckets
    Ingest.mergeIntoParquet(spark,
      (0L until 20L).map(i => (i, s"v$i", 1L)).toDF("key", "v", "seq"),
      dir.toString, "key")
    val before = snapshot()

    // second commit touches exactly one key's bucket
    Ingest.mergeIntoParquet(spark,
      Seq((7L, "V7", 2L)).toDF("key", "v", "seq"), dir.toString, "key")
    val after = snapshot()
    val b7 = bucketOf(7L)
    val untouched = before.keySet.filterNot(_.contains(s"_bucket=$b7"))
    assert(untouched.nonEmpty)
    untouched.foreach { p =>
      assert(after.get(p) == before.get(p), s"untouched bucket file rewritten: $p")
    }
    // and the merge is correct
    val out = spark.read.parquet(dir.toString).collect()
      .map(r => r.getAs[Long]("key") -> r.getAs[String]("v")).toMap
    assert(out(7L) == "V7" && out(0L) == "v0" && out.size == 20)
  }

  test("merge uses the persisted bucket layout, not the caller's parameter") {
    val dir = Files.createTempDirectory("graft_stream_l").resolve("tbl")
    Ingest.mergeIntoParquet(spark,
      (0L until 20L).map(i => (i, s"v$i", 1L)).toDF("key", "v", "seq"),
      dir.toString, "key", nBuckets = 4)
    // a later caller passing a DIFFERENT bucket count must not make keys hash
    // to fresh buckets (which would duplicate them past the anti-join)
    Ingest.mergeIntoParquet(spark,
      (0L until 20L).map(i => (i, s"V$i", 2L)).toDF("key", "v", "seq"),
      dir.toString, "key", nBuckets = 16)
    val out = spark.read.parquet(dir.toString).collect()
      .map(r => r.getAs[Long]("key") -> r.getAs[String]("v"))
    assert(out.length == 20, s"duplicate keys after layout-mismatched merge: ${out.length}")
    assert(out.toMap.forall { case (k, v) => v == s"V$k" })
  }
}

class VectorIngestStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming facade ingest keeps the collection and its index searchable") {
    implicit val sqlCtx = spark.sqlContext
    def vec(seed: Int): Seq[Double] =
      (0 until 8).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_vstream").toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8))
    val mem = MemoryStream[(String, String, Seq[Double])]
    val stream = mem.toDF().toDF("key", "chunk", "vector")
      .withColumn("metadata", map(lit("src"), lit("stream")))
    val q = graft.streaming.VectorIngest.start(cat, "t", "m", stream)
    try {
      mem.addData((0 until 20).map(i => (s"k$i", s"streamed chunk $i", vec(i))): _*)
      q.processAllAvailable()
      assert(cat.load("t", "m").count() == 20)
      val hit = cat.search(SearchRequest("t", "m", vec(7), limit = 3))
      assert(hit.success && hit.data.head.content == "streamed chunk 7")
      assert(hit.data.head.meta.get("src").contains("stream"))

      // a later micro-batch UPSERTS (and in-batch dup keys keep the last)
      mem.addData(("k7", "old text", vec(7)), ("k7", "replaced by stream", vec(7)))
      q.processAllAvailable()
      assert(cat.load("t", "m").count() == 20)
      val rep = cat.search(SearchRequest("t", "m", vec(7), limit = 3))
      assert(rep.data.head.content == "replaced by stream")
      // the incrementally-maintained sparse index followed the stream
      val m = graft.sources.SparseIndex.read(spark,
        java.nio.file.Paths.get(cat.sparseDirOf("t", "m")).toString)
      assert(m.global.head().getLong(0) == 20)
    } finally q.stop()
  }

  test("a beyond-request-size micro-batch commits through the distributed path") {
    implicit val sqlCtx = spark.sqlContext
    // period-104729 (> batch size) so all 10k vectors are DISTINCT — the
    // usual period-97 fixture would make the self-match an arbitrary tie
    def vec(seed: Int): Seq[Double] =
      (0 until 8).map(i => ((seed * 131 + i * 313 + 7) % 104729 - 52364).toDouble)
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_vstream_big").toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8))
    val mem = MemoryStream[(String, String, Seq[Double])]
    val stream = mem.toDF().toDF("key", "chunk", "vector")
      .withColumn("metadata", map(lit("src"), lit("bigstream")))
    val q = graft.streaming.VectorIngest.start(cat, "t", "m", stream)
    try {
      // 10k rows ≫ the 1000-row facade insert contract: the micro-batch
      // must take insertDf (one distributed commit), not driver chunking
      mem.addData((0 until 10000).map(i => (s"k$i", s"big chunk $i", vec(i))): _*)
      q.processAllAvailable()
      assert(cat.load("t", "m").count() == 10000)
      val hit = cat.search(SearchRequest("t", "m", vec(7777), limit = 3))
      assert(hit.success && hit.data.head.content == "big chunk 7777")
      assert(hit.data.head.meta.get("src").contains("bigstream"))
      // ONE commit per trigger: the sparse stats moved to exactly n=10000
      val m = graft.sources.SparseIndex.read(spark,
        java.nio.file.Paths.get(cat.sparseDirOf("t", "m")).toString)
      assert(m.global.head().getLong(0) == 10000)
    } finally q.stop()
  }

  test("insertDf stores exactly what the request-path insert stores") {
    def vec(seed: Int): Seq[Double] =
      (0 until 8).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
    val catA = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_eqA").toString)
    val catB = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_eqB").toString)
    for (c <- Seq(catA, catB)) c.generateSchema(SchemaSpec("t", "m", dimension = 8))
    val rows = (0 until 120).map(i =>
      EmbeddedVector(s"k$i", s"parity doc $i alpha beta", "m",
        Map("i" -> i.toString), vec(i), dynamicFields = Map("src" -> "eq")))
    catA.insert("t", "m", rows)
    val df = rows.map(r => (r.key, r.chunk, r.metadata, r.vector, r.dynamicFields))
      .toDF("key", "chunk", "metadata", "vector", "extra")
    assert(catB.insertDf("t", "m", df) == 120L)

    def dump(c: VectorStoreCatalog) = c.load("t", "m")
      .select(col("flouds_vector_id"), col("chunk"), col("meta"), col("extra"),
        col("vector"),
        expr("array_sort(map_entries(sparse_vector))").as("sv"))
      .collect().map(_.toString).sorted.toSeq
    assert(dump(catA) == dump(catB),
      "distributed and request-path inserts diverge in stored rows")
    // and the incremental sparse stats agree exactly
    def stats(c: VectorStoreCatalog) = {
      val m = graft.sources.SparseIndex.read(spark,
        java.nio.file.Paths.get(c.sparseDirOf("t", "m")).toString)
      (m.global.head().toSeq, m.termDf.collect().map(_.toString).sorted.toSeq,
        m.tf.collect().map(_.toString).sorted.toSeq)
    }
    assert(stats(catA) == stats(catB), "sparse index state diverges")
  }

  test("insertDf validates distributed, dedups last-arrival, rejects bad rows") {
    def vec(seed: Int): Seq[Double] =
      (0 until 8).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_insertdf").toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, metadataLength = 256))
    // dup key k1: single partition makes arrival order exact — last wins
    val df = Seq(
      ("k1", "first arrival", vec(1)),
      ("k2", "doc two", vec(2)),
      ("k1", "last arrival", vec(1))
    ).toDF("key", "chunk", "vector")
      .withColumn("metadata", map(lit("a"), lit("b"))).coalesce(1)
    assert(cat.insertDf("t", "m", df) == 2L)
    assert(cat.load("t", "m").count() == 2)
    val got = cat.search(SearchRequest("t", "m", vec(1), limit = 1))
    assert(got.data.head.content == "last arrival")

    // a wrong-dim vector anywhere in the batch fails the whole commit
    val badDim = Seq(("k9", "bad", Seq(1.0, 2.0)))
      .toDF("key", "chunk", "vector")
      .withColumn("metadata", typedLit(Map.empty[String, String]))
    val e = intercept[IllegalArgumentException](cat.insertDf("t", "m", badDim))
    assert(e.getMessage.contains("invalid vectors"))
    // metadata_length is enforced against the stored serialization
    val badMeta = Seq(("k9", "doc", vec(9)))
      .toDF("key", "chunk", "vector")
      .withColumn("metadata", map(lit("k"), lit("x" * 300)))
    val e2 = intercept[IllegalArgumentException](cat.insertDf("t", "m", badMeta))
    assert(e2.getMessage.contains("metadata_length"))
    // auto_id collections are rejected (no distributed id reservation)
    cat.generateSchema(SchemaSpec("t", "auto", dimension = 8,
      primaryKeyDataType = "INT64"))
    val e3 = intercept[IllegalArgumentException](
      cat.insertDf("t", "auto", df))
    assert(e3.getMessage.contains("auto_id"))

    // a NULL metadata map stores "{}" (request-path parity: json.dumps of
    // meta-or-{} — NULL would diverge under metaRequired / meta filters)
    val nullMeta = Seq(("kn", "null meta doc", vec(3)))
      .toDF("key", "chunk", "vector")
      .withColumn("metadata", lit(null).cast("map<string,string>"))
    assert(cat.insertDf("t", "m", nullMeta) == 1L)
    val storedMeta = cat.load("t", "m")
      .filter(col("flouds_vector_id") === "kn").select("meta").head().getString(0)
    assert(storedMeta == "{}", s"NULL metadata stored as '$storedMeta'")

    // a NULL vector ELEMENT fails validation (the exists() predicate must
    // not three-valued-logic its way to "valid")
    val nullElem = Seq(("kz", "bad elem",
        Seq[java.lang.Double](1.0, null, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0)))
      .toDF("key", "chunk", "vector")
      .withColumn("metadata", typedLit(Map.empty[String, String]))
    val e4 = intercept[IllegalArgumentException](cat.insertDf("t", "m", nullElem))
    assert(e4.getMessage.contains("invalid vectors"))
  }

  test("insertDf explicit ordinal: deterministic last-wins across shuffled partitions") {
    def vec(seed: Int): Seq[Double] =
      (0 until 8).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_insertdf_ord").toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8))
    // 10 versions of each of 4 keys, scattered over 8 partitions by a
    // shuffle — monotonically_increasing_id order is partition-dependent
    // here, so only the caller ordinal makes the winner deterministic
    val rows = (0 until 40).map(i => (s"k${i % 4}", s"v$i", vec(i % 4), i.toLong))
    val df = rows.toDF("key", "chunk", "vector", "seq")
      .repartition(8, col("chunk"))
      .withColumn("metadata", typedLit(Map.empty[String, String]))
    assert(cat.insertDf("t", "m", df, ordinalCol = Some("seq")) == 4L)
    val got = cat.load("t", "m").select("flouds_vector_id", "chunk").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // the max-seq row for key kj is i = 36 + j
    (0 until 4).foreach { j =>
      assert(got(s"k$j") == s"v${36 + j}",
        s"key k$j kept ${got(s"k$j")}, want v${36 + j}")
    }
    // the ordinal column is consumed by dedup, not stored
    assert(!cat.load("t", "m").columns.contains("seq"))
  }

  test("streaming ingest rejects auto_id collections (replay would duplicate rows)") {
    implicit val sqlCtx = spark.sqlContext
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_vstream_auto").toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8,
      primaryKeyDataType = "INT64"))
    val mem = MemoryStream[(String, String, Seq[Double])]
    val stream = mem.toDF().toDF("key", "chunk", "vector")
      .withColumn("metadata", map(lit("src"), lit("stream")))
    val e = intercept[IllegalArgumentException] {
      graft.streaming.VectorIngest.start(cat, "t", "m", stream)
    }
    assert(e.getMessage.contains("auto_id"))
  }
}

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming dedup drops repeated keys within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    val out = graft.streaming.Ingest.dedupStream(
      mem.toDF().toDF("key", "ts", "v"), "key", "ts", "30 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(0), "a"), (1L, ts(1), "a-dup"), (2L, ts(2), "b"))
      q.processAllAvailable()
      mem.addData((1L, ts(3), "a-dup2"), (3L, ts(4), "c"))
      q.processAllAvailable()
      val keys = spark.table("dedup_stream").collect()
        .map(r => r.getAs[Long]("key") -> r.getAs[String]("v"))
      assert(keys.map(_._1).sorted.toSeq == Seq(1L, 2L, 3L))
      assert(keys.toMap.apply(1L) == "a") // first occurrence wins
    } finally q.stop()
  }
}

class LshSkewGuardSpec extends SparkSpec {
  import graft.operators.Dedup
  import spark.implicits._

  test("jaccardPairs maxDf caps the quadratic blowup of a ubiquitous term") {
    // 40 docs sharing one ubiquitous token, pairwise-distinct otherwise,
    // plus one true near-dup pair on rare terms
    val docs = ((0L until 40L).map(i => (i, s"boiler token$i", "en"))
      ++ Seq((100L, "alpha beta gamma delta", "en"),
             (101L, "alpha beta gamma epsilon", "en"))).toDF("doc_id", "text", "blk")
    // unguarded: "boiler" (df=40) emits 40*39/2 = 780 intersection pairs
    val unguarded = Dedup.jaccardPairs(docs, "blk", 0.01)
    assert(unguarded.count() >= 780)
    // guarded: boiler dropped from the sets; only the rare-term pair remains,
    // with Jaccard computed over the remaining vocabulary (3/5)
    val guarded = Dedup.jaccardPairs(docs, "blk", 0.5, maxDf = Some(10))
    val rows = guarded.collect()
    assert(rows.length == 1, s"got ${rows.toSeq}")
    assert(rows.head.getAs[Long]("doc_a") == 100L &&
      rows.head.getAs[Long]("doc_b") == 101L)
    assert(math.abs(rows.head.getAs[Double]("jaccard") - 0.6) < 1e-12)
  }

  test("maxBucketSize drops degenerate buckets but keeps normal near-dup pairs") {
    // 30 identical boilerplate docs (a degenerate bucket) + one true pair
    val docs = ((0L until 30L).map(i => (i, "the same boilerplate text every time repeated"))
      ++ Seq((100L, "alpha beta gamma delta epsilon zeta"),
             (101L, "alpha beta gamma delta epsilon zeta"))).toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(docs)
    val unguarded = Dedup.lshCandidatePairs(sig).count()
    val guarded = Dedup.lshCandidatePairs(sig, maxBucketSize = Some(10))
    // degenerate 30-doc bucket => 435 pairs gone; the true pair survives
    assert(guarded.count() < unguarded)
    assert(guarded.filter(col("doc_a") === 100L && col("doc_b") === 101L).count() == 1)
    assert(guarded.filter(col("doc_a") < 30L && col("doc_b") < 30L).count() == 0)
  }
}

class StreamingSessionizeSpec extends SparkSpec {
  import graft.streaming.SessionizeStream._
  import spark.implicits._

  test("stateful streaming sessionization closes sessions by gap and by timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SEvent]
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    val gapMs = 30L * 60 * 1000
    val sessions = sessionize(
      mem.toDS().withWatermark("ts", "10 minutes").as[SEvent], gapMs)
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // user 1: two events 5 min apart (one session), then silence
      mem.addData(SEvent(1L, ts(0), 1.0), SEvent(1L, ts(5), 2.0))
      q.processAllAvailable()
      assert(spark.table("sess").count() == 0) // still open

      // same user, past the gap IN-BATCH: closes the first session directly
      mem.addData(SEvent(1L, ts(50), 4.0))
      q.processAllAvailable()
      val first = spark.table("sess").as[ClosedSession].collect()
      assert(first.toSeq == Seq(
        ClosedSession(1L, ts(0).getTime, ts(5).getTime, 2L, 3.0)))

      // another user's much-later event advances the watermark beyond the
      // open session's deadline -> event-time TIMEOUT closes it
      mem.addData(SEvent(2L, ts(99) /* wm -> :89 > :50+30 */, 9.0))
      q.processAllAvailable()
      mem.addData(SEvent(2L, ts(99), 0.0)) // tick a batch at the new watermark
      q.processAllAvailable()
      val closed = spark.table("sess").as[ClosedSession].collect()
      assert(closed.exists(c =>
        c.userId == 1L && c.sessionStart == ts(50).getTime && c.nEvents == 1L))
    } finally q.stop()
  }
}

class StreamingWindowSpec extends SparkSpec {
  import spark.implicits._

  test("event-time windowed aggregation with watermark over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    val agg = mem.toDF().toDF("ts", "etype", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "30 minutes"), col("etype"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
    val q = agg.writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    try {
      mem.addData((ts(1), "a", 1.0), (ts(5), "a", 2.0), (ts(31), "b", 4.0))
      q.processAllAvailable()
      val rows = spark.table("win_agg").collect()
        .map(r => (r.getStruct(0).getTimestamp(0).toString.take(16),
          r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(rows == Set(
        ("2024-01-01 00:00", "a", 2L, 3.0),
        ("2024-01-01 00:30", "b", 1L, 4.0)))
    } finally q.stop()
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("BMP/WAV header parsers decode files produced by independent JDK encoders") {
    // BMP via ImageIO (JDK's own BMP writer — not our synthesizer)
    val img = new java.awt.image.BufferedImage(17, 9,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos))
    assert(Multimodal.decodeBmpHeader(bos.toByteArray).map(t => (t._1, t._2))
      .contains((17, 9)))

    // WAV via javax.sound.sampled (JDK's own WAV writer)
    val fmt = new javax.sound.sampled.AudioFormat(22050f, 16, 2, true, false)
    val pcm = new Array[Byte](22050 * 2 * 2 / 10)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / fmt.getFrameSize)
    val wos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, wos)
    assert(Multimodal.decodeWavHeader(wos.toByteArray).contains((22050, 2, 16)))

    // and our own synthesized files round-trip
    assert(Multimodal.decodeBmpHeader(Multimodal.synthBmp(6L))
      .contains((10, 9, 24))) // w = 4+6%13 = 10, h = 3+6%7 = 9
    assert(Multimodal.decodeWavHeader(Multimodal.synthWav(7L))
      .contains((16000, 2, 16))) // rate = 8000+(7%5)*4000, ch = 1+(7/2)%2
    // garbage is rejected, not misparsed
    assert(Multimodal.decodeBmpHeader("not a bitmap at all".getBytes).isEmpty)
    assert(Multimodal.decodeWavHeader(Multimodal.synthBmp(2L)).isEmpty)
  }

  test("PNG IHDR parser decodes JDK-encoded files; synthPng is a valid PNG") {
    // independent encoder: ImageIO's own PNG writer
    val img = new java.awt.image.BufferedImage(23, 11,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val pos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", pos))
    assert(Multimodal.decodePngHeader(pos.toByteArray).map(t => (t._1, t._2))
      .contains((23, 11)))

    // our synthesized file round-trips our parser…
    assert(Multimodal.decodePngHeader(Multimodal.synthPng(9L))
      .contains((11, 6, 8))) // w = 2+9%11 = 11, h = 2+9%5 = 6, depth 8
    // …and is a REAL decodable PNG: ImageIO reads it back, dims and a
    // pixel agree with the synthesis formula ((id+x+y)%256 on all channels)
    val rt = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.synthPng(9L)))
    assert(rt != null && rt.getWidth == 11 && rt.getHeight == 6)
    val px = rt.getRaster.getPixel(3, 2, null.asInstanceOf[Array[Int]])
    assert(px.toSeq == Seq(14, 14, 14)) // (9+3+2)%256
    // garbage (and a non-PNG container) is rejected, not misparsed
    assert(Multimodal.decodePngHeader("not a png".getBytes).isEmpty)
    assert(Multimodal.decodePngHeader(Multimodal.synthBmp(2L)).isEmpty)
  }

  test("extractMediaFeatures decodes all three containers with parsed bit depth") {
    val docs = (0L until 9L).toDF("doc_id")
    val rows = Multimodal.extractMediaFeatures(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(0L).getAs[String]("media_type") == "image/png")
    assert(rows(0L).getAs[Long]("bit_depth") == 8)
    assert(rows(0L).getAs[Long]("width") == 2 && rows(0L).getAs[Long]("height") == 2)
    assert(rows(1L).getAs[String]("media_type") == "image/bmp")
    assert(rows(1L).getAs[Long]("bit_depth") == 24)
    assert(rows(2L).getAs[String]("media_type") == "audio/wav")
    assert(rows(2L).getAs[Long]("bit_depth") == 16)
    assert(rows(2L).getAs[Long]("sample_rate") == 8000 + (2 % 5) * 4000)
  }

  test("BMP resize emits a valid container with correctly sampled pixels") {
    val id = 6L // w = 10, h = 9 → resized 5×4
    val resized = Multimodal.resizeBmp(Multimodal.synthBmp(id), 5, 4).get
    assert(Multimodal.decodeBmpHeader(resized).contains((5, 4, 24)))
    // independent decoder: ImageIO reads the re-encoded file
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
    assert(img != null && img.getWidth == 5 && img.getHeight == 4)
    // nearest-neighbor: resized pixel (2, 1) samples source (2*10/5, 1*9/4)
    // = (4, 2); BMP rows are bottom-up, so ask ImageIO for y = h-1-1 = 2.
    // source bytes (B,G,R) = (id + 4*3 + c + 2) % 256 for c = 0,1,2
    val px = img.getRaster.getPixel(2, 2, null.asInstanceOf[Array[Int]])
    assert(px.toSeq == Seq(22, 21, 20), s"got ${px.toSeq}") // ImageIO gives RGB
    // non-BMP input is rejected, not mangled
    assert(Multimodal.resizeBmp(Multimodal.synthWav(3L), 2, 2).isEmpty)
  }

  test("WAV frame sampling parses the data chunk and honors channel count") {
    val id = 7L // rate 16000, ch 2, n = 23 frames
    val (frames, kept, sum) = Multimodal.sampleWavFrames(Multimodal.synthWav(id), 4).get
    assert(frames == 23 && kept == 6) // frames 0,4,8,12,16,20
    val expected = (0 until 23 by 4).flatMap(f =>
      (0 until 2).map(j => ((id + f * 2 + j) % 64) * 512)).sum
    assert(sum == expected)
    assert(Multimodal.sampleWavFrames(Multimodal.synthBmp(2L), 4).isEmpty)
  }

  test("binary payload plumbing produces deterministic byte features") {
    val docs = Seq((7L, "abc"), (8L, "")).toDF("doc_id", "text")
    val f = Multimodal.extractFeatures(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // "abc" = 97,98,99: checksum ((0*31+97)*31+98)%997... computed mod 997
    var c = 0L; for (b <- Seq(97, 98, 99)) c = (c * 31 + b) % 997
    assert(f(7L).getAs[Long]("n_bytes") == 3)
    assert(f(7L).getAs[Long]("first_byte") == 97)
    assert(f(7L).getAs[Long]("checksum") == c)
    assert(f(8L).getAs[Long]("first_byte") == -1)
    val hist = f(7L).getSeq[Double](f(7L).fieldIndex("feature"))
    assert(hist.sum == 3.0)
  }
}

class DynamicFieldsAndConfigSpec extends SparkSpec {

  test("dynamic fields round-trip; encrypted config KV; health probe") {
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_dyn").toString)
    def vec(seed: Int): Seq[Double] =
      (0 until 8).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8))
    cat.insert("t", "m", Seq(
      EmbeddedVector("a", "alpha", "m", Map("k" -> "v"), vec(1),
        dynamicFields = Map("page" -> "7", "lang" -> "en")),
      EmbeddedVector("b", "beta", "m", Map(), vec(2))))
    val extras = cat.load("t", "m").orderBy("flouds_vector_id")
      .select("extra").collect().map(r =>
        Option(r.getMap[String, String](0)).map(_.toMap).getOrElse(Map.empty))
    assert(extras(0) == Map("page" -> "7", "lang" -> "en"))
    assert(extras(1).isEmpty)

    cat.configSetEncrypted("t", "api_key", "s3cr3t", "passphrase")
    assert(cat.configGet("t", "api_key").exists(_.startsWith("enc:")))
    assert(cat.configGetEncrypted("t", "api_key", "passphrase").contains("s3cr3t"))
    assert(cat.configGetEncrypted("t", "api_key", "wrong").isEmpty)

    val h = cat.health()
    assert(h("status") == "healthy" && h("collections") == "1")
  }
}

class IndexedSearchSpec extends SparkSpec {

  test("index-bounded searchDf equals operator-level exact KNN at full probe") {
    import graft.operators.{Knn, SearchParams}
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_idxeq").toString)
    def vec(seed: Int): Seq[Double] =
      (0 until 8).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, nlist = 8))
    cat.insert("t", "m", (0 until 90).map(i =>
      EmbeddedVector(s"k$i", s"chunk $i", "m", Map("i" -> s"$i"), vec(i))))
    cat.persistIndex("t", "m")

    // expected: exact Knn.search over the SAME stored rows and doc_ids
    import spark.implicits._
    val corpus = cat.load("t", "m")
      .select(col("flouds_vector_id"), col("chunk"), col("meta"), col("extra"),
        col("vector").as("dv"))
      .withColumn("doc_id", xxhash64(col("flouds_vector_id")))
    for (req <- Seq(
        SearchRequest("t", "m", vec(23), limit = 7, nprobe = 8),
        SearchRequest("t", "m", vec(23), limit = 7, nprobe = 8, offset = 3,
          scoreThreshold = Some(-0.5)),
        SearchRequest("t", "m", vec(23), limit = 7, nprobe = 8,
          metaFilter = Map("i" -> "2")))) {
      val params = SearchParams(req.metricType, req.limit, req.offset,
        req.scoreThreshold, req.roundDecimal, req.textFilter,
        req.minimumWordsMatch, req.includeStopWords,
        req.increaseLimitForTextSearch, req.metaFilter, req.metaRequired,
        None, req.extraFilter, Seq("chunk", "meta"))
      val expected = Knn.search(corpus, Seq((0L, req.vector)).toDF("qid", "qv"), params)
        .select("rank", "doc_id", "score", "chunk").collect().map(_.toSeq).toSeq
      val got = cat.searchDf(req)
        .select("rank", "doc_id", "score", "chunk").collect().map(_.toSeq).toSeq
      assert(got == expected, s"facade diverges from exact for $req")
      assert(got.nonEmpty)
    }
  }

  test("facade search routes through the persisted IVF index (nprobe cells)") {
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_idxsearch").toString)
    def vec(seed: Int): Seq[Double] =
      (0 until 8).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, nlist = 8))
    // 90 < 97 = the synthetic vector period, so all vectors are distinct
    cat.insert("t", "m", (0 until 90).map(i =>
      EmbeddedVector(s"k$i", s"chunk $i", "m", Map("i" -> s"$i"), vec(i))))
    cat.persistIndex("t", "m")

    // full-probe search = exact: self-match first
    val full = cat.search(SearchRequest("t", "m", vec(17), limit = 5, nprobe = 8))
    assert(full.success && full.data.head.content == "chunk 17")

    // narrow probe still finds the self-match (its own cell is ranked first)
    val narrow = cat.search(SearchRequest("t", "m", vec(17), limit = 5, nprobe = 4))
    assert(narrow.success && narrow.data.head.content == "chunk 17")
    // indexed search composes with partition targeting (probed cells ∩ part);
    // rows live in _default so a bogus partition finds nothing, _default all
    val inPart = cat.search(SearchRequest("t", "m", vec(17), limit = 5, nprobe = 8,
      partitionNames = Seq("_default")))
    assert(inPart.success && inPart.data.head.content == "chunk 17")
    val noPart = cat.search(SearchRequest("t", "m", vec(17), limit = 5, nprobe = 8,
      partitionNames = Seq("nope")))
    assert(!noPart.success)
    // and post-filters still apply on the probed subset
    val filt = cat.search(SearchRequest("t", "m", vec(17), limit = 5, nprobe = 8,
      metaFilter = Map("i" -> "17")))
    assert(filt.data.map(_.content) == Seq("chunk 17"))
  }
}

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed layout prunes to the looked-up keys' buckets") {
    val dir = Files.createTempDirectory("graft_layout").resolve("tbl").toString
    val df = (0L until 1000L).map(i => (i, s"v$i")).toDF("key", "v")
    graft.sources.Layout.writeBucketed(df, dir, "key", nBuckets = 16)

    val res = graft.sources.Layout.lookup(spark, dir, "key", Seq(7L, 423L), 16)
    assert(res.collect().map(r => r.getAs[Long]("key") -> r.getAs[String]("v")).toSet ==
      Set(7L -> "v7", 423L -> "v423"))

    // partition pruning visible in the plan
    val p = res.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(p).map(_.group(1))
    assert(pf.exists(_.contains("_bucket")), s"bucket pruning missing: $pf")
  }
}
