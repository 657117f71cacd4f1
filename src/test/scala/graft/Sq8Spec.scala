package graft

import graft.api._
import graft.core.Tables
import graft.operators.{Ivf, Knn, SearchParams}
import graft.sources.VectorStoreCatalog
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** IVF_SQ8 (VERDICT item 6): scalar-quantized index storage must actually
  * change the build, round-trip through the catalog, keep inserted rows
  * searchable, and lose at most a little recall vs the flat index.
  */
class Sq8Spec extends SparkSpec {

  test("SQ8 probe recall is within epsilon of flat-IVF recall") {
    val corpus  = Tables.ordersCorpus(spark, Sf).select("doc_id", "dv")
    val queries = Tables.queryBatch(spark, 8)
    val exact = Knn.search(corpus, queries,
      SearchParams(metric = "COSINE", limit = 10, outputFields = Nil))

    val flat = Ivf.build(corpus, nlist = 8, metric = "COSINE")
    val sq   = Ivf.quantizeIndex(flat)
    val rFlat = Ivf.recallVsExact(Ivf.probe(flat, queries, nprobe = 4, k = 10), exact)
    val rSq8  = Ivf.recallVsExact(Ivf.probeSq8(sq, queries, nprobe = 4, k = 10), exact)
    assert(rSq8 >= rFlat - 0.1, s"SQ8 recall $rSq8 too far below flat $rFlat")
    assert(rSq8 >= 0.5, s"SQ8 recall $rSq8 unreasonably low")
  }

  test("codes are byte-range and decode reconstructs within one quantization step") {
    val corpus = Tables.ordersCorpus(spark, Sf).select("doc_id", "dv").limit(200)
    val sq = Ivf.buildSq8(corpus, nlist = 4, metric = "COSINE")
    val codes = sq.clustered.select(explode(col("codes"))).collect().map(_.getInt(0))
    assert(codes.forall(c => c >= 0 && c <= 255))
    // max |x - decode(encode(x))| <= scale/2 (+ rounding slack) per dim
    val dec = Ivf.decodeSq8(sq).clustered
      .join(corpus.withColumnRenamed("dv", "orig"), "doc_id")
      .select(aggregate(zip_with(col("dv"), col("orig"), (a, b) => abs(a - b)),
        lit(0.0), (acc, x) => greatest(acc, x)).as("maxerr"))
      .agg(max("maxerr")).head().getDouble(0)
    val maxScale = sq.scales.max
    assert(dec <= maxScale * 0.5 + 1e-9, s"decode error $dec > half-step ${maxScale * 0.5}")
  }

  test("PQ probe recall is reasonable and codes are mSub small ints") {
    val corpus  = Tables.ordersCorpus(spark, Sf).select("doc_id", "dv")
    val queries = Tables.queryBatch(spark, 8)
    val exact = Knn.search(corpus, queries,
      SearchParams(metric = "COSINE", limit = 10, outputFields = Nil))

    val flat = Ivf.build(corpus, nlist = 8, metric = "COSINE")
    val pq = Ivf.quantizePq(flat, mSub = 8, ksub = 64)
    assert(pq.mSub == 8 && pq.dsub == 8)
    val codes = pq.clustered.select(explode(col("pqcodes"))).collect().map(_.getInt(0))
    assert(codes.forall(c => c >= 0 && c < 64))

    // 8-byte codes for 64-dim vectors: recall floor is loose by design
    val rPq = Ivf.recallVsExact(Ivf.probePq(pq, queries, nprobe = 8, k = 10), exact)
    assert(rPq >= 0.4, s"PQ recall $rPq unreasonably low")

    // decode reconstructs each subvector to its codebook center exactly
    val dec = Ivf.decodePq(pq).clustered.select(size(col("dv"))).head().getInt(0)
    assert(dec == 64)

    // ADC scoring == decode-then-dot scoring: at k = |corpus| every probed
    // (qid, doc_id) is scored by both paths — same candidate sets, scores
    // equal to FP-regrouping tolerance (mSub table reads vs a dim-loop)
    val n = corpus.count().toInt
    def scoreMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("doc_id")) ->
        r.getAs[Double]("score")).toMap
    val viaDecode = scoreMap(Ivf.probePq(pq, queries, nprobe = 8, k = n))
    val viaAdc    = scoreMap(Ivf.probePqAdc(pq, queries, nprobe = 8, k = n))
    assert(viaAdc.keySet == viaDecode.keySet, "ADC candidate set diverged")
    viaAdc.foreach { case (key, s) =>
      assert(math.abs(s - viaDecode(key)) < 1e-9, s"$key: $s vs ${viaDecode(key)}")
    }
  }

  test("index_type=IVF_PQ round-trips through the catalog; inserts stay searchable") {
    val base = Files.createTempDirectory("graft_pq")
    val cat = new VectorStoreCatalog(spark, base.toString)
    def vec(seed: Int): Seq[Double] =
      (0 until 8).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, nlist = 4,
      indexType = "IVF_PQ"))
    cat.insert("t", "m", (0 until 90).map(i =>
      EmbeddedVector(s"k$i", s"chunk $i", "m", Map(), vec(i))))
    cat.persistIndex("t", "m")

    // index tables live under the CURRENT generation root (r14 pointer)
    val idxRoot = cat.denseRoot("t", "m")
    val stored = spark.read.parquet(idxRoot.resolve("clustered").toString)
    assert(stored.columns.contains("pqcodes") && !stored.columns.contains("dv"))
    assert(java.nio.file.Files.exists(idxRoot.resolve("pq")))

    // search routes through the decoded PQ index; full probe still finds all
    val hit = cat.search(SearchRequest("t", "m", vec(17), limit = 5, nprobe = 4))
    assert(hit.success && hit.data.head.content == "chunk 17")

    // post-build insert is PQ-encoded + appended and searchable
    cat.insert("t", "m", Seq(
      EmbeddedVector("new1", "fresh chunk", "m", Map(), vec(95))))
    val fresh = cat.search(SearchRequest("t", "m", vec(95), limit = 3, nprobe = 4))
    assert(fresh.success && fresh.data.head.content == "fresh chunk")
  }

  test("index_type=IVF_SQ8 changes the persisted build; inserts stay searchable") {
    val base = Files.createTempDirectory("graft_sq8")
    val cat = new VectorStoreCatalog(spark, base.toString)
    def vec(seed: Int): Seq[Double] =
      (0 until 8).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, nlist = 4,
      indexType = "IVF_SQ8"))
    cat.insert("t", "m", (0 until 90).map(i =>
      EmbeddedVector(s"k$i", s"chunk $i", "m", Map(), vec(i))))
    cat.persistIndex("t", "m")
    assert(cat.properties("t", "m")("index_type") == "IVF_SQ8")

    // the stored clustered table (under the current generation root) holds
    // codes, not raw vectors
    val stored = spark.read.parquet(
      cat.denseRoot("t", "m").resolve("clustered").toString)
    assert(stored.columns.contains("codes") && !stored.columns.contains("dv"))

    // search routes through the decoded index and still self-matches
    val hit = cat.search(SearchRequest("t", "m", vec(17), limit = 5, nprobe = 4))
    assert(hit.success && hit.data.head.content == "chunk 17")

    // a post-build insert is absorbed (encoded + appended) and searchable
    cat.insert("t", "m", Seq(
      EmbeddedVector("new1", "fresh chunk", "m", Map(), vec(95))))
    val fresh = cat.search(SearchRequest("t", "m", vec(95), limit = 3, nprobe = 4))
    assert(fresh.success && fresh.data.head.content == "fresh chunk")
  }
}
