package graft

import graft.core.Tables
import graft.operators._
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  test("BM25 matches a hand-computed score on a tiny corpus") {
    // corpus: d0="a b a", d1="b c", d2="c c c c"; N=3, avgdl=3
    val docs = Seq((0L, "a b a"), (1L, "b c"), (2L, "c c c c")).toDF("doc_id", "text")
    val m = Bm25.fit(docs)
    val res = Bm25.searchTopK(m, Seq(0L -> "a"), 10).collect()
    // only d0 contains 'a': idf = ln(1 + (3-1+0.5)/(1+0.5)) = ln(8/3)
    // tf=2, dl=3, avgdl=3 => w = idf*2*2.5/(2+1.5*(0.25+0.75*1)) = idf*5/3.5
    val expected = math.log(1 + 2.5 / 1.5) * 5 / 3.5
    assert(res.length == 1)
    assert(res.head.getAs[Long]("doc_id") == 0L)
    assert(math.abs(res.head.getAs[Double]("score") - expected) < 1e-6)
  }

  test("candidate restriction limits WHICH docs score, never their scores") {
    // partition targeting must keep index-wide df/n/sumdl: a doc's BM25
    // score is a function of the corpus stats only, so restricting the
    // candidate set may drop rows but never change a surviving row's score
    // (deriving df from a restricted tf table would inflate rare-in-
    // partition terms).
    val docs = Seq((0L, "a b a"), (1L, "b c a"), (2L, "c c a c"), (3L, "a d"))
      .toDF("doc_id", "text")
    val m = Bm25.fit(docs)
    val q = Seq(0L -> "a c")
    val all = Bm25.searchTopK(m, q, 10).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    val keep = Seq(1L, 2L).toDF("doc_id")
    val restricted = Bm25.searchTopK(m, q, 10, Some(keep)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(restricted.keySet == Set(1L, 2L))
    restricted.foreach { case (id, s) => assert(s == all(id),
      s"doc $id score changed under candidate restriction: $s vs ${all(id)}") }
  }

  test("document sparse encoding drops low-weight postings with drop_ratio_build") {
    val docs = Tables.load(spark, Sf, "documents").limit(50)
    val m = Bm25.fit(docs)
    val full = Bm25.encodeDocuments(m, 0.0)
      .select(explode(map_values(col("sparse_vector")))).count()
    val dropped = Bm25.encodeDocuments(m, 0.5)
      .select(explode(map_values(col("sparse_vector")))).count()
    assert(dropped < full && dropped > 0)
  }
}

class HybridSpec extends SparkSpec {

  test("RRF score equals 1/(60+rd) + 1/(60+rs) and sparse-only hits survive dense threshold") {
    val corpus = Tables.docsCorpus(spark, Sf).select(col("doc_id"), col("qv").as("dv"))
    val queries = Tables.docsCorpus(spark, Sf).filter(col("doc_id") === 0)
      .select(col("doc_id").as("qid"), col("qv"))
    val m = Bm25.fit(Tables.load(spark, Sf, "documents"))
    val res = Hybrid.search(corpus, queries, m, Seq(0L -> "spark join window"),
      SearchParams(limit = 10, scoreThreshold = Some(0.99))) // kills all dense hits except self
    val rows = res.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rrf = r.getAs[Double]("rrf_score")
      assert(rrf > 0 && rrf <= 2.0 / 61)
    }
    // with threshold 0.99 only the self-match survives on the dense side;
    // sparse-only docs must still be present
    val sparseOnly = rows.count(r => r.isNullAt(r.fieldIndex("dense_score")))
    assert(sparseOnly > 0, "sparse-only hits must survive the dense threshold")
  }

  test("bulk searchDf is row-identical to the Seq path and keeps query text out of the driver plan") {
    import spark.implicits._
    val corpus = Tables.docsCorpus(spark, Sf).select(col("doc_id"), col("qv").as("dv"))
    val docs = Tables.load(spark, Sf, "documents")
    val m = Bm25.fit(docs)
    // the query text derives from the distributed source (NOT a driver
    // toDF) so the plan-shape assert below sees only the bulk path's own
    // driver artifacts
    val queriesDf = Tables.docsCorpus(spark, Sf).filter(col("doc_id") < 3)
      .select(col("doc_id").as("qid"), col("qv"),
        concat(lit("spark data merge doc"), col("doc_id")).as("text"))
    val texts = queriesDf.select("qid", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val p = SearchParams(limit = 10, scoreThreshold = Some(0.2))

    def dump(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("qid", "rank").collect().map(_.toString).toSeq
    val seqRes  = Hybrid.search(corpus, queriesDf.select("qid", "qv"), m, texts, p)
    val bulkRes = Hybrid.searchDf(corpus, queriesDf, m, p)
    assert(dump(seqRes) == dump(bulkRes), "bulk hybrid diverges from Seq path")

    // bulk shape: the sparse leg's query analysis must run inside the plan
    // (a distributed project over the queries source), never as a
    // driver-materialized local relation of (qid, term) rows
    val sparkPlan = bulkRes.queryExecution.executedPlan.toString
    assert(!sparkPlan.contains("LocalTableScan"),
      s"driver-side local relation in bulk hybrid plan:\n$sparkPlan")
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val dupDocs = Seq(
    (0L, "spark join window merge data table scan filter", "en"),
    (1L, "spark join window merge data table scan filter", "en"), // exact dup of 0
    (2L, "completely different tokens here about streams and state", "en"))
    .toDF("doc_id", "text", "lang")

  test("exact dedup groups identical texts and keeps the min id") {
    val g = Dedup.exact(dupDocs).collect()
    assert(g.length == 2)
    val dupGroup = g.find(_.getAs[Long]("n_rows") == 2).get
    assert(dupGroup.getAs[Long]("keep_id") == 0L)
  }

  test("identical docs share minhash signature and simhash; jaccard = 1") {
    val sig = Dedup.minhashSignatures(dupDocs).collect()
      .map(r => r.getAs[Long]("doc_id") -> (0 until 8).map(j => r.getAs[Long](s"h$j")))
      .toMap
    assert(sig(0L) == sig(1L))
    assert(sig(0L) != sig(2L))
    val sh = Dedup.simhash(dupDocs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sh(0L) == sh(1L))
    val j = Dedup.jaccardPairs(dupDocs, "lang", 0.99).collect()
    assert(j.length == 1 && j.head.getAs[Double]("jaccard") == 1.0)
  }

  test("LSH candidate pairs find the exact dup with est_sim 1.0") {
    val pairs = Dedup.lshCandidatePairs(Dedup.minhashSignatures(dupDocs)).collect()
    assert(pairs.exists(r => r.getAs[Long]("doc_a") == 0L &&
      r.getAs[Long]("doc_b") == 1L && r.getAs[Double]("est_sim") == 1.0))
  }

  test("chunkDocs emits hand-computed sliding windows incl. the short tail") {
    val docs = Seq((0L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocs(docs, size = 4, overlap = 2).collect()
      .map(r => r.getAs[Long]("chunk_id") ->
        (r.getAs[String]("chunk_text"), r.getAs[Long]("n_tokens"))).toMap
    assert(got == Map(
      0L -> ("t1 t2 t3 t4", 4L), 1L -> ("t3 t4 t5 t6", 4L),
      2L -> ("t5 t6 t7 t8", 4L), 3L -> ("t7 t8 t9 t10", 4L),
      4L -> ("t9 t10", 2L)), s"got $got")
  }

  test("components propagate across a chain; dropNearDuplicates keeps one per cluster") {
    // chain 1-2-3 (1-3 never directly paired) + isolated pair 7-9: label
    // propagation must converge to the transitive closure's roots
    val pairs = Seq((2L, 1L), (2L, 3L), (9L, 7L)).toDF("doc_a", "doc_b")
    val comp = Dedup.components(pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("root")).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
    val docs = Seq(1L, 2L, 3L, 5L, 7L, 9L).toDF("doc_id")
    val kept = Dedup.dropNearDuplicates(docs, pairs).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(kept == Seq(1L, 5L, 7L), s"got $kept") // 5 untouched, reps 1 and 7
  }

  test("components refuse to return non-converged labels (diameter > maxIter)") {
    val chain = (0L until 7L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalArgumentException] {
      Dedup.components(chain, maxIter = 3).collect()
    }
    assert(e.getMessage.contains("converge"))
    val ok = Dedup.components(chain).collect() // default maxIter suffices
      .map(r => r.getAs[Long]("root")).toSet
    assert(ok == Set(0L), "whole chain must share root 0")
  }
}

class IvfSpec extends SparkSpec {

  test("IVF probe recall@10 >= 0.8 vs exact KNN at nprobe=8/nlist=16") {
    val corpus = Tables.ordersCorpus(spark, Sf).select("doc_id", "dv")
    val queries = Tables.queryBatch(spark, 8)
    val exact = Knn.search(Tables.ordersCorpus(spark, Sf), queries,
      SearchParams(limit = 10, outputFields = Nil))
    val idx = Ivf.build(corpus, nlist = 16)
    val approx = Ivf.probe(idx, queries, nprobe = 8, k = 10)
    val recall = Ivf.recallVsExact(approx, exact)
    assert(recall >= 0.8, s"recall $recall")
  }

  test("nprobe=nlist degenerates to exact search (recall 1.0)") {
    val corpus = Tables.ordersCorpus(spark, Sf).select("doc_id", "dv")
    val queries = Tables.queryBatch(spark, 4)
    val exact = Knn.search(Tables.ordersCorpus(spark, Sf), queries,
      SearchParams(limit = 10, outputFields = Nil))
    val idx = Ivf.build(corpus, nlist = 8)
    val approx = Ivf.probe(idx, queries, nprobe = 8, k = 10)
    assert(Ivf.recallVsExact(approx, exact) == 1.0)
  }
}

class AnnLshSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("LSH ANN: self-match survives bucketing; recall vs exact is reasonable") {
    val c = graft.core.Tables.docsCorpus(spark, Sf)
    val corpus = c.select(col("doc_id"), col("qv"))
    val queries = c.filter(col("doc_id") < 8).select(col("doc_id").as("qid"), col("qv"))
    val approx = AnnLsh.search(corpus, queries, k = 10, nTables = 8, nPlanes = Some(5))
    val top1 = approx.filter(col("rank") === 1).collect()
    top1.foreach(r => assert(r.getAs[Long]("qid") == r.getAs[Long]("doc_id"),
      "self must be its own nearest neighbour within its bucket"))
    val exact = Knn.search(corpus.select(col("doc_id"), col("qv").as("dv")), queries,
      SearchParams(limit = 10, outputFields = Nil))
    val recall = Ivf.recallVsExact(approx, exact)
    assert(recall >= 0.35, s"4x6-plane LSH recall@10 too low: $recall")
  }

  test("auto plane count: floor 6 small, ceil(log2(n/64)) large; default = explicit") {
    // the formula itself (the scale contract: expected bucket size ~64)
    assert(AnnLsh.autoPlanes(100) == 6)       // floor
    assert(AnnLsh.autoPlanes(64L * 64) == 6)  // 64 buckets of 64 — at the floor
    assert(AnnLsh.autoPlanes(5000) == 7)      // 5000/64 = 78 -> 2^7 = 128 >= 78
    assert(AnnLsh.autoPlanes(1000000) == 14)  // 1e6/64 = 15625 -> 2^14
    // a corpus big enough that auto > floor: the default must equal the
    // explicit Some(autoPlanes(n)) run row-for-row
    val corpus = graft.core.Tables.queryBatch(spark, 5000, 16)
      .select(col("qid").as("doc_id"), col("qv"))
    val queries = graft.core.Tables.queryBatch(spark, 4, 16)
    val auto = AnnLsh.search(corpus, queries, k = 5, dim = 16)
    val explicitP = AnnLsh.search(corpus, queries, k = 5,
      nPlanes = Some(AnnLsh.autoPlanes(5000)), dim = 16)
    assert(AnnLsh.autoPlanes(5000) > AnnLsh.MinPlanes)
    assert(auto.exceptAll(explicitP).isEmpty && explicitP.exceptAll(auto).isEmpty,
      "default (auto) bucketing must equal the explicit effective plane count")
    // corpusCount hint: same rows, no count job needed by the caller
    val hinted = AnnLsh.search(corpus, queries, k = 5, dim = 16,
      corpusCount = Some(5000L))
    assert(hinted.exceptAll(auto).isEmpty && auto.exceptAll(hinted).isEmpty)
  }

  test("parquetRowCount: footer metadata equals a full count() at every table") {
    Seq("embeddings", "documents", "orders").foreach { t =>
      val p = s"$Sf/$t.parquet"
      assert(graft.core.Tables.parquetRowCount(spark, p) == spark.read.parquet(p).count(),
        s"footer row count must be exact for $t")
    }
  }
}

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("merge replaces matched keys and appends new ones") {
    val cur = Seq((1L, "a"), (2L, "b")).toDF("key", "v")
    val batch = Seq((2L, "B"), (3L, "c")).toDF("key", "v")
    val out = Upsert.merge(cur, batch, "key").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "B", 3L -> "c"))
  }

  test("duplicate keys in a batch are rejected (insert_request.py:89-104 parity)") {
    val cur = Seq((1L, "a")).toDF("key", "v")
    val bad = Seq((2L, "x"), (2L, "y")).toDF("key", "v")
    assertThrows[IllegalArgumentException](Upsert.validateBatch(bad, "key"))
    assert(Upsert.batchDuplicates(bad, "key").count() == 1)
    Upsert.validateBatch(Seq((2L, "x")).toDF("key", "v"), "key") // ok
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("fingerprint is order-sensitive; quality in [0,1]; langId deterministic") {
    val docs = Seq((0L, "alpha beta gamma"), (1L, "gamma beta alpha"))
      .toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) != fp(1L), "permuted docs must fingerprint differently")

    val q = TextAnalysis.quality(Tables.load(spark, Sf, "documents")).collect()
    q.foreach { r =>
      val v = r.getAs[Double]("quality")
      assert(v >= 0.0 && v <= 1.0)
    }

    val l1 = TextAnalysis.langId(Tables.load(spark, Sf, "documents")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    val l2 = TextAnalysis.langId(Tables.load(spark, Sf, "documents")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    assert(l1 == l2)
  }

  test("langId identifies real sentences in each profiled language") {
    val samples = Seq(
      0L -> ("en", "the quick brown fox jumped over the lazy dog and it was fast"),
      1L -> ("de", "der schnelle braune fuchs sprang und die hunde waren nicht schnell mit ihm"),
      2L -> ("fr", "le renard brun saute dans le jardin pour chasser les poules avec une ruse"),
      3L -> ("es", "el zorro salta por el jardin pero los perros duermen entre las flores"),
      4L -> ("it", "il gatto dorme che non vuole giocare per ore con il cane della casa"))
    val docs = samples.map { case (id, (_, t)) => (id, t) }.toDF("doc_id", "text")
    val pred = TextAnalysis.langId(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    samples.foreach { case (id, (want, _)) =>
      assert(pred(id) == want, s"doc $id: predicted ${pred(id)}, want $want")
    }
  }
}

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("salted join and salted count match their unsalted equivalents") {
    // heavily skewed: 90% of rows share key 1
    val big = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i.toLong))
      .toDF("k", "id")
    val small = Seq((1L, "hot"), (950L, "cold")).toDF("k", "v")

    val plain  = big.join(small, "k").collect().map(_.toSeq).toSet
    val salted = Salting.saltedJoin(big, small, "k", "id").collect().map(_.toSeq).toSet
    assert(salted == plain && plain.nonEmpty)

    val counts = Salting.saltedCount(big, "k", "id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(1L) == 900L && counts.size == 101)
  }
}

class Bm25IncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("mergeStats(fit(a), b) equals fit(a ++ b); removeDocs inverts") {
    val a = Seq((0L, "alpha beta"), (1L, "beta gamma gamma")).toDF("doc_id", "text")
    val b = Seq((2L, "alpha alpha delta")).toDF("doc_id", "text")
    val full = Bm25.fit(a.unionByName(b))
    val inc  = Bm25.mergeStats(Bm25.fit(a), b)
    def posts(m: Bm25.Model) = Bm25.postings(m)
      .select("doc_id", "term", "wScaled").collect().map(_.toSeq).toSet
    assert(posts(full) == posts(inc))

    val removed = Bm25.removeDocs(inc, Seq(Tuple1(2L)).toDF("doc_id"))
    assert(posts(removed) == posts(Bm25.fit(a)))
  }
}
