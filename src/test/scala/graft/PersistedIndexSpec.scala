package graft

import graft.api._
import graft.operators.Bm25
import graft.sources.{SparseIndex, VectorStoreCatalog}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

/** Round-2 scale invariants for the facade hot paths (VERDICT items 1/5):
  *  - hybrid search scores from the PERSISTED BM25 tables — its plan contains
  *    no corpus tokenization (the reference always searches through its built
  *    index, base_milvus.py:1286-1310);
  *  - insert rewrites ONLY the buckets the batch's keys hash to — untouched
  *    bucket files are byte-identical across the commit;
  *  - the incremental SparseIndex.upsert equals a from-scratch refit.
  */
class PersistedIndexSpec extends SparkSpec {

  private def vec(seed: Int, dim: Int = 8): Seq[Double] =
    (0 until dim).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)

  /** relative path -> md5 of every file under `root` (ignoring _SUCCESS). */
  private def snapshot(root: Path): Map[String, String] = {
    if (!Files.exists(root)) return Map.empty
    Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p) && !p.getFileName.toString.startsWith("_SUCCESS"))
      .map { p =>
        val md = MessageDigest.getInstance("MD5").digest(Files.readAllBytes(p))
        root.relativize(p).toString -> md.map("%02x".format(_)).mkString
      }.toMap
  }

  test("hybrid facade search plan has no corpus tokenize/aggregate (persisted postings)") {
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_persisted").toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8))
    cat.insert("t", "m", (0 until 30).map(i =>
      EmbeddedVector(s"k$i", s"alpha beta gamma doc$i data", "m", Map(), vec(i))))
    assert(cat.sparseIndexExists("t", "m"), "insert must build the sparse index")

    val df = cat.searchDf(SearchRequest("t", "m", vec(3), limit = 5,
      hybridSearch = true, textFilter = Some("alpha data")))
    // Corpus tokenization would appear as a Generate/explode over the chunk
    // column; the persisted path only joins stored tf/doclen/termdf/global.
    val plan = df.queryExecution.optimizedPlan.toString()
    assert(!plan.contains("Generate"), s"corpus tokenization in hybrid plan:\n$plan")
    assert(!plan.toLowerCase.contains("explode"), "explode in hybrid plan")

    // and it still answers correctly (self-match first via dense leg)
    val resp = cat.search(SearchRequest("t", "m", vec(3), limit = 5,
      hybridSearch = true, textFilter = Some("alpha data")))
    assert(resp.success && resp.data.head.content == "alpha beta gamma doc3 data")
  }

  test("insert rewrites only the touched buckets (data + sparse index)") {
    val base = Files.createTempDirectory("graft_buckets")
    val cat = new VectorStoreCatalog(spark, base.toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8))
    // 40 rows spread across the 16 buckets; < AutoFlushMinBatch so no
    // compaction pass rewrites untouched buckets behind our back.
    cat.insert("t", "m", (0 until 40).map(i =>
      EmbeddedVector(s"k$i", s"common words plus doc$i", "m", Map(), vec(i))))

    val tableDir = base.resolve(cat.dbName("t")).resolve(cat.tableName("t", "m"))
    val before = snapshot(tableDir)

    // one-row upsert: exactly one data bucket (xxhash64 of the key) and one
    // sparse bucket (pmod of the doc_id hash) may change
    cat.insert("t", "m",
      Seq(EmbeddedVector("k7", "replaced text entirely", "m", Map(), vec(7))))
    val after = snapshot(tableDir)

    val dataBucket = spark.range(1)
      .select(pmod(xxhash64(lit("k7")), lit(16L))).head().getLong(0)
    val sparseBucket = spark.range(1)
      .select(pmod(xxhash64(lit("k7")), lit(16L))).head().getLong(0)

    val changed = (before.keySet ++ after.keySet)
      .filter(p => before.get(p) != after.get(p))
    // every changed file must live in the touched data bucket, the touched
    // sparse tf/doclen bucket, or the small termdf/global dictionary tables
    val allowed = changed.forall { p =>
      p.contains(s"_bucket=$dataBucket") ||
        p.startsWith("index/bm25/termdf") || p.startsWith("index/bm25/global")
    }
    assert(allowed, s"files outside touched buckets changed:\n" +
      changed.filterNot(p => p.contains(s"_bucket=$dataBucket") ||
        p.startsWith("index/bm25/termdf") || p.startsWith("index/bm25/global"))
        .mkString("\n"))
    // untouched buckets byte-identical: at least one other bucket existed
    val untouchedData = before.keySet.filter(p =>
      p.startsWith("data/") && !p.contains(s"_bucket=$dataBucket"))
    assert(untouchedData.nonEmpty)
    assert(untouchedData.forall(p => after.get(p) == before.get(p)),
      "untouched data bucket files were rewritten")
    val untouchedSparse = before.keySet.filter(p =>
      (p.startsWith("index/bm25/tf/") || p.startsWith("index/bm25/doclen/")) &&
        !p.contains(s"_bucket=$sparseBucket"))
    assert(untouchedSparse.nonEmpty)
    assert(untouchedSparse.forall(p => after.get(p) == before.get(p)),
      "untouched sparse bucket files were rewritten")

    // readback correctness after the partial rewrite
    val got = cat.load("t", "m").filter(col("flouds_vector_id") === "k7")
      .select("chunk").head().getString(0)
    assert(got == "replaced text entirely")
    assert(cat.load("t", "m").count() == 40)
  }

  test("auto-flush compacts only fragmented buckets; clean flush is a no-op") {
    val base = Files.createTempDirectory("graft_flush")
    val cat = new VectorStoreCatalog(spark, base.toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8))
    // 120 rows >= AutoFlushMinBatch -> insert runs flush once at the end
    cat.insert("t", "m", (0 until 120).map(i =>
      EmbeddedVector(s"k$i", s"words doc$i", "m", Map(), vec(i))))
    val tableDir = base.resolve(cat.dbName("t")).resolve(cat.tableName("t", "m"))
    assert(cat.load("t", "m").count() == 120)

    // bucket dirs are compact by construction (one file per bucket dir)
    val bucketDirs = Files.walk(tableDir.resolve("data")).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("_bucket="))
      .toSeq
    assert(bucketDirs.nonEmpty)
    bucketDirs.foreach { b =>
      val n = Files.list(b).iterator().asScala
        .count(_.getFileName.toString.endsWith(".parquet"))
      assert(n <= cat.FlushMaxFilesPerBucket, s"$b fragmented: $n files")
    }

    // flush on a compact table rewrites nothing
    val before = snapshot(tableDir.resolve("data"))
    cat.flush("t", "m")
    assert(snapshot(tableDir.resolve("data")) == before, "clean flush rewrote files")
  }

  test("flush converges on multi-partition collections (per (part,bucket) counting)") {
    val base = Files.createTempDirectory("graft_flush_mp")
    val cat = new VectorStoreCatalog(spark, base.toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8))
    // one small batch per partition: every (part,bucket) dir holds exactly one
    // file, but each bucket's files SUMMED across the 6 partitions exceed
    // FlushMaxFilesPerBucket — counting the sum would rewrite every flush
    for (p <- 0 until 6)
      cat.insert("t", "m", (0 until 20).map(i =>
        EmbeddedVector(s"p${p}_k$i", s"doc $i", "m", Map(), vec(p * 100 + i))),
        partition = Some(s"p$p"))
    val tableDir = base.resolve(cat.dbName("t")).resolve(cat.tableName("t", "m"))
    val before = snapshot(tableDir.resolve("data"))
    cat.flush("t", "m")
    assert(snapshot(tableDir.resolve("data")) == before,
      "flush rewrote a compact multi-partition table")
    assert(cat.load("t", "m").count() == 120)
  }

  test("upsert rewrites its clustered cells: no stale vectors, no duplicate doc_ids") {
    import graft.operators.Ivf
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_stale").toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, nlist = 4))
    cat.insert("t", "m", (0 until 60).map(i =>
      EmbeddedVector(s"k$i", s"chunk $i", "m", Map(), vec(i))))
    cat.persistIndex("t", "m")

    // replace k7 with a DIFFERENT vector (vec(300) lands far from vec(7))
    cat.insert("t", "m",
      Seq(EmbeddedVector("k7", "moved", "m", Map(), vec(300))))

    // the clustered table holds exactly one row per doc, none stale
    val idx = cat.loadIndex("t", "m")
    val k7 = spark.range(1).select(xxhash64(lit("k7"))).head().getLong(0)
    val rows = idx.clustered.filter(col("doc_id") === k7).collect()
    assert(rows.length == 1, s"expected 1 clustered row for k7, got ${rows.length}")
    assert(rows.head.getSeq[Double](rows.head.fieldIndex("dv")) ==
      vec(300), "clustered row still carries the replaced vector")
    assert(idx.clustered.count() == 60)

    // a DIRECT probe over the persisted table (the b5b serving path) sees the
    // new vector: searching with vec(300) ranks k7 first, once
    import spark.implicits._
    val q = Seq((0L, vec(300))).toDF("qid", "qv")
    val hits = Ivf.probePersisted(idx, q, nprobe = 4, k = 5).collect()
    assert(hits.count(_.getAs[Long]("doc_id") == k7) == 1)
    assert(hits.minBy(_.getAs[Long]("rank")).getAs[Long]("doc_id") == k7)
  }

  test("incremental SparseIndex.upsert equals a from-scratch refit") {
    import spark.implicits._
    val docsA = (0L until 50L).map(i => (i, s"alpha beta doc$i common")).toDF("doc_id", "text")
    // replaces 0,10,20,30,40 and adds 50..54
    val batch = (0L until 5L).map(i => (i * 10, s"replaced gamma doc${i * 10}"))
      .++((50L until 55L).map(i => (i, s"fresh delta doc$i")))
      .toDF("doc_id", "text")
    val merged = docsA.join(batch, Seq("doc_id"), "left_anti").unionByName(batch)

    val dir = Files.createTempDirectory("graft_incr").toString
    SparseIndex.write(Bm25.fit(docsA), dir, nBuckets = 4)
    SparseIndex.upsert(spark, dir, batch, nBuckets = 4)
    val m = SparseIndex.read(spark, dir)
    val ref = Bm25.fit(merged)

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(canon(m.tf) == canon(ref.tf))
    assert(canon(m.docLen) == canon(ref.docLen))
    assert(canon(m.termDf) == canon(ref.termDf))
    assert(canon(m.global) == canon(ref.global))

    // and the scored surface agrees
    val q = Seq(0L -> "gamma delta common")
    assert(canon(Bm25.searchTopK(m, q, 10)) == canon(Bm25.searchTopK(ref, q, 10)))
  }
}
