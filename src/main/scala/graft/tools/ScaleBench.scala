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
    // The dedup pair only runs at factor ≤ 10: the replicated corpus keeps
    // the TEXT of each copy identical (only keys perturbed), so duplicate
    // density — and with it LSH candidate-pair volume — grows with the
    // factor itself. At 100× a "slope" for b7/b7c would measure that
    // quadratic dup-density blowup by construction, not corpus scaling;
    // the 10× point already isolates the index-vs-recompute gap.
    val withDedup = factor <= 10
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

    // ---- untimed prep at BOTH scales (persisted serving state) ----
    def prep(sfDir: String, tag: String): (Ivf.Index, String, Hnsw.Graph, String) = {
      val corpus = Tables.ordersCorpus(spark, sfDir).select("doc_id", "dv")
      val ivfDir = s"$out/prep_$tag/ivf"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(ivfDir))) {
        val idx = Ivf.build(corpus, nlist = 256, maxIter = 5)
        idx.clustered.repartition(col("centroid_id"))
          .write.mode("overwrite").partitionBy("centroid_id")
          .parquet(s"$ivfDir/clustered")
        idx.centroids.write.mode("overwrite").parquet(s"$ivfDir/centroids")
      }
      val ivf = Ivf.Index(
        spark.read.parquet(s"$ivfDir/centroids"),
        spark.read.parquet(s"$ivfDir/clustered"), "COSINE")
      val bmDir = s"$out/prep_$tag/bm25"
      if (!graft.sources.SparseIndex.exists(bmDir))
        graft.sources.SparseIndex.write(
          Bm25.fit(Tables.load(spark, sfDir, "documents")), bmDir, nBuckets = 16)
      val hnswDir = s"$out/prep_$tag/hnsw"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$hnswDir/nodes"))) {
        val g = Hnsw.build(Tables.docsCorpus(spark, sfDir)
          .select(col("doc_id"), col("qv").as("dv")), m = 8)
        g.nodes.write.mode("overwrite").parquet(s"$hnswDir/nodes")
        g.edges.write.mode("overwrite").parquet(s"$hnswDir/edges")
        g.entries.write.mode("overwrite").parquet(s"$hnswDir/entries")
      }
      val g = Hnsw.Graph(
        spark.read.parquet(s"$hnswDir/nodes"),
        spark.read.parquet(s"$hnswDir/edges"),
        spark.read.parquet(s"$hnswDir/entries"), "COSINE")
      val ddDir = s"$out/prep_$tag/dedupidx"
      if (withDedup && !graft.sources.DedupIndex.exists(ddDir))
        graft.sources.DedupIndex.build(
          Tables.load(spark, sfDir, "documents").select("doc_id", "text")
            .filter(col("doc_id") % 5 =!= 0), ddDir, nBuckets = 16)
      (ivf, bmDir, g, ddDir)
    }

    val q64 = Tables.queryBatch(spark, 64)
    // FIXED 512-doc increment for the dedup pair, same at both scales
    // (from the base table, so the query side is scale-invariant; its ids
    // are disjoint-enough from either corpus split)
    val dedupIncrement = Tables.load(spark, src, "documents")
      .select("doc_id", "text")
      .filter(col("doc_id") % 5 === 0 && col("doc_id") < 2560)
    def headliners(sfDir: String, tag: String): Seq[(String, () => DataFrame)] = {
      val (ivf, bmDir, g, ddDir) = prep(sfDir, tag)
      Seq(
        "b1_knn_cos_64q" -> (() => Knn.search(Tables.ordersCorpus(spark, sfDir),
          q64, SearchParams(limit = 10, outputFields = Nil))),
        "b5b_ivf_probe_persisted" -> (() =>
          Ivf.probePersisted(ivf, q64, nprobe = 16, k = 10)),
        "b14_hnsw_search" -> (() => {
          val queries = Tables.docsCorpus(spark, sfDir).filter(col("doc_id") < 8)
            .select(col("doc_id").as("qid"), col("qv"))
          Hnsw.search(g, queries, k = 10, ef = 64)
        }),
        "b3b_bm25_persisted" -> (() => Bm25.searchTopK(
          graft.sources.SparseIndex.read(spark, bmDir),
          (0L until 8L).map(_ -> "spark join window merge data"), 10)),
        // dedup pair: the full recompute scales with the corpus, the index
        // query only with the (fixed) increment + candidate volume — the
        // slope GAP is what the persisted index buys. NB the replicated
        // corpus is 10 textual near-copies per base doc (keys perturbed,
        // text not), so incremental candidates grow with the duplicate
        // density itself — a worst case for any LSH index.
        "b7_dedup_full_recompute" -> (() => Dedup.lshCandidatePairs(
          Dedup.minhashSignatures(Tables.load(spark, sfDir, "documents")))),
        "b7c_dedup_incr_query" -> (() => graft.sources.DedupIndex.queryBatch(
          spark, ddDir, dedupIncrement, nBuckets = 16)),
      ).filter { case (name, _) => withDedup || !name.startsWith("b7") }
    }

    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    def time(fn: () => DataFrame): Double = {
      val ts = (1 to iters).map { _ =>
        spark.catalog.clearCache(); System.gc(); Thread.sleep(1000)
        val t0 = System.nanoTime()
        fn().count()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(s"[scale] iters: ${ts.map(t => f"$t%.2f").mkString(", ")}")
      ts.min
    }

    val base   = headliners(src, "sf01").toMap
    val scaled = headliners(out, s"sfx$factor").toMap
    val rows = base.keys.toSeq.sorted.map { name =>
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
