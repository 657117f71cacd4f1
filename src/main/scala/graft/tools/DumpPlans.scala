package graft.tools

import graft.core.Tables
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Writes `.explain("formatted")` output for the bench/declared query shapes
  * to files under a target directory (plans/r17/<name>_<tag>.txt) — the
  * optimization-round artifact the judge diffs against plan claims.
  *
  * Usage: runMain graft.tools.DumpPlans <outDir> <tag> [name,name,...]
  * Data: sf0.01 (plan SHAPE is sf-independent; the bench's sf0.1 fixtures
  * would add minutes of untimed prep for identical plan trees).
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r17")
    val tag = args.drop(1).headOption.getOrElse("before")
    val only = args.drop(2).headOption.map(_.split(",").toSet)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"

    def docsCorpus = Tables.docsCorpus(spark, dir)
    def docs = Tables.load(spark, dir, "documents")
    val q64 = Tables.queryBatch(spark, 64)

    // persisted fixtures for the serving-path plans
    lazy val prepDir = java.nio.file.Files.createTempDirectory("graft_plans").toString
    lazy val persistedIvf = {
      val idx = Ivf.build(Tables.ordersCorpus(spark, dir).select("doc_id", "dv"),
        nlist = 16, maxIter = 2)
      idx.clustered.repartition(col("centroid_id"))
        .write.mode("overwrite").partitionBy("centroid_id")
        .parquet(s"$prepDir/ivf/clustered")
      idx.centroids.write.mode("overwrite").parquet(s"$prepDir/ivf/centroids")
      Ivf.Index(spark.read.parquet(s"$prepDir/ivf/centroids"),
        spark.read.parquet(s"$prepDir/ivf/clustered"), "COSINE")
    }
    lazy val persistedHnsw = {
      val g = Hnsw.build(docsCorpus.select(col("doc_id"), col("qv").as("dv")), m = 8)
      g.nodes.write.mode("overwrite").parquet(s"$prepDir/hnsw/nodes")
      g.edges.write.mode("overwrite").parquet(s"$prepDir/hnsw/edges")
      g.entries.write.mode("overwrite").parquet(s"$prepDir/hnsw/entries")
      Hnsw.Graph(spark.read.parquet(s"$prepDir/hnsw/nodes"),
        spark.read.parquet(s"$prepDir/hnsw/edges"),
        spark.read.parquet(s"$prepDir/hnsw/entries"), "COSINE")
    }

    val shapes: Seq[(String, () => DataFrame)] = Seq(
      "b1_knn_cos_64q" -> (() => Knn.search(Tables.ordersCorpus(spark, dir), q64,
        SearchParams(limit = 10, outputFields = Nil))),
      "b2_knn_filtered" -> (() => Knn.search(Tables.ordersCorpus(spark, dir), q64,
        SearchParams(limit = 10, scoreThreshold = Some(0.1),
          metaFilter = Map("priority" -> "URGENT"), outputFields = Seq("meta")))),
      "b5b_ivf_probe_persisted" -> (() =>
        Ivf.probePersisted(persistedIvf, q64, nprobe = 16, k = 10)),
      "b14_hnsw_search" -> (() => {
        val queries = docsCorpus.filter(col("doc_id") < 8)
          .select(col("doc_id").as("qid"), col("qv"))
        Hnsw.search(persistedHnsw, queries, k = 10, ef = 64)
      }),
      "b14b_hnsw_search_bulk" -> (() => {
        val queries = docsCorpus.filter(col("doc_id") < 512)
          .select(col("doc_id").as("qid"), col("qv"))
        Hnsw.searchBulk(persistedHnsw, queries, k = 10, ef = 64)
      }),
      "q_knn_cosine" -> (() => graft.SparkEntry.queries("q_knn_cosine")(spark, dir)),
      "q_ivf_knn" -> (() => graft.SparkEntry.queries("q_ivf_knn")(spark, dir)),
      "q_contamination" -> (() => graft.SparkEntry.queries("q_contamination")(spark, dir)),
      "q_contam_bloom" -> (() => graft.SparkEntry.queries("q_contam_bloom")(spark, dir)),
      "b3_bm25" -> (() => Bm25.searchTopK(Bm25.fit(docs),
        (0L until 8L).map(_ -> "spark join window merge data"), 10)),
      "b7_dedup_minhash_lsh" -> (() =>
        Dedup.lshCandidatePairs(Dedup.minhashSignatures(docs))),
      "b17_semantic_dedup" -> (() => graft.SparkEntry.queries("q_semantic_dedup")(spark, dir)),
      "b8_q1_agg" -> (() => graft.SparkEntry.queries("q1_agg")(spark, dir)),
      "b9_join_agg" -> (() => graft.SparkEntry.queries("q_join_agg")(spark, dir)),
    )

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for ((name, fn) <- shapes if only.forall(_.contains(name))) {
      try {
        val df = fn()
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[plans] wrote $name ($tag)")
      } catch { case e: Throwable =>
        System.err.println(s"[plans] $name FAILED: $e")
      }
    }
    spark.stop()
  }
}
