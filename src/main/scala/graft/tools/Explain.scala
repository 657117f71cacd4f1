package graft.tools

import graft.core.Tables
import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off plan auditor: prints formatted physical plans for the headline
  * operators so shuffle/broadcast/codegen shape can be reviewed.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"

    println("==== KNN cosine ====")
    Knn.search(Tables.ordersCorpus(spark, dir), Tables.queryBatch(spark, 4),
      SearchParams(limit = 10, outputFields = Nil)).explain("formatted")

    println("==== column-pruned scan: q1_agg ====")
    graft.SparkEntry.queries("q1_agg")(spark, dir).explain("formatted")

    println("==== join_agg (broadcasts) ====")
    graft.SparkEntry.queries("q_join_agg")(spark, dir).explain("formatted")

    println("==== bm25 topk ====")
    graft.SparkEntry.queries("q_bm25_topk")(spark, dir).explain("formatted")

    println("==== indexed hybrid (persisted-IVF dense leg + BM25, RRF) ====")
    locally {
      import graft.operators.{Bm25, Hybrid, Ivf}
      val corpus = Tables.docsCorpus(spark, dir)
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("qv").as("dv"))
      val tmp = java.nio.file.Files.createTempDirectory("graft_explain").toString
      val built = Ivf.build(corpus, nlist = 16, maxIter = 3)
      built.clustered
        .repartition(org.apache.spark.sql.functions.col("centroid_id"))
        .write.mode("overwrite").partitionBy("centroid_id")
        .parquet(s"$tmp/clustered")
      built.centroids.write.mode("overwrite").parquet(s"$tmp/centroids")
      val idx = Ivf.Index(spark.read.parquet(s"$tmp/centroids"),
        spark.read.parquet(s"$tmp/clustered"), "COSINE")
      val queries = Tables.docsCorpus(spark, dir)
        .filter(org.apache.spark.sql.functions.col("doc_id") < 4)
        .select(org.apache.spark.sql.functions.col("doc_id").as("qid"),
          org.apache.spark.sql.functions.col("qv"))
      val dense = Ivf.probePersisted(idx, queries, nprobe = 4, k = 50)
        .select(org.apache.spark.sql.functions.col("qid"),
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("score").as("rawScore"))
      Hybrid.searchScored(dense, Bm25.fit(Tables.load(spark, dir, "documents")),
        (0L until 4L).map(_ -> "spark join data"),
        SearchParams(limit = 10)).explain("formatted")
    }

    // curation stages: the Gopher/C4 gates must show ONE pruned scan and
    // zero exchanges; ppx_buckets legitimately shuffles (tf join + per-lang
    // window) — review that its joins broadcast and the window is partitioned
    for (q <- Seq("q_gopher_rules", "q_c4_rules", "q_ppx_buckets")) {
      println(s"==== $q ====")
      graft.SparkEntry.queries(q)(spark, dir).explain("formatted")
    }

    // temporal joins: as-of must show ONE exchange + window, NO join node;
    // range join must show an equi-join (SMJ/SHJ) on (keys, bin), never a
    // BroadcastNestedLoopJoin; kmv must show ObjectHashAggregate partial;
    // heavy hitters: MG partial + broadcast recount; binned quantiles:
    // partial-agg histogram (no data-wide sort)
    for (q <- Seq("q_asof_join", "q_asof_chunked", "q_range_join",
        "q_session_attrib", "q_kmv_vocab", "q_heavy_hitters",
        "q_quantiles", "q_binned_quantiles")) {
      println(s"==== $q ====")
      graft.SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
