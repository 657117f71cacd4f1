package graft.tools

import graft.core.Tables
import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-JVM A/B of the bulk beam walk's hop-join physicality: the shuffle
  * regime (edges/nodes re-exchanged per hop) vs the broadcast regime a
  * fused-cap-sized batch qualifies for (r18). Flips
  * [[Knn.maxFusedQueries]] in-process so both arms run identical code on a
  * warm JVM — the only honest comparison on a box whose cold-run swings
  * exceed the effect (r17 "box lesson").
  */
object ProfileBulk {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = java.nio.file.Files.createTempDirectory("graft_pb").toString
    val corpus = Tables.docsCorpus(spark, dir).select(col("doc_id"), col("qv").as("dv"))
    val g0 = Hnsw.build(corpus, m = 8)
    g0.nodes.write.mode("overwrite").parquet(s"$out/nodes")
    g0.edges.write.mode("overwrite").parquet(s"$out/edges")
    g0.entries.write.mode("overwrite").parquet(s"$out/entries")
    def g = Hnsw.Graph(spark.read.parquet(s"$out/nodes"),
      spark.read.parquet(s"$out/edges"),
      spark.read.parquet(s"$out/entries"), "COSINE")
    val queries = Tables.docsCorpus(spark, dir).filter(col("doc_id") < 512)
      .select(col("doc_id").as("qid"), col("qv"))
    val dflt = Knn.maxFusedQueries
    def run(tag: String): Unit = {
      spark.catalog.clearCache(); System.gc(); Thread.sleep(500)
      jobs.set(0)
      val t0 = System.nanoTime()
      val n = Tables.checksumAll(
        Hnsw.searchBulk(g, queries, k = 10, ef = 64)).count()
      println(f"[bulk] $tag%-10s ${(System.nanoTime() - t0) / 1e9}%6.2f s  " +
        f"${jobs.get()}%3d jobs  rows=$n")
    }
    run("warmup")
    for (_ <- 1 to 3) {
      Knn.maxFusedQueries = 1; run("shuffle")
      Knn.maxFusedQueries = dflt; run("broadcast")
    }
    spark.stop()
  }
}
