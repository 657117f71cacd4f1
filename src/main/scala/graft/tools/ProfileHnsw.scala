package graft.tools

import graft.core.Tables
import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hop-count vs recall/latency for the HNSW beam search at sf0.1. */
object ProfileHnsw {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val corpus = Tables.docsCorpus(spark, dir).select(col("doc_id"), col("qv").as("dv"))
    val queries = Tables.docsCorpus(spark, dir).filter(col("doc_id") < 8)
      .select(col("doc_id").as("qid"), col("qv"))
    val g = Hnsw.build(corpus, m = 8)
    g.edges.cache().count(); g.nodes.cache().count(); g.entries.cache().count()
    val exact = Knn.search(corpus, queries, SearchParams(limit = 10, outputFields = Nil))
      .cache(); exact.count()
    for (hops <- Seq(2, 3, 4, 6, 8)) {
      val t0 = System.nanoTime()
      val approx = Hnsw.search(g, queries, k = 10, ef = 64, maxHops = hops)
      val n = approx.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val rec = Ivf.recallVsExact(approx, exact)
      println(f"maxHops=$hops%2d  ${dt}%6.2f s  recall=$rec%.3f  rows=$n")
    }
    spark.stop()
  }
}
