package graft.tools

import graft.core.Tables
import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-profiler for the KNN hot path at sf0.1. */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val corpus = Tables.ordersCorpus(spark, dir)
    val q = Tables.queryBatch(spark, 64)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   ($n rows)")
    }

    time("scan+synthvec only")(corpus.count())
    time("score only (no topk)")(Knn.scored(corpus.select("doc_id", "dv"), q, "COSINE").count())
    time("score+heap topk")(TopK.perKey(Knn.scored(corpus.select("doc_id", "dv"), q, "COSINE"),
      "qid", "rawScore", "doc_id", 10).count())
    time("full search")(Knn.search(corpus, q, SearchParams(limit = 10, outputFields = Nil)).count())
    spark.stop()
  }
}
