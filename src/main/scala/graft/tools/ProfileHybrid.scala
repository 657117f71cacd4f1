package graft.tools

import graft.core.Tables
import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-profiler for the b4 hybrid path at sf0.1: where does the time go
  * between corpus prep, the dense leg, the sparse leg, and fusion?
  */
object ProfileHybrid {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def docs       = Tables.load(spark, dir, "documents")
    def docsCorpus = Tables.docsCorpus(spark, dir)
    val qtexts = (0L until 8L).map(_ -> "spark join window merge data")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s   ($n rows)")
    }

    time("warmup docs.count")(docs.count())
    time("docsCorpus (join) count")(docsCorpus.count())
    val corpus  = docsCorpus.select(col("doc_id"), col("qv").as("dv"))
    val queries = docsCorpus.filter(col("doc_id") < 8)
      .select(col("doc_id").as("qid"), col("qv"))
    time("queries materialize")(queries.count())
    time("dense leg only")(TopK.perKey(
      Knn.scored(corpus, queries.select("qid", "qv"), "COSINE"),
      "qid", "rawScore", "doc_id", 10, desc = true).count())
    time("bm25 fit.tf only")(Bm25.fit(docs).tf.count())
    time("sparse leg (fit+search)")(Bm25.searchTopK(Bm25.fit(docs), qtexts, 10).count())
    time("full hybrid (b4 shape)")(Hybrid.search(corpus, queries, Bm25.fit(docs),
      qtexts, SearchParams(limit = 10)).count())
    time("full hybrid again (warm)")(Hybrid.search(corpus, queries, Bm25.fit(docs),
      qtexts, SearchParams(limit = 10)).count())
    spark.stop()
  }
}
