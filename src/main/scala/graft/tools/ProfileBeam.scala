package graft.tools

import graft.operators.Hnsw
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the request-path beam search: builds a small graph,
  * runs one 100-query search, and prints every Spark job with its callsite
  * so the fixed job chain is attributable line by line.
  */
object ProfileBeam {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def vec(seed: Int): Seq[Double] =
      (0 until 64).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
    val corpus = (0 until 1000).map(i => (i.toLong, vec(i)))
      .toDF("doc_id", "dv").localCheckpoint()
    val g0 = Hnsw.build(corpus, m = 8)
    // persisted-graph shape, as the absorb sees it
    val dir = java.nio.file.Files.createTempDirectory("beam_prof").toString
    g0.nodes.write.parquet(s"$dir/nodes")
    g0.edges.write.parquet(s"$dir/edges")
    g0.entries.write.parquet(s"$dir/entries")
    val g = Hnsw.Graph(
      spark.read.schema("doc_id LONG, dv ARRAY<DOUBLE>").parquet(s"$dir/nodes").persist(),
      spark.read.schema("src LONG, dst LONG").parquet(s"$dir/edges").persist(),
      spark.read.schema("doc_id LONG, dv ARRAY<DOUBLE>").parquet(s"$dir/entries"),
      "COSINE")
    g.nodes.count(); g.edges.count()
    val queries = (0 until 100).map(i => (i.toLong, vec(i * 7 + 3)))
      .toDF("qid", "qv").localCheckpoint()

    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = starts.getOrDefault(je.jobId, System.nanoTime())
        jobs.add((je.jobId, "", System.nanoTime() - t0))
      }
    })
    val hops = args.headOption.map(_.toInt).getOrElse(3)
    for (i <- 1 to 5) {
      jobs.clear()
      val t0 = System.nanoTime()
      val n = Hnsw.search(g, queries, k = 8, ef = 32, maxHops = hops,
        earlyStop = false).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val js = jobs.asScala.toSeq.sortBy(_._1)
      println(f"[beam-profile] iter $i maxHops=$hops search(100q) took $dt%.2f s, rows=$n, jobs=${js.size}, jobTime=${js.map(_._3).sum / 1e6}%.0f ms")
    }
    spark.stop()
  }
}
