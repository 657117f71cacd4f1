package graft.tools

import graft.core.Tables
import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase attribution for the b13 HNSW build wall: KMeans fit (eager, inside
  * Ivf.build) vs the lazy edge-derivation plan materialized by the writes.
  */
object ProfileHnswBuild {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val trace = sys.env.contains("GRAFT_PROFILE_JOBS")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (trace) System.err.println(
          s"[job ${js.jobId}] stages=${js.stageInfos.size} " +
            js.stageInfos.map(_.name.takeWhile(_ != '\n').take(50))
              .mkString(" | "))
      }
    })
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = java.nio.file.Files.createTempDirectory("graft_hb").toString
    def corpus = Tables.docsCorpus(spark, dir).select(col("doc_id"), col("qv").as("dv"))
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val j0 = jobs.get()
      val r = f
      println(f"[hb] $name%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ${jobs.get() - j0}%3d jobs")
      r
    }
    for (it <- 1 to 3) {
      println(s"-- iteration $it")
      val ivf = phase("ivf.build (kmeans)")(
        Ivf.build(corpus, math.max(2, math.min(math.min(4096L, 2000 / 64), 2000).toInt),
          maxIter = 8))
      phase("graph build+write") {
        val g = phase("  Hnsw.build eager")(Hnsw.build(corpus, m = 8))
        phase("  edges write")(
          g.edges.write.mode("overwrite").parquet(s"$out/edges"))
        phase("  nodes write")(
          g.nodes.write.mode("overwrite").parquet(s"$out/nodes"))
        phase("  entries write")(
          g.entries.write.mode("overwrite").parquet(s"$out/entries"))
      }
    }
    // coarseIter sweep (r17 verdict next-round item 1a): the coarse cells
    // only need LOCALITY, and each KMeans iteration is a driver-synchronized
    // job round — measure what iterations actually buy in approximate-regime
    // recall before touching the default. Recall is @10 at ef=64 over 64
    // queries vs exact KNN (the HnswSpec bound's shape, wider query set).
    val queries = Tables.docsCorpus(spark, dir)
      .filter(col("doc_id") < 64)
      .select(col("doc_id").as("qid"), col("qv"))
    val exact = Knn.search(Tables.docsCorpus(spark, dir)
        .select(col("doc_id"), col("qv").as("dv")), queries,
      SearchParams(limit = 10, outputFields = Nil)).localCheckpoint()
    for (ci <- Seq(8, 4, 2, 1); rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val g = Hnsw.build(corpus, m = 8, coarseIter = ci)
      g.edges.write.mode("overwrite").parquet(s"$out/ci/edges")
      g.nodes.write.mode("overwrite").parquet(s"$out/ci/nodes")
      g.entries.write.mode("overwrite").parquet(s"$out/ci/entries")
      val dt = (System.nanoTime() - t0) / 1e9
      val served = Hnsw.Graph(spark.read.parquet(s"$out/ci/nodes"),
        spark.read.parquet(s"$out/ci/edges"),
        spark.read.parquet(s"$out/ci/entries"), "COSINE")
      val rec = Ivf.recallVsExact(
        Hnsw.search(served, queries, k = 10, ef = 64), exact)
      println(f"[ci] coarseIter=$ci%2d rep=$rep  build+write ${dt}%6.2f s  recall@10(ef=64)=$rec%.4f")
    }
    spark.stop()
  }
}
