package graft.tools

import graft.core.Tables
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase attribution for the b15 PQ probe family (r17 verdict item 7:
  * "profile before touching"): times nested sub-plans of probePqAdc with
  * the noop sink so the cost splits into scan / ADC scoring / routing+join
  * / top-k, plus the decode-path twin. Same persisted fixture the bench
  * reads (prebuilt once, untimed).
  */
object ProfilePq {
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
    val out = java.nio.file.Files.createTempDirectory("graft_pq").toString
    val orders = Tables.ordersCorpus(spark, dir).select("doc_id", "dv")
    val q64 = Tables.queryBatch(spark, 64)
    val idx = Ivf.build(orders, nlist = 256, maxIter = 5)
    val pq0 = Ivf.quantizePq(idx, mSub = 8, ksub = 64, maxIter = 3)
    pq0.clustered.write.mode("overwrite").parquet(s"$out/clustered")
    val pq = Ivf.Pq(idx.centroids,
      spark.read.parquet(s"$out/clustered"), pq0.codebooks, "COSINE")

    def time(name: String)(df: => DataFrame): Unit = {
      spark.catalog.clearCache(); System.gc(); Thread.sleep(500)
      jobs.set(0)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[pq] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ${jobs.get()}%3d jobs")
    }
    for (_ <- 1 to 2) {
      time("scan codes only")(pq.clustered)
      time("scan + nd2 kernel")(pq.clustered.withColumn("nd2",
        graft.functions.VecExprs.pqAdc(col("pqcodes"),
          typedLit(pq.codebooks.flatten.map(c => c.map(x => x * x).sum)))))
      time("route only")(Ivf.route(q64, pq.centroids, pq.metric, 16))
      time("adc scores (no topk)")(Ivf.adcScores(pq.clustered,
        Ivf.route(q64, pq.centroids, pq.metric, 16), pq.codebooks, pq.metric))
      time("full probePqAdc")(Ivf.probePqAdc(pq, q64, nprobe = 16, k = 10))
      time("full probePq (decode)")(Ivf.probePq(pq, q64, nprobe = 16, k = 10))
    }
    spark.stop()
  }
}
