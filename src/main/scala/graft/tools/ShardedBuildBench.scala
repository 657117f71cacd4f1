package graft.tools

import graft.core.Tables
import graft.operators.Hnsw
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The >clamp-point build measurement (r11 verdict item 6): one graph's
  * cell-local kNN term is n·(n/4096) past the 262k-doc nlist clamp, and
  * SCALE.md prescribes sharding there. This times `Hnsw.build` vs
  * `Hnsw.buildSharded` on a replicated embeddings corpus ABOVE the clamp
  * so the sharded arm's sub-quadratic slope is a measured number, not a
  * prediction.
  *
  * Usage: runMain graft.tools.ShardedBuildBench <factor> <mode> [outDir]
  *   factor — corpus replication of sf0.1's ~2k docs (200 → ~400k docs)
  *   mode   — "sharded" | "unsharded" | "both"
  * Replication is ScaleBench's scheme (perturbed keys, vectors kept), and
  * the replica parquet is reused across runs. Run with
  * SPARK_DRIVER_MEM=96g at factor ≥ 100 (the 100×-harness note).
  */
object ShardedBuildBench {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(200)
    val mode   = args.drop(1).headOption.getOrElse("both")
    val out    = args.drop(2).headOption.getOrElse(s"target/sfx$factor")
    val src    = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus   = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (name <- Seq("documents", "embeddings")) {
      val dst = s"$out/$name.parquet"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dst))) {
        val base = Tables.load(spark, src, name)
        val key = if (name == "documents") "doc_id" else "vec_id"
        base.crossJoin(spark.range(factor).select(col("id").as("_r")))
          .withColumn(key, col(key) * factor + col("_r"))
          .drop("_r").write.mode("overwrite").parquet(dst)
      }
    }
    val corpus = Tables.docsCorpus(spark, out)
      .select(col("doc_id"), col("qv").as("dv"))
    val n = corpus.count()
    System.err.println(s"[sharded-bench] corpus $n docs (factor $factor)")

    def time(tag: String)(g: => Hnsw.Graph): Unit = {
      val t0 = System.nanoTime()
      val edges = g.edges.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"""{"bench":"$tag","docs":$n,"sec":$dt%.1f,"edges":$edges}""")
    }
    if (mode == "sharded" || mode == "both")
      time("hnsw_build_sharded")(Hnsw.buildSharded(corpus, m = 8))
    if (mode == "unsharded" || mode == "both")
      time("hnsw_build_unsharded")(Hnsw.build(corpus, m = 8))
    spark.stop()
  }
}
