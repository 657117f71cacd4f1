package graft.tools

import graft.api._
import graft.sources.VectorStoreCatalog
import org.apache.spark.sql.SparkSession

/** Scratch profiler for the facade insert hot path: seeds a collection,
  * then logs per-Spark-job timings (INFO) for one 500-row insert so the
  * fixed-cost budget of the commit protocol is attributable job by job.
  */
object ProfileInsert {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def vec(seed: Int): Seq[Double] =
      (0 until 64).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
    val indexed = args.headOption.contains("indexed")
    val cat = new VectorStoreCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft_prof").toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 64))
    cat.insert("t", "m", (0 until 1000).map(i =>
      EmbeddedVector(s"seed$i", s"seed doc $i lorem ipsum", "m", Map(), vec(i))))
    if (indexed) cat.persistIndex("t", "m")
    // warm
    cat.insert("t", "m", (0 until 500).map(i =>
      EmbeddedVector(if (i < 250) s"seed$i" else s"w$i", s"warm doc $i", "m",
        Map(), vec(1000 + i))))
    cat.profileStages = true
    val t0 = System.nanoTime()
    cat.insert("t", "m", (0 until 500).map(i =>
      EmbeddedVector(if (i < 250) s"seed$i" else s"n$i", s"new doc $i", "m",
        Map(), vec(2000 + i))))
    cat.profileStages = false
    println(f"[profile] insert(500) took ${(System.nanoTime() - t0) / 1e9}%.2f s (indexed=$indexed)")
    spark.stop()
  }
}
