package graft.tools

import graft.api._
import graft.sources.VectorStoreCatalog
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Corpus-size slope of the facade insert, merge vs delta mode: seeds
  * collections at two corpus sizes (via `insertDf`, folded/untimed), then
  * times the SAME 500-row upsert mix into each. The merge commit's cost
  * carries an O(touched buckets) read-rewrite term that grows with corpus;
  * the delta commit appends one file and should stay FLAT. Prints one line
  * per (mode, corpus) cell for SCALE.md's table.
  */
object ProfileDelta {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val sizes = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(10000, 100000)
    val iters = args.headOption.map(_.toInt).getOrElse(3)
    val cat = new VectorStoreCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft_pdelta").toString)

    def vecCol(seed: org.apache.spark.sql.Column) = array(
      (0 until 64).map(i =>
        ((seed * 131 + lit(i * 313 + 7)) % 97 - 48).cast("double")): _*)

    for (n <- sizes; mode <- Seq("merge", "delta")) {
      val m = s"$mode$n"
      cat.generateSchema(SchemaSpec("t", m, dimension = 64,
        extraProps = if (mode == "delta") Map("ingest_mode" -> "delta") else Map.empty))
      // seed corpus (untimed): distributed ingest, then fold so both modes
      // start from an identical compact bucket layout
      cat.insertDf("t", m, spark.range(n)
        .select(concat(lit("seed"), col("id")).as("key"),
          concat(lit("seed doc "), col("id")).as("chunk"),
          map(lit("g"), lit("0")).as("metadata"),
          vecCol(col("id")).as("vector")))
      cat.flush("t", m)

      // timed: the b6-style 250-replace / 250-fresh request batch
      val times = (1 to iters).map { g =>
        val batch = (0 until 500).map { i =>
          val key = if (i < 250) s"seed$i" else s"g${g}_n$i"
          EmbeddedVector(key, s"doc $g $i", m, Map("g" -> g.toString),
            (0 until 64).map(j => (((g * 1000 + i) * 131 + j * 313 + 7) % 97 - 48).toDouble))
        }
        if (g == iters) { // attribute the warmest iteration stage by stage
          System.err.println(s"[pdelta] stages for mode=$mode corpus=$n:")
          cat.profileStages = true
        }
        val t0 = System.nanoTime()
        cat.insert("t", m, batch)
        cat.profileStages = false
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[pdelta] mode=$mode%-5s corpus=$n%7d insert(500) iters: " +
        times.map(t => f"$t%.2f").mkString(", ") + f"  min=${times.min}%.2f s")
    }
    spark.stop()
  }
}
