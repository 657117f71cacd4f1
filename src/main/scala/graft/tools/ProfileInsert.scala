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
    val mode = args.headOption.getOrElse("plain") // plain | indexed | hnsw | pend
    if (mode == "pend") {
      // the r16 verdict #1 "done" trace: 18 sequential inserts into a
      // pending-window (default 8) HNSW collection — pre-r17 every Wth
      // iteration paid the synchronous fold inline (15-23 s at the 1M
      // point); with the detached fold no iteration may read >2x steady
      // state. The fold still runs (on the rebuild executor) — its cost
      // shows up, if at all, as mild contention on later iterations.
      val cat = new VectorStoreCatalog(spark,
        java.nio.file.Files.createTempDirectory("graft_prof").toString)
      cat.generateSchema(SchemaSpec("t", "m", dimension = 64,
        indexType = "HNSW", extraProps = Map("hnsw_max_absorbs" -> "100000")))
      cat.insert("t", "m", (0 until 1000).map(i =>
        EmbeddedVector(s"seed$i", s"seed doc $i lorem ipsum", "m", Map(), vec(i))))
      cat.persistIndex("t", "m")
      def churn(gen: Int) = (0 until 100).map { i =>
        val key = if (i < 50) s"seed${gen % 900 + i}" else s"k${gen}_$i"
        EmbeddedVector(key, s"doc $gen $i", "m", Map("g" -> gen.toString),
          vec(gen * 1000 + i))
      }
      cat.insert("t", "m", churn(0)) // warm
      val times = (1 to 18).map { g =>
        val t0 = System.nanoTime()
        cat.insert("t", "m", churn(g))
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[pend] insert $g%2d  $dt%6.2f s")
        dt
      }
      cat.awaitRebuilds("t", "m")
      val steady = times.sorted.apply(times.size / 2)
      println(f"[pend] median ${steady}%.2f s  max ${times.max}%.2f s  " +
        f"max/median ${times.max / steady}%.2f")
      spark.stop(); return
    }
    val cat = new VectorStoreCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft_prof").toString)
    if (mode == "hnsw") {
      // the b6i fixture shape: 1000-row HNSW collection, 100-row churn
      // batches (50 replacements + 50 fresh), absorb threshold never crossed.
      // 2nd arg = hnsw_connect_hops (A/B the absorb beam depth in-session)
      val hops = args.drop(1).headOption.getOrElse("3")
      cat.generateSchema(SchemaSpec("t", "m", dimension = 64,
        indexType = "HNSW", extraProps = Map("hnsw_max_absorbs" -> "100000",
          // window=1 = absorb-per-insert: this profiler exists to trace the
          // ABSORB CYCLE (the b6i shape); without it the r16 pending default
          // routes every insert to the append path and the trace shows no
          // absorb at all
          "hnsw_absorb_window" -> "1",
          "hnsw_connect_hops" -> hops)))
      cat.insert("t", "m", (0 until 1000).map(i =>
        EmbeddedVector(s"seed$i", s"seed doc $i lorem ipsum", "m", Map(), vec(i))))
      cat.persistIndex("t", "m")
      def churn(gen: Int) = (0 until 100).map { i =>
        val key = if (i < 50) s"seed${gen % 900 + i}" else s"k${gen}_$i"
        EmbeddedVector(key, s"doc $gen $i", "m", Map("g" -> gen.toString),
          vec(gen * 1000 + i))
      }
      cat.insert("t", "m", churn(1)) // warm
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val traceJobs = sys.env.contains("GRAFT_PROFILE_JOBS")
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          if (traceJobs) System.err.println(
            s"[job ${js.jobId}] stages=${js.stageInfos.size} " +
              js.stageInfos.map(_.name.takeWhile(_ != '\n').take(60))
                .mkString(" | "))
        }
      })
      cat.jobProbe = () => jobs.get()
      for (g <- 2 to 4) {
        jobs.set(0)
        cat.profileStages = true
        val t0 = System.nanoTime()
        cat.insert("t", "m", churn(g))
        cat.profileStages = false
        println(f"[profile] hnsw insert(100) took ${(System.nanoTime() - t0) / 1e9}%.2f s, ${jobs.get()} spark jobs")
      }
      spark.stop(); return
    }
    val indexed = mode == "indexed"
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
