package graft.tools

import graft.core.Tables
import graft.operators.Hnsw
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the two r15 object-store claims under INJECTED per-GET latency
  * (r15 verdict task 3 / finding 4) — both were provably neutral on a
  * local fs, where re-reads are page-cache hits and a pointer read is ~µs:
  *
  *  - "pointer": the generation-pointer cache's value. A catalog serving
  *    loop runs with `spark.graft.sim.pointer.latency.ms` injected into
  *    every pointer GET ([[graft.sources.VectorStoreCatalog]] readGenState)
  *    and A/Bs the cache ON (default TTL) vs OFF
  *    (`spark.graft.gen.cache.ttl.ms = 0` — re-read per resolution, the
  *    pre-r15 behavior).
  *  - "graph": the `cacheGraph` request-scoped persist. The 8-query
  *    request shape walks the persisted 1M graph with nodes/edges read
  *    through `simfs://` ([[graft.sources.SimLatencyFileSystem]] — every
  *    file open pays the latency, the S3-GET model) and A/Bs
  *    cacheGraph=false (per-hop re-reads are real "network" I/O) vs true
  *    (one read, then memory).
  *
  * Arms are interleaved ×2 in one JVM so JIT/session state cancels.
  * Usage: runMain graft.tools.ObjectStoreLatencyBench <pointer|graph>
  *        [latencyMs=20] [fixtureDir=target/sfx500]
  */
object ObjectStoreLatencyBench {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("pointer")
    val latMs = args.drop(1).headOption.map(_.toLong).getOrElse(20L)
    val fixture = args.drop(2).headOption.getOrElse("target/sfx500")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .config("spark.hadoop.fs.simfs.impl",
        "graft.sources.SimLatencyFileSystem")
      .config("spark.hadoop.fs.simfs.open.latency.ms", latMs.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (mode == "pointer") {
      val cat = new graft.sources.VectorStoreCatalog(spark,
        java.nio.file.Files.createTempDirectory("oslat").toString)
      def vec(seed: Int): Seq[Double] =
        (0 until 32).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
      cat.generateSchema(graft.api.SchemaSpec("t", "m", dimension = 32,
        indexType = "HNSW"))
      cat.insert("t", "m", (0 until 1000).map(i =>
        graft.api.EmbeddedVector(s"k$i", s"doc $i lorem", "m", Map(), vec(i))))
      cat.persistIndex("t", "m")
      val reqs = 32
      def serve(): Unit = (0 until reqs).foreach { i =>
        val r = cat.search(graft.api.SearchRequest("t", "m", vec(i), limit = 5))
        require(r.success, s"req $i failed")
      }
      serve() // warm-up, no injected latency yet
      spark.conf.set("spark.graft.sim.pointer.latency.ms", latMs.toString)
      for (round <- 1 to 2; cached <- Seq(true, false)) {
        spark.conf.set("spark.graft.gen.cache.ttl.ms",
          if (cached) "2000" else "0")
        val t0 = System.nanoTime()
        serve()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"""{"bench":"pointer_cache","round":$round,"cache":$cached,"getLatencyMs":$latMs,"requests":$reqs,"sec":$dt%.2f,"ms_per_req":${dt * 1000 / reqs}%.1f}""")
      }
      spark.conf.unset("spark.graft.sim.pointer.latency.ms")
      spark.conf.unset("spark.graft.gen.cache.ttl.ms")
      // The vanished-root EXISTENCE PROBE's own cost at the latency axis
      // (r17 deferred item): cache fully warm (long TTL, no pointer
      // latency), inject per-probe HEAD latency and A/B against zero —
      // the delta is exactly what the guard costs a warm serving loop.
      spark.conf.set("spark.graft.gen.cache.ttl.ms", "3600000")
      for (round <- 1 to 2; probeMs <- Seq(0L, latMs)) {
        spark.conf.set("spark.graft.sim.exists.latency.ms", probeMs.toString)
        val t0 = System.nanoTime()
        serve()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"""{"bench":"exists_probe","round":$round,"probeLatencyMs":$probeMs,"requests":$reqs,"sec":$dt%.2f,"ms_per_req":${dt * 1000 / reqs}%.1f}""")
      }
      spark.conf.unset("spark.graft.sim.exists.latency.ms")
      spark.conf.unset("spark.graft.gen.cache.ttl.ms")
    }

    if (mode == "graph") {
      val abs = java.nio.file.Paths.get(fixture).toAbsolutePath
      require(java.nio.file.Files.exists(abs.resolve("hnsw/edges")),
        s"run ShardedBuildBench <factor> sharded first — no graph at $abs")
      // one-time local materialization of the node table, so both arms
      // read the same three parquet dirs through simfs
      val nodesDir = abs.resolve("hnsw/nodes")
      if (!java.nio.file.Files.exists(nodesDir))
        Tables.docsCorpus(spark, abs.toString)
          .select(col("doc_id"), col("qv").as("dv"))
          .write.parquet(nodesDir.toString)
      def sim(p: java.nio.file.Path) = s"simfs://$p"
      val g = Hnsw.Graph(
        spark.read.schema("doc_id LONG, dv ARRAY<DOUBLE>")
          .parquet(sim(nodesDir)),
        spark.read.schema("src LONG, dst LONG").parquet(sim(abs.resolve("hnsw/edges"))),
        spark.read.parquet(abs.resolve("hnsw/entries").toString), "COSINE")
      // queries prepped from LOCAL reads — only the hop loop pays latency
      val queries = spark.read.schema("doc_id LONG, dv ARRAY<DOUBLE>")
        .parquet(nodesDir.toString)
        .orderBy("doc_id").limit(8)
        .select(col("doc_id").as("qid"), col("dv").as("qv"))
        .localCheckpoint()
      val n = queries.count()
      for (round <- 1 to 2; cache <- Seq(false, true)) {
        val t0 = System.nanoTime()
        val rows = Hnsw.search(g, queries, k = 10, ef = 64,
          cacheGraph = cache).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"""{"bench":"graph_cache","round":$round,"cacheGraph":$cache,"getLatencyMs":$latMs,"queries":$n,"sec":$dt%.2f,"rows":$rows}""")
      }
    }
    spark.stop()
  }
}
