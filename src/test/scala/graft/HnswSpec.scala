package graft

import graft.api._
import graft.core.Tables
import graft.operators.{Hnsw, Ivf, Knn, SearchParams}
import graft.sources.VectorStoreCatalog
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** HNSW (navigable small-world graph) index — build quality, beam-search
  * recall, and the facade lifecycle (VERDICT r2 "What's missing" #1: accept
  * HNSW as a real index type instead of silently building IVF_FLAT).
  */
class HnswSpec extends SparkSpec {

  test("beam search recall@10 >= 0.8 vs exact KNN at ef=64") {
    val corpus = Tables.docsCorpus(spark, Sf)
      .select(col("doc_id"), col("qv").as("dv"))
    val queries = Tables.docsCorpus(spark, Sf).filter(col("doc_id") < 8)
      .select(col("doc_id").as("qid"), col("qv"))
    val g = Hnsw.build(corpus, m = 8)
    val exact = Knn.search(corpus, queries, SearchParams(limit = 10, outputFields = Nil))
    val approx = Hnsw.search(g, queries, k = 10, ef = 64)
    val recall = Ivf.recallVsExact(approx, exact)
    assert(recall >= 0.8, s"recall $recall")
  }

  test("sharded build: union graph serves with recall on par with the unsharded graph") {
    val corpus = Tables.docsCorpus(spark, Sf)
      .select(col("doc_id"), col("qv").as("dv"))
    val queries = Tables.docsCorpus(spark, Sf).filter(col("doc_id") < 8)
      .select(col("doc_id").as("qid"), col("qv"))
    val n = corpus.count()
    // force ≥3 shards on the test corpus (production shardTarget is the
    // nlist-clamp regime bound; the mechanics are scale-free)
    val sharded = Hnsw.buildSharded(corpus, m = 8, shardTarget = (n / 3).toInt)
    val exact = Knn.search(corpus, queries, SearchParams(limit = 10, outputFields = Nil))
    val shardedRecall = Ivf.recallVsExact(
      Hnsw.search(sharded, queries, k = 10, ef = 64), exact)
    val unshardedRecall = Ivf.recallVsExact(
      Hnsw.search(Hnsw.build(corpus, m = 8), queries, k = 10, ef = 64), exact)
    assert(shardedRecall >= 0.8, s"sharded recall $shardedRecall")
    assert(shardedRecall >= unshardedRecall - 0.1,
      s"sharded $shardedRecall must stay on par with unsharded $unshardedRecall")
    // edges stay shard-local: no edge crosses a shard boundary
    val s = math.ceil(n.toDouble / (n / 3).toDouble).toInt
    val crossing = sharded.edges
      .filter(pmod(col("src"), lit(s)) =!= pmod(col("dst"), lit(s))).count()
    assert(crossing == 0, s"$crossing cross-shard edges in a sharded graph")
    // a 1-shard target degenerates to the plain build (same entry count)
    val one = Hnsw.buildSharded(corpus, m = 8, shardTarget = (n + 1).toInt)
    assert(one.entries.count() == Hnsw.build(corpus, m = 8).entries.count())
  }

  test("shard routing: R >= S is bit-exact vs all-shard; top-R keeps recall") {
    val corpus = Tables.docsCorpus(spark, Sf)
      .select(col("doc_id"), col("qv").as("dv"))
    val queries = Tables.docsCorpus(spark, Sf).filter(col("doc_id") < 8)
      .select(col("doc_id").as("qid"), col("qv"))
    val n = corpus.count()
    val s = 4
    val sharded = Hnsw.buildSharded(corpus, m = 8,
      shardTarget = math.ceil(n.toDouble / s).toInt)
    assert(sharded.entries.columns.contains("shard"),
      "sharded entries must carry their shard id")
    assert(sharded.entries.select("shard").distinct().count() == s)
    def dump(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("qid", "rank").collect().map(_.toString).toSeq
    // R >= S routes nothing away — identical rows to the default all-seed
    val all = Hnsw.search(sharded, queries, k = 10, ef = 64)
    assert(dump(Hnsw.search(sharded, queries, k = 10, ef = 64, routeShards = s))
      == dump(all), "routeShards = S must be bit-exact vs all-shard seeding")
    assert(dump(Hnsw.search(sharded, queries, k = 10, ef = 64,
      routeShards = Int.MaxValue)) == dump(all))
    // top-R routing: the hash-sharded corpus splits every query's true
    // top-k ~uniformly across shards, so R of S shards bounds attainable
    // recall near R/S — assert the router lands in that regime rather
    // than collapsing (R=2 of 4 ⇒ ~half the all-shard recall, floor 0.4)
    val exact = Knn.search(corpus, queries, SearchParams(limit = 10, outputFields = Nil))
    val allR = Ivf.recallVsExact(all, exact)
    val routedR = Ivf.recallVsExact(
      Hnsw.search(sharded, queries, k = 10, ef = 64, routeShards = 2), exact)
    assert(routedR >= 0.4 * allR,
      s"top-2-of-4 routed recall $routedR collapsed vs all-shard $allR")
    // bulk path routes identically
    assert(dump(Hnsw.searchBulk(sharded, queries, k = 10, ef = 64, routeShards = 2))
      == dump(Hnsw.search(sharded, queries, k = 10, ef = 64, routeShards = 2)),
      "bulk routing diverged from request-path routing")
  }

  test("searchBulk is row-identical to search at full and partial beam") {
    val corpus = Tables.docsCorpus(spark, Sf).limit(300)
      .select(col("doc_id"), col("qv").as("dv"))
    val g = Hnsw.build(corpus, m = 6)
    val queries = Tables.docsCorpus(spark, Sf).filter(col("doc_id") < 6)
      .select(col("doc_id").as("qid"), col("qv"))
    def dump(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("qid", "rank").collect().map(_.toString).toSeq
    // full beam (ef >= |corpus|): the walk is exhaustive over the connected
    // component — the strongest equality point
    assert(dump(Hnsw.search(g, queries, k = 10, ef = 512)) ==
      dump(Hnsw.searchBulk(g, queries, k = 10, ef = 512)),
      "bulk full-beam results diverge")
    // partial beam: same hops, same evictions, just a different join
    // strategy for the query attach
    assert(dump(Hnsw.search(g, queries, k = 10, ef = 16)) ==
      dump(Hnsw.searchBulk(g, queries, k = 10, ef = 16)),
      "bulk partial-beam results diverge")
  }

  test("filtered search never returns a doc_id twice (evicted seeds stay visited)") {
    val corpus = Tables.docsCorpus(spark, Sf).limit(200)
      .select(col("doc_id"), col("qv").as("dv"))
    val g = Hnsw.build(corpus, m = 4)
    val queries = Tables.docsCorpus(spark, Sf).filter(col("doc_id") < 4)
      .select(col("doc_id").as("qid"), col("qv"))
    val allowed = corpus.filter(col("doc_id") % 3 === 0).select("doc_id")
    // ef far below |allowed| forces seed eviction: an evicted allowed seed
    // re-reached by the walk must NOT enter the pool a second time
    val res = Hnsw.search(g, queries, k = 20, ef = 4, allowed = Some(allowed))
    val rows = res.collect().map(r =>
      (r.getAs[Long]("qid"), r.getAs[Long]("doc_id"))).toSeq
    assert(rows.size == rows.distinct.size,
      s"duplicate (qid, doc_id) in filtered results")
    val ok = allowed.collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => ok(r._2)), "filtered result outside the allowed set")
  }

  test("pre-bucketing flat graph layout is migrated on first absorb") {
    def vec(seed: Int): Seq[Double] =
      (0 until 8).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_hnsw_mig").toString)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, indexType = "HNSW"))
    cat.insert("t", "m", (0 until 60).map(i =>
      EmbeddedVector(s"k$i", s"chunk $i", "m", Map(), vec(i))))
    cat.persistIndex("t", "m")
    // simulate the legacy layout: rewrite nodes/edges as FLAT parquet
    val d = java.nio.file.Paths.get(cat.hnswDirOf("t", "m"))
    for ((table, schema) <- Seq("nodes" -> "doc_id LONG, dv ARRAY<DOUBLE>",
        "edges" -> "src LONG, dst LONG")) {
      val flat = spark.read.schema(schema + ", _bucket LONG")
        .parquet(d.resolve(table).toString).drop("_bucket").collect()
      VectorStoreCatalog.deleteRec(d.resolve(table))
      spark.createDataFrame(
          new java.util.ArrayList(java.util.Arrays.asList(flat: _*)),
          org.apache.spark.sql.types.StructType.fromDDL(schema))
        .write.parquet(d.resolve(table).toString)
      spark.catalog.refreshByPath(d.resolve(table).toString)
    }
    // an insert must migrate the layout (not silently drop the old graph)
    // and keep the collection searchable
    cat.insert("t", "m",
      Seq(EmbeddedVector("fresh", "fresh doc", "m", Map(), vec(70))))
    import scala.jdk.CollectionConverters._
    assert(Files.list(d.resolve("nodes")).iterator().asScala
      .exists(_.getFileName.toString.startsWith("_bucket=")), "nodes not migrated")
    val hit = cat.search(SearchRequest("t", "m", vec(17), limit = 3))
    assert(hit.success && hit.data.head.content == "chunk 17",
      "pre-migration graph content lost")
    val fresh = cat.search(SearchRequest("t", "m", vec(70), limit = 3))
    assert(fresh.success && fresh.data.head.content == "fresh doc")
  }

  test("bridge skew guard: over-cap buckets dropped, degenerate graph stays connected") {
    import spark.implicits._
    // the guard mechanics on a hand-built bucket table: an oversize bucket's
    // rows vanish from the bridge source, normal buckets pass through
    val bucketed = ((0L until 40L).map(i => (0L, 7L, i, Seq(1.0, 2.0))) ++
      (100L until 105L).map(i => (0L, 9L, i, Seq(3.0, 4.0))))
      .toDF("table", "bucket", "doc_id", "qv")
    val kept = Hnsw.bridgeBuckets(bucketed, cap = 16)
      .select("bucket").collect().map(_.getLong(0))
    assert(kept.forall(_ == 9L) && kept.length == 5,
      s"cap should drop the 40-row bucket, keep the 5-row one; kept ${kept.toSeq}")

    // end-to-end: 200 IDENTICAL vectors land in ONE LSH bucket per table
    // (every hyperplane sign agrees) — the exact degenerate shape the cap
    // bounds. The build must stay sub-quadratic AND the graph connected:
    // cell kNN + hub edges carry connectivity without any bridges.
    val n = 250L
    val corpus = spark.range(n).select(col("id").as("doc_id"),
      when(col("id") < 200, array(lit(5.0), lit(-3.0), lit(2.0), lit(1.0)))
        .otherwise(array(col("id") % 13 - 6.0, col("id") % 7 - 3.0,
          col("id") % 11 - 5.0, col("id") % 5 - 2.0)).as("dv"))
    val g = Hnsw.build(corpus, m = 4, maxBridgeBucket = 16)
    val comp = graft.operators.Dedup.components(
      g.edges.select(col("src").as("doc_a"), col("dst").as("doc_b")))
    assert(comp.select("doc_id").distinct().count() == n,
      "some node has no edge at all")
    assert(comp.select("root").distinct().count() == 1L,
      "degenerate-bucket graph fragmented into islands")
  }

  test("graph edges are symmetric (reverse links kept)") {
    val corpus = Tables.docsCorpus(spark, Sf).limit(300)
      .select(col("doc_id"), col("qv").as("dv"))
    val g = Hnsw.build(corpus, m = 4)
    val rev = g.edges.select(col("dst").as("src"), col("src").as("dst"))
    assert(g.edges.join(rev, Seq("src", "dst"), "left_anti").count() == 0)
    assert(g.edges.count() > 0 && !g.entries.isEmpty)
  }

  test("facade auto-shards past hnsw_shard_target; absorb and search unchanged") {
    def vec(seed: Int): Seq[Double] =
      (0 until 8).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_hnsw_shard").toString)
    // shard target far below the corpus: persistIndex must route through
    // buildSharded (3 shards here; production default is the clamp point)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, indexType = "HNSW",
      extraProps = Map("hnsw_shard_target" -> "30",
        "hnsw_max_absorbs" -> "1000")))
    cat.insert("t", "m", (0 until 90).map(i =>
      EmbeddedVector(s"k$i", s"chunk $i", "m", Map(), vec(i))))
    cat.persistIndex("t", "m")
    // the union graph carries every shard's entry medoids
    val nEntries = cat.loadHnsw("t", "m").entries.count()
    // exact self-match through the sharded graph
    val hit = cat.search(SearchRequest("t", "m", vec(17), limit = 5))
    assert(hit.success && hit.data.head.content == "chunk 17")
    // absorb into the sharded graph: fresh key + replacement both serve
    cat.insert("t", "m", Seq(
      EmbeddedVector("k95", "fresh doc", "m", Map(), vec(95)),
      EmbeddedVector("k17", "moved", "m", Map(), vec(60))))
    val fresh = cat.search(SearchRequest("t", "m", vec(95), limit = 3))
    assert(fresh.success && fresh.data.head.content == "fresh doc")
    val moved = cat.search(SearchRequest("t", "m", vec(60), limit = 3))
    assert(moved.success && moved.data.head.content == "moved")
    assert(nEntries > 3, s"3 shards must union >3 entry medoids, got $nEntries")

    // persisted entries carry their shard id (the routing key survives the
    // publish AND the absorb above — absorbs must not strip the column)
    val entries = cat.loadHnsw("t", "m").entries
    assert(entries.columns.contains("shard"), "persisted entries lost shard")
    assert(entries.filter(col("shard").isNull).count() == 0,
      "absorb dropped shard ids from the entries table")

    // `hnsw_route_shards` >= S serves identically to the unrouted default
    val cat2 = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_hnsw_route").toString)
    cat2.generateSchema(SchemaSpec("t", "m", dimension = 8, indexType = "HNSW",
      extraProps = Map("hnsw_shard_target" -> "30",
        "hnsw_route_shards" -> "3", "hnsw_max_absorbs" -> "1000")))
    cat2.insert("t", "m", (0 until 90).map(i =>
      EmbeddedVector(s"k$i", s"chunk $i", "m", Map(), vec(i))))
    cat2.persistIndex("t", "m")
    val routedHit = cat2.search(SearchRequest("t", "m", vec(17), limit = 5))
    assert(routedHit.success && routedHit.data.head.content == "chunk 17",
      "routed facade search lost the exact self-match")
  }

  test("facade HNSW lifecycle: build, search, insert-absorb, empty-then-insert") {
    def vec(seed: Int): Seq[Double] =
      (0 until 8).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_hnsw").toString)
    // hnsw_absorb_window=1: this test pins the ABSORB path's internals
    // (per-insert graph connect, entries refresh, bucket-restricted
    // rewrites); the r16 growing-segment default regime is HnswPendingSpec
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, indexType = "HNSW",
      extraProps = Map("hnsw_absorb_window" -> "1")))
    // 90 < 97 = synthetic vector period, so all vectors are distinct
    cat.insert("t", "m", (0 until 90).map(i =>
      EmbeddedVector(s"k$i", s"chunk $i", "m", Map(), vec(i))))
    cat.persistIndex("t", "m")
    assert(cat.hnswExists("t", "m") && !cat.indexExists("t", "m"),
      "HNSW must build a graph, not a silent IVF_FLAT")

    // exact self-match through the graph path (re-ranked on stored vectors)
    val hit = cat.search(SearchRequest("t", "m", vec(17), limit = 5))
    assert(hit.success && hit.data.head.content == "chunk 17")

    // insert absorption: new docs connect into the graph, no rebuild
    cat.insert("t", "m",
      Seq(EmbeddedVector("k95", "fresh doc", "m", Map(), vec(95))))
    val fresh = cat.search(SearchRequest("t", "m", vec(95), limit = 3))
    assert(fresh.success && fresh.data.head.content == "fresh doc")
    // and an upserted key is searchable at its NEW vector, once
    cat.insert("t", "m",
      Seq(EmbeddedVector("k17", "moved", "m", Map(), vec(60))))
    val moved = cat.searchDf(SearchRequest("t", "m", vec(60), limit = 5))
      .orderBy("rank").select("chunk").collect().map(_.getString(0))
    assert(moved.count(_ == "moved") == 1, s"got ${moved.toSeq}")
    assert(moved.head == "moved")

    // hybrid over the graph: dense leg from beam search, sparse from postings
    val hy = cat.search(SearchRequest("t", "m", vec(5), limit = 5,
      hybridSearch = true, textFilter = Some("chunk 5")))
    assert(hy.success && hy.data.map(_.content).contains("chunk 5"))

    // partition targeting composes: in-partition docs only (FILTERED beam
    // search — the walk is unrestricted but allowed candidates pool and
    // allowed nodes seed the beam)
    cat.insert("t", "m",
      Seq(EmbeddedVector("p1", "partitioned doc", "m", Map(), vec(33))),
      partition = Some("px"))
    val inPart = cat.search(SearchRequest("t", "m", vec(33), limit = 5,
      partitionNames = Seq("px")))
    assert(inPart.success && inPart.data.map(_.content) == Seq("partitioned doc"))
    // ...and a 1-doc partition FAR from the query is still served — a
    // post-hoc partition filter over the global top-k would starve it
    val farPart = cat.search(SearchRequest("t", "m", vec(71), limit = 3,
      partitionNames = Seq("px")))
    assert(farPart.success && farPart.data.map(_.content) == Seq("partitioned doc"),
      "filtered search must return the partition's docs even when none make the global beam")

    // upserting a key that is an entry medoid refreshes the entries table —
    // future walks must seed from the CURRENT vector
    val hnswG = cat.loadHnsw("t", "m")
    val entryIds = hnswG.entries.select("doc_id").collect().map(_.getLong(0)).toSet
    val keyHash = spark.range(0, 96).selectExpr("id", "xxhash64(concat('k', id)) AS h")
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    val medoidKey = entryIds.flatMap(keyHash.get).headOption
    medoidKey.foreach { ki =>
      cat.insert("t", "m",
        Seq(EmbeddedVector(s"k$ki", s"chunk $ki", "m", Map(), vec(77))))
      val dv = cat.loadHnsw("t", "m").entries
        .filter(col("doc_id") === lit(keyHash.map(_.swap).apply(ki)))
        .select("dv").head().getSeq[Double](0)
      assert(dv == vec(77), "entry medoid must carry its upserted vector")
    }

    // absorb is bucket-restricted: inserting one key rewrites only that
    // key's node-bucket directory — every other bucket's files are untouched
    {
      import scala.jdk.CollectionConverters._
      val nodesDir = java.nio.file.Paths.get(cat.hnswDirOf("t", "m"), "nodes")
      def snapshot(): Map[String, Long] =
        Files.walk(nodesDir).iterator().asScala
          .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
          .map(p => nodesDir.relativize(p).toString -> Files.getLastModifiedTime(p).toMillis)
          .toMap
      val before = snapshot()
      cat.insert("t", "m",
        Seq(EmbeddedVector("bkt-probe", "bucket probe doc", "m", Map(), vec(44))))
      val after = snapshot()
      val bkt = spark.range(1)
        .select(pmod(xxhash64(lit("bkt-probe")), lit(16L))).head().getLong(0)
      // exact path segment: "_bucket=1" must not also exclude _bucket=10..15
      val untouched = before.keySet.filterNot(_.startsWith(s"_bucket=$bkt/"))
      assert(untouched.nonEmpty, "need untouched buckets for the assertion")
      untouched.foreach { p =>
        assert(after.get(p) == before.get(p), s"untouched node bucket rewritten: $p")
      }
    }

    // empty-collection HNSW: index build succeeds, first insert rebuilds
    val cat2 = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_hnsw_e").toString)
    cat2.generateSchema(SchemaSpec("t", "m", dimension = 8, indexType = "HNSW"))
    cat2.persistIndex("t", "m")
    assert(cat2.hnswExists("t", "m"))
    cat2.insert("t", "m", Seq(EmbeddedVector("a", "alpha doc", "m", Map(), vec(1))))
    val found = cat2.search(SearchRequest("t", "m", vec(1), limit = 5))
    assert(found.success && found.data.head.content == "alpha doc")
  }

  test("churned absorbs keep non-hub out-degree bounded, recall intact") {
    // collision-free generator: 389 is prime and > every n used, so every
    // write in the test stores a DISTINCT vector — exact-match queries
    // cannot tie across keys (the shared period-97 fixture reuses vectors
    // after heavy churn, which made spot-checks ambiguous)
    def cvec(n: Int): Seq[Double] =
      (0 until 8).map(i => ((n * 37 + i * 53 + 11) % 389 - 194).toDouble)
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_hnsw_churn").toString)
    // max_absorbs high: this test isolates the per-absorb degree re-prune —
    // the rebuild path must never fire
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, indexType = "HNSW",
      extraProps = Map("hnsw_max_absorbs" -> "1000")))
    cat.insert("t", "m", (0 until 80).map(i =>
      EmbeddedVector(s"k$i", s"chunk $i", "m", Map(), cvec(i))))
    cat.persistIndex("t", "m")
    // sustained churn: each absorb upserts 3 existing keys to MOVED vectors
    // and adds 1 fresh key — the pattern that grew adjacency without bound
    // before the neighbour-shrink (VERDICT r10 "what's wrong" #3)
    for (r <- 0 until 25) {
      val ups = (0 until 3).map { j =>
        val k = (r * 7 + j * 11) % 80
        EmbeddedVector(s"k$k", s"chunk $k", "m", Map(), cvec(100 + r * 4 + j))
      }
      cat.insert("t", "m",
        ups :+ EmbeddedVector(s"f$r", s"fresh $r", "m", Map(), cvec(100 + r * 4 + 3)))
    }
    cat.awaitRebuilds("t", "m") // drain in-flight detached folds (r17)
    val g = cat.loadHnsw("t", "m")
    val entrySrc = g.entries.select(col("doc_id").as("src"))
    val entryDst = g.entries.select(col("doc_id").as("dst"))
    val nonHubDeg = g.edges
      .join(entrySrc, Seq("src"), "left_anti")
      .join(entryDst, Seq("dst"), "left_anti")
      .groupBy("src").agg(count(lit(1)).as("deg"))
    val worst = nonHubDeg.agg(max(col("deg"))).head().getLong(0)
    assert(worst <= 16,
      s"non-hub out-degree grew to $worst under churn (cap 16 = hnsw_max_degree)")
    // recall non-degrading: beam search over the churned graph still finds
    // the exact neighbours of the CURRENT corpus
    val corpus = cat.load("t", "m").select(
      xxhash64(col("flouds_vector_id")).as("doc_id"), col("vector").as("dv"))
    val queries = corpus.orderBy("doc_id").limit(8)
      .select(col("doc_id").as("qid"), col("dv").as("qv"))
    val exact = Knn.search(corpus, queries, SearchParams(limit = 10, outputFields = Nil))
    val approx = Hnsw.search(cat.loadHnsw("t", "m"), queries, k = 10, ef = 64)
    val recall = Ivf.recallVsExact(approx, exact)
    assert(recall >= 0.8, s"post-churn recall $recall")
    // and a key moved in the LAST round is served at its new vector
    val movedKey = (24 * 7) % 80
    val hit = cat.search(SearchRequest("t", "m", cvec(100 + 24 * 4), limit = 3))
    assert(hit.success && hit.data.head.content == s"chunk $movedKey")
  }

  test("hnsw_max_absorbs triggers a full rebuild that clears the counter") {
    def vec(seed: Int): Seq[Double] =
      (0 until 8).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
    val cat = new VectorStoreCatalog(spark,
      Files.createTempDirectory("graft_hnsw_rb").toString)
    // window=1: the counter bumps per ABSORB CYCLE — with the default
    // pending window this test would count folds, not inserts
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, indexType = "HNSW",
      extraProps = Map("hnsw_max_absorbs" -> "3", "hnsw_absorb_window" -> "1")))
    cat.insert("t", "m", (0 until 40).map(i =>
      EmbeddedVector(s"k$i", s"chunk $i", "m", Map(), vec(i))))
    cat.persistIndex("t", "m")
    def counter(): Int = {
      val p = java.nio.file.Paths.get(cat.hnswBaseDirOf("t", "m"), "_absorbs.json")
      if (!Files.exists(p)) 0
      else """"count"\s*:\s*"(\d+)"""".r.findFirstMatchIn(Files.readString(p))
        .map(_.group(1).toInt).getOrElse(0)
    }
    assert(counter() == 0, "fresh build must start with a clear counter")
    for (r <- 0 until 3) {
      cat.insert("t", "m",
        Seq(EmbeddedVector(s"n$r", s"new $r", "m", Map(), vec(50 + r))))
      assert(counter() == r + 1, s"absorb ${r + 1} must bump the counter")
    }
    // 4th insert: counter at the cap → a full rebuild is SCHEDULED (r12:
    // detached from the insert) and the debt clock resets at schedule time;
    // the batch itself is absorbed into the serving graph immediately
    cat.insert("t", "m",
      Seq(EmbeddedVector("n3", "new 3", "m", Map(), vec(53))))
    assert(counter() == 0, "scheduling the rebuild must reset the absorb counter")
    val preHit = cat.search(SearchRequest("t", "m", vec(53), limit = 3))
    assert(preHit.success && preHit.data.head.content == "new 3",
      "the triggering batch must be served before the detached rebuild lands")
    cat.awaitRebuilds("t", "m")
    assert(counter() == 0, "a completed rebuild with no backlog owes no debt")
    val hit = cat.search(SearchRequest("t", "m", vec(53), limit = 3))
    assert(hit.success && hit.data.head.content == "new 3",
      "the batch that triggered the rebuild must be in the rebuilt graph")
  }
}
