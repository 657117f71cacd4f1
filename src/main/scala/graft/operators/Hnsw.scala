package graft.operators

import graft.functions.VecExprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-based ANN: a navigable small-world graph with greedy beam search —
  * the engine's HNSW index type (the reference accepts HNSW at
  * `/root/reference/app/models/generate_schema_request.py:113-132`; Milvus
  * builds the Malkov & Yashunin 2016 structure).
  *
  * Spark-first re-expression, documented divergences from hierarchical HNSW:
  *  - ONE graph layer. HNSW's upper layers are a log-scale shortcut to a good
  *    entry point; here the entry set is the per-cell medoids of a coarse
  *    IVF clustering instead (score the ≤nlist entries, start the walk from
  *    the best few). Same role, one distributed table instead of a skip-list.
  *  - The kNN graph is built BLOCKED, never all-pairs: cell-local exact kNN
  *    (cells from [[Ivf.build]], ~64 docs each, keyed self-join) unioned
  *    with multi-table hyperplane-LSH bucket pairs ([[AnnLsh.withBuckets]])
  *    for long-range bridges, then per-node top-m and symmetrization. Every
  *    join is keyed on (cell) or (table,bucket) — the 100 TB shape.
  *  - Search is the standard beam search: seed the beam from the entry
  *    medoids, repeatedly expand the frontier's out-edges, score, keep the
  *    best `ef` per query, stop when no new node enters the beam (or
  *    maxHops). The loop is driver-orchestrated but every step is a
  *    distributed join; per-hop lineage is truncated with localCheckpoint.
  *
  * All scoring uses the codegen kernels and the shared metric arithmetic —
  * bit-identical to [[Knn.scored]], so the facade's exact re-rank of graph
  * candidates gives the same scores the flat path would.
  */
object Hnsw {

  /** nodes: (doc_id, dv); edges: (src, dst) directed, symmetrized;
    * entries: (doc_id, dv) — the per-cell medoids.
    */
  final case class Graph(nodes: DataFrame, edges: DataFrame, entries: DataFrame,
      metric: String) {
    /** Distinct shard count of the medoid table (None = unsharded or
      * legacy null-shard graph). One tiny agg over `entries` (≤ S·nlist
      * rows), memoized per loaded Graph, and consulted ONLY when a finite
      * `routeShards` is set — the default all-seed path never pays the
      * job. Lets an over-provisioned knob (R ≥ S, e.g. `hnsw_route_shards`
      * outliving a re-shard that shrank the graph) cost nothing instead of
      * paying the router's per-query scoring pass + window to filter
      * nothing.
      */
    lazy val shardCount: Option[Long] =
      if (!entries.columns.contains("shard")) None
      else {
        val c = entries.filter(col("shard").isNotNull)
          .agg(countDistinct(col("shard"))).head().getLong(0)
        if (c == 0L) None else Some(c)
      }
  }

  /** The bridge skew guard: drop over-cap (table, bucket) groups before the
    * self-join — keyed count + semi-join, the [[Dedup.lshCandidatePairs]]
    * shape. Package-private so the spec can assert the cap mechanics.
    */
  private[graft] def bridgeBuckets(bucketed: DataFrame, cap: Int): DataFrame = {
    val keep = bucketed.groupBy("table", "bucket")
      .agg(count(lit(1)).as("bsz")).filter(col("bsz") <= cap)
      .select("table", "bucket")
    bucketed.join(keep, Seq("table", "bucket"), "left_semi")
  }

  private def ceilLog2(x: Long): Int =
    if (x <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(x - 1L)

  private def scorePairs(pairs: DataFrame, metric: String): DataFrame =
    pairs
      .withColumn("nd2", VecExprs.norm2(col("a_dv")))
      .withColumn("nq2", VecExprs.norm2(col("b_dv")))
      .withColumn("dotp", VecExprs.dot(col("a_dv"), col("b_dv")))
      .withColumn("s", Knn.rawScore(metric))

  /** Build the graph. `corpus`: (doc_id, dv). `m` = max neighbours per node
    * before symmetrization (HNSW's M).
    *
    * `maxBridgeBucket`: skew guard for the bridge self-join — the same cap
    * [[Dedup.lshCandidatePairs]] threads through its band buckets. A bucket
    * with B rows emits B² bridge pairs, so ONE degenerate LSH bucket
    * (near-constant vectors, zero vectors — every hyperplane sign agrees)
    * would make the build quadratic in that bucket's size. Buckets over the
    * cap are dropped from the BRIDGE source only: their members are so
    * mutually similar that the cell-local kNN already links them, and
    * connectivity never depends on bridges (hub edges reach every node from
    * its medoid — see below). Bounded: ≤ nTables·2^nPlanes·cap² scored
    * bridge pairs regardless of skew.
    */
  /** `nPlanes` is a FLOOR, not the count used: the effective bridge plane
    * count auto-scales as max(nPlanes, ceil(log2(n/64))) so expected bucket
    * size stays ~64 and the bridge self-join stays linear in n (SCALE.md
    * "build scaling, measured at 10×" — the fixed default was quadratic).
    * An explicit argument therefore RAISES the plane count on small corpora
    * but cannot lower it below the auto-scale on large ones; there is
    * deliberately no opt-out (a sub-scale plane count is a measured
    * quadratic, never a sane regime).
    */
  /** `coarseIter`: KMeans iterations for the coarse cells. The cells only
    * need LOCALITY (similar docs usually share a cell so the cell-local kNN
    * finds them), not a converged clustering — connectivity never depends
    * on cell quality (hub edges star every node to its medoid and bridges
    * cross cells), and full-beam exactness is structural. Each KMeans
    * iteration is a driver-synchronized job over the training sample, so on
    * a small corpus the default-20 fit was pure fixed latency — the
    * dominant term of the measured build wall (SCALE.md b13 note).
    */
  def build(corpus: DataFrame, m: Int = 8, metric: String = "COSINE",
      seed: Long = 42L, nTables: Int = 4, nPlanes: Int = 6,
      maxBridgeBucket: Int = 4096, coarseIter: Int = 4,
      stats: Option[(Long, Int)] = None): Graph = {
    val spark = corpus.sparkSession
    // ONE stats job for corpus size AND vector width (a separate
    // select(size(dv)).head() was a second full scheduler round-trip per
    // build); max(size) is exact — every stored vector has the collection
    // dim, enforced at ingest. `stats` = (count, dim) skips even that job
    // when the caller already aggregated it ([[buildSharded]]'s 1-shard
    // degenerate case).
    val (n, dimStat) = stats.getOrElse {
      val r = corpus.agg(count(lit(1)), max(size(col("dv")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0 else r.getInt(1))
    }
    val emptyEdges = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("src", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("dst", org.apache.spark.sql.types.LongType))))
    if (n == 0) return Graph(corpus, emptyEdges, corpus.limit(0), metric)

    if (n == 1) return Graph(corpus, emptyEdges, corpus, metric)

    // Coarse cells: bounded-sample KMeans; ~64 docs per cell (clamped to
    // [2, n] — MLlib KMeans needs 2 ≤ k ≤ points).
    val nlist = math.max(2, math.min(math.min(4096L, n / 64), n).toInt)
    val ivf = Ivf.build(corpus, nlist, metric, seed, maxIter = coarseIter,
      knownCount = Some(n))
    // The cell assignment is a LAZY map-only pass (corpus scan + one fused
    // nearestCentroid loop: n·nlist·dim multiply-adds) and FOUR consumers
    // below read it — both sides of the cell-pair self-join, the entry
    // scoring, and the hub stars. Left lazy each consumer recomputes the
    // full pass; pinned once (DISK_ONLY: lineage kept, a lost block
    // recomputes — the semanticDedup pin's rationale, guide §5), the other
    // three read the materialized rows. Negligible at sf0.1 (~8M flops per
    // pass), 3 saved corpus-wide assignment passes at production nlist/dim.
    // Lifetime is the returned Graph's (edges/entries plans reference it);
    // the ContextCleaner reclaims the blocks when the caller drops it.
    val clustered = ivf.clustered
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)

    // Cell-local candidate pairs (keyed on centroid_id), both directions.
    val c = clustered.select(col("centroid_id"),
      col("doc_id").as("a_id"), col("dv").as("a_dv"))
    val c2 = clustered.select(col("centroid_id"),
      col("doc_id").as("b_id"), col("dv").as("b_dv"))
    val cellPairs = c.join(c2, "centroid_id")
      .filter(col("a_id") =!= col("b_id"))
      .select("a_id", "a_dv", "b_id", "b_dv")

    // Long-range bridges: multi-table hyperplane-LSH bucket pairs (keyed on
    // (table, bucket)) — connects near-duplicate regions across cells.
    // nPlanes must GROW with the corpus: a fixed 2^nPlanes bucket count
    // means bucket size n/2^nPlanes, and the bucket self-join emits
    // size² pairs per bucket — quadratic in n (measured: b13 slope 1.28
    // at 10× with the fixed default). Scaling planes to hold ~64 docs per
    // expected bucket keeps bridge volume ≈ nTables·n·64 — linear — while
    // bucket-local similarity only sharpens with more planes (bridges are
    // a recall supplement; connectivity rides on the hub edges).
    val nPlanesEff = math.max(nPlanes, ceilLog2(math.max(1L, n / 64)))
    val dim = dimStat
    val b0 = AnnLsh.withBuckets(corpus.select(col("doc_id"), col("dv").as("qv")),
      "doc_id", nTables, nPlanesEff, dim)
    val b = bridgeBuckets(b0, maxBridgeBucket)
    val bridgePairs = b.select(col("table"), col("bucket"),
        col("doc_id").as("a_id"), col("qv").as("a_dv"))
      .join(b.select(col("table"), col("bucket"),
        col("doc_id").as("b_id"), col("qv").as("b_dv")), Seq("table", "bucket"))
      .filter(col("a_id") =!= col("b_id"))
      .select("a_id", "a_dv", "b_id", "b_dv")

    // Per-node top-m outgoing edges from the blocked candidates. The same
    // pair can surface from the cell join AND several LSH tables — dedup
    // before top-m, or one neighbour occupies multiple of src's m slots and
    // crowds out distinct neighbours (degrading graph recall). Scoring runs
    // FIRST (map-side, no exchange), so the dedup shuffle moves (id, id,
    // score) rows, never rows carrying two dim-length vectors.
    val scored = scorePairs(cellPairs.unionByName(bridgePairs), metric)
      .select(col("a_id").as("src"), col("b_id").as("dst"), col("s"))
      .dropDuplicates("src", "dst")
    val top = TopK.perKey(scored, "src", "s", "dst", m,
        desc = Knn.higherIsBetter(metric))
      .select("src", "dst")

    // Entry medoids: per cell, the node nearest its centroid.
    val entryScored = scorePairs(clustered
        .join(broadcast(ivf.centroids), "centroid_id")
        .select(col("centroid_id"), col("doc_id"), col("dv"),
          col("dv").as("a_dv"), col("center").as("b_dv")), metric)
    val bestPerCell =
      if (Knn.higherIsBetter(metric))
        expr("max_by(struct(doc_id, dv), struct(s, -doc_id))")
      else
        expr("min_by(struct(doc_id, dv), struct(s, doc_id))")
    val entryByCell = entryScored.groupBy("centroid_id")
      .agg(bestPerCell.as("best"))
      .select(col("centroid_id"),
        col("best.doc_id").as("entry_id"), col("best.dv").as("entry_dv"))

    // Connectivity guarantees a bare kNN graph lacks (it fragments into
    // islands): HUB edges — every node ↔ its cell's medoid — bound the walk
    // diameter (~4: node → medoid → medoid' → node') and make every node
    // reachable from the entry set; the medoids themselves get their own
    // kNN-m graph (≤ nlist² scored pairs, build-time only).
    val star = clustered.join(broadcast(entryByCell), "centroid_id")
      .filter(col("doc_id") =!= col("entry_id"))
      .select(col("doc_id").as("src"), col("entry_id").as("dst"))
    val entryPairs = entryByCell
      .select(col("entry_id").as("a_id"), col("entry_dv").as("a_dv"))
      .crossJoin(entryByCell
        .select(col("entry_id").as("b_id"), col("entry_dv").as("b_dv")))
      .filter(col("a_id") =!= col("b_id"))
    val entryTop = TopK.perKey(
        scorePairs(entryPairs, metric)
          .select(col("a_id").as("src"), col("b_id").as("dst"), col("s")),
        "src", "s", "dst", m, desc = Knn.higherIsBetter(metric))
      .select("src", "dst")

    // Symmetrize everything (an HNSW node keeps its reverse links too).
    val fwd = top.unionByName(star).unionByName(entryTop)
    val edges = fwd.unionByName(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()

    Graph(corpus, edges,
      entryByCell.select(col("entry_id").as("doc_id"), col("entry_dv").as("dv")),
      metric)
  }

  /** Sharded graph build — the prescribed arm for corpora past the
    * single-graph regime boundary (the nlist clamp: one graph's cell-local
    * kNN term is n·(n/4096) past ~262k docs — SCALE.md "known scale
    * limits"). Shards are doc_id-hash slices (pmod(doc_id, S)), so each is
    * a UNIFORM sample of the corpus and each shard graph is an independent
    * small-world sized back inside the clamp regime
    * (S = ceil(n/shardTarget)).
    *
    * The union of shard graphs IS a servable [[Graph]], unchanged search
    * machinery: edges stay shard-local (no cross-shard links are needed)
    * because the entry medoids of EVERY shard seed each query's beam —
    * the walk explores all shards simultaneously and the per-query
    * ef-beam/top-k merge is exactly the ranked-list fan-out+merge of
    * distributed ANN serving. Recall matches the unsharded graph within
    * spec bounds (HnswSpec): a query's true top-k is split across shards
    * by the hash, and each shard recovers its own members independently —
    * sharding never makes a neighbour harder to reach, it only removes
    * CROSS-shard edges that beam search would not need (each shard seeds
    * from its own medoids).
    *
    * Cost: S independent builds of ~shardTarget docs — linear total, each
    * inside the clamp regime — submitted from `buildParallelism` scheduler
    * threads (a build's wall is dominated by driver-synchronized job
    * latency, KMeans iterations above all, so concurrent shard builds
    * interleave their job chains on the same executors; results are
    * seed-deterministic and independent of scheduling). Graph construction
    * only — the DataFrames composing each shard's plan are lazy, so the
    * concurrency materializes when the caller writes/counts the union.
    * Each shard gets its own KMeans seed (inits must not correlate).
    */
  def buildSharded(corpus: DataFrame, m: Int = 8, metric: String = "COSINE",
      seed: Long = 42L, shardTarget: Int = 200000,
      buildParallelism: Int = 4): Graph = {
    // shardTarget is a user-settable collection property (hnsw_shard_target):
    // ceil(n/0) would fan out ~2^31 shard futures — fail fast instead
    require(shardTarget > 0, s"shardTarget must be positive, got $shardTarget")
    // one stats job either way: the degenerate 1-shard case hands (n, dim)
    // straight to build() instead of re-aggregating
    val statsRow = corpus.agg(count(lit(1)), max(size(col("dv")))).head()
    val n = statsRow.getLong(0)
    val dim = if (statsRow.isNullAt(1)) 0 else statsRow.getInt(1)
    val s = math.max(1, math.ceil(n.toDouble / shardTarget.toDouble).toInt)
    if (s == 1) return build(corpus, m, metric, seed, stats = Some((n, dim)))
    // build() itself runs eager jobs (stats agg, KMeans fit), so the
    // fan-out must be thread-level, not plan-level
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(s, buildParallelism)))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    // PoolPinned: a sharded build runs both as foreground DDL and inside
    // the weight-1 rebuild pool — the submitting thread's scheduler pool
    // must ride onto the fan-out workers, not their creation-time snapshot
    val sc = corpus.sparkSession.sparkContext
    val shards =
      try scala.concurrent.Await.result(
        scala.concurrent.Future.sequence((0 until s).map { i =>
          graft.core.PoolPinned.future(sc)(
            build(corpus.filter(pmod(col("doc_id"), lit(s)) === i), m, metric,
              seed + i))
        }), scala.concurrent.duration.Duration.Inf)
      finally pool.shutdown()
    // entries carry their shard id so serving can ROUTE a query to its
    // nearest shards ([[search]]'s routeShards) instead of seeding all S —
    // at hundreds of shards all-shard seeding grows the per-query beam
    // linearly in S. Absent (the unsharded build, pre-existing persisted
    // graphs) the column reads as null and routing degrades to all-seed.
    Graph(corpus,
      shards.map(_.edges).reduce(_.unionByName(_)),
      shards.zipWithIndex.map { case (sg, i) =>
        sg.entries.withColumn("shard", lit(i.toLong))
      }.reduce(_.unionByName(_)),
      metric)
  }

  /** Degree re-pruning for incrementally absorbed graphs — HNSW's
    * neighbour-shrink (Malkov & Yashunin 2016 §4, SELECT-NEIGHBORS on
    * overflow), batched. Insert absorption appends symmetric edges, so a
    * node's adjacency grows without bound under sustained churn: hub
    * degrees inflate every beam expansion and stale links accumulate.
    * This caps every OVERFULL node's out-adjacency to its `maxDeg` best
    * neighbours by the graph metric.
    *
    * Hub exemption: edges touching an entry medoid (either endpoint) are
    * connectivity structure, not kNN links — the star topology's whole
    * point is that medoid degree scales with cell size — so they bypass
    * the cap. A non-entry node's out-degree is therefore bounded by
    * maxDeg + its medoid links (≤ a few), and the degree bound the spec
    * asserts is `maxDeg + entryLinks`.
    *
    * Cost shape: the degree count and the split are one pass over `edges`
    * (call it with the TOUCHED buckets only, never the whole graph); only
    * OVERFULL nodes' edges are scored, and `vecsFor` receives exactly the
    * distinct endpoint ids of those edges, so the caller can bucket-restrict
    * its vector lookup — O(overfull·deg), never O(graph).
    *
    * Determinism: ties rank by (score, dst) via [[TopK.perKey]], so reruns
    * prune identically.
    *
    * @param edges    (src, dst) directed adjacency to prune (extra columns
    *                 dropped)
    * @param entryIds (doc_id) — the entry medoids, small (≤ nlist)
    * @param maxDeg   per-node out-adjacency cap (HNSW's m_max; 2·m is the
    *                 customary layer-0 value)
    * @param vecsFor  id table (doc_id) → (doc_id, dv) covering at least
    *                 those ids; rows for other ids are ignored
    */
  def pruneAdjacency(edges: DataFrame, entryIds: DataFrame, maxDeg: Int,
      metric: String, vecsFor: DataFrame => DataFrame): DataFrame = {
    val e = edges.select("src", "dst")
    val srcEntry = entryIds.select(col("doc_id").as("src"))
    val dstEntry = entryIds.select(col("doc_id").as("dst"))
    val hub = e.join(broadcast(srcEntry), Seq("src"), "left_semi")
      .unionByName(
        e.join(broadcast(srcEntry), Seq("src"), "left_anti")
          .join(broadcast(dstEntry), Seq("dst"), "left_semi")
          .select("src", "dst"))
    val normal = e.join(broadcast(srcEntry), Seq("src"), "left_anti")
      .join(broadcast(dstEntry), Seq("dst"), "left_anti")
    val over = normal.groupBy("src").agg(count(lit(1)).as("deg"))
      .filter(col("deg") > maxDeg).select("src")
    val keepSmall = normal.join(over, Seq("src"), "left_anti")
    val candidates = normal.join(over, Seq("src"), "left_semi").localCheckpoint()
    val ids = candidates.select(col("src").as("doc_id"))
      .unionByName(candidates.select(col("dst").as("doc_id"))).distinct()
    val vecs = vecsFor(ids)
    val scored = scorePairs(
      candidates
        .join(vecs.select(col("doc_id").as("src"), col("dv").as("a_dv")), "src")
        .join(vecs.select(col("doc_id").as("dst"), col("dv").as("b_dv")), "dst"),
      metric).select(col("src"), col("dst"), col("s"))
    val prunedTop = TopK.perKey(scored, "src", "s", "dst", maxDeg,
        desc = Knn.higherIsBetter(metric))
      .select("src", "dst")
    hub.unionByName(keepSmall).unionByName(prunedTop)
  }

  /** Beam search: queries (qid, qv) → (qid, rank, doc_id, score), top-k per
    * query by the graph metric. `ef` is the beam width (HNSW's efSearch);
    * recall grows with ef and the walk stops as soon as a hop adds nothing
    * new to any beam (or after `maxHops`).
    *
    * `allowed` (doc_id column) restricts the RESULT set, not the walk — the
    * standard filtered-ANN shape: the beam traverses the full graph (a
    * filtered beam gets stuck the moment the allowed region is sparse), every
    * scored candidate that passes the filter accumulates into a result pool,
    * and the beam is additionally seeded from allowed nodes so a small or
    * far-away allowed set is always reachable (never starved by the global
    * top-ef, which is what a post-hoc filter over the unfiltered top-k does).
    */
  /** `earlyStop = false` runs exactly `maxHops` hops without the per-hop
    * frontier-emptiness probe — RESULT-IDENTICAL (an empty frontier adds
    * no neighbours, so extra hops are no-ops), but each probe is a
    * driver-synchronized job: on a fixed-small-hop walk (the insert
    * absorb's connect search) the probes were half the fixed latency.
    * Early stop stays the serving default, where beams often converge
    * before maxHops and the probe saves whole hop jobs.
    */
  /** `routeShards = R` (sharded graphs only): seed each query's beam from
    * the entries of its R nearest SHARDS (shard distance = its best entry-
    * medoid score for that query) instead of every shard's entries — the
    * scale path for S in the hundreds, where all-shard seeding grows each
    * query's beam linearly in S. The default (Int.MaxValue) and any R ≥ S
    * are EXACTLY the all-shard walk (q_hnsw_sharded stays bit-exact);
    * smaller R trades recall for a beam bounded by R·nlist seeds
    * (HnswSpec pins the recall floor vs all-shard seeding). Entries
    * without a shard id (unsharded graphs, pre-routing persisted graphs)
    * always seed.
    */
  /** `cacheGraph = true` persists nodes+edges for the duration of the hop
    * loop: every hop joins the frontier against BOTH tables, so an
    * uncached walk re-reads the full graph maxHops times. OPT-IN, off by
    * default: measured NEUTRAL locally even at the 1M-doc point (the OS
    * page cache absorbs the re-scans) and a 10–15% cost on small graphs
    * (the persist materialization pass) — SCALE.md "Request-scoped graph
    * caching". Turn it on where the re-reads are real I/O: executors
    * pulling the graph from an object store per hop. The cache is
    * request-scoped (unpersisted before return; the returned top-k frame
    * depends only on the checkpointed walk state).
    */
  def search(g: Graph, queries: DataFrame, k: Int, ef: Int = 64,
      maxHops: Int = 8, allowed: Option[DataFrame] = None,
      earlyStop: Boolean = true, routeShards: Int = Int.MaxValue,
      cacheGraph: Boolean = false): DataFrame =
    searchImpl(g, queries, k, ef, maxHops, allowed, broadcastQueries = true,
      earlyStop = earlyStop, routeShards = routeShards, cacheGraph = cacheGraph)

  /** Bulk graph search: identical algorithm and results to [[search]]
    * (BulkHnswSpec: row-identical at full and partial beam), but the query
    * table attaches to each hop's candidates by a SHUFFLE join keyed on qid
    * instead of a broadcast — a million-query batch is not broadcastable,
    * and the hop amortization is already built in (each hop's joins serve
    * EVERY query; the hop count is bounded by the graph diameter, not the
    * query count). The query prep is materialized once so the source is
    * not re-scanned every hop.
    */
  def searchBulk(g: Graph, queries: DataFrame, k: Int, ef: Int = 64,
      maxHops: Int = 8, allowed: Option[DataFrame] = None,
      routeShards: Int = Int.MaxValue, cacheGraph: Boolean = false): DataFrame =
    searchImpl(g, queries, k, ef, maxHops, allowed, broadcastQueries = false,
      earlyStop = true, routeShards = routeShards, cacheGraph = cacheGraph)

  /** The hop loop keeps ONE combined state table per hop —
    * (qid, doc_id, s, af, best, fr), one row per (qid, doc_id) the walk has
    * ever scored — instead of the four separate checkpointed frames
    * (best / pool / frontier / visited) of the r5–r13 shape. Each hop is
    * therefore exactly TWO driver-synchronized jobs (the state checkpoint
    * and the cheap frontier-emptiness probe on the checkpointed result)
    * instead of five; on the insert-absorb path (b6i — a fixed per-batch
    * job chain) this halves the beam search's fixed latency, and the
    * serving paths (b14) win the same job count.
    *
    * Row-identical to the old shape, proof sketch:
    *  - best: iterated `top_ef(best ∪ new)` equals `top_ef(all scored)` —
    *    a row evicted at hop t had ef better rows then, all of which remain
    *    scored forever, so it can never re-enter; and a row in the global
    *    top-ef was never evictable. The per-hop window rank over all
    *    scored rows computes exactly that, with the same (s, doc_id) tie
    *    order as [[TopK.perKey]].
    *  - pool: the old per-hop ef-cap only ever discarded rows with ef
    *    better ALLOWED rows already present — rows that can never make the
    *    final top-k (k ≤ ef) — so ranking all allowed scored rows at the
    *    end is equivalent.
    *  - visited/frontier: the state's row set IS the visited set; the
    *    frontier flag marks rows that just entered the beam.
    */
  private def searchImpl(g: Graph, queries: DataFrame, k: Int, ef: Int,
      maxHops: Int, allowed: Option[DataFrame],
      broadcastQueries: Boolean, earlyStop: Boolean,
      routeShards: Int = Int.MaxValue,
      cacheGraph: Boolean = false): DataFrame = {
    val desc = Knn.higherIsBetter(g.metric)
    // Request-scoped graph cache (opt-in; see search()'s scaladoc for the
    // measured local neutrality): the hop loop reads nodes AND edges once
    // per hop (neighbour expansion + vector attach), so an uncached walk
    // pays maxHops full-table reads — a real cost only when those reads
    // are network I/O. Only frames THIS call newly persisted are
    // unpersisted in the finally below (Spark persistence is not
    // reference-counted — blindly unpersisting would evict a cache the
    // CALLER established for its own cross-request reuse); the returned
    // frame reads only the checkpointed walk state either way.
    val cacheNodes = cacheGraph &&
      g.nodes.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val cacheEdges = cacheGraph &&
      g.edges.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val nodesT = if (cacheNodes) g.nodes.persist() else g.nodes
    val edgesT = if (cacheEdges) g.edges.persist() else g.edges
    try {
    val qPrep0 = queries.select(col("qid"), col("qv"),
      VecExprs.norm2(col("qv")).as("nq2"))
    val qPrep = if (broadcastQueries) qPrep0 else qPrep0.localCheckpoint()
    // Adaptive hop-join physicality for bulk batches (guide §3.1): the
    // shuffle-join walk re-exchanges the FULL edges and nodes tables every
    // hop — right for an unbounded query table, pure waste for a bulk batch
    // whose beam state is broadcastable. The batch is already materialized
    // (the checkpoint above), so ONE count decides: if |q|·ef fits the
    // fused-request ceiling (|frontier| ≤ |q|·ef rows; the per-hop
    // neighbour broadcast is bounded by that times the pruned degree), run
    // the request path's broadcast hop joins — the graph tables are then
    // only ever map-side scanned, never shuffled. Row-identical either way
    // (BulkHnswSpec pins bulk ≡ request at full and partial beam); join
    // strategy never changes the walk's row set. Past the ceiling the
    // shuffle plans stay — a million-query batch must not broadcast.
    val bcastQ = broadcastQueries ||
      qPrep.count() * math.max(1L, ef.toLong) <= Knn.maxFusedQueries * 64L

    // (qid, doc_id, dv) → (qid, doc_id, s): per-pair scoring, queries
    // broadcast on the request path / qid-shuffled on the bulk path (same
    // kernel chain as Knn.scoredPairs either way).
    def score(cand: DataFrame): DataFrame = cand
      .withColumn("nd2", VecExprs.norm2(col("dv")))
      .join(if (bcastQ) broadcast(qPrep) else qPrep, "qid")
      .withColumn("dotp", VecExprs.dot(col("qv"), col("dv")))
      .withColumn("s", Knn.rawScore(g.metric))
      .select("qid", "doc_id", "s")

    // Materialize the allowed id set ONCE — the flag join runs per hop, and
    // in the facade `allowed` is a parquet scan + hash over the targeted
    // partition dirs that must not be re-read maxHops times. Deduped so a
    // caller's non-distinct id table cannot duplicate scored rows.
    val allowedIds = allowed.map(_.select("doc_id").distinct().localCheckpoint())
    // af = allowed-flag: whether this scored row may enter the result pool
    def withAllowedFlag(scored: DataFrame): DataFrame = allowedIds match {
      case None => scored.withColumn("af", lit(false))
      case Some(a) =>
        scored.join(a.withColumn("_afHit", lit(true)), Seq("doc_id"), "left")
          .withColumn("af", coalesce(col("_afHit"), lit(false))).drop("_afHit")
    }

    val wBest = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy((if (desc) col("s").desc else col("s").asc) :: col("doc_id").asc :: Nil: _*)

    // Seed: the entry medoids, plus (when filtering) a deterministic slice
    // of the allowed nodes to anchor the beam near the allowed region.
    val entrySeedAll = queries.select("qid")
      .crossJoin(g.entries.select(col("doc_id"), col("dv")))
    // Shard routing: per qid, rank shards by their best entry score and
    // keep ONLY the top-R shards' entries as seeds. The router's cost is
    // one scoring pass over the (qid × entries) pairs — the pairs the seed
    // scores anyway — plus a tiny per-(qid, shard) aggregate; entries are
    // ≤ S·nlist rows and broadcast. Shard-less entries (null shard) always
    // seed: they are structural, not routable. R ≥ S filters nothing, so
    // the default path is untouched (and skipped entirely for speed).
    val entrySeed =
      if (routeShards == Int.MaxValue || !g.entries.columns.contains("shard") ||
          g.shardCount.forall(_ <= routeShards))
        entrySeedAll
      else {
        val shardOf = broadcast(g.entries.select(col("doc_id"), col("shard")))
        val tagged = entrySeedAll.join(shardOf, "doc_id")
        val bestAgg = if (desc) max(col("s")) else min(col("s"))
        val wShard = org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy((if (desc) col("bs").desc else col("bs").asc) ::
            col("shard").asc :: Nil: _*)
        val keepShards = score(entrySeedAll).join(shardOf, "doc_id")
          .filter(col("shard").isNotNull)
          .groupBy("qid", "shard").agg(bestAgg.as("bs"))
          .withColumn("_srn", row_number().over(wShard))
          .filter(col("_srn") <= routeShards)
          .select("qid", "shard")
        tagged.filter(col("shard").isNull)
          .select("qid", "doc_id", "dv")
          .unionByName(tagged
            .join(keepShards, Seq("qid", "shard"), "left_semi")
            .select("qid", "doc_id", "dv"))
      }
    val seedCand = allowedIds.fold(entrySeed) { a =>
      entrySeed.unionByName(queries.select("qid").crossJoin(
        nodesT.join(a, Seq("doc_id"), "left_semi").orderBy("doc_id").limit(ef)))
    }
    var state = withAllowedFlag(score(seedCand.dropDuplicates("qid", "doc_id")))
      .withColumn("_rn", row_number().over(wBest))
      .withColumn("best", col("_rn") <= ef)
      .withColumn("fr", col("_rn") <= ef)
      .select("qid", "doc_id", "s", "af", "best", "fr")
      .localCheckpoint()
    // Request-path joins BROADCAST the beam side into the graph scans: the
    // checkpointed state has no catalyst stats, so without the hint every
    // hop planned the frontier→edges / nbrs→nodes / anti-state joins as
    // sort-merge — shuffling the WHOLE edges table per hop. With the hint
    // each hop is one map-side pass over the (cached or parquet) graph
    // tables plus two small shuffles (distinct, window). The beam side is
    // bounded by |queries|·ef on this path (requests are ≤1000 vectors);
    // the bulk path (unbounded query tables) keeps shuffle joins.
    val bc: DataFrame => DataFrame =
      df => if (bcastQ) broadcast(df) else df
    var hop = 0
    var frontierEmpty = earlyStop && state.filter(col("fr")).isEmpty
    while (hop < maxHops && !frontierEmpty) {
      val frontier = state.filter(col("fr")).select("qid", "doc_id")
      // Neighbour candidates WITHOUT the per-hop distinct + anti-join of
      // the r14–r17 shape: duplicate (qid, doc_id) pairs (multi-edge hits,
      // already-visited nodes) ride through the vector attach and scoring
      // — volume stays bounded by the frontier's out-degree, the walk's
      // intrinsic cost — and ONE hash aggregate below dedups the union.
      // That removes two fixed-latency plan rounds per hop: the distinct
      // exchange inside the neighbour derivation and the anti-join against
      // the full state (a broadcast-build job per hop on the request path,
      // a state-sized shuffle on the bulk path). Row-identical: a
      // re-scored pair is bit-equal to its state copy (same deterministic
      // kernel over the same (qv, dv), and `af` is a function of doc_id),
      // so first() picks among identical values; wasBest folds with OR
      // (max), and rank monotonicity keeps `fr` semantics — a non-best
      // state row's rank only degrades as rows accumulate, so it can never
      // re-enter the frontier, exactly as when the anti-join dropped its
      // re-score.
      val nbrs = bc(frontier)
        .join(edgesT, frontier("doc_id") === edgesT("src"))
        .select(col("qid"), col("dst").as("doc_id"))
      val scoredN = withAllowedFlag(score(bc(nbrs).join(nodesT, "doc_id")))
        .withColumn("wasBest", lit(false))
      val all = state
        .select(col("qid"), col("doc_id"), col("s"), col("af"),
          col("best").as("wasBest"))
        .unionByName(scoredN.select("qid", "doc_id", "s", "af", "wasBest"))
        .groupBy("qid", "doc_id")
        .agg(first(col("s")).as("s"), first(col("af")).as("af"),
          max(col("wasBest")).as("wasBest"))
      state = all
        .withColumn("_rn", row_number().over(wBest))
        .withColumn("best", col("_rn") <= ef)
        .withColumn("fr", col("_rn") <= ef && !col("wasBest"))
        .select("qid", "doc_id", "s", "af", "best", "fr")
        .localCheckpoint()
      frontierEmpty = earlyStop && state.filter(col("fr")).isEmpty
      hop += 1
    }
    val candidates =
      if (allowedIds.isDefined) state.filter(col("af")) else state.filter(col("best"))
    TopK.perKey(candidates.select("qid", "doc_id", "s"), "qid", "s", "doc_id",
        k, desc)
      .select(col("qid"), col("rank"), col("doc_id"), col("s").as("score"))
    } finally {
      // the hop loop materialized every read (localCheckpoint per hop), so
      // the cache has served its purpose; the returned frame reads only
      // the checkpointed state
      if (cacheNodes) nodesT.unpersist(false)
      if (cacheEdges) edgesT.unpersist(false)
    }
  }
}
