package graft.operators

import graft.functions.Vec
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour index — the native
  * replacement for the reference's Milvus IVF_FLAT index
  * (`/root/reference/app/milvus/base_milvus.py:1266-1284`: nlist 1–65536,
  * metric COSINE/L2/IP; probe count `nprobe` capped at 256,
  * `vector_store.py:493-495`).
  *
  * Build (D3): MLlib KMeans(k=nlist) over the corpus vectors → a clustered
  * corpus table (centroid_id, doc_id, dv) and a small centroid table.
  * At 100 TB the clustered table is written bucketed/partitioned by
  * centroid_id so a probe reads only nprobe/nlist of the data — the scan
  * prunes instead of streaming the full corpus past every query.
  *
  * Probe (A1-approx): route each query to its `nprobe` nearest centroids
  * (tiny broadcast join), then score ONLY docs in those cells and take top-k.
  * `nprobe` semantics match the reference: number of cells searched, not a
  * probability.
  */
object Ivf {

  final case class Index(centroids: DataFrame, clustered: DataFrame, metric: String)

  /** Coarse-quantizer training budget: KMeans trains on a deterministic
    * hash-sample of ≈ TrainPerCell·nlist corpus rows (standard IVF practice:
    * cell quality saturates at a few dozen training points per centroid, so
    * training must NOT scale with corpus size — the reference treats index
    * build as an offline DDL step, base_milvus.py:1266-1284). Assignment
    * always covers the full corpus.
    */
  val TrainPerCell = 64

  /** Build the index. `corpus`: (doc_id, dv ARRAY<DOUBLE>).
    * `knownCount`: corpus row count when the caller already aggregated it
    * (Hnsw.build's stats pass) — skips the count job, which is pure fixed
    * latency on the build's driver-synchronized chain.
    */
  def build(corpus: DataFrame, nlist: Int, metric: String = "COSINE",
      seed: Long = 42L, maxIter: Int = 20,
      knownCount: Option[Long] = None): Index = {
    require(nlist >= 1 && nlist <= 65536, "nlist 1-65536")
    val target = TrainPerCell.toLong * nlist
    val n = knownCount.getOrElse(corpus.count())
    // deterministic sample (hash filter, pushed to the scan): seeded so the
    // build is reproducible, independent of partitioning/row order
    val train =
      if (n > 2 * target)
        corpus.filter(pmod(xxhash64(col("doc_id"), lit(seed)),
          lit(math.max(1L, n / target))) === 0L)
      else corpus
    val feats = train.withColumn("features", array_to_vector(col("dv")))
    // "random" init: k-means|| costs several extra passes at high k and IVF
    // cell quality is insensitive to init (probe routing only needs balanced
    // cells, recall is governed by nprobe)
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(maxIter)
      .setInitMode("random")
      .setFeaturesCol("features").fit(feats)
    val spark = corpus.sparkSession
    val centroids = spark.createDataFrame(
        model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }.toSeq)
      .toDF("centroid_id", "center")
    // full-corpus assignment pass (one map-side job; the only part of the
    // build that is — and must be — linear in the corpus). Routed through
    // [[assign]] — the SAME deterministic metric-based rule incremental
    // insert uses — so any row's cell is recomputable from (dv, centroids)
    // alone, which is what lets an upsert delete its old row's cell rows
    // without scanning the index. (It also aligns assignment with probe
    // routing for COSINE/IP, where min-Euclidean and max-similarity differ.)
    buildWithCentroids(corpus, centroids, metric)
  }

  /** Assign every corpus row to its best centroid under `metric` (ties →
    * lowest centroid_id). One map-side-combinable aggregation over the
    * corpus×centroids product (centroids broadcast) — the standard IVF
    * assignment step, reused by the deterministic build and by incremental
    * insert (new vectors are routed to the nearest EXISTING cell, exactly
    * how an inverted file absorbs inserts without a rebuild).
    * Returns (centroid_id, doc_id, dv).
    */
  def assign(corpus: DataFrame, centroids: DataFrame, metric: String): DataFrame = {
    // The centroid table is tiny by construction (≤ nlist rows) — collect it
    // and run assignment as ONE fused codegen loop per corpus row
    // ([[graft.functions.VecExprs.nearestCentroid]]): map-only, no
    // corpus × centroids join, no aggregation, no shuffle. Score arithmetic
    // is bit-identical to Vec.score for integer-valued vectors, and the
    // tie-break (lowest centroid_id) matches the previous
    // max_by(struct(s, -id)) / min_by(struct(s, id)) rule.
    val cents = centroids.select("centroid_id", "center").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toSeq
    if (cents.isEmpty)
      corpus.select(lit(0).cast("int").as("centroid_id"), col("doc_id"), col("dv"))
        .limit(0)
    else
      corpus.select(
        graft.functions.VecExprs.nearestCentroid(col("dv"), cents, metric)
          .as("centroid_id"),
        col("doc_id"), col("dv"))
  }

  /** Deterministic seeded centroids: center_j = synthVec(j*7919 + 13) — a
    * fixed, data-independent codebook both engines (Spark and the DuckDB
    * oracle) can generate bit-identically. Routing quality is far below
    * KMeans, but the IVF *mechanics* (assignment, nprobe routing, cell-pruned
    * scan) are identical — this is what makes `q_ivf_knn` hash-checkable.
    */
  def seededCentroids(spark: org.apache.spark.sql.SparkSession, nlist: Int,
      dim: Int = graft.core.Tables.Dim): DataFrame =
    spark.range(nlist).select(col("id").cast("int").as("centroid_id"),
      graft.core.Tables.synthVec(col("id") * 7919L + 13L, dim).as("center"))

  /** Build an IVF index from externally supplied centroids (seeded codebook
    * or centroids trained elsewhere) — one assignment pass, no KMeans.
    */
  def buildWithCentroids(corpus: DataFrame, centroids: DataFrame,
      metric: String = "COSINE"): Index =
    Index(centroids, assign(corpus, centroids, metric), metric)

  /** IVF_SQ8: the scalar-quantized variant of the index
    * (`/root/reference/app/models/generate_schema_request.py:113-132` accepts
    * IVF_SQ8; Milvus stores each vector component as one byte). Per-dimension
    * affine code: code_i = round((x_i − min_i)/scale_i) ∈ [0,255],
    * scale_i = (max_i − min_i)/255; decode x̂_i = min_i + code_i·scale_i.
    * The clustered table stores the int8-range codes — 8× smaller than
    * float64 storage at 100 TB — and probing scores against decoded
    * vectors (the standard SQ8 trade: small recall loss for 8× less I/O).
    */
  final case class Sq8(centroids: DataFrame, clustered: DataFrame,
      mins: Seq[Double], scales: Seq[Double], metric: String)

  /** Quantize a built (flat) index into SQ8 form. Per-dim min/max is one
    * aggregation over (corpus × dim) exploded rows — build-time only.
    */
  def quantizeIndex(idx: Index): Sq8 = {
    val stats = idx.clustered
      .select(posexplode(col("dv")).as(Seq("pos", "x")))
      .groupBy("pos").agg(min("x").as("mn"), max("x").as("mx"))
      .orderBy("pos").collect()
    val mins   = stats.map(_.getDouble(1)).toIndexedSeq
    val scales = stats.map(r => (r.getDouble(2) - r.getDouble(1)) / 255.0).toIndexedSeq
    val codes = sq8Codes(idx.clustered, mins, scales)
      .select("centroid_id", "doc_id", "codes")
    Sq8(idx.centroids, codes, mins, scales, idx.metric)
  }

  /** Add a `codes` column encoding `dv` with the given SQ8 params (shared by
    * the build and by incremental insert into a persisted SQ8 index).
    */
  def sq8Codes(df: DataFrame, mins: Seq[Double], scales: Seq[Double]): DataFrame = {
    val mArr = typedLit(mins)
    val sArr = typedLit(scales)
    df.withColumn("codes",
      zip_with(col("dv"), sequence(lit(0), lit(mins.length - 1)), (x, i) => {
        val sc = element_at(sArr, i + 1)
        // clamp to the byte range: vectors inserted after the build may fall
        // outside the min/max seen at quantization time
        when(sc === 0.0, lit(0)).otherwise(greatest(lit(0), least(lit(255),
          round((x - element_at(mArr, i + 1)) / sc, 0).cast("int"))))
      }))
  }

  def buildSq8(corpus: DataFrame, nlist: Int, metric: String = "COSINE",
      seed: Long = 42L, maxIter: Int = 20): Sq8 =
    quantizeIndex(build(corpus, nlist, metric, seed, maxIter))

  /** Decode an SQ8 clustered table back to approximate vectors (dv column). */
  def decodeSq8(sq: Sq8): Index = {
    val mArr = typedLit(sq.mins)
    val sArr = typedLit(sq.scales)
    val dv = sq.clustered.withColumn("dv",
      zip_with(col("codes"), sequence(lit(0), lit(sq.mins.length - 1)),
        (c, i) => element_at(mArr, i + 1) + c.cast("double") * element_at(sArr, i + 1)))
      .select("centroid_id", "doc_id", "dv")
    Index(sq.centroids, dv, sq.metric)
  }

  /** Approximate top-k over the SQ8 index: route on true centroids, score on
    * decoded vectors — identical plan shape to [[probe]], 1/8 the scan bytes.
    */
  def probeSq8(sq: Sq8, queries: DataFrame, nprobe: Int, k: Int): DataFrame =
    probe(decodeSq8(sq), queries, nprobe, k)

  /** IVF_PQ: product quantization (Jégou/Douze/Schmid, "Product Quantization
    * for Nearest Neighbor Search", TPAMI 2011 — public knowledge; the
    * reference accepts the index type at
    * `generate_schema_request.py:113-132`). The vector is split into `mSub`
    * subspaces; each subspace gets its own ksub-entry codebook (per-subspace
    * KMeans); a vector is stored as `mSub` small codes — e.g. 8 bytes for a
    * 64-dim float64 vector, a 64× compression. Probing decodes to the
    * concatenation of subspace centroids (codebook lookup) and scores that
    * approximation. This variant quantizes RAW vectors (not residuals
    * against the coarse centroid) — a documented simplification; the coarse
    * routing stage is identical either way.
    *
    * codebooks(m)(code) = the dsub-dim center; tiny
    * (mSub·ksub·dsub doubles), always a broadcast literal.
    */
  final case class Pq(centroids: DataFrame, clustered: DataFrame,
      codebooks: Seq[Seq[Seq[Double]]], metric: String) {
    def mSub: Int = codebooks.length
    def dsub: Int = codebooks.head.head.length
  }

  /** Per-row PQ code for one subspace: argmin-L2 over the codebook, ties →
    * lowest code — a pure expression (codebook is a literal), no join.
    */
  private def pqCode(cb: Seq[Seq[Double]], sv: Column): Column = {
    val dists = transform(typedLit(cb), c =>
      aggregate(zip_with(c, sv, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x))
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** Add a `pqcodes ARRAY<INT>` column encoding `dv`. */
  def pqEncode(df: DataFrame, codebooks: Seq[Seq[Seq[Double]]]): DataFrame = {
    val dsub = codebooks.head.head.length
    df.withColumn("pqcodes", array(codebooks.indices.map(m =>
      pqCode(codebooks(m), slice(col("dv"), lit(m * dsub + 1), lit(dsub)))): _*))
  }

  /** Train per-subspace codebooks and quantize a built (flat) index. */
  def quantizePq(idx: Index, mSub: Int = 8, ksub: Int = 256,
      seed: Long = 42L, maxIter: Int = 10): Pq = {
    val dim = idx.clustered.select(size(col("dv"))).head().getInt(0)
    require(dim % mSub == 0, s"dim $dim not divisible by mSub $mSub")
    val dsub = dim / mSub
    val codebooks = (0 until mSub).map { m =>
      val feats = idx.clustered
        .select(array_to_vector(slice(col("dv"), lit(m * dsub + 1), lit(dsub))).as("features"))
      val kEff = math.min(ksub,
        feats.distinct().limit(ksub + 1).count().toInt) // KMeans needs k <= distinct points
      new KMeans().setK(math.max(2, kEff)).setSeed(seed + m).setMaxIter(maxIter)
        .setInitMode("random").setFeaturesCol("features")
        .fit(feats).clusterCenters.map(_.toArray.toSeq).toSeq
    }
    val clustered = pqEncode(idx.clustered, codebooks)
      .select("centroid_id", "doc_id", "pqcodes")
    Pq(idx.centroids, clustered, codebooks, idx.metric)
  }

  def buildPq(corpus: DataFrame, nlist: Int, mSub: Int = 8, ksub: Int = 256,
      metric: String = "COSINE", seed: Long = 42L, maxIter: Int = 20): Pq =
    quantizePq(build(corpus, nlist, metric, seed, maxIter), mSub, ksub, seed)

  /** Decode a PQ clustered table to approximate vectors (codebook lookup —
    * the literal nested array is effectively a broadcast).
    */
  def decodePq(pq: Pq): Index = {
    val cbLit = typedLit(pq.codebooks)
    val dv = pq.clustered.withColumn("dv",
      flatten(zip_with(col("pqcodes"), sequence(lit(0), lit(pq.mSub - 1)),
        (c, i) => element_at(element_at(cbLit, i + 1), c + 1))))
      .select("centroid_id", "doc_id", "dv")
    Index(pq.centroids, dv, pq.metric)
  }

  /** Approximate top-k over the PQ index: route on true centroids, score on
    * codebook reconstructions.
    */
  def probePq(pq: Pq, queries: DataFrame, nprobe: Int, k: Int): DataFrame =
    probe(decodePq(pq), queries, nprobe, k)

  /** [[probePq]] with ASYMMETRIC DISTANCE COMPUTATION (Jégou et al. 2011
    * §5.2): instead of decoding every candidate to a dim-length vector and
    * dotting it, each query precomputes a per-subspace lookup table
    * lut[m][c] = ⟨q_m, codebook[m][c]⟩ (mSub·ksub doubles, computed ONCE
    * per query), and per-candidate scoring collapses to mSub table reads
    * via the [[graft.functions.PqAdc]] codegen kernel. ‖decoded‖² decomposes
    * the same way from a query-INDEPENDENT constant table of per-entry
    * ‖codebook[m][c]‖², so the shared [[Knn.rawScore]] arithmetic applies
    * unchanged (COSINE/L2/IP). Same decoded-vector semantics as [[probePq]];
    * per-pair work drops dim/mSub-fold (only FP summation grouping differs).
    * Ragged codebooks (kEff < ksub) are zero-padded — padded slots are
    * never addressed because codes only index real entries.
    */
  def probePqAdc(pq: Pq, queries: DataFrame, nprobe: Int, k: Int): DataFrame = {
    val routed = route(queries, pq.centroids, pq.metric, nprobe)
    val scored = adcScores(pq.clustered, routed, pq.codebooks, pq.metric)
    TopK.perKey(scored, "qid", "rawScore", "doc_id", k,
        desc = Knn.higherIsBetter(pq.metric))
      .select(col("qid"), col("rank"), col("doc_id"), col("rawScore").as("score"))
  }

  /** The ADC scoring core, shared with the facade's PQ serving path:
    * clusteredCodes (centroid_id, doc_id, pqcodes) ⋈ routed
    * (qid, qv, centroid_id) → (qid, doc_id, rawScore) under `metric`.
    *
    * Plan shape (this is the serving hot path, so the shape is the point):
    * ONE join. The probe side is (centroid_id, qid, lutq, nq2) — one row per
    * (query, probed cell), |queries|·nprobe rows each carrying that query's
    * LUT — broadcast for request-sized query sets, so the candidate stream
    * (centroid_id, doc_id, pqcodes, nd2) never shuffles and never widens:
    * the score is computed inside the post-join projection and only
    * (qid, doc_id, rawScore) rows come out. The query-independent ‖decoded‖²
    * (`nd2`) is computed ONCE per candidate row BEFORE pair formation, not
    * per (query, doc) pair. `broadcastQueries = false` is the bulk-path
    * form (a million-query LUT set must stay distributed; the join then
    * shuffles by centroid_id, still never by pair).
    */
  def adcScores(clusteredCodes: DataFrame, routed: DataFrame,
      codebooks: Seq[Seq[Seq[Double]]], metric: String,
      broadcastQueries: Boolean = true): DataFrame = {
    val mSub = codebooks.length
    val dsub = codebooks.head.head.length
    val ksub = codebooks.map(_.length).max
    val padded: Seq[Seq[Seq[Double]]] = codebooks.map(cb =>
      cb ++ Seq.fill(ksub - cb.length)(Seq.fill(dsub)(0.0)))
    val cbLit = typedLit(padded)
    // per-query dot table: lut[m·ksub + c] = ⟨q_m, cb[m][c]⟩. Computed on
    // the DISTINCT queries — not on `routed`, which has |queries|·nprobe
    // rows and would evaluate this mSub·ksub·dsub interpreted-HOF
    // expression once per probed cell — then joined back to the probed
    // cells (tiny ⋈ tiny).
    val qLut = flatten(zip_with(cbLit, sequence(lit(0), lit(mSub - 1)),
      (cbm, m) => transform(cbm, c =>
        aggregate(
          zip_with(c, slice(col("qv"), m * dsub + 1, lit(dsub)), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x))))
    val qTables = routed.select("qid", "qv").dropDuplicates("qid")
      .withColumn("lutq", qLut)
      .withColumn("nq2", graft.functions.VecExprs.norm2(col("qv")))
      .select("qid", "lutq", "nq2")
    val probes0 = routed.select("qid", "centroid_id").join(qTables, "qid")
    val probes = if (broadcastQueries) broadcast(probes0) else probes0
    // query-independent norm table: ‖cb[m][c]‖² as a plain literal
    val ndLut = typedLit(padded.flatten.map(c => c.map(x => x * x).sum))
    clusteredCodes
      .withColumn("nd2", graft.functions.VecExprs.pqAdc(col("pqcodes"), ndLut))
      .join(probes, "centroid_id")
      .withColumn("dotp", graft.functions.VecExprs.pqAdc(col("pqcodes"), col("lutq")))
      .withColumn("rawScore", Knn.rawScore(metric))
      .select("qid", "doc_id", "rawScore")
  }

  /** THE routing rule, shared by every probe variant and the facade: rank
    * centroids per query by the index metric, ties break on centroid_id
    * (deterministic/oracle-exact), keep the top min(nprobe, 256) cells
    * (reference cap, vector_store.py:495). One definition so tie-breaking
    * can never diverge between the decode/ADC/persisted paths.
    */
  private[graft] def route(queries: DataFrame, centroids: DataFrame,
      metric: String, nprobe: Int): DataFrame = {
    val np = math.min(nprobe, 256)
    val centScore = Vec.score(metric, col("qv"), col("center"))
    val cw = Window.partitionBy("qid").orderBy(
      (if (Vec.higherIsBetter(metric)) centScore.desc else centScore.asc),
      col("centroid_id").asc)
    queries.crossJoin(broadcast(centroids))
      .withColumn("crank", row_number().over(cw))
      .filter(col("crank") <= np)
      .select("qid", "qv", "centroid_id")
  }

  /** Approximate top-k: queries (qid, qv) → (qid, rank, doc_id, score). */
  def probe(index: Index, queries: DataFrame, nprobe: Int, k: Int): DataFrame = {
    val routed = route(queries, index.centroids, index.metric, nprobe)
    // Scan only the probed cells: codegen dot kernel + partial top-k.
    val scored = index.clustered
      .withColumn("nd2", graft.functions.VecExprs.norm2(col("dv")))
      .join(routed.withColumn("nq2", graft.functions.VecExprs.norm2(col("qv"))),
        "centroid_id")
      .withColumn("dotp", graft.functions.VecExprs.dot(col("qv"), col("dv")))
      .withColumn("rawScore", Knn.rawScore(index.metric))
      .select("qid", "doc_id", "rawScore")
    TopK.perKey(scored, "qid", "rawScore", "doc_id", k,
        desc = Knn.higherIsBetter(index.metric))
      .select(col("qid"), col("rank"), col("doc_id"), col("rawScore").as("score"))
  }

  /** Probe a PERSISTED index (clustered table written PARTITIONED BY
    * centroid_id): in addition to the routing join, the probed cell ids
    * (≤ nprobe·|queries| — tiny by construction) are collected and pushed
    * as a static `centroid_id IN (...)` partition filter, so the parquet
    * scan reads only the probed cells' files. This is the IVF "inverted
    * file" realized as partition pruning — at 100 TB the scan touches
    * nprobe/nlist of the data.
    */
  def probePersisted(index: Index, queries: DataFrame, nprobe: Int, k: Int): DataFrame = {
    val routed = route(queries, index.centroids, index.metric, nprobe)
    // tiny by construction: nprobe * |queries| ids
    val cells = routed.select("centroid_id").distinct().collect().map(_.getInt(0))
    val pruned = index.clustered.filter(col("centroid_id").isin(cells.toIndexedSeq: _*))
    val scored = pruned
      .withColumn("nd2", graft.functions.VecExprs.norm2(col("dv")))
      .join(routed.withColumn("nq2", graft.functions.VecExprs.norm2(col("qv"))),
        "centroid_id")
      .withColumn("dotp", graft.functions.VecExprs.dot(col("qv"), col("dv")))
      .withColumn("rawScore", Knn.rawScore(index.metric))
      .select("qid", "doc_id", "rawScore")
    TopK.perKey(scored, "qid", "rawScore", "doc_id", k,
        desc = Knn.higherIsBetter(index.metric))
      .select(col("qid"), col("rank"), col("doc_id"), col("rawScore").as("score"))
  }

  /** Bulk (million-query) variant of [[probePersisted]]: routing stays a
    * JOIN keyed on centroid_id — the driver never collects the probed cell
    * ids, so the plan is fully distributed and |queries| can be arbitrarily
    * large. The static `centroid_id IN (…)` partition filter is deliberately
    * absent: at bulk scale the union of probed cells approaches ALL cells
    * (the IN-list would prune nothing and only burden the driver); the
    * routing join still cell-masks every (query, doc) pair, so results are
    * identical to [[probePersisted]] (spec-asserted). Use probePersisted for
    * request-serving (few queries → few cells → static pruning wins); use
    * this when queries are a large Dataset.
    */
  def probeBulk(index: Index, queries: DataFrame, nprobe: Int, k: Int): DataFrame =
    probe(index, queries, nprobe, k)

  /** Recall@k of the approximate result vs an exact result (both
    * (qid, rank, doc_id)): |approx ∩ exact| / |exact|.
    */
  def recallVsExact(approx: DataFrame, exact: DataFrame): Double = {
    val hit = approx.select("qid", "doc_id")
      .join(exact.select("qid", "doc_id"), Seq("qid", "doc_id"), "left_semi")
      .count()
    hit.toDouble / math.max(exact.count(), 1L)
  }
}
