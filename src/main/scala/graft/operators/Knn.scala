package graft.operators

import graft.functions.{Text, VecExprs}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Search knobs, mirroring the reference's `SearchEmbeddedRequest`
  * (`/root/reference/app/models/search_request.py:49-131`). Caps follow the
  * reference: limit ≤ 100 (`vector_store.py:457`), offset 0–100, over-fetch
  * default +10 (`vector_store.py:483-490`).
  */
final case class SearchParams(
    metric: String = "COSINE",
    limit: Int = 10,
    offset: Int = 0,
    scoreThreshold: Option[Double] = None,
    roundDecimal: Int = -1,
    textFilter: Option[String] = None,
    minimumWordsMatch: Int = 2,
    includeStopWords: Boolean = false,
    increaseLimitForTextSearch: Int = 10,
    metaFilter: Map[String, String] = Map.empty,
    metaRequired: Boolean = false,
    rangeFilter: Option[(Double, Double)] = None, // (range_filter, radius)
    /** Dynamic-field filter: CI substring conjunction over the `extra` map
      * column (enable_dynamic_field parity, base_milvus.py:996,1071).
      */
    extraFilter: Map[String, String] = Map.empty,
    outputFields: Seq[String] = Seq("chunk", "meta"))

/** Exact K-nearest-neighbour search + the reference's client-side post-filter
  * pipeline, as one declarative Spark plan.
  *
  * Reference pipeline (`/root/reference/app/milvus/vector_store.py:519-592`):
  * ANN top-(limit+Δ) → score threshold (P2) → text filter (P3/P4) →
  * meta_required (P6) → meta filter (P5) → truncate (A4). We reproduce the
  * *lossy* semantics faithfully: filters run AFTER the top-k cut, so filtered
  * rows reduce the result count rather than being refetched.
  *
  * Scale design:
  *  - queries are the broadcast side of a nested-loop join; the corpus side
  *    streams fully distributed and is never shuffled for scoring;
  *  - per-row norms are computed ONCE per corpus row / query (not per pair);
  *    the per-pair kernel is a single codegen'd dot product ([[VecExprs]]);
  *  - L2 uses the exact integer identity |q−d|² = |q|² − 2⟨q,d⟩ + |d|²;
  *  - the top-k cut is [[TopK.perKey]]: per-partition bounded heaps then a
  *    window over ≤ k·|queries|·partitions rows — no full sort/shuffle of
  *    the scored pairs.
  */
object Knn {

  /** Raw metric score from precomputed norms + codegen dot product.
    * Bitwise-identical to the naive Σ formulations for integer-valued
    * vectors (exact integer partial sums).
    */
  def rawScore(metric: String): Column = metric match {
    case "COSINE" => col("dotp") / (sqrt(col("nq2")) * sqrt(col("nd2")))
    case "L2"     => sqrt(col("nq2") - lit(2.0) * col("dotp") + col("nd2"))
    case "IP"     => col("dotp")
    case m        => throw new IllegalArgumentException(s"metric $m (want COSINE|L2|IP)")
  }

  def higherIsBetter(metric: String): Boolean = metric != "L2"

  /** Query broadcasts created by [[fusedCandidates]] on the current thread,
    * held WEAKLY (a strong ref here would pin them against the
    * ContextCleaner's GC-driven reaping, the fallback path for callers that
    * never release). The eager facade entry points
    * (`VectorStoreCatalog.search`/`searchBatch`) call
    * [[releaseFusedBroadcasts]] right after collecting their result, so a
    * long-lived serving driver does not accumulate one broadcast per search
    * until a driver GC happens to run. Callers that keep the returned
    * DataFrame LAZY (e.g. `searchDf` library users) must either collect +
    * release themselves or run with `spark.cleaner.periodicGC.interval` set
    * low (as Bench/Verify do — see SCALE.md).
    */
  private val pendingBroadcasts =
    new ThreadLocal[scala.collection.mutable.ArrayBuffer[
        java.lang.ref.WeakReference[org.apache.spark.broadcast.Broadcast[_]]]] {
      override def initialValue() = scala.collection.mutable.ArrayBuffer.empty
    }

  /** Scope marker for [[releaseFusedBroadcasts]]: the facade takes a mark
    * at ENTRY and releases only broadcasts registered after it — a library
    * caller that built a lazy `searchDf` plan earlier on the same thread
    * must not have that plan's still-referenced broadcast destroyed by an
    * unrelated facade call (its later evaluation would fail with a
    * destroyed-broadcast SparkException).
    */
  def fusedBroadcastMark(): Int = pendingBroadcasts.get().size

  /** Destroy the fused-scan query broadcasts created on THIS thread since
    * `mark` (default: all of them). Safe only once their consuming action
    * has run (the facade collects first); destroying a broadcast a
    * still-lazy plan references would fail that plan's later evaluation.
    */
  def releaseFusedBroadcasts(mark: Int = 0): Unit = {
    val buf = pendingBroadcasts.get()
    val from = math.min(mark, buf.size)
    buf.drop(from).foreach { ref =>
      val bc = ref.get()
      if (bc != null) bc.destroy()
    }
    buf.remove(from, buf.size - from)
  }

  /** Score every (query, corpus) pair: broadcast-nested-loop join with a
    * codegen'd dot kernel. Arrays and norms are dropped from the output —
    * rows entering the top-k prune are narrow.
    */
  def scored(corpus: DataFrame, queries: DataFrame, metric: String): DataFrame = {
    val corpusPrep  = corpus.withColumn("nd2", VecExprs.norm2(col("dv")))
    val queriesPrep = queries.withColumn("nq2", VecExprs.norm2(col("qv")))
    val passthrough = corpus.columns.filter(c => c != "dv" && c != "doc_id").toSeq
    corpusPrep.crossJoin(broadcast(queriesPrep))
      .withColumn("dotp", VecExprs.dot(col("qv"), col("dv")))
      .withColumn("rawScore", rawScore(metric))
      .select((Seq("qid", "doc_id", "rawScore") ++ passthrough).map(col): _*)
  }

  /** Fused scan→score→per-partition-top-k for the full-scan path: one
    * mapPartitions pass keeps a bounded per-query heap while streaming the
    * corpus, so the ≤ |corpus|·|queries| pair rows are NEVER materialized —
    * only ≤ k·|queries| survivors per partition leave the scan. The final
    * exact ranking stays the shared [[TopK.perKey]] window in
    * [[pipeline]] (re-applied over the tiny candidate set).
    *
    * Numerical contract: bitwise-identical to [[scored]] — same
    * left-to-right summation as [[VecExprs.dot]]/[[VecExprs.norm2]], the
    * same score formulas in the same operation order as [[rawScore]], and
    * Spark's double total order (java.lang.Double.compare: NaN largest,
    * -0.0 < 0.0) for the heap, with doc_id as the ascending tie-break —
    * the same order [[TopK.perKey]] ranks by. The optional band is applied
    * with the same total-order semantics as the Column filter; when `band`
    * is None no filter runs (matching pipeline's fold).
    *
    * Queries are collected to the driver and rebroadcast as primitive
    * arrays — the same |queries|·dim·8-byte ceiling as the BNLJ broadcast
    * (SCALE.md "query batch ceiling"). The ceiling is ENFORCED, not
    * assumed: the collect is capped at [[maxFusedQueries]] rows, and a
    * batch past the cap auto-routes to the fully distributed BNLJ plan
    * ([[scored]]; band + top-k re-applied by [[pipeline]], bit-identical
    * results) — mirroring DedupIndex's broadcast cap. The request contract
    * bounds facade batches well under the cap; this guards LIBRARY callers
    * handing an unbounded query DataFrame to [[search]].
    */
  @volatile var maxFusedQueries: Int =
    sys.env.get("GRAFT_KNN_MAX_FUSED")
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
      .filter(v => v > 0 && v < Int.MaxValue) // lenient: a bad value must
      .getOrElse(4096) // not crash the object initializer; overflow-safe +1

  private[graft] def fusedCandidates(corpus: DataFrame, queries: DataFrame,
      metric: String, k: Int, band: Option[(Double, Double)]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cap = maxFusedQueries
    val qRows = queries.select(col("qid").cast("long"), col("qv"))
      .limit(cap + 1).collect()
    if (qRows.length > cap)
      return scored(corpus, queries, metric)
    val qidArr = qRows.map(_.getLong(0))
    val qvArr  = qRows.map(_.getSeq[Double](1).toArray)
    val bc = spark.sparkContext.broadcast((qidArr, qvArr))
    pendingBroadcasts.get() += new java.lang.ref.WeakReference(bc)
    val desc = higherIsBetter(metric)
    val mcode = metric match {
      case "COSINE" => 0
      case "L2"     => 1
      case "IP"     => 2
      case m        => throw new IllegalArgumentException(s"metric $m (want COSINE|L2|IP)")
    }
    val (useBand, lo, hi) = band match {
      case Some((l, h)) => (true, l, h)
      case None         => (false, 0.0, 0.0)
    }
    corpus.select(col("doc_id").cast("long"), col("dv"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val (qids, qvs) = bc.value
        val nQ = qids.length
        val nq2 = new Array[Double](nQ)
        var q = 0
        while (q < nQ) {
          val v = qvs(q); var a = 0.0; var i = 0
          while (i < v.length) { a += v(i) * v(i); i += 1 }
          nq2(q) = a; q += 1
        }
        // (s1,d1) better than (s2,d2): Spark double order on score
        // (desc per metric), then smaller doc_id
        @inline def better(s1: Double, d1: Long, s2: Double, d2: Long): Boolean = {
          val c0 = java.lang.Double.compare(s1, s2)
          val c = if (desc) c0 else -c0
          if (c != 0) c > 0 else d1 < d2
        }
        // bounded heap, worst kept element at root
        val hScore = Array.fill(nQ)(new Array[Double](k))
        val hId    = Array.fill(nQ)(new Array[Long](k))
        val hN     = new Array[Int](nQ)
        def offer(qi: Int, s: Double, d: Long): Unit = {
          val sc = hScore(qi); val id = hId(qi); var n = hN(qi)
          if (n < k) {
            var i = n; sc(i) = s; id(i) = d; n += 1; hN(qi) = n
            while (i > 0 && better(sc((i - 1) / 2), id((i - 1) / 2), sc(i), id(i))) {
              val p = (i - 1) / 2
              val ts = sc(i); sc(i) = sc(p); sc(p) = ts
              val td = id(i); id(i) = id(p); id(p) = td
              i = p
            }
          } else if (better(s, d, sc(0), id(0))) {
            sc(0) = s; id(0) = d
            var i = 0
            var done = false
            while (!done) {
              val l = 2 * i + 1; val r = l + 1
              var w = i // worst of parent/children sits up
              if (l < n && better(sc(w), id(w), sc(l), id(l))) w = l
              if (r < n && better(sc(w), id(w), sc(r), id(r))) w = r
              if (w == i) done = true
              else {
                val ts = sc(i); sc(i) = sc(w); sc(w) = ts
                val td = id(i); id(i) = id(w); id(w) = td
                i = w
              }
            }
          }
        }
        while (it.hasNext) {
          val (docId, dv) = it.next()
          var nd2 = 0.0
          var i = 0
          while (i < dv.length) { val v = dv(i); nd2 += v * v; i += 1 }
          q = 0
          while (q < nQ) {
            val qv = qvs(q)
            val n = math.min(qv.length, dv.length)
            var dot = 0.0
            i = 0
            while (i < n) { dot += qv(i) * dv(i); i += 1 }
            val s =
              if (mcode == 0) dot / (math.sqrt(nq2(q)) * math.sqrt(nd2))
              else if (mcode == 1) math.sqrt(nq2(q) - 2.0 * dot + nd2)
              else dot
            val inBand = !useBand ||
              (java.lang.Double.compare(s, lo) >= 0 && java.lang.Double.compare(s, hi) <= 0)
            if (inBand) offer(q, s, docId)
            q += 1
          }
        }
        (0 until nQ).iterator.flatMap { qi =>
          (0 until hN(qi)).iterator.map(j => (qids(qi), hId(qi)(j), hScore(qi)(j)))
        }
      }
      .toDF("qid", "doc_id", "rawScore")
  }

  /** Score ONLY the given (query, corpus) pairs: `corpusPairs` carries a
    * `qid` column naming which query each candidate row belongs to (e.g. the
    * winners of that query's own probed IVF cells), and the join on qid —
    * queries broadcast — evaluates the same codegen kernel chain as
    * [[scored]], so scores are bit-identical. This is what keeps a BATCH of
    * searches per-query-exact: candidates never leak across queries.
    */
  def scoredPairs(corpusPairs: DataFrame, queries: DataFrame, metric: String): DataFrame = {
    val corpusPrep  = corpusPairs.withColumn("nd2", VecExprs.norm2(col("dv")))
    val queriesPrep = queries.withColumn("nq2", VecExprs.norm2(col("qv")))
    val passthrough = corpusPairs.columns
      .filter(c => c != "dv" && c != "doc_id" && c != "qid").toSeq
    corpusPrep.join(broadcast(queriesPrep), "qid")
      .withColumn("dotp", VecExprs.dot(col("qv"), col("dv")))
      .withColumn("rawScore", rawScore(metric))
      .select((Seq("qid", "doc_id", "rawScore") ++ passthrough).map(col): _*)
  }

  /** corpus: (doc_id, dv, [chunk], [meta], …); queries: (qid, qv). doc_id
    * must be unique (it is the PK). Returns (qid, rank, doc_id, score,
    * outputFields…).
    *
    * LATE MATERIALIZATION: when the corpus carries payload columns
    * (chunk/meta/extra), scoring and the top-k prune run over NARROW
    * (doc_id, dv) rows only, and the payload is joined back for just the
    * ≤ fetchK·|queries| winners (broadcast) before the payload-dependent
    * filters. At 100 TB this is the difference between streaming kilobyte
    * chunk strings through billions of scored pairs and reading them once
    * for a few hundred winners.
    */
  /** Full-scan strategy switch: the fused mapPartitions scan (default —
    * never materializes pair rows) vs the BNLJ + codegen-kernel +
    * PartialTopKExec plan (`GRAFT_KNN=bnlj`; also what [[scored]] callers
    * like the hybrid legs always use). Results are bit-identical
    * (KnnSpec equality incl. NaN/zero-vector ordering); var so specs can
    * exercise both paths in one JVM.
    */
  @volatile var fusedScan: Boolean =
    !sys.env.get("GRAFT_KNN").contains("bnlj")

  def search(corpus: DataFrame, queries: DataFrame, p: SearchParams): DataFrame = {
    // Column-prune the payload to what the request actually touches — a
    // filter it runs or a field it returns. A request needing NO payload
    // (b1 shape: no filters, outputFields=Nil) skips the materialization
    // pass entirely; one that needs `meta` only never reads `chunk`.
    val needed = corpus.columns.filterNot(c => c == "doc_id" || c == "dv")
      .filter(c => p.outputFields.contains(c) ||
        (c == "chunk" && p.textFilter.exists(_.trim.nonEmpty)) ||
        (c == "meta"  && (p.metaFilter.nonEmpty || p.metaRequired)) ||
        (c == "extra" && p.extraFilter.nonEmpty))
    val narrow =
      if (fusedScan) {
        val overFetch =
          if (p.textFilter.exists(_.trim.nonEmpty)) p.increaseLimitForTextSearch else 0
        fusedCandidates(corpus.select("doc_id", "dv"), queries, p.metric,
          p.offset + p.limit + overFetch, p.rangeFilter)
      } else scored(corpus.select("doc_id", "dv"), queries, p.metric)
    if (needed.isEmpty) pipeline(narrow, p)
    else pipeline(narrow, p,
      payload = Some(corpus.select(("doc_id" +: needed).map(col).toIndexedSeq: _*)))
  }

  /** The reference's post-scoring pipeline over ANY pre-scored
    * (qid, doc_id, rawScore, fields…) rows — shared by the full-scan path
    * ([[search]]) and the index-bounded facade path (which pre-scores
    * point-looked-up candidates with [[scoredPairs]]). `payload`, when
    * given, is joined on doc_id AFTER the top-k prune (late
    * materialization) and before the payload-dependent filters.
    */
  def pipeline(scoredDf: DataFrame, p: SearchParams,
      payload: Option[DataFrame] = None): DataFrame = {
    require(p.limit >= 1 && p.limit <= 100, "limit 1-100")
    require(p.offset >= 0 && p.offset <= 100, "offset 0-100")

    val overFetch = if (p.textFilter.exists(_.trim.nonEmpty)) p.increaseLimitForTextSearch else 0
    val fetchK    = p.offset + p.limit + overFetch

    var df = scoredDf

    // Range search (A3, vector_store.py:501-503) restricts by score band
    // before ranking — the engine-side part of radius / range_filter.
    df = p.rangeFilter.fold(df) { case (lo, hi) =>
      df.filter(col("rawScore") >= lo && col("rawScore") <= hi)
    }

    df = TopK.perKey(df, "qid", "rawScore", "doc_id", fetchK,
        desc = higherIsBetter(p.metric))
      .withColumnRenamed("rank", "annRank")
      .filter(col("annRank") > p.offset)

    // P2: score threshold (reference drops hits below threshold client-side).
    df = p.scoreThreshold.fold(df)(t => df.filter(col("rawScore") >= t))

    // Late materialization: the winners are tiny — broadcast them into the
    // payload scan (map-side join, corpus never shuffles).
    payload.foreach(pl => df = pl.join(broadcast(df), "doc_id"))

    // P3/P4: keyword-containment text filter with stopword removal
    // (vector_store.py:888-936). Empty effective word set rejects every row.
    df = p.textFilter.filter(_.trim.nonEmpty).fold(df) { tf =>
      val words = Text.filterWords(tf, p.includeStopWords)
      if (words.isEmpty) df.limit(0)
      else {
        val need    = math.min(words.length, p.minimumWordsMatch)
        val chunkLc = lower(col("chunk"))
        val hits    = words.map(wd => when(chunkLc.contains(wd), 1).otherwise(0))
          .reduce(_ + _)
        df.filter(hits >= need)
      }
    }

    // P6: meta_required — drop rows whose meta is missing/empty/invalid JSON.
    if (p.metaRequired)
      df = df.filter(col("meta").isNotNull &&
        get_json_object(col("meta"), "$").isNotNull &&
        col("meta") =!= "{}")

    // P5: case-insensitive substring conjunction over parsed JSON meta
    // (vector_store.py:871-886). Missing key ⇒ row dropped.
    p.metaFilter.foreach { case (k, v) =>
      val mv = get_json_object(col("meta"), s"$$.$k")
      df = df.filter(mv.isNotNull && lower(mv).contains(v.toLowerCase))
    }

    // Dynamic-field filter: same CI substring conjunction, but over the
    // `extra` MAP column (schema-on-write overflow). Missing key ⇒ dropped.
    p.extraFilter.foreach { case (k, v) =>
      val ev = element_at(col("extra"), k)
      df = df.filter(ev.isNotNull && lower(ev).contains(v.toLowerCase))
    }

    // A4: final truncate to `limit` in ANN-rank order; re-rank for output.
    // (input here is ≤ fetchK·|queries| rows — a plain window is fine)
    val wf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("annRank").asc)
    df = df.withColumn("rank", row_number().over(wf).cast("long"))
      .filter(col("rank") <= p.limit)

    // P8: round_decimal -1..6 (search_request.py:70-75).
    val scoreOut = if (p.roundDecimal >= 0) round(col("rawScore"), p.roundDecimal)
                   else col("rawScore")

    val extra = p.outputFields.filter(f => df.columns.contains(f)).map(col)
    df.select(Seq(col("qid"), col("rank"), col("doc_id"),
      scoreOut.as("score")) ++ extra: _*)
  }
}
