package graft.operators

import graft.functions.{Text, Vec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * Scale design: the corpus side stays fully distributed — queries are the
  * broadcast side of a nested-loop join (`broadcast(queries)`), scores are
  * codegen'd higher-order expressions, and the top-k is a per-qid window. At
  * 100 TB the window shuffle is rank-bounded per query (qid count is small),
  * so the shuffle payload is corpus_rows × query_count scored pairs reduced by
  * map-side `rank <= fetchK` pruning — see [[TopK.perKey]] for the
  * partial-top-k variant used when query count is large.
  */
object Knn {

  /** corpus: (doc_id, dv, [chunk], [meta], …); queries: (qid, qv).
    * Returns (qid, rank, doc_id, score, outputFields…).
    */
  def search(corpus: DataFrame, queries: DataFrame, p: SearchParams): DataFrame = {
    require(p.limit >= 1 && p.limit <= 100, "limit 1-100")
    require(p.offset >= 0 && p.offset <= 100, "offset 0-100")

    val overFetch = if (p.textFilter.exists(_.trim.nonEmpty)) p.increaseLimitForTextSearch else 0
    val fetchK    = p.offset + p.limit + overFetch

    val raw = Vec.score(p.metric, col("qv"), col("dv"))
    val ord =
      if (Vec.higherIsBetter(p.metric)) Seq(col("rawScore").desc, col("doc_id").asc)
      else Seq(col("rawScore").asc, col("doc_id").asc)
    val w = Window.partitionBy(col("qid")).orderBy(ord: _*)

    var df = corpus
      .crossJoin(broadcast(queries))
      .withColumn("rawScore", raw)

    // Range search (A3, vector_store.py:501-503) restricts by score band
    // before ranking — the engine-side part of the reference's radius /
    // range_filter params.
    df = p.rangeFilter.fold(df) { case (lo, hi) =>
      if (Vec.higherIsBetter(p.metric))
        df.filter(col("rawScore") >= lo && col("rawScore") <= hi)
      else df.filter(col("rawScore") <= hi && col("rawScore") >= lo)
    }

    df = df
      .withColumn("annRank", row_number().over(w))
      .filter(col("annRank") <= fetchK && col("annRank") > p.offset)

    // P2: score threshold (reference drops hits below threshold client-side).
    df = p.scoreThreshold.fold(df)(t => df.filter(col("rawScore") >= t))

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

    // A4: final truncate to `limit` in ANN-rank order; re-rank for output.
    val wf = Window.partitionBy(col("qid")).orderBy(col("annRank").asc)
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
