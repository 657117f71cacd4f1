package graft.streaming

import graft.operators.TextAnalysis
import graft.sources.DedupIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming corpus CURATION — the online form of the batch
  * quality+dedup+scrub pipeline ([[TextAnalysis.curate]],
  * [[DedupIndex.ingestDeduped]]): a crawl stream is scrubbed, quality-gated,
  * near-dup-gated against everything already accepted, and the survivors are
  * committed, one micro-batch at a time.
  *
  * Per trigger:
  *   1. PII scrub — redact emails/phones in place (codegen'd regexes,
  *      map-side only);
  *   2. quality gate — drop docs under `minQuality` (the
  *      [[TextAnalysis.quality]] score, map-side only);
  *   3. near-dup gate — [[DedupIndex.ingestDeduped]] drops docs whose LSH
  *      similarity against the ACCEPTED corpus reaches `threshold`, admits
  *      the survivors into the persisted index (O(batch) band-pruned query
  *      + O(batch) upsert — the index, not the corpus, carries the state);
  *   4. commit — survivors merge into the bucketed curated table
  *      ([[Ingest.mergeIntoParquet]]: only touched buckets rewritten).
  *
  * State across triggers lives entirely in the two on-disk stores (dedup
  * index + curated table), both crash-healing — the stream itself keeps no
  * executor state, so a restart resumes from the checkpoint with nothing to
  * rebuild. At 100 TB the same topology holds: steps 1–2 are embarrassingly
  * parallel, step 3 is bounded by batch size and band fan-out, step 4 by
  * touched buckets.
  */
object CurateStream {

  /** Start the curation stream. `stream` needs (doc_id, text) plus any
    * payload columns, which survive to the curated table.
    *
    * The quality gate is the [[TextAnalysis.quality]] score by default;
    * passing `gopherMinWords` switches it to the [[TextAnalysis.gopherRules]]
    * conjunction (the published heuristic gate) with that word-count floor —
    * still map-side either way.
    */
  def start(spark: SparkSession, stream: DataFrame, indexDir: String,
      curatedPath: String, minQuality: Double = 0.5, threshold: Double = 0.75,
      checkpoint: Option[String] = None, nBuckets: Int = 16,
      gopherMinWords: Option[Long] = None): StreamingQuery = {
    val writer = stream.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        curateBatch(spark, batch.toDF(), indexDir, curatedPath, minQuality,
          threshold, nBuckets, gopherMinWords)
      }
    checkpoint.fold(writer)(cp => writer.option("checkpointLocation", cp)).start()
  }

  /** One curation micro-batch (also the batch-backfill entry point). */
  def curateBatch(spark: SparkSession, batch: DataFrame, indexDir: String,
      curatedPath: String, minQuality: Double, threshold: Double,
      nBuckets: Int = 16, gopherMinWords: Option[Long] = None): Unit = {
    if (batch.isEmpty) return
    val scrubbed = batch.withColumn("text",
      regexp_replace(
        regexp_replace(col("text"), TextAnalysis.EmailRe, "<EMAIL>"),
        TextAnalysis.PhoneRe, "<PHONE>"))
    val gated = gopherMinWords match {
      case Some(minWords) => scrubbed.join(
        TextAnalysis.gopherRules(scrubbed, minWords = minWords)
          .filter(col("keep") === 1L).select("doc_id"),
        Seq("doc_id"), "left_semi")
      case None => scrubbed
        .join(TextAnalysis.quality(scrubbed).select("doc_id", "quality"), "doc_id")
        .filter(col("quality") >= minQuality).drop("quality")
    }
    val good = gated.localCheckpoint()
    val survivors = DedupIndex.ingestDeduped(spark, indexDir,
      good.select("doc_id", "text"), threshold, nBuckets)
    val out = good.join(survivors.select("doc_id"), Seq("doc_id"), "left_semi")
    if (!out.isEmpty)
      Ingest.mergeIntoParquet(spark, out, curatedPath, "doc_id", nBuckets)
  }
}
