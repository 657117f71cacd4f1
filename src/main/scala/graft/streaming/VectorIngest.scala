package graft.streaming

import graft.api.EmbeddedVector
import graft.sources.VectorStoreCatalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming face of the catalog insert (§2.8 extension — the reference is
  * batch-only; its auto-flush threshold becomes the micro-batch trigger):
  * each micro-batch becomes a validated facade insert, so a stream keeps a
  * collection AND all of its indexes continuously searchable — the
  * bucket-restricted data merge, the incremental BM25 stats delta, and the
  * IVF cell rewrite / HNSW beam-search connect all run per trigger, each
  * O(batch), never O(table).
  *
  * Request-sized micro-batches (≤1000 rows, the reference's own insert
  * shape, vector_store.py:292-404) go through the facade insert — collected
  * and validated row-by-row on the driver. A micro-batch BEYOND that bound
  * takes [[VectorStoreCatalog.insertDf]]: the same commit protocol run
  * directly on the batch DataFrame (distributed validation, last-arrival
  * key dedup, bucket-restricted merge), one commit per trigger, no driver
  * collect of row payloads — the large-stream shape. In both paths
  * duplicate keys inside one micro-batch keep the LAST occurrence (stream
  * order wins, as a later upsert would).
  */
object VectorIngest {

  /** Start ingesting `stream` — columns (key STRING, chunk STRING,
    * metadata MAP<STRING,STRING>, vector ARRAY<DOUBLE>) — into the
    * collection. Returns the running query (caller stops it).
    */
  def start(cat: VectorStoreCatalog, tenant: String, model: String,
      stream: DataFrame, partition: Option[String] = None,
      checkpoint: Option[String] = None): StreamingQuery = {
    // foreachBatch is AT-LEAST-ONCE: after a crash between the insert commit
    // and the offset commit, the micro-batch replays. Keyed collections
    // converge (the replay upserts the same keys); an auto_id collection
    // would mint fresh ids and duplicate every replayed row — reject it.
    require(!cat.autoId(tenant, model),
      s"streaming ingest into auto_id collection $tenant/$model would " +
        "duplicate rows on micro-batch replay (at-least-once delivery); " +
        "use a keyed (VARCHAR-PK) collection for streams")
    val writer = stream.writeStream
      .outputMode("update")
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val b = batch
          .select(col("key"), col("chunk"), col("metadata"), col("vector"))
          .persist()
        try {
          val n = b.count()
          if (n > graft.operators.Upsert.MaxBatch) {
            // large-stream: one distributed commit, payloads never collected
            cat.insertDf(tenant, model, b, partition): Unit
          } else if (n > 0) {
            val rows = b.collect().map { r =>
              EmbeddedVector(r.getString(0), r.getString(1), model,
                Option(r.getMap[String, String](2)).map(_.toMap).getOrElse(Map.empty),
                r.getSeq[Double](3))
            }
            // last occurrence of a key wins within the micro-batch
            val deduped = rows.zipWithIndex.groupBy(_._1.key)
              .map { case (_, occ) => occ.maxBy(_._2) }.toSeq
              .sortBy(_._2).map(_._1)
            deduped.grouped(graft.operators.Upsert.MaxBatch)
              .foreach(g => cat.insert(tenant, model, g.toSeq, partition))
          }
        } finally b.unpersist()
      }
    checkpoint.fold(writer)(cp => writer.option("checkpointLocation", cp)).start()
  }
}
