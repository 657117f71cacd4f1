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
  * The facade insert contract is request-sized (≤1000 validated rows with a
  * driver-side batch — the reference's own insert shape,
  * vector_store.py:292-404), so each micro-batch is collected and chunked to
  * the insert limit; duplicate keys inside one micro-batch keep the LAST
  * occurrence (stream order wins, as a later upsert would).
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
        val rows = batch
          .select(col("key"), col("chunk"), col("metadata"), col("vector"))
          .collect()
          .map { r =>
            EmbeddedVector(r.getString(0), r.getString(1), model,
              Option(r.getMap[String, String](2)).map(_.toMap).getOrElse(Map.empty),
              r.getSeq[Double](3))
          }
        // last occurrence of a key wins within the micro-batch
        val deduped = rows.zipWithIndex.groupBy(_._1.key)
          .map { case (_, occ) => occ.maxBy(_._2) }.toSeq
          .sortBy(_._2).map(_._1)
        deduped.grouped(graft.operators.Upsert.MaxBatch)
          .foreach(b => cat.insert(tenant, model, b.toSeq, partition))
      }
    checkpoint.fold(writer)(cp => writer.option("checkpointLocation", cp)).start()
  }
}
