package graft.streaming

import graft.operators.Upsert
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming ingest — the streaming extension of the reference's
  * buffered insert + flush cycle (SURVEY §2.8: the reference itself is batch
  * only; this is the natural Spark-first extension, flagged as such).
  *
  * `readStream → validate → foreachBatch(MERGE into parquet table)`: each
  * micro-batch is an upsert-by-key commit, i.e. the reference's auto-flush
  * threshold becomes the micro-batch trigger. On a cluster the sink would be
  * Delta `MERGE`; here the same anti-join ∪ batch plan writes parquet.
  */
object Ingest {

  /** Start an upsert stream into `tablePath`. `stream` must contain `key`
    * plus the payload columns. Returns the running query (caller stops it).
    */
  def start(spark: SparkSession, stream: DataFrame, tablePath: String,
      key: String = "key", checkpoint: Option[String] = None): StreamingQuery = {
    val writer = stream.writeStream
      .outputMode("update")
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        mergeIntoParquet(spark, batch.toDF(), tablePath, key)
      }
    checkpoint.fold(writer)(cp => writer.option("checkpointLocation", cp)).start()
  }

  /** One micro-batch commit: read current table (if any), MERGE, atomic swap.
    * Duplicate keys inside a micro-batch keep the latest row (max by a
    * monotonic `seq` column when present, else arbitrary-but-single).
    */
  def mergeIntoParquet(spark: SparkSession, batch: DataFrame, tablePath: String,
      key: String): Unit = synchronized {
    if (batch.isEmpty) return
    val deduped =
      if (batch.columns.contains("seq")) {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(key)).orderBy(col("seq").desc)
        batch.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
      } else batch.dropDuplicates(key)
    val dir = java.nio.file.Paths.get(tablePath)
    val merged =
      if (java.nio.file.Files.exists(dir))
        Upsert.merge(spark.read.parquet(tablePath), deduped, key)
      else deduped
    val tmp = dir.resolveSibling(dir.getFileName.toString + "_tmp_" + System.nanoTime())
    merged.write.mode("overwrite").parquet(tmp.toString)
    val old = dir.resolveSibling(dir.getFileName.toString + "_old_" + System.nanoTime())
    if (java.nio.file.Files.exists(dir)) java.nio.file.Files.move(dir, old)
    java.nio.file.Files.move(tmp, dir)
    if (java.nio.file.Files.exists(old)) graft.sources.VectorStoreCatalog.deleteRec(old)
  }
}
