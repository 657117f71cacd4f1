package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import java.nio.file.{Files, Path, Paths}

/** Structured-Streaming ingest — the streaming extension of the reference's
  * buffered insert + flush cycle (SURVEY §2.8: the reference itself is batch
  * only; this is the natural Spark-first extension, flagged as such).
  *
  * `readStream → validate → foreachBatch(MERGE into parquet table)`: each
  * micro-batch is an upsert-by-key commit, i.e. the reference's auto-flush
  * threshold becomes the micro-batch trigger.
  *
  * Scale shape: the table lives in a hash-bucketed layout (`_bucket =
  * pmod(xxhash64(key), n)` directory partitions, as [[graft.sources.Layout]])
  * and a micro-batch commit reads and rewrites ONLY the buckets its keys hash
  * to — cost per trigger is O(batch + touched buckets), independent of table
  * size, instead of a full-table rewrite per second. Untouched bucket files
  * are byte-identical across a commit (spec-asserted). On a cluster the sink
  * would be Delta `MERGE` with the same bucketing.
  */
object Ingest {

  /** Start an upsert stream into `tablePath`. `stream` must contain `key`
    * plus the payload columns. Returns the running query (caller stops it).
    */
  def start(spark: SparkSession, stream: DataFrame, tablePath: String,
      key: String = "key", checkpoint: Option[String] = None,
      nBuckets: Int = 16): StreamingQuery = {
    val writer = stream.writeStream
      .outputMode("update")
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        mergeIntoParquet(spark, batch.toDF(), tablePath, key, nBuckets)
      }
    checkpoint.fold(writer)(cp => writer.option("checkpointLocation", cp)).start()
  }

  /** One micro-batch commit: bucket the batch, read ONLY the touched bucket
    * partitions of the current table, anti-join ∪ batch, rewrite ONLY those
    * bucket directories (atomic per-directory swap). Duplicate keys inside a
    * micro-batch keep the latest row (max by a monotonic `seq` column when
    * present, else arbitrary-but-single).
    */
  def mergeIntoParquet(spark: SparkSession, batch: DataFrame, tablePath: String,
      key: String, nBuckets: Int = 16): Unit = synchronized {
    if (batch.isEmpty) return
    val deduped =
      if (batch.columns.contains("seq")) {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(key)).orderBy(col("seq").desc)
        batch.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
      } else batch.dropDuplicates(key)
    // The bucket count is a LAYOUT property: it must match what the table was
    // first written with, or the anti-join slice misses a key's existing copy
    // and the table silently duplicates it. The creating call persists its
    // value in _layout.json; later merges use the stored value and ignore a
    // divergent parameter (the honest alternative to trusting the caller).
    val dir = Paths.get(tablePath)
    val layoutFile = dir.resolve("_layout.json")
    val nB =
      if (Files.exists(layoutFile))
        graft.sources.VectorStoreCatalog.readJson(layoutFile)("n_buckets").toInt
      else nBuckets
    // int _bucket to match parquet partition-directory type inference
    val withB = deduped.withColumn("_bucket",
      pmod(xxhash64(col(key).cast("string")), lit(nB.toLong)).cast("int"))

    if (!Files.exists(dir)) {
      val tmp = tmpSibling(dir)
      withB.write.mode("overwrite").partitionBy("_bucket").parquet(tmp.toString)
      Files.createDirectories(dir.getParent)
      Files.move(tmp, dir)
      graft.sources.VectorStoreCatalog.writeJson(dir.resolve("_layout.json"),
        Map("n_buckets" -> nB.toString))
    } else {
      val touched = withB.select("_bucket").distinct().collect()
        .map(_.getInt(0)).toIndexedSeq
      // partition-pruned slice: only the touched buckets' files are read
      val slice = spark.read.parquet(tablePath)
        .filter(col("_bucket").isin(touched: _*))
      val merged = slice.join(withB.select(key), Seq(key), "left_anti")
        .unionByName(withB.select(slice.columns.map(col).toSeq: _*))
      val tmp = tmpSibling(dir)
      merged.write.mode("overwrite").partitionBy("_bucket").parquet(tmp.toString)
      touched.foreach { b =>
        swapDir(tmp.resolve(s"_bucket=$b"), dir.resolve(s"_bucket=$b"))
      }
      graft.sources.VectorStoreCatalog.deleteRec(tmp)
    }
    spark.catalog.refreshByPath(tablePath)
  }

  /** Streaming exact dedup: drop events whose `idCol` was already seen
    * within the watermark horizon (`dropDuplicatesWithinWatermark` — state
    * per key is bounded by the watermark, so this survives unbounded
    * streams; an unwatermarked dropDuplicates would grow state forever).
    * The streaming face of [[graft.operators.Dedup.exact]].
    */
  def dedupStream(stream: DataFrame, idCol: String, tsCol: String,
      watermark: String): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCol)

  private def tmpSibling(dir: Path): Path =
    dir.resolveSibling(dir.getFileName.toString + "_tmp_" + System.nanoTime())

  private def swapDir(src: Path, target: Path): Unit =
    graft.sources.VectorStoreCatalog.swapDir(src, target)
}
