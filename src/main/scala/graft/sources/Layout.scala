package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-bucketed parquet layout: the storage half of the 100 TB co-location
  * story on plain parquet (no Hive metastore / Delta in this environment).
  *
  * Writing partitions rows into `_bucket = pmod(xxhash64(key), n)` directory
  * partitions. Point lookups and semi-joins against a known key set then
  * prune to the relevant bucket directories — a scan of 1/n of the files —
  * and a MERGE against a batch can be restricted to the buckets the batch
  * touches. On a cluster with a metastore this maps 1:1 onto real
  * `bucketBy`; the operator layer is unchanged either way.
  */
object Layout {

  def writeBucketed(df: DataFrame, path: String, keyCol: String, nBuckets: Int): Unit = {
    require(nBuckets >= 1, "nBuckets >= 1")
    df.withColumn("_bucket", pmod(xxhash64(col(keyCol).cast("string")), lit(nBuckets)))
      .write.mode(SaveMode.Overwrite).partitionBy("_bucket").parquet(path)
  }

  def readBucketed(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Point/key-set lookup with bucket pruning: only the buckets containing
    * the requested keys are scanned (partition filter on `_bucket`).
    */
  def lookup(spark: SparkSession, path: String, keyCol: String,
      keys: Seq[Any], nBuckets: Int): DataFrame = {
    val df = readBucketed(spark, path)
    import spark.implicits._
    val keyDf = spark.createDataset(keys.map(_.toString)).toDF(keyCol + "_k")
      .withColumn("_bucket", pmod(xxhash64(col(keyCol + "_k")), lit(nBuckets)))
    val buckets = keyDf.select("_bucket").distinct().collect().map(_.getLong(0))
    df.filter(col("_bucket").isin(buckets.toIndexedSeq: _*))
      .filter(col(keyCol).cast("string").isin(keys.map(_.toString): _*))
      .drop("_bucket")
  }
}
