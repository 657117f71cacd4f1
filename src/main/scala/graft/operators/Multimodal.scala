package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in distributed per-partition batches.
  *
  * The actual media decode is STUBBED (this container has no image/audio
  * libraries): [[decodeStub]] derives deterministic fake features from the
  * bytes. Everything around the stub — schema, binary column handling,
  * partition-batched imperative processing (`mapPartitions`, the Scala
  * analogue of a Pandas-UDF `mapInPandas` batch), feature schema — is the
  * real Spark-side pipeline a production decoder would drop into.
  */
object Multimodal {

  /** Feature schema produced per asset. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("first_byte", LongType),
    StructField("checksum", LongType),
    StructField("feature", ArrayType(DoubleType, containsNull = false))))

  /** Attach a binary payload column (here: utf-8 of a text column — the
    * deterministic stand-in for real image bytes) + media metadata.
    */
  def withBinaryPayload(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("payload", col(textCol).cast("binary"))
      .withColumn("media_type", lit("image/fake"))

  /** ??? real decoder goes here — STUB: deterministic pseudo-features from
    * raw bytes (n_bytes, first byte, rolling checksum mod 997, an 8-dim
    * byte-histogram-ish feature). The mapPartitions batch shape (iterate a
    * whole partition, emit one feature row per asset) is exactly what a
    * JNI/image-lib decoder would use.
    */
  def decodeStub(assets: DataFrame): DataFrame = {
    val schema = assets.schema
    val idIdx  = schema.fieldIndex("doc_id")
    val mtIdx  = schema.fieldIndex("media_type")
    val pIdx   = schema.fieldIndex("payload")
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(featureSchema))
    assets.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](pIdx)
        var checksum = 0L
        val hist = new Array[Double](8)
        var i = 0
        while (i < bytes.length) {
          val b = bytes(i) & 0xff
          checksum = (checksum * 31 + b) % 997
          hist(b % 8) += 1.0
          i += 1
        }
        Row(r.getLong(idIdx), r.getString(mtIdx), bytes.length.toLong,
          if (bytes.nonEmpty) (bytes(0) & 0xff).toLong else -1L,
          checksum, hist.toSeq)
      }
    }
  }

  /** End-to-end: docs → binary payload → partition-batched decode →
    * features. The distributed shape (schema, binary flow, batching) is
    * real; only the inner decode is fake.
    */
  def extractFeatures(docs: DataFrame): DataFrame =
    decodeStub(withBinaryPayload(docs).select("doc_id", "media_type", "payload"))
}
