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

  // ==== REAL container decode (pure JVM — no native libs needed) ==========
  // BMP and RIFF/WAVE headers are simple little-endian structures; parsing
  // them is a genuine decode of real container formats, replacing the stub
  // for these two types. The same mapPartitions batch shape carries it.

  import java.nio.{ByteBuffer, ByteOrder}

  /** Parse a BMP header: returns (width, height, bitsPerPixel) or None if
    * the magic/size is wrong. (BITMAPINFOHEADER layout: 'BM' magic, i32
    * width at offset 18, i32 height at 22, u16 bpp at 28 — all LE.)
    */
  def decodeBmpHeader(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (bytes == null || bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') None
    else {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      Some((bb.getInt(18), bb.getInt(22), bb.getShort(28) & 0xffff))
    }
  }

  /** Parse a canonical RIFF/WAVE header: returns (sampleRate, channels,
    * bitsPerSample) or None. ('RIFF' @0, 'WAVE' @8, 'fmt ' @12; u16
    * channels @22, u32 sample rate @24, u16 bits @34 — all LE.)
    */
  def decodeWavHeader(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    def tag(off: Int, s: String) =
      bytes.length >= off + 4 && s.indices.forall(i => bytes(off + i) == s(i).toByte)
    if (bytes == null || bytes.length < 44 ||
        !tag(0, "RIFF") || !tag(8, "WAVE") || !tag(12, "fmt ")) None
    else {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      Some((bb.getInt(24), bb.getShort(22) & 0xffff, bb.getShort(34) & 0xffff))
    }
  }

  /** Deterministic 24bpp BMP for a doc id: width 4+id%13, height 3+id%7,
    * pixel (x,y) channels derived from (id+x+y). A fully valid file a real
    * viewer could open — the synthetic stand-in for stored image bytes.
    */
  def synthBmp(id: Long): Array[Byte] = {
    val w = (4 + id % 13).toInt; val h = (3 + id % 7).toInt
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val size = 54 + rowBytes * h
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    bb.putInt(0).putInt(rowBytes * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (y <- 0 until h; x <- 0 until rowBytes) {
      val v = if (x < w * 3) ((id + x + y) % 256).toInt else 0
      bb.put(v.toByte)
    }
    bb.array()
  }

  /** Deterministic PCM16 WAV for a doc id: sample rate 8000+(id%5)*4000,
    * channels 1+(id/2)%2, 16+id%32 frames of a small sawtooth.
    */
  def synthWav(id: Long): Array[Byte] = {
    val rate = (8000 + (id % 5) * 4000).toInt
    val ch = (1 + (id / 2) % 2).toInt
    val n = (16 + id % 32).toInt
    val dataBytes = n * ch * 2
    val bb = ByteBuffer.allocate(44 + dataBytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + dataBytes).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(ch.toShort)
    bb.putInt(rate).putInt(rate * ch * 2).putShort((ch * 2).toShort).putShort(16)
    bb.put("data".getBytes).putInt(dataBytes)
    for (i <- 0 until n * ch) bb.putShort((((id + i) % 64) * 512).toShort)
    bb.array()
  }

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("sample_rate", LongType),
    StructField("channels", LongType)))

  /** Synthesize per-doc media payloads (even ids → BMP, odd → WAV), then
    * REALLY decode each container's header in the partition-batched pass.
    * The decoded fields come from parsing the bytes — if the parsers were
    * wrong, the DuckDB oracle (which predicts them from the synthesis
    * formulas) would catch it.
    */
  def extractMediaFeatures(docs: DataFrame): DataFrame = {
    val ids = docs.select("doc_id")
    val idIdx = 0
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(mediaSchema))
    ids.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        if (id % 2 == 0) {
          val bytes = synthBmp(id)
          val (w, h, _) = decodeBmpHeader(bytes).getOrElse(
            throw new IllegalStateException(s"undecodable BMP for doc $id"))
          Row(id, "image/bmp", bytes.length.toLong, w.toLong, h.toLong, null, null)
        } else {
          val bytes = synthWav(id)
          val (rate, ch, _) = decodeWavHeader(bytes).getOrElse(
            throw new IllegalStateException(s"undecodable WAV for doc $id"))
          Row(id, "audio/wav", bytes.length.toLong, null, null, rate.toLong, ch.toLong)
        }
      }
    }
  }
}
