package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver testdata plus deterministic synthetic columns.
  *
  * The reference system (gmalakar/Flouds.VectorDB) stores rows of
  * (id, chunk, dense vector, sparse vector, JSON meta) — see
  * `/root/reference/app/milvus/base_milvus.py:920-997`. The driver testdata has
  * no vector column on the TPC-H tables, so we derive one deterministically
  * from the row key. Components are small INTEGERS (stored as double):
  *
  *   v(key)(i) = (key*131 + i*313 + 7) % 97 - 48,   i = 0..63
  *
  * Integer-valued components make dot products and squared norms exact
  * integers (< 2^53), so cosine = dot / (sqrt(nq)*sqrt(nd)) is a chain of
  * IEEE correctly-rounded ops — bitwise reproducible by the DuckDB oracle
  * regardless of summation order. This is what makes the §2.10 KNN queries
  * hash-checkable.
  */
object Tables {

  val Dim = 64

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Normalize a timestamp-ish column to epoch MICROSECONDS as LONG,
    * whatever physical type the parquet writer chose. The driver has shipped
    * `events.ts` as int64 nanoseconds (read as LongType under
    * `spark.sql.legacy.parquet.nanosAsLong`), as Timestamp(NANOS), and —
    * since the r7 regeneration — as Timestamp(MICROS) with
    * isAdjustedToUTC=false (Spark reads that as TimestampNTZType).
    * All unit/representation flips collapse here so the `ts`-consuming
    * queries stay schema-adaptive.
    *
    * NTZ wall-clock values are interpreted as UTC instants: every graft
    * entrypoint pins `spark.sql.session.timeZone=UTC`, matching DuckDB's
    * `epoch_us(ts)` on naive timestamps.
    */
  def tsMicros(df: DataFrame, name: String = "ts"): DataFrame = {
    val micros = df.schema(name).dataType match {
      case LongType         => expr(s"$name DIV 1000") // int64 nanos -> us
      case TimestampType    => unix_micros(col(name))
      case TimestampNTZType => unix_micros(col(name).cast(TimestampType))
      case dt => throw new IllegalArgumentException(
        s"column `$name` has unsupported timestamp representation $dt")
    }
    df.withColumn(name, micros)
  }

  /** Deterministic integer-valued vector for a row key (as array<double>).
    * Codegen kernel ([[graft.functions.VecExprs.synthVec]]); bit-identical
    * to the original `transform(sequence(...))` HOF, which was interpreted
    * per element (CodegenFallback) and dominated the orders-corpus scans.
    */
  def synthVec(key: Column, dim: Int = Dim): Column =
    graft.functions.VecExprs.synthVec(key, dim)

  /** Query vector q(qid) = synthVec(qid*997 + 1). */
  def queryVec(qid: Column, dim: Int = Dim): Column =
    synthVec(qid.cast("long") * 997 + 1, dim)

  /** A batch of `n` query vectors: (qid BIGINT, qv ARRAY<DOUBLE>). */
  def queryBatch(spark: SparkSession, n: Int, dim: Int = Dim): DataFrame =
    spark.range(n).select(col("id").as("qid"), queryVec(col("id"), dim).as("qv"))

  /** `orders` as a vector-store corpus: (doc_id, dv, meta JSON, chunk).
    * Mirrors the reference row shape (base_milvus.py:1032-1065): PK + dense
    * vector + JSON metadata + text chunk.
    */
  def ordersCorpus(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "orders").select(
      col("o_orderkey").as("doc_id"),
      synthVec(col("o_orderkey")).as("dv"),
      to_json(struct(
        col("o_orderstatus").as("status"),
        col("o_orderpriority").as("priority"))).as("meta"),
      concat_ws(" ", col("o_orderstatus"), col("o_orderpriority")).as("chunk"))

  /** `documents` joined with `embeddings` (doc_id == vec_id): text corpus with
    * a real float embedding, quantized to integers for determinism.
    * Columns: doc_id, text, lang, source, n_chars, label, qv ARRAY<DOUBLE>
    * (quantized: round(e*1000)).
    */
  def docsCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = load(spark, sfDir, "documents")
    val emb  = load(spark, sfDir, "embeddings")
    docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(docs("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"), col("label"),
        quantize(col("embedding")).as("qv"))
  }

  /** Full-materialization guard for the bench harnesses: a per-row FILTER
    * over a hash of every column, so `.count()` on the result cannot let
    * Catalyst prune the operators under measurement (an as-of loses its
    * whole window; a projection-ending query degenerates to a scan count).
    * An aggregate would not work — counting a one-row aggregate folds to a
    * constant. Shared here so Bench and ScaleBench can never drift.
    */
  def checksumAll(df: DataFrame): DataFrame =
    df.filter(xxhash64(struct(df.columns.map(col): _*)) =!= lit(42L))

  /** Quantize a float embedding to integer-valued doubles:
    * round(x*1000) — identical in Spark and DuckDB, making downstream dot
    * products exact integers.
    */
  def quantize(emb: Column): Column =
    transform(emb, x => round(x.cast("double") * 1000, 0))

  /** Exact row count of a parquet table from its FOOTER metadata — a
    * driver-side O(#files) metadata read, zero Spark jobs. This is the
    * "table stats" source the serving paths use to size knobs that need a
    * corpus cardinality (e.g. [[graft.operators.AnnLsh.autoPlanes]]): a
    * `df.count()` there costs a full scheduled job per request, while the
    * footers carry the identical number for free. Accepts a single file or
    * a directory of part files (skips `_`/`.` sidecars, recurses into
    * partition dirs). At cluster scale the same number comes from the table
    * format's snapshot manifest — this helper is the file-layout analogue.
    */
  def parquetRowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    def rows(st: org.apache.hadoop.fs.FileStatus): Long = {
      val name = st.getPath.getName
      if (name.startsWith("_") || name.startsWith(".")) 0L
      else if (st.isDirectory) fs.listStatus(st.getPath).map(rows).sum
      else {
        val in = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
        try in.getRecordCount finally in.close()
      }
    }
    rows(fs.getFileStatus(root))
  }
}
