package graft.sources

import graft.api._
import graft.operators.{Bm25, Hybrid, Ivf, Knn, SearchParams, Upsert}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Parquet-backed multi-tenant vector-store catalog — the engine-side
  * equivalent of the reference's Milvus DDL + lifecycle layer
  * (`/root/reference/app/milvus/base_milvus.py`):
  *
  *  - D1 tenant database  `{tenant}_vectorstore`        (base_milvus.py:465-477)
  *  - D2 collection       `vector_store_schema_for_{tenant}_{model}`
  *    (model lowercased, `-`/`.` → `_`;  base_milvus.py:487-497)
  *  - D3/D4 index build   → IVF centroid/clustered tables + BM25 postings
  *  - S1 insert (validated upsert, auto-flush semantics), S3 flush,
  *    S4 load/exists, S5 schema introspection, S6 partition targeting
  *  - D8 config KV        (tenant-scoped key→value, cached)
  *
  * Storage layout under `basePath`:
  *   {tenant}_vectorstore/{table}/data/part-*.parquet    (partitioned by `part`)
  *   {tenant}_vectorstore/{table}/_schema.json           (table properties)
  *
  * Writes go through a MERGE (anti-join ∪ batch) and atomic directory swap —
  * the moral equivalent of a Delta MERGE commit in an environment without
  * Delta. On a real cluster this class would sit on Delta/Iceberg; every
  * operator above it is storage-agnostic (plain DataFrames).
  */
class VectorStoreCatalog(spark: SparkSession, basePath: String) {

  import VectorStoreCatalog._

  // ---- naming (base_milvus.py:465-497) ----
  def dbName(tenant: String): String = s"${tenant}_vectorstore"
  def tableName(tenant: String, model: String): String =
    s"vector_store_schema_for_${tenant}_${model.toLowerCase.replaceAll("[-.]", "_")}"

  private def tableDir(tenant: String, model: String): Path =
    Paths.get(basePath, dbName(tenant), tableName(tenant, model))
  private def dataDir(tenant: String, model: String): Path =
    tableDir(tenant, model).resolve("data")

  /** The one table shape (SURVEY §1.2 / base_milvus.py:920-997). */
  def storeSchema(dim: Int): StructType = StructType(Seq(
    StructField("flouds_vector_id", StringType, nullable = false),
    StructField("chunk", StringType),
    StructField("model", StringType),
    StructField("vector", ArrayType(DoubleType, containsNull = false)),
    StructField("sparse_vector", MapType(IntegerType, FloatType)),
    StructField("meta", StringType),
    StructField("extra", MapType(StringType, StringType)),
    StructField("part", StringType)))

  // ---- D1/D2: generate_schema ----
  def generateSchema(spec: SchemaSpec): Unit = {
    Validation.requireValidTenant(spec.tenant)
    Validation.requireValidModel(spec.model)
    val dir = tableDir(spec.tenant, spec.model)
    Files.createDirectories(dir)
    val props = Map(
      "dimension" -> spec.dimension.toString,
      "metric_type" -> spec.metricType,
      "index_type" -> spec.indexType,
      "nlist" -> spec.nlist.toString,
      "metadata_length" -> spec.metadataLength.toString,
      "drop_ratio_build" -> spec.dropRatioBuild.toString)
    writeJson(dir.resolve("_schema.json"), props)
  }

  def collectionExists(tenant: String, model: String): Boolean =
    Files.exists(tableDir(tenant, model).resolve("_schema.json"))

  /** S5: dimension introspected back from table properties
    * (vector_store.py:207-263).
    */
  def dimension(tenant: String, model: String): Int =
    readJson(tableDir(tenant, model).resolve("_schema.json"))("dimension").toInt

  def properties(tenant: String, model: String): Map[String, String] =
    readJson(tableDir(tenant, model).resolve("_schema.json"))

  /** S4: load = read (+ optional cache, the Milvus load_collection analogue). */
  def load(tenant: String, model: String): DataFrame = {
    val d = dataDir(tenant, model)
    if (Files.exists(d) && Files.list(d).iterator().asScala.nonEmpty)
      spark.read.schema(storeSchema(dimension(tenant, model))).parquet(d.toString)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      storeSchema(dimension(tenant, model)))
  }

  // ---- S1: validated upsert with BM25 sparse generation ----
  /** Insert/upsert a batch (≤1000 rows, unique keys, dim-checked — the
    * reference's insert_data path, vector_store.py:292-404). Sparse vectors
    * are (re)generated for the whole table from per-collection BM25 stats —
    * a documented divergence from the reference's fit-once-process-wide
    * quirk (vector_store.py:42-52): per-collection stats are strictly more
    * correct and shard cleanly per tenant.
    */
  /** auto_flush_min_batch semantics (milvus_helper.py:121-131): flush when
    * the batch size reaches the threshold; 0 => always, <0 => never.
    */
  val AutoFlushMinBatch: Int =
    sys.env.getOrElse("GRAFT_AUTO_FLUSH_MIN_BATCH", "100").toInt

  def insert(tenant: String, model: String, rows: Seq[EmbeddedVector],
      partition: Option[String] = None): Long = {
    require(collectionExists(tenant, model), s"collection missing for $tenant/$model")
    require(rows.nonEmpty && rows.size <= Upsert.MaxBatch, "batch 1-1000 rows")
    val dim = dimension(tenant, model)
    rows.foreach(Validation.requireValidRow(_, dim))
    val keys = rows.map(_.key)
    require(keys.distinct.size == keys.size, "duplicate keys in batch")

    import spark.implicits._
    val batch = rows.toDF()
      .select(col("key").as("flouds_vector_id"), col("chunk"), col("model"),
        col("vector"), col("metadata"), col("dynamicFields").as("extra"))
      .withColumn("meta", to_json(col("metadata"))).drop("metadata")
      .withColumn("part", lit(partition.getOrElse("_default")))

    val current = load(tenant, model).drop("sparse_vector")
    val merged = Upsert.merge(
      current,
      batch.select(current.columns.map(col).toSeq: _*),
      "flouds_vector_id")

    // H1: per-collection BM25 sparse vectors over the merged corpus.
    val bm25 = Bm25.fit(merged.select(col("flouds_vector_id").as("doc_id"),
      col("chunk").as("text")))
    val sparse = Bm25.encodeDocuments(bm25,
      properties(tenant, model).getOrElse("drop_ratio_build", "0.0").toDouble)
    val out = merged.join(sparse.withColumnRenamed("doc_id", "flouds_vector_id"),
        Seq("flouds_vector_id"), "left")
      .select(storeSchema(dim).fieldNames.map(col).toSeq: _*)

    val n = out.count() // materialize before the swap invalidates old files
    atomicReplace(tenant, model, out)
    // S3 auto-flush decision (batch >= threshold; 0 always, <0 never)
    if (AutoFlushMinBatch == 0 || (AutoFlushMinBatch > 0 && rows.size >= AutoFlushMinBatch))
      flush(tenant, model)
    n
  }

  /** S3: flush/OPTIMIZE hook — parquet writes are already atomic commits
    * here, so flush compacts small files (the reference's flush persists
    * Milvus segments, vector_store.py:406-426).
    */
  def flush(tenant: String, model: String): Unit = {
    val df = load(tenant, model)
    atomicReplace(tenant, model, df.coalesce(math.max(1, (df.count() / 500000L).toInt)))
  }

  // ---- search facade (milvus_helper.search_embedded_data analogue) ----
  def search(req: SearchRequest): SearchResponse = {
    val t0 = System.nanoTime()
    require(collectionExists(req.tenant, req.model), "collection missing")
    Validation.requireValidVector(req.vector, dimension(req.tenant, req.model))

    val table = load(req.tenant, req.model)
    // S6: partition targeting prunes before anything else.
    val part = req.partitionName.fold(table)(p => table.filter(col("part") === p))
    var corpus = part.select(col("flouds_vector_id"), col("chunk"), col("meta"),
      col("vector").as("dv"))
      .withColumn("doc_id", xxhash64(col("flouds_vector_id")))

    // A1-approx: when an IVF index exists, restrict the scan to the query's
    // nprobe nearest cells (the reference always searches through its
    // index; nprobe is the request knob, capped 256 - vector_store.py:495).
    if (indexExists(req.tenant, req.model) && req.partitionName.isEmpty) {
      val idx = loadIndex(req.tenant, req.model)
      import spark.implicits._
      val qv = Seq(Tuple1(req.vector)).toDF("qv")
      val centScore = graft.functions.VecExprs.dot(col("qv"), col("center")) /
        (sqrt(graft.functions.VecExprs.norm2(col("qv"))) *
         sqrt(graft.functions.VecExprs.norm2(col("center"))))
      val cells = qv.crossJoin(broadcast(idx.centroids))
        .select(col("centroid_id"), centScore.as("cs"))
        .orderBy(col("cs").desc).limit(math.min(req.nprobe, 256))
        .collect().map(_.getInt(0))
      val probedDocs = idx.clustered
        .filter(col("centroid_id").isin(cells.toIndexedSeq: _*))
        .select("doc_id")
      corpus = corpus.join(probedDocs, Seq("doc_id"), "left_semi")
    }

    import spark.implicits._
    val queries = Seq((0L, req.vector)).toDF("qid", "qv")
    val params = SearchParams(req.metricType, req.limit, req.offset,
      req.scoreThreshold, req.roundDecimal, req.textFilter, req.minimumWordsMatch,
      req.includeStopWords, req.increaseLimitForTextSearch, req.metaFilter,
      req.metaRequired, None, Seq("chunk", "meta") ++ req.outputFields)

    val res =
      if (req.hybridSearch && req.textFilter.exists(_.nonEmpty)) {
        // H4 gating: sparse leg only with query text; failure → dense-only.
        val bm25 = Bm25.fit(part.select(col("flouds_vector_id").as("doc_id"),
          col("chunk").as("text")).withColumn("doc_id", xxhash64(col("doc_id").cast("string"))))
        Hybrid.search(corpus, queries, bm25, Seq(0L -> req.textFilter.get), params)
          .join(corpus.select(col("doc_id"), col("chunk"), col("meta")), "doc_id")
      } else Knn.search(corpus, queries, params)

    val rows = res.select(col("chunk"), col("meta")).collect().map { r =>
      EmbeddedMeta(r.getAs[String]("chunk"), parseMeta(r.getAs[String]("meta")))
    }.toSeq
    val dt = (System.nanoTime() - t0) / 1e9
    if (rows.isEmpty)
      SearchResponse(success = false, "No vectors found for the given query.",
        req.tenant, dt, Nil)
    else SearchResponse(success = true, "ok", req.tenant, dt, rows)
  }

  /** D3: build the IVF index tables for a collection. */
  def buildIndex(tenant: String, model: String): Ivf.Index = {
    val props = properties(tenant, model)
    val corpus = load(tenant, model).select(
      xxhash64(col("flouds_vector_id")).as("doc_id"), col("vector").as("dv"))
    // cap nlist so small collections still get >=2 non-trivial cells
    Ivf.build(corpus, nlist = math.max(2, math.min(props("nlist").toInt,
      (corpus.count() / 64).toInt)), metric = props("metric_type"))
  }

  // ---- D4/D5: index persistence + idempotent build ----
  private def indexDir(tenant: String, model: String): Path =
    tableDir(tenant, model).resolve("index")

  def indexExists(tenant: String, model: String): Boolean =
    Files.exists(indexDir(tenant, model).resolve("centroids"))

  /** Persist the IVF index tables (centroids + corpus clustered by
    * centroid_id) and the BM25 posting lists — the durable form of D3/D4.
    * The clustered table is PARTITIONED BY centroid_id so a probe scan reads
    * only nprobe/nlist of the files (partition pruning = the IVF inverted
    * file). Idempotent: `ensureIndex` is the reference's list-then-create
    * (base_milvus.py:1216-1264).
    */
  def persistIndex(tenant: String, model: String): Unit = {
    val idx = buildIndex(tenant, model)
    val d = indexDir(tenant, model)
    idx.clustered.write.mode(SaveMode.Overwrite).partitionBy("centroid_id")
      .parquet(d.resolve("clustered").toString)
    idx.centroids.write.mode(SaveMode.Overwrite)
      .parquet(d.resolve("centroids").toString)
    val bm25 = Bm25.fit(load(tenant, model).select(
      xxhash64(col("flouds_vector_id")).as("doc_id"), col("chunk").as("text")))
    Bm25.postings(bm25).write.mode(SaveMode.Overwrite)
      .parquet(d.resolve("postings").toString)
    spark.catalog.refreshByPath(d.toString)
  }

  def ensureIndex(tenant: String, model: String): Unit =
    if (!indexExists(tenant, model)) persistIndex(tenant, model)

  def loadIndex(tenant: String, model: String): Ivf.Index = {
    val d = indexDir(tenant, model)
    Ivf.Index(
      spark.read.parquet(d.resolve("centroids").toString),
      spark.read.parquet(d.resolve("clustered").toString),
      properties(tenant, model)("metric_type"))
  }

  // ---- D6/D7: tenant bootstrap + user/role management (service layer;
  //      SURVEY §2.6 marks these out of engine scope — thin but functional
  //      stubs so the API surface is complete) ----
  private val rng = new java.security.SecureRandom()

  /** create_user (base_milvus.py:542-581): `{tenant}_` + 26 random
    * alphanumerics; secret = urlsafe base64 of 36 random bytes.
    */
  def createUser(tenant: String): (String, String) = {
    Validation.requireValidTenant(tenant)
    val alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    val id = s"${tenant}_" + (0 until 26).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    val secretBytes = new Array[Byte](36)
    rng.nextBytes(secretBytes)
    val secret = java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(secretBytes)
    configSet(tenant, s"user.$id", secret)
    configSet(tenant, s"role.$id", TenantPrivileges.mkString(","))
    (id, secret)
  }

  def authenticate(tenant: String, clientId: String, secret: String): Boolean =
    configGet(tenant, s"user.$clientId").contains(secret)

  def dropUser(tenant: String, clientId: String): Unit = {
    configDelete(tenant, s"user.$clientId")
    configDelete(tenant, s"role.$clientId")
  }

  def grants(tenant: String, clientId: String): Seq[String] =
    configGet(tenant, s"role.$clientId").map(_.split(",").toSeq).getOrElse(Nil)

  // ---- D8: tenant-scoped config KV with cache (config_service.py) ----
  private val kvCache = scala.collection.concurrent.TrieMap.empty[String, Map[String, String]]

  private def kvPath(tenant: String): Path =
    Paths.get(basePath, dbName(tenant), "config_kv.json")

  def configSet(tenant: String, key: String, value: String): Unit = {
    val m = configAll(tenant) + (key -> value)
    Files.createDirectories(kvPath(tenant).getParent)
    writeJson(kvPath(tenant), m)
    kvCache.put(tenant, m)
  }

  def configGet(tenant: String, key: String): Option[String] = configAll(tenant).get(key)

  def configDelete(tenant: String, key: String): Unit = {
    val m = configAll(tenant) - key
    writeJson(kvPath(tenant), m)
    kvCache.put(tenant, m)
  }

  /** D8 encryption option (config_service.py Fernet analogue): AES-GCM with
    * a SHA-256-derived key; ciphertext stored as "enc:" + base64(iv||ct).
    */
  def configSetEncrypted(tenant: String, key: String, value: String,
      passphrase: String): Unit = {
    val cipher = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
    val iv = new Array[Byte](12); rng.nextBytes(iv)
    cipher.init(javax.crypto.Cipher.ENCRYPT_MODE, aesKey(passphrase),
      new javax.crypto.spec.GCMParameterSpec(128, iv))
    val ct = cipher.doFinal(value.getBytes("UTF-8"))
    configSet(tenant, key,
      "enc:" + java.util.Base64.getEncoder.encodeToString(iv ++ ct))
  }

  def configGetEncrypted(tenant: String, key: String,
      passphrase: String): Option[String] =
    configGet(tenant, key).filter(_.startsWith("enc:")).flatMap { v =>
      try {
        val bytes = java.util.Base64.getDecoder.decode(v.drop(4))
        val cipher = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
        cipher.init(javax.crypto.Cipher.DECRYPT_MODE, aesKey(passphrase),
          new javax.crypto.spec.GCMParameterSpec(128, bytes.take(12)))
        Some(new String(cipher.doFinal(bytes.drop(12)), "UTF-8"))
      } catch { case _: Throwable => None }
    }

  private def aesKey(passphrase: String) = new javax.crypto.spec.SecretKeySpec(
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(passphrase.getBytes("UTF-8")), "AES")

  /** Health probe (health_service.py analogue): basePath reachability +
    * collection count.
    */
  def health(): Map[String, String] = {
    val base = Paths.get(basePath)
    val collections =
      if (Files.exists(base))
        Files.walk(base, 2).iterator().asScala.count(p =>
          Files.exists(p.resolve("_schema.json")))
      else 0
    Map("status" -> (if (Files.isWritable(base)) "healthy" else "degraded"),
      "collections" -> collections.toString)
  }

  private def configAll(tenant: String): Map[String, String] =
    kvCache.getOrElseUpdate(tenant,
      if (Files.exists(kvPath(tenant))) readJson(kvPath(tenant)) else Map.empty)

  // ---- helpers ----
  private def atomicReplace(tenant: String, model: String, df: DataFrame): Unit = {
    val target = dataDir(tenant, model)
    val tmp = target.resolveSibling("data_tmp_" + System.nanoTime())
    df.write.mode(SaveMode.Overwrite).partitionBy("part").parquet(tmp.toString)
    val old = target.resolveSibling("data_old_" + System.nanoTime())
    if (Files.exists(target)) Files.move(target, old)
    Files.move(tmp, target)
    if (Files.exists(old)) deleteRec(old)
    // drop Spark's cached file listing for the swapped path
    spark.catalog.refreshByPath(target.toString)
  }
}

object VectorStoreCatalog {

  /** The 9 privileges the reference grants each tenant role
    * (base_milvus.py:71-81).
    */
  val TenantPrivileges: Seq[String] = Seq(
    "CreateIndex", "DropIndex", "Search", "Query", "Load", "Release",
    "Insert", "Delete", "Compaction")

  private[sources] def parseMeta(s: String): Map[String, String] =
    // P7: JSON parse with silent {} fallback (vector_store.py:938-954)
    try {
      if (s == null) Map.empty
      else "\"([^\"]+)\"\\s*:\\s*\"([^\"]*)\"".r.findAllMatchIn(s)
        .map(m => m.group(1) -> m.group(2)).toMap
    } catch { case _: Throwable => Map.empty }

  private[sources] def writeJson(p: Path, m: Map[String, String]): Unit = {
    val body = m.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{", ", ", "}")
    Files.writeString(p, body)
  }

  private[sources] def readJson(p: Path): Map[String, String] = {
    val s = Files.readString(p)
    "\"([^\"]+)\"\\s*:\\s*\"([^\"]*)\"".r.findAllMatchIn(s)
      .map(m => m.group(1) -> m.group(2)).toMap
  }

  private def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")

  private[graft] def deleteRec(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.isDirectory(p)) Files.list(p).iterator().asScala.toSeq.foreach(deleteRec)
    Files.deleteIfExists(p)
  }
}
