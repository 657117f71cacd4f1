package graft.api

/** Request/response envelopes mirroring the reference's Pydantic models
  * (`/root/reference/app/models/` *.py) at the library boundary. Validation
  * rules follow `app/utils/input_validator.py` and the request models.
  */
final case class EmbeddedVector(
    key: String,
    chunk: String,
    model: String,
    metadata: Map[String, String] = Map.empty,
    vector: Seq[Double] = Nil,
    /** enable_dynamic_field extras (base_milvus.py:996,1071): schema-on-write
      * overflow kept in a MAP column (SURVEY 7.3 "dynamic fields").
      */
    dynamicFields: Map[String, String] = Map.empty)

final case class EmbeddedMeta(content: String, meta: Map[String, String])

/** `GenerateSchemaRequest` (generate_schema_request.py:27-65). */
final case class SchemaSpec(
    tenant: String,
    model: String,
    dimension: Int = 384,
    metricType: String = "COSINE",
    indexType: String = "IVF_FLAT",
    nlist: Int = 1024,
    metadataLength: Int = 4096,
    dropRatioBuild: Double = 0.1,
    /** PK dtype (base_milvus.py:895-917): VARCHAR (caller-supplied string
      * keys, upsert-by-key) or INT64 (store-generated auto_id, append-only —
      * `auto_id = dtype == INT64` in the reference). INT / STRING are the
      * reference's accepted aliases.
      */
    primaryKeyDataType: String = "VARCHAR",
    /** Engine-side layout/tuning properties with no reference analogue —
      * `n_buckets` (hash-bucket count of the data layout), `ingest_mode`
      * (`merge` = read-merge-swap commit, `delta` = merge-on-read append;
      * see VectorStoreCatalog), `max_delta_files` (delta fold threshold).
      * Core schema keys always win over entries here.
      */
    extraProps: Map[String, String] = Map.empty) {
  require(dimension >= 1 && dimension <= 4096, "dimension 1-4096")
  require(Set("COSINE", "L2", "IP")(metricType), "metric COSINE|L2|IP")
  require(Set("IVF_FLAT", "IVF_SQ8", "IVF_PQ", "HNSW")(indexType), "index type")
  require(nlist >= 1 && nlist <= 65536, "nlist 1-65536")
  require(metadataLength >= 256 && metadataLength <= 65535, "metadata_length 256-65535")
  require(dropRatioBuild >= 0.0 && dropRatioBuild <= 1.0, "drop_ratio_build 0-1")
  require(Set("VARCHAR", "STRING", "INT64", "INT")(primaryKeyDataType.toUpperCase),
    "primary_key_data_type VARCHAR|STRING|INT64|INT")
  require(Set("merge", "delta")(extraProps.getOrElse("ingest_mode", "merge")),
    "ingest_mode merge|delta")

  /** Normalized dtype, as the reference's dtype_map collapses aliases. */
  def pkType: String =
    if (Set("INT64", "INT")(primaryKeyDataType.toUpperCase)) "INT64" else "VARCHAR"
}

/** Search request knobs (search_request.py:49-131) — mapped onto the engine's
  * SearchParams by the facade.
  */
final case class SearchRequest(
    tenant: String,
    model: String,
    vector: Seq[Double],
    limit: Int = 10,
    offset: Int = 0,
    nprobe: Int = 10,
    roundDecimal: Int = -1,
    scoreThreshold: Option[Double] = None,
    metricType: String = "COSINE",
    outputFields: Seq[String] = Seq("chunk", "meta"),
    metaRequired: Boolean = false,
    metaFilter: Map[String, String] = Map.empty,
    textFilter: Option[String] = None,
    minimumWordsMatch: Int = 2,
    includeStopWords: Boolean = false,
    increaseLimitForTextSearch: Int = 10,
    hybridSearch: Boolean = false,
    partitionName: Option[String] = None,
    /** Multiple target partitions (vector_store.py:63-71,505-507 accepts a
      * list); combined with `partitionName` when both are given.
      */
    partitionNames: Seq[String] = Nil,
    /** Range search (A3, vector_store.py:501-503): `radius` is the FAR score
      * bound, `rangeFilter` the NEAR bound — for COSINE/IP the kept band is
      * [radius, rangeFilter]; for L2 (distance) it is [rangeFilter, radius].
      * Closed intervals (documented divergence from Milvus's half-open ones;
      * boundary-exact hits are measure-zero on real scores).
      */
    radius: Option[Double] = None,
    rangeFilter: Option[Double] = None,
    /** Conjunctive case-insensitive substring filter over the dynamic-field
      * `extra` map (enable_dynamic_field parity, base_milvus.py:996,1071).
      */
    extraFilter: Map[String, String] = Map.empty,
    /** HNSW search beam width (efSearch). The reference forwards index
      * search params to Milvus, whose HNSW takes `ef` per request
      * (generate_schema_request.py:113-132) — this is that dial for HNSW
      * collections (ignored by IVF/flat ones, as Milvus ignores `ef` on an
      * IVF index). None => the engine default `max(64, 2k)`; the effective
      * value is clamped to at least the fetch width (beam narrower than k
      * cannot return k results) and echoed in the response envelope.
      */
    ef: Option[Int] = None,
    consistencyLevel: String = "Bounded") {
  // Accepted and recorded for parity; Delta/parquet snapshot reads are
  // effectively Strong (SURVEY 4.1 "consistency levels": accept & ignore).
  require(Set("Strong", "Session", "Bounded", "Eventually")(consistencyLevel),
    "consistency Strong|Session|Bounded|Eventually")
  require(limit >= 1 && limit <= 100, "limit 1-100")
  require(offset >= 0 && offset <= 100, "offset 0-100")
  require(nprobe >= 4 && nprobe <= 128, "nprobe 4-128")
  require(roundDecimal >= -1 && roundDecimal <= 6, "round_decimal -1..6")
  require(metaFilter.size <= 10 && metaFilter.values.forall(_.length <= 200),
    "meta_filter <=10 keys, values <=200 chars")
  require(textFilter.forall(_.length <= 500), "text_filter <=500 chars")
  require(minimumWordsMatch >= 1 && minimumWordsMatch <= 10, "minimum_words_match 1-10")
  require(increaseLimitForTextSearch >= 0 && increaseLimitForTextSearch <= 100,
    "increase_limit_for_text_search 0-100")
  require(ef.forall(e => e >= 1 && e <= 32768), "ef 1-32768")
}

/** Base response envelope (base_response.py:12-38): `success=false` when no
  * results (vector_store_service.py:430-435).
  */
final case class SearchResponse(
    success: Boolean,
    message: String,
    tenantCode: String,
    timeTaken: Double,
    data: Seq[EmbeddedMeta],
    /** Effective search knobs, echoed back like the reference echoes its
      * request params in the response model (search_base.py:12-95) — e.g.
      * the clamped `ef` actually used on an HNSW collection, `nprobe` on an
      * IVF one.
      */
    params: Map[String, String] = Map.empty)

object Validation {
  private val ModelRe  = "[a-z0-9_.\\-]{1,100}".r
  private val TenantRe = "[a-zA-Z0-9_]{1,64}".r

  /** input_validator.py:129-153 — model id shape (validated lowercased, as
    * the reference normalizes model names before use).
    */
  def requireValidModel(model: String): Unit =
    require(ModelRe.matches(model.toLowerCase), s"invalid model name: $model")

  def requireValidTenant(tenant: String): Unit =
    require(TenantRe.matches(tenant), s"invalid tenant: $tenant")

  /** input_validator.py:228-250 — vector sanity. */
  def requireValidVector(v: Seq[Double], dim: Int): Unit = {
    require(v.length == dim, s"vector dim ${v.length} != collection dim $dim")
    require(v.forall(x => !x.isNaN && !x.isInfinite && math.abs(x) <= 1e6),
      "vector values must be finite with |x| <= 1e6")
  }

  /** insert_request.py / embedded_vector.py limits. `requireKey = false` for
    * auto_id (INT64-PK) collections, where the store generates the PK and
    * the caller's key is ignored (base_milvus.py:1019-1030).
    */
  def requireValidRow(r: EmbeddedVector, dim: Int, requireKey: Boolean = true): Unit = {
    if (requireKey)
      require(r.key != null && r.key.nonEmpty && r.key.length <= 256, "key 1-256 chars")
    require(r.chunk != null && r.chunk.length <= 60000, "chunk <=60000 chars")
    requireValidModel(r.model)
    requireValidVector(r.vector, dim)
  }
}
