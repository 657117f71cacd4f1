package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language-ID (marker n-gram
  * heuristic), quality scoring, token counting, document fingerprinting.
  * Pure column arithmetic — no UDFs — with DuckDB-replicable semantics.
  */
object TextAnalysis {

  /** Function-word profiles per language — the classic stopword-profile
    * language-ID heuristic (public knowledge: score a document by how many of
    * its tokens are closed-class function words of each language; function
    * words are frequent and language-specific, so the argmax is a robust LID
    * for latin-script text). Sets may overlap across languages (e.g. "la" in
    * fr/es) — that is inherent to the method, and both engines score it the
    * same way. Tie-break: first language in alphabetical order wins
    * (de en es fr it).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "ein", "mit",
      "auf", "sich", "auch", "werden"),
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it",
      "for", "with", "was", "this"),
    "es" -> Seq("el", "los", "las", "una", "por", "como", "pero", "sus",
      "este", "entre", "cuando", "muy"),
    "fr" -> Seq("le", "les", "des", "est", "dans", "pour", "qui", "pas",
      "sur", "avec", "une", "mais"),
    "it" -> Seq("il", "che", "di", "non", "per", "sono", "con", "del",
      "come", "anche", "della", "questo"))

  private def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => markers.map(m => t === m).reduce(_ || _)))

  /** (doc_id, s_de..s_zh, pred_lang): argmax marker-hit count with
    * alphabetical tie-break, expressed as a chained CASE identical to the
    * oracle's.
    */
  def langId(docs: DataFrame): DataFrame = {
    val toks = Text.tokens(col("text"))
    val scored = docs.select(Seq(col("doc_id")) ++
      LangMarkers.map { case (l, m) => markerCount(toks, m).cast("long").as(s"s_$l") }: _*)
    val langs = LangMarkers.map(_._1)
    val pred = langs.foldRight(lit(langs.last)) { case (l, rest) =>
      val isMax = langs.filter(_ != l)
        .map(o => col(s"s_$l") >= col(s"s_$o"))
        .reduce(_ && _)
      when(isMax, lit(l)).otherwise(rest)
    }
    scored.withColumn("pred_lang", pred)
  }

  /** Quality score in [0,1]: length saturation + non-stopword ratio + mean
    * token length saturation. (doc_id, n_tokens, stop_ratio, quality).
    */
  def quality(docs: DataFrame): DataFrame = {
    val toks = Text.tokens(col("text"))
    val stopHits = size(filter(toks, t => Text.Stopwords.map(sw => t === sw).reduce(_ || _)))
    val charSum = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    docs.select(col("doc_id"), size(toks).cast("long").as("n_tokens"),
        stopHits.cast("long").as("stop_cnt"), charSum.as("char_sum"))
      .filter(col("n_tokens") > 0)
      .withColumn("stop_ratio", col("stop_cnt").cast("double") / col("n_tokens"))
      .withColumn("quality",
        lit(0.4) * least(lit(1.0), col("n_tokens") / 100.0) +
          lit(0.3) * (lit(1.0) - col("stop_ratio")) +
          lit(0.3) * least(lit(1.0), col("char_sum").cast("double") / col("n_tokens") / 8.0))
      .select("doc_id", "n_tokens", "stop_ratio", "quality")
  }

  /** Per-language token accounting: whitespace tokens, BPE-ish regex tokens
    * ([a-z0-9]+ runs or single non-space symbols), and an estimated BPE count
    * (ceil(chars/4)).
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("lang"),
        size(Text.tokens(col("text"))).cast("long").as("ws_toks"),
        size(expr("regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 ]', 0)")).cast("long").as("re_toks"),
        ceil(col("n_chars") / 4.0).cast("long").as("est_bpe"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("ws_toks").as("total_ws"),
        sum("re_toks").as("total_re"), sum("est_bpe").as("total_bpe"))

  /** Deterministic train/valid/test split by multiplicative key hash —
    * reproducible across engines and runs (no rand()), stable under
    * repartitioning. Fractions are over the 32-bit hash space.
    */
  def split(docs: DataFrame, idCol: String, trainFrac: Double, validFrac: Double): DataFrame = {
    val h = (col(idCol) * 2654435761L) % 4294967296L
    val trainCut = (trainFrac * 4294967296.0).toLong
    val validCut = ((trainFrac + validFrac) * 4294967296.0).toLong
    docs.withColumn("split",
      when(h < trainCut, "train").when(h < validCut, "valid").otherwise("test"))
  }

  /** Document length histogram: 100-char buckets with counts and decimal-
    * exact mean token estimates per bucket.
    */
  def lengthHistogram(docs: DataFrame): DataFrame =
    docs.select((col("n_chars").cast("long") / 100L).cast("long").as("bucket"),
        col("n_chars"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))

  /** End-to-end curation pipeline (the composed shape a training-data run
    * uses): quality gate -> exact-dedup keep-list -> per-source accounting.
    * Mean quality accumulates in FIXED-POINT (1e-9) so it is aggregation-
    * order independent and oracle-exact.
    */
  def curate(docs: DataFrame, minQuality: Double): DataFrame = {
    val q = quality(docs).select(col("doc_id"), col("quality"))
    val keep = Dedup.exact(docs).select(col("keep_id").as("doc_id"))
    docs.join(q, "doc_id")
      .join(keep, Seq("doc_id"), "left_semi") // only group representatives
      .filter(col("quality") >= minQuality)
      .withColumn("qs", round(col("quality") * 1e9, 0).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        (sum("qs").cast("double") / 1e9 / count(lit(1))).as("mean_quality"))
  }

  /** Order-sensitive integer document fingerprint: Σ pos·tokenCode + n_tokens
    * (a rolling-hash analogue that stays aggregation-order independent).
    */
  def fingerprint(docs: DataFrame): DataFrame =
    Dedup.tokenTable(docs).groupBy("doc_id")
      .agg((sum(col("pos") * Text.tokenCode(col("term"))) + count(lit(1))).as("fp"))

  /** Unigram-LM log-probability score — the classic cheap perplexity proxy
    * for corpus quality filtering (docs whose tokens are improbable under
    * the corpus unigram distribution score low). Add-one smoothing:
    * p(t) = (ctf(t)+1) / (T + V). Per-token ln p is accumulated in FIXED
    * POINT (round(lp·1e9) summed as integers) so the per-doc mean is
    * aggregation-order independent and oracle-exact — same trick as BM25.
    * Returns (doc_id, n_tokens, avg_logprob).
    */
  def unigramLogProb(docs: DataFrame): DataFrame = {
    val toks = Dedup.tokenTable(docs)
    val tf = toks.groupBy("term").agg(count(lit(1)).as("ctf"))
    val g = toks.agg(count(lit(1)).as("t_total"))
      .crossJoin(tf.agg(count(lit(1)).as("v_size")))
    val lp = toks.join(tf, "term").crossJoin(broadcast(g))
      .withColumn("s", round(
        log((col("ctf") + 1).cast("double") /
          (col("t_total") + col("v_size")).cast("double")) * 1e9, 0).cast("long"))
    lp.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (sum("s").cast("double") / 1e9 / count(lit(1))).as("avg_logprob"))
  }

  /** Bigram-LM conditional log-probability — the next step up from
    * [[unigramLogProb]] on the cheap-perplexity ladder (docs whose token
    * TRANSITIONS are improbable under the corpus bigram distribution score
    * low, catching shuffled-word and template text a unigram model cannot).
    * Add-one smoothing over the unigram vocabulary:
    * p(cur|prev) = (c(prev,cur)+1) / (c_ctx(prev)+V), c_ctx counting only
    * prev occurrences with a successor so probabilities sum to 1 per
    * context. Same fixed-point ln device as the unigram scorer. Bigrams are
    * assembled inside the token array (slice + zip_with — zero shuffles);
    * docs with fewer than 2 tokens have no bigram and are absent.
    * Returns (doc_id, n_bigrams, avg_logprob).
    */
  def bigramLogProb(docs: DataFrame): DataFrame = {
    val tokArr = Text.tokens(col("text"))
    val pairT = "array<struct<prev:string,cur:string>>"
    val pairs = docs.select(col("doc_id"),
        explode(when(size(tokArr) >= 2,
          zip_with(slice(tokArr, lit(1), size(tokArr) - 1),
            slice(tokArr, lit(2), size(tokArr) - 1),
            (p, c) => struct(p.as("prev"), c.as("cur"))))
          .otherwise(array().cast(pairT))).as("pc"))
      .select(col("doc_id"), col("pc.prev").as("prev"), col("pc.cur").as("cur"))
    val cbi = pairs.groupBy("prev", "cur").agg(count(lit(1)).as("cbi"))
    val cctx = pairs.groupBy("prev").agg(count(lit(1)).as("cctx"))
    val g = Dedup.tokenTable(docs).agg(count_distinct(col("term")).as("v_size"))
    pairs.join(cbi, Seq("prev", "cur")).join(cctx, Seq("prev"))
      .crossJoin(broadcast(g))
      .withColumn("s", round(
        log((col("cbi") + 1).cast("double") /
          (col("cctx") + col("v_size")).cast("double")) * 1e9, 0).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        (sum("s").cast("double") / 1e9 / count(lit(1))).as("avg_logprob"))
  }

  /** Deterministic stratified sampling — the data-mixing primitive of a
    * training pipeline (keep fraction f(stratum) of each stratum, stable
    * across runs/partitioning): keep iff hash(doc_id)/2^32 < f. Same
    * multiplicative hash as [[split]]; no rand(), oracle-exact.
    */
  def stratifiedSample(docs: DataFrame, stratumCol: String,
      fracs: Map[String, Double], defaultFrac: Double = 0.0): DataFrame = {
    val h = (col("doc_id") * 2654435761L) % 4294967296L
    val f = fracs.foldLeft(lit(defaultFrac)) { case (acc, (k, frac)) =>
      when(col(stratumCol) === k, lit(frac)).otherwise(acc)
    }
    docs.filter(h.cast("double") < f * 4294967296.0)
  }

  /** Sliding-window document chunking — the ingestion step that turns long
    * documents into overlapping retrieval units (the reference stores
    * client-side pre-chunked text, base_milvus.py:1048; this is the
    * engine-side equivalent). Chunk c covers token positions
    * [c·stride+1, c·stride+size], stride = size − overlap; every window
    * that starts before the document's end is emitted, so short tail
    * chunks are kept (standard sliding-window semantics). One map-side
    * explode (each token lands in ≤ size/stride chunks) + one keyed
    * aggregation; integer arithmetic only, DuckDB-replicable.
    */
  def chunkDocs(docs: DataFrame, size: Int = 32, overlap: Int = 8): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size, "need 0 <= overlap < size")
    val stride = size - overlap
    Dedup.tokenTable(docs)
      .withColumn("lastC", expr(s"(pos - 1) div $stride"))
      .withColumn("firstC", when(col("pos") <= size, lit(0L))
        .otherwise(expr(s"(pos - $size + $stride - 1) div $stride")))
      .withColumn("chunk_id", explode(sequence(col("firstC"), col("lastC"))))
      .groupBy("doc_id", "chunk_id")
      .agg(
        array_join(expr(
          "transform(array_sort(collect_list(struct(pos, term))), x -> x.term)"),
          " ").as("chunk_text"),
        count(lit(1)).as("n_tokens"))
  }

  /** Contiguous token-budget sharding (the scalable form of sequence
    * packing): within each group, docs in doc_id order are assigned to
    * shards of ~`binTokens` whitespace tokens — shard_id = floor(running
    * total BEFORE this doc / binTokens). One window cumsum per group; a
    * shard may overflow by at most one document (greedy packing's usual
    * contract). Deterministic, DuckDB-replicable.
    */
  def tokenShards(docs: DataFrame, groupCol: String, binTokens: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("doc_id")
    docs.select(col("doc_id"), col(groupCol).as("grp"),
        size(Text.tokens(col("text"))).cast("long").as("toks"))
      .withColumn("cum", sum("toks").over(w))
      .withColumn("shard_id", expr(s"(cum - toks) div $binTokens"))
      .select("grp", "shard_id", "doc_id", "toks")
  }

  /** PII patterns shared with the oracle — deliberately simple regexes that
    * mean the same thing in Java and RE2 (no lookaround, no backrefs).
    */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** PII scrubbing (standard training-data hygiene pass): count and redact
    * email addresses and phone numbers. Pure regexp column ops — codegen'd,
    * no UDFs, embarrassingly parallel. Returns doc_id, n_emails, n_phones,
    * clean (redacted text), clean_len.
    */
  def scrubPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val clean = regexp_replace(regexp_replace(t, EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")
    docs.select(col("doc_id"),
      regexp_count(t, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(t, lit(PhoneRe)).cast("long").as("n_phones"),
      clean.as("clean"),
      length(clean).cast("long").as("clean_len"))
  }

  /** Per-source document cap (Common-Crawl-style curation: no domain may
    * dominate the mix): keep the `cap` longest docs per source, ties to the
    * lowest doc_id. Returns (doc_id, source, n_chars, rk).
    *
    * Plain `row_number` window — Spark 4 plants WindowGroupLimit partials
    * BEFORE the shuffle for rank-limit filters, so each map task forwards at
    * most `cap` rows per source it saw; the exchange carries
    * ≤ cap·|sources|·partitions rows, not the corpus.
    */
  def sourceCap(docs: DataFrame, cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))
    docs.select(col("doc_id"), col("source"), col("n_chars").cast("long").as("n_chars"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= cap)
  }

  /** Deterministic global shuffle into training shards: every doc gets a
    * pseudo-random rank from the same multiplicative hash as [[split]]
    * (Knuth, 2654435761 mod 2³²), shard = rank mod nShards, and an explicit
    * 1-based position in hash order within its shard. Returns
    * (doc_id, shard, pos).
    *
    * This is the "global shuffle before training" pass: the hash order is
    * uncorrelated with ingest order, reproducible across runs/engines, and
    * each shard sorts independently (the window keys the exchange on
    * `shard`, so a 100 TB corpus sorts as nShards parallel
    * corpus/nShards-sized sorts — in production the same frame writes via
    * `repartition(shard).sortWithinPartitions(h)`).
    */
  def shuffleShards(docs: DataFrame, nShards: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("h"), col("doc_id"))
    docs.select(col("doc_id"))
      .withColumn("h", (col("doc_id") * 2654435761L) % 4294967296L)
      .withColumn("shard", (col("h") % nShards).cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select("doc_id", "shard", "pos")
  }

  /** Fixed-length SEQUENCE PACKING: assign every document a contiguous
    * global token range, then cut the concatenated stream into training
    * sequences of exactly `seqLen` tokens (docs crossing a boundary span
    * sequences — standard concat-and-chunk packing, no padding waste).
    * Returns (doc_id, grp, toks, tok_start 0-based, seq_first, seq_last).
    *
    * The global prefix sum is TWO-PHASE so no window ever sees the corpus:
    * per-group running sums (parallel across groups, each a doc_id-ordered
    * partition-local sort) plus a group-offset table of |groups| rows whose
    * own cumsum is the only unpartitioned window — group count, not corpus
    * size. Same shape a 100 TB packing job would use with file-level
    * partitions as groups. Zero-token docs are dropped (they occupy no
    * range; emitting them would need a degenerate empty span).
    */
  def packSequences(docs: DataFrame, seqLen: Long,
      grpCol: String = "source"): DataFrame = {
    require(seqLen > 0, "seqLen > 0")
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("doc_id")
    val wG = org.apache.spark.sql.expressions.Window
      .orderBy("grp")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val perDoc = docs.select(col("doc_id"), col(grpCol).as("grp"),
        size(Text.tokens(col("text"))).cast("long").as("toks"))
      .filter(col("toks") > 0)
      .withColumn("cum_end", sum("toks").over(wIn))
    val offsets = perDoc.groupBy("grp").agg(sum("toks").as("gtoks"))
      .withColumn("goff", coalesce(sum("gtoks").over(wG), lit(0L)))
      .select("grp", "goff")
    perDoc.join(broadcast(offsets), "grp")
      .withColumn("tok_start", col("goff") + col("cum_end") - col("toks"))
      .withColumn("seq_first", expr(s"tok_start div $seqLen"))
      .withColumn("seq_last", expr(s"(goff + cum_end - 1) div $seqLen"))
      .select("doc_id", "grp", "toks", "tok_start", "seq_first", "seq_last")
  }

  /** Temperature-scaled source balancing (the multilingual-training mixing
    * device, exponent fixed at 1/2): source s keeps a
    * sqrt(n_s / n_max) fraction of its docs, so the largest source passes
    * whole while smaller sources are progressively LESS downsampled than
    * proportional mixing would — flattening the source distribution. The
    * exponent is sqrt and not a free power because IEEE sqrt is correctly
    * rounded in both engines while pow(x, 0.7) need not be — the oracle
    * compare demands bit-identical membership decisions. Selection is the
    * same Knuth-hash threshold as [[stratifiedSample]]. Returns per-source
    * (grp, n_docs, n_kept).
    */
  def temperatureSample(docs: DataFrame, grpCol: String = "source"): DataFrame = {
    val counts = docs.groupBy(col(grpCol).as("grp"))
      .agg(count(lit(1)).as("n_docs"))
    val nMax = counts.agg(max("n_docs").as("n_max"))
    val h = (col("doc_id") * 2654435761L) % 4294967296L
    val kept = docs.select(col("doc_id"), col(grpCol).as("grp"))
      .join(broadcast(counts), "grp").crossJoin(broadcast(nMax))
      .filter(h.cast("double") <
        sqrt(col("n_docs").cast("double") / col("n_max")) * 4294967296.0)
      .groupBy("grp").agg(count(lit(1)).as("n_kept"))
    counts.join(kept, Seq("grp"), "left")
      .select(col("grp"), col("n_docs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** The Gopher required-stopword list (Rae et al. 2021, table A1): a doc
    * must contain at least [[GopherMinStopHits]] distinct words from it.
    */
  val GopherReqStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")
  val GopherMinStopHits = 2

  /** Gopher quality-rule document filter (Rae et al. 2021, table A1 — the
    * standard pretraining heuristic gate). Per-doc signals plus the
    * conjunction verdict, all column arithmetic (no UDFs) with
    * DuckDB-replicable semantics:
    *   - word count in [minWords, maxWords]
    *   - mean word length in [3, 10] chars
    *   - symbol-to-word ratio ('#' chars + non-overlapping '...' runs) < 0.1
    *   - < 90% of non-empty lines bullet-led ("- " / "* "), < 30% ending "..."
    *   - >= 80% of words containing an alphabetic character
    *   - >= 2 distinct hits from the required-stopword list
    * Ratio denominators use greatest(n,1) so symbol-only docs produce exact
    * zeros instead of NULL/NaN (they fail the word-count rule regardless).
    * Every ratio is an exact-integer division — bit-identical in the oracle.
    * Single map-side projection per doc: no shuffle, no join; at 100 TB this
    * runs embarrassingly parallel over file splits.
    * Returns (doc_id, n_words, mean_word_len, alpha_frac, symbol_ratio,
    * bullet_frac, ellipsis_frac, stop_hits, keep 0/1).
    */
  def gopherRules(docs: DataFrame, minWords: Long = 50L,
      maxWords: Long = 100000L): DataFrame = {
    val toks  = Text.tokens(col("text"))
    val lines = filter(
      org.apache.spark.sql.functions.split(col("text"), "\n", -1), l => l =!= "")
    val hashCnt = (length(col("text")) -
      length(replace(col("text"), lit("#"), lit("")))).cast("long")
    val ellCnt = ((length(col("text")) -
      length(replace(col("text"), lit("..."), lit("")))) / lit(3)).cast("long")
    val sig = docs.select(col("doc_id"),
      size(toks).cast("long").as("n_words"),
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("char_sum"),
      size(filter(toks, t => t.rlike("[a-z]"))).cast("long").as("alpha_words"),
      (hashCnt + ellCnt).as("sym_cnt"),
      size(lines).cast("long").as("n_lines"),
      size(filter(lines, l => l.like("- %") || l.like("* %")))
        .cast("long").as("bullet_lines"),
      size(filter(lines, l => l.like("%..."))).cast("long").as("ellipsis_lines"),
      GopherReqStops.map(w => when(array_contains(toks, w), 1L).otherwise(0L))
        .reduce(_ + _).as("stop_hits"))
    sig
      .withColumn("mean_word_len",
        col("char_sum").cast("double") / greatest(col("n_words"), lit(1L)))
      .withColumn("alpha_frac",
        col("alpha_words").cast("double") / greatest(col("n_words"), lit(1L)))
      .withColumn("symbol_ratio",
        col("sym_cnt").cast("double") / greatest(col("n_words"), lit(1L)))
      .withColumn("bullet_frac",
        col("bullet_lines").cast("double") / greatest(col("n_lines"), lit(1L)))
      .withColumn("ellipsis_frac",
        col("ellipsis_lines").cast("double") / greatest(col("n_lines"), lit(1L)))
      .withColumn("keep",
        (col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
          col("symbol_ratio") < 0.1 &&
          col("bullet_frac") < 0.9 && col("ellipsis_frac") < 0.3 &&
          col("alpha_frac") > 0.8 &&
          col("stop_hits") >= GopherMinStopHits).cast("long"))
      .select("doc_id", "n_words", "mean_word_len", "alpha_frac",
        "symbol_ratio", "bullet_frac", "ellipsis_frac", "stop_hits", "keep")
  }

  /** C4 heuristic clean (Raffel et al. 2020 §2.2 — the public filter set):
    * line-level keeps (terminal punctuation, >= minLineWords words, no
    * "javascript") and page-level gates (>= minSentences sentence enders,
    * no "lorem ipsum", no '{'). Sentence counting is the documented
    * approximation (terminal-punct chars), not a sentence splitter. Like
    * [[gopherRules]] this is one map-side projection per doc — no shuffle,
    * no join — and every output is integer-exact for the oracle.
    * Returns (doc_id, n_lines, n_kept_lines, n_sentences, has_lorem,
    * has_brace, clean_chars, keep 0/1) where clean_chars is the length of
    * the kept-lines text the pipeline would emit.
    */
  def c4Rules(docs: DataFrame, minLineWords: Int = 5,
      minSentences: Int = 3): DataFrame = {
    val F = org.apache.spark.sql.functions
    val lines = filter(F.split(col("text"), "\n", -1), l => l =!= "")
    def lineWords(l: Column) =
      size(filter(F.split(lower(l), "[^a-z0-9]+"), t => t =!= ""))
    val kept = filter(lines, l =>
      (rtrim(l).like("%.") || rtrim(l).like("%!") ||
        rtrim(l).like("%?") || rtrim(l).like("%\"")) &&
        lineWords(l) >= minLineWords && !lower(l).contains("javascript"))
    val punct = (length(col("text")) - length(
      replace(replace(replace(col("text"), lit("."), lit("")),
        lit("!"), lit("")), lit("?"), lit("")))).cast("long")
    docs.select(col("doc_id"),
        size(lines).cast("long").as("n_lines"),
        size(kept).cast("long").as("n_kept_lines"),
        punct.as("n_sentences"),
        lower(col("text")).contains("lorem ipsum").cast("long").as("has_lorem"),
        col("text").contains("{").cast("long").as("has_brace"),
        length(array_join(kept, "\n")).cast("long").as("clean_chars"))
      .withColumn("keep",
        (col("n_sentences") >= minSentences &&
          col("has_lorem") === 0L && col("has_brace") === 0L &&
          col("n_kept_lines") >= 1L).cast("long"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): within each
    * language, rank documents by LM score and cut into head/middle/tail
    * terciles — the standard device for quality-stratifying a crawl before
    * mixing. The scorer is [[unigramLogProb]] (already fixed-point and
    * hash-exact across engines); higher avg_logprob = lower perplexity =
    * head. NTILE over (lang) partitions with a doc_id tie-break makes the
    * assignment total and deterministic even for duplicate texts. The only
    * window is per-language — at 100 TB this is a per-lang sort, the same
    * shape CCNet itself shards by language. Docs with zero tokens have no
    * LM score and are absent (inner join), as in the scorer.
    * Returns (doc_id, lang, avg_logprob, tercile 1-3, bucket).
    */
  def perplexityBuckets(docs: DataFrame): DataFrame = {
    val lp = unigramLogProb(docs).select(col("doc_id"), col("avg_logprob"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("avg_logprob").desc, col("doc_id"))
    docs.select(col("doc_id"), col("lang")).join(lp, "doc_id")
      .withColumn("tercile", ntile(3).over(w).cast("long"))
      .withColumn("bucket",
        when(col("tercile") === 1L, "head")
          .when(col("tercile") === 2L, "middle").otherwise("tail"))
      .select("doc_id", "lang", "avg_logprob", "tercile", "bucket")
  }

  /** EXACT heavy-hitter terms (frequency share > minShare) via the
    * candidate-verify pattern: a Misra-Gries sketch pass proposes ≤k
    * candidates (guaranteed superset of every term with share > 1/(k+1)),
    * then a broadcast semi-join recounts ONLY the candidates exactly.
    *
    * The result is deterministic and equals the naive `GROUP BY term
    * HAVING count > n·minShare` — but the term universe never shuffles:
    * pass 1 exchanges ≤2k (term,count) pairs per partition (map-side MG
    * partials), pass 2 shuffles candidate rows only. At 100 TB the naive
    * form re-keys every token; this shape is two scans and two tiny
    * exchanges. Requires minShare > 1/(k+1) or the sketch guarantee
    * doesn't cover the threshold.
    *
    * Returns (term, n BIGINT) — every term with true count > n·minShare.
    */
  def heavyTerms(docs: DataFrame, k: Int, minShare: Double): DataFrame = {
    require(minShare > 1.0 / (k + 1),
      s"minShare $minShare below the k=$k sketch guarantee 1/(k+1)")
    val toks = Dedup.tokenTable(docs).select("term")
    // The sketch result is ONE row (≤k candidate terms + a count): collect
    // it once and inline it as literals, so the MG aggregate's corpus scan
    // runs exactly once. (Reading the sketch DF from two downstream
    // consumers would re-run the full tokenization+aggregate per consumer —
    // three corpus scans instead of the documented two.)
    val sketchRow = toks.agg(
      graft.functions.HeavyHitters.mgTerms(col("term"), k).as("cand"),
      count(lit(1)).as("n_total")).head()
    val candTerms = sketchRow.getSeq[String](0)
    val nTotal    = sketchRow.getLong(1)
    val spark = docs.sparkSession
    import spark.implicits._
    if (candTerms.isEmpty)
      return toks.limit(0).withColumn("n", lit(0L)).select("term", "n")
    toks.join(broadcast(candTerms.toDF("term")), "term")
      .groupBy("term").agg(count(lit(1)).as("n"))
      .filter(col("n").cast("double") > lit(nTotal).cast("double") * minShare)
      .select("term", "n")
  }
}
