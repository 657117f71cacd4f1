package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING (Sennrich et al. 2016 — the standard
  * subword-vocabulary learner every modern LM tokenizer descends from).
  * The reference pipeline only counts tokens; training the tokenizer is the
  * missing upstream step of a corpus pipeline, and its classic
  * implementation is driver-bound (a dict of word counts). This one is
  * Spark-shaped end to end:
  *
  *   - the word vocabulary (the heavy pass — every token of the corpus) is
  *     one distributed groupBy;
  *   - each merge round is two narrow steps on the VOCAB table (distinct
  *     words, not corpus tokens): explode adjacent symbol pairs → weighted
  *     count → argmax, then a fold-based in-array merge of the winning pair.
  *     Only the single argmax row crosses the driver per round;
  *   - the vocab DataFrame is localCheckpoint'd per round (same driver-loop
  *     hygiene as [[Dedup.components]] and the HNSW beam search).
  *
  * At 100 TB the corpus pass stays one shuffle; the merge loop runs on the
  * vocabulary (∝ distinct words, millions — not the corpus), each round a
  * bounded two-stage job. numMerges is small by construction (a tokenizer
  * is 10k–100k merges; each is O(vocab)).
  *
  * Determinism: argmax ties break lexicographically on (a, b), so the merge
  * sequence is a pure function of the corpus — reruns and the spec's
  * hand-computed fixture agree exactly.
  */
object Bpe {

  /** End-of-word marker (Sennrich's `</w>`): distinguishes "est" inside a
    * word from "est" ending one, and lets decoding restore word boundaries.
    */
  val Eow = "</w>"

  /** Word vocabulary with counts and the initial symbol sequence
    * (characters + [[Eow]]): one corpus-wide groupBy — the only pass whose
    * cost scales with corpus size.
    */
  def vocab(docs: DataFrame): DataFrame =
    Dedup.tokenTable(docs)
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .withColumn("syms", concat(
        expr("transform(sequence(1, length(term)), i -> substring(term, i, 1))"),
        array(lit(Eow))))

  /** Weighted adjacent-pair counts over a vocab table (the scoring relation
    * each training round argmaxes): (a, b, c BIGINT) — c = Σ word-count over
    * every adjacency of the pair. Public so the FIRST merge pick (one
    * argmax = one SQL query) is oracle-checkable against DuckDB.
    */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("cnt"), explode(pairsOf(col("syms"))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("cnt").as("c"))

  /** Adjacent-pair table of a symbol column: (a, b) per neighboring symbol
    * pair, weighted by the word count downstream.
    */
  private def pairsOf(syms: Column): Column =
    zip_with(
      slice(syms, lit(1), size(syms) - 1),
      slice(syms, lit(2), size(syms) - 1),
      (a, b) => struct(a.as("a"), b.as("b")))

  /** One left-to-right, non-overlapping merge of the pair (a, b) into a+b
    * within a symbol array, as a pure fold — no UDF, codegen-friendly
    * aside from the lambda interpretation, and bitwise deterministic.
    */
  def mergeOnce(syms: Column, a: String, b: String): Column =
    aggregate(syms,
      array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 && element_at(acc, -1) === a && s === b,
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(s))))

  /** Train `numMerges` BPE merges over the corpus. Returns the merge table
    * in training order: (rank 1-based, a, b, merged, pair_count). Stops
    * early when no adjacent pair remains (fully merged vocabulary).
    */
  def train(docs: DataFrame, numMerges: Int): Seq[(Int, String, String, String, Long)] = {
    require(numMerges >= 1, "numMerges >= 1")
    var v = vocab(docs).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var exhausted = false
    var rank = 1
    while (rank <= numMerges && !exhausted) {
      // weighted pair counts over the vocab; argmax with lexicographic
      // tie-break — ONE row to the driver per round
      val top = pairCounts(v)
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, a, b, a + b, c))
        v = v.withColumn("syms", mergeOnce(col("syms"), a, b)).localCheckpoint()
        rank += 1
      }
    }
    merges.toSeq
  }

  /** Segment a term table (column `term`) with a learned merge sequence:
    * applies every merge in training order. Returns (term, pieces). The
    * fold chain builds one deep expression — fine for the request-sized
    * merge lists specs use; bulk encoding at full tokenizer size would
    * batch the merges through intermediate checkpoints the same way
    * training does.
    */
  def encodeTerms(terms: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val init: Column = concat(
      expr("transform(sequence(1, length(term)), i -> substring(term, i, 1))"),
      array(lit(Eow)))
    val pieces = merges.foldLeft(init) { case (acc, (a, b)) => mergeOnce(acc, a, b) }
    terms.withColumn("pieces", pieces)
  }
}
