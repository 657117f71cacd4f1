package graft

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-9 curation operators: Bloom-prefiltered decontamination, SemDeDup
  * semantic dedup, per-source caps, deterministic shuffle shards.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // train docs share the "spark join window" shingles with test doc 10;
  // test doc 11 is fully novel. Lots of train-only shingles for the Bloom
  // prefilter to discard.
  private val docs = Seq(
    (0L, "spark join window merge data table scan filter"),
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "one two three four five six seven eight nine ten"),
    (10L, "spark join window about nothing else at all"),
    (11L, "entirely novel holdout content with fresh tokens"))
    .toDF("doc_id", "text")
  private val splitDf = Seq(
    (0L, "train"), (1L, "train"), (2L, "train"),
    (10L, "test"), (11L, "test")).toDF("doc_id", "split")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shingles"),
      r.getAs[Long]("n_seen"), r.getAs[Double]("contamination"))).toSet

  test("contaminationBloom is bit-identical to contamination at any fpp") {
    val exact = rows(Dedup.contamination(docs, splitDf))
    assert(exact.nonEmpty && exact.exists(_._3 > 0),
      "fixture must have real train/test overlap")
    // tight and deliberately FP-heavy filters must both reproduce the exact
    // operator: false positives survive the prefilter but match nothing in
    // the exact overlap join
    assert(rows(Dedup.contaminationBloom(docs, splitDf, fpp = 0.01)) == exact)
    assert(rows(Dedup.contaminationBloom(docs, splitDf, fpp = 0.5)) == exact)
  }

  test("semanticDedup drops intra-cluster near-dups, keeps across clusters") {
    // seeds: 0 -> (1000,0), 1 -> (0,1000). 2 is a near-copy of seed 0,
    // 3 of seed 1; 4 lands in cluster 0 but is far from everything there
    // at threshold 0.9.
    val emb = Seq(
      (0L, Array(1000.0, 0.0)),
      (1L, Array(0.0, 1000.0)),
      (2L, Array(999.0, 10.0)),
      (3L, Array(10.0, 999.0)),
      (4L, Array(700.0, -700.0)))
      .toDF("doc_id", "qv")
    val kept = Dedup.semanticDedup(emb, k = 2, threshold = 0.9).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    assert(kept == Map(0L -> 0L, 1L -> 1L, 4L -> 0L), s"got $kept")
  }

  test("semanticDedup assignment ties break to the lowest centroid id") {
    val emb = Seq(
      (0L, Array(1000.0, 0.0)),
      (1L, Array(0.0, 1000.0)),
      (5L, Array(500.0, 500.0))) // equal cosine to both seeds
      .toDF("doc_id", "qv")
    val kept = Dedup.semanticDedup(emb, k = 2, threshold = 0.99).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    assert(kept(5L) == 0L, s"tie must go to centroid 0, got ${kept(5L)}")
  }

  test("sourceCap keeps the cap longest docs per source, ties to low id") {
    val d = Seq(
      (1L, "web", 50L), (2L, "web", 90L), (3L, "web", 90L), (4L, "web", 10L),
      (5L, "book", 70L))
      .toDF("doc_id", "source", "n_chars")
    val got = TextAnalysis.sourceCap(d, cap = 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("rk"))).toSet
    assert(got == Set((2L, "web", 1L), (3L, "web", 2L), (5L, "book", 1L)),
      s"got $got")
  }

  test("shuffleShards covers every doc once with hash-ordered positions") {
    val d = (0L until 10L).toDF("doc_id")
    val got = TextAnalysis.shuffleShards(d, nShards = 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("pos")))
    assert(got.map(_._1).toSet == (0L until 10L).toSet)
    def h(id: Long) = (id * 2654435761L) % 4294967296L
    // shard assignment is the documented hash
    got.foreach { case (id, shard, _) => assert(shard == h(id) % 3) }
    // positions are 1..n_shard in hash order within each shard
    got.groupBy(_._2).foreach { case (_, rs) =>
      val byPos = rs.sortBy(_._3)
      assert(byPos.map(_._3).toSeq == (1L to rs.length).toSeq)
      assert(byPos.map(r => h(r._1)).toSeq == byPos.map(r => h(r._1)).sorted.toSeq)
    }
  }

  private def gopherRow(df: org.apache.spark.sql.DataFrame, id: Long) =
    df.filter(col("doc_id") === id).collect().head

  test("gopherRules signals hand-computed on a clean doc") {
    val d = Seq((0L, "the cat sat with the dog and that was it"))
      .toDF("doc_id", "text")
    val r = gopherRow(TextAnalysis.gopherRules(d, minWords = 5L), 0L)
    assert(r.getAs[Long]("n_words") == 10L)
    assert(r.getAs[Double]("mean_word_len") == 31.0 / 10)
    assert(r.getAs[Double]("alpha_frac") == 1.0)
    assert(r.getAs[Double]("symbol_ratio") == 0.0)
    assert(r.getAs[Long]("stop_hits") == 4L) // the, and, that, with
    assert(r.getAs[Long]("keep") == 1L)
  }

  test("gopherRules fails each rule independently") {
    val d = Seq(
      // symbol-heavy: 4 '#' over 6 words = 0.667 > 0.1
      (1L, "# # # # the and with that be of"),
      // all lines bullet-led -> bullet_frac 1.0 >= 0.9
      (2L, "- the cat and dog\n- that was with it\n- be of the end"),
      // every line ends '...' -> ellipsis_frac 1.0 > 0.3
      (3L, "the cat and dog that...\nwas with it be of..."),
      // numeric tokens: alpha_frac 2/7 < 0.8
      (4L, "1 2 3 4 5 the and"),
      // only one required stopword present
      (5L, "cats sit quietly near windows the whole day"),
      // word count below the floor
      (6L, "the and that with"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(d, minWords = 5L)
    assert(out.filter(col("keep") === 1L).count() == 0)
    assert(gopherRow(out, 1L).getAs[Double]("symbol_ratio") == 4.0 / 6)
    assert(gopherRow(out, 2L).getAs[Double]("bullet_frac") == 1.0)
    assert(gopherRow(out, 3L).getAs[Double]("ellipsis_frac") == 1.0)
    assert(gopherRow(out, 4L).getAs[Double]("alpha_frac") == 2.0 / 7)
    assert(gopherRow(out, 5L).getAs[Long]("stop_hits") == 1L)
    assert(gopherRow(out, 6L).getAs[Long]("n_words") == 4L)
  }

  test("gopherRules counts '...' runs non-overlapping and '#' per char") {
    // 5 dots = one non-overlapping '...' run (replace eats left-to-right)
    val d = Seq((0L, "a..... b ## c")).toDF("doc_id", "text")
    val r = gopherRow(TextAnalysis.gopherRules(d, minWords = 1L), 0L)
    assert(r.getAs[Double]("symbol_ratio") == 3.0 / 3) // 2 '#' + 1 run over 3 words
  }

  test("perplexityBuckets cuts per-lang terciles with head = most probable") {
    // one language, 6 docs: doc 0 repeats the corpus-dominant token (highest
    // avg logprob -> head); doc 5 is all-unique tokens (tail); 1..4 mix.
    val d = Seq(
      (0L, "aa aa aa aa", "en"),
      (1L, "aa aa bb bb", "en"),
      (2L, "aa bb cc dd", "en"),
      (3L, "aa bb ee ff", "en"),
      (4L, "gg hh ii aa", "en"),
      (5L, "jj kk ll mm", "en"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.perplexityBuckets(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("tercile"), r.getAs[String]("bucket"))).toMap
    assert(out(0L) == (1L, "head"))
    assert(out(5L) == (3L, "tail"))
    assert(out.values.map(_._1).groupBy(identity).view.mapValues(_.size).toMap ==
      Map(1L -> 2, 2L -> 2, 3L -> 2)) // NTILE(3) over 6 docs = 2/2/2
  }

  test("c4Rules keeps punctuated >=5-word lines and gates pages") {
    val l1 = "This is a good line with seven words."
    val l2 = "Another fine line stands right here today!"
    val l3 = "Short one."
    val l4 = "A third full sentence line ends here?"
    val d = Seq(
      (0L, s"$l1\n$l2\n$l3\n$l4"),                       // clean page
      (1L, "Please enable javascript to view this page."), // js line dropped
      (2L, "Lorem ipsum dolor sit amet etc etc.\nMore words follow in this line today.\nAnd a third sentence is right here."),
      (3L, "function foo() { return 1; }\nA normal sentence with enough words here.\nAnother normal sentence with enough words too.\nA third normal sentence with enough words now."),
      (4L, "One line with plenty of words ends here."),   // 1 sentence < 3
      (5L, "this line just ends without punctuation\nso does this one here"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.c4Rules(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Long]("n_kept_lines") == 3L) // short line dropped
    assert(out(0L).getAs[Long]("n_sentences") == 4L)
    assert(out(0L).getAs[Long]("clean_chars") == s"$l1\n$l2\n$l4".length.toLong)
    assert(out(0L).getAs[Long]("keep") == 1L)
    assert(out(1L).getAs[Long]("n_kept_lines") == 0L) // javascript filter
    assert(out(2L).getAs[Long]("has_lorem") == 1L)
    assert(out(3L).getAs[Long]("has_brace") == 1L)
    assert(out(4L).getAs[Long]("n_sentences") == 1L)
    assert(out(5L).getAs[Long]("n_kept_lines") == 0L) // no terminal punct
    assert((1L to 5L).forall(out(_).getAs[Long]("keep") == 0L))
  }

  test("boilerplateLines strikes lines shared by more than maxDf docs") {
    val d = Seq(
      (1L, "unique one\nSHARED\nother a"),
      (2L, "unique two\nSHARED\nother b"),
      (3L, "unique three\nSHARED"))
      .toDF("doc_id", "text")
    val got = Dedup.boilerplateLines(d, maxDf = 2L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("n_boiler"),
          r.getAs[Long]("clean_chars"))).toMap
    // SHARED appears in 3 > 2 docs -> struck everywhere; clean_chars =
    // kept line lengths + (kept-1) joining newlines
    assert(got(1L) == (3L, 1L, ("unique one".length + "other a".length + 1).toLong))
    assert(got(2L) == (3L, 1L, ("unique two".length + "other b".length + 1).toLong))
    assert(got(3L) == (2L, 1L, "unique three".length.toLong))
    // at maxDf = 3 nothing is boilerplate and full lengths survive
    val loose = Dedup.boilerplateLines(d, maxDf = 3L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_boiler")).toMap
    assert(loose.values.forall(_ == 0L))
  }

  test("dropBoilerplateLines rebuilds docs in order; fully-struck docs stay") {
    val d = Seq(
      (1L, "first\nSHARED\nlast"),
      (2L, "SHARED\nmiddle two"),
      (3L, "SHARED"))
      .toDF("doc_id", "text")
    val got = Dedup.dropBoilerplateLines(d, maxDf = 2L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("clean_text")).toMap
    assert(got == Map(
      1L -> "first\nlast",
      2L -> "middle two",
      3L -> "")) // every line struck -> visible with empty text
  }

  test("boilerplateLines counts df by distinct docs, not occurrences") {
    // doc 1 repeats INTRA-doc: df is still 1, so nothing is struck at
    // maxDf = 1 except the truly cross-doc line
    val d = Seq(
      (1L, "echo\necho\ncross"),
      (2L, "cross\nsolo"))
      .toDF("doc_id", "text")
    val got = Dedup.boilerplateLines(d, maxDf = 1L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("n_boiler"))).toMap
    assert(got(1L) == (3L, 1L)) // only "cross" struck; both echoes kept
    assert(got(2L) == (2L, 1L))
  }

  test("perplexityBuckets breaks duplicate-text ties by doc_id") {
    val d = Seq(
      (7L, "aa aa", "en"), (3L, "aa aa", "en"), (5L, "aa aa", "en"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.perplexityBuckets(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("tercile")).toMap
    assert(out == Map(3L -> 1L, 5L -> 2L, 7L -> 3L))
  }
}
