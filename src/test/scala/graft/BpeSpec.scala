package graft

import graft.operators.Bpe

/** BPE tokenizer training: the Sennrich et al. 2016 worked example,
  * hand-computed merge-by-merge (counts, lexicographic tie-breaks), plus
  * segmentation of an unseen word with the learned merges.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic fixture: low×5, lower×2, newest×6, widest×3
  private def corpus = Seq(
    (1L, Seq.fill(5)("low").mkString(" ")),
    (2L, Seq.fill(2)("lower").mkString(" ")),
    (3L, Seq.fill(6)("newest").mkString(" ")),
    (4L, Seq.fill(3)("widest").mkString(" ")))
    .toDF("doc_id", "text")

  test("train reproduces the hand-computed merge sequence with tie-breaks") {
    val merges = Bpe.train(corpus, 5)
    // round 1: (e,s),(s,t),(t,</w>) all 9 — lexicographic tie-break picks
    // (e,s); rounds 2-3 cascade est, est</w>; round 4 ties (l,o)/(o,w) at 7
    assert(merges == Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "est", "</w>", "est</w>", 9L),
      (4, "l", "o", "lo", 7L),
      (5, "lo", "w", "low", 7L)), s"got $merges")
  }

  test("train is deterministic across runs") {
    assert(Bpe.train(corpus, 4) == Bpe.train(corpus, 4))
  }

  test("train stops early when the vocabulary is fully merged") {
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // "ab</w>" has 2 pairs to merge; a huge budget must not loop past them
    val merges = Bpe.train(tiny, 50)
    assert(merges.length == 2)
    assert(merges.map(_._4) == Seq("ab", "ab</w>"))
  }

  test("encodeTerms segments an unseen word with the learned merges") {
    val merges = Bpe.train(corpus, 5).map(m => (m._2, m._3))
    val pieces = Bpe.encodeTerms(Seq("lowest").toDF("term"), merges)
      .select("pieces").as[Seq[String]].head()
    assert(pieces == Seq("low", "est</w>"))
  }

  test("mergeOnce is left-to-right non-overlapping") {
    val got = Bpe.encodeTerms(Seq("aaa").toDF("term"), Seq(("a", "a")))
      .select("pieces").as[Seq[String]].head()
    assert(got == Seq("aa", "a", "</w>"))
  }
}
