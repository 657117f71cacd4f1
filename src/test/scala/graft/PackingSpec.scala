package graft

import graft.operators.TextAnalysis

/** Sequence packing and temperature-scaled source balancing against
  * hand-computed fixtures (two-phase prefix sum; sqrt keep fractions).
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences cuts the concatenated group streams at seqLen") {
    // source A: 3 + 4 tokens; source B: 5 tokens; seqLen 4.
    // Global order (A, then B): doc1 [0,2], doc2 [3,6], doc3 [7,11].
    val docs = Seq(
      (1L, "a b c", "A"),
      (2L, "d e f g", "A"),
      (3L, "h i j k l", "B"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.packSequences(docs, seqLen = 4L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(out === Set(
      (1L, "A", 3L, 0L, 0L, 0L),
      (2L, "A", 4L, 3L, 0L, 1L),   // crosses the 4-token boundary
      (3L, "B", 5L, 7L, 1L, 2L)))  // offset by A's 7 tokens, spans two seqs
  }

  test("packSequences token ranges tile the corpus exactly") {
    val docs = Tables.docsDf
    val out = TextAnalysis.packSequences(docs, seqLen = 512L)
      .select("toks", "tok_start").collect()
    val total = out.map(_.getLong(0)).sum
    assert(out.map(r => r.getLong(1) + r.getLong(0)).max === total)
    assert(out.map(_.getLong(1)).min === 0L)
    // ranges are disjoint and contiguous: starts sorted == running sums
    val starts = out.sortBy(_.getLong(1)).map(_.getLong(1))
    val cums = out.sortBy(_.getLong(1)).map(_.getLong(0))
      .scanLeft(0L)(_ + _).dropRight(1)
    assert(starts.sameElements(cums))
  }

  private object Tables {
    def docsDf = {
      val dir = Sf
      spark.read.parquet(s"$dir/documents.parquet")
    }
  }

  test("bigramLogProb: add-one conditionals against a hand computation") {
    // corpus = "a b a b" + "solo": bigrams (a,b)x2, (b,a)x1; contexts a=2,
    // b=1; V=3 ("solo" counts toward the unigram vocab). p(b|a)=(2+1)/(2+3),
    // p(a|b)=(1+1)/(1+3); avg = (2 ln 3/5 + ln 1/2)/3.
    val docs = Seq((1L, "a b a b"), (2L, "solo")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(docs).collect()
    assert(out.length === 1 && out.head.getLong(0) === 1L) // no bigram in doc 2
    assert(out.head.getLong(1) === 3L)
    // fixed-point rounding keeps us within 1e-9 of the real-valued mean
    assert(math.abs(out.head.getDouble(2) - (-0.5715994760306423)) < 1e-8)
  }

  test("temperatureSample keeps the largest source whole, flattens the rest") {
    // A has 4 docs (n_max) -> keep fraction 1.0; B has 1 doc -> sqrt(1/4)=0.5
    // and doc 1's Knuth hash lands in the upper half -> dropped.
    val docs = Seq(
      (10L, "x", "A"), (11L, "x", "A"), (12L, "x", "A"), (13L, "x", "A"),
      (1L, "x", "B"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.temperatureSample(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set(("A", 4L, 4L), ("B", 1L, 0L)))
    // swap B's doc for one whose hash lands low -> kept
    val docs2 = Seq(
      (10L, "x", "A"), (11L, "x", "A"), (12L, "x", "A"), (13L, "x", "A"),
      (2L, "x", "B"))
      .toDF("doc_id", "text", "source")
    val out2 = TextAnalysis.temperatureSample(docs2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out2 === Set(("A", 4L, 4L), ("B", 1L, 1L)))
  }
}
