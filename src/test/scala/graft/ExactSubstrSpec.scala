package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Exact-substring span dedup (Lee et al. 2022 relational form) and the
  * Gopher duplicate-n-gram char fraction, against hand-computed fixtures:
  * span merge, island gaps, intra-doc duplication, fully-duplicated docs.
  */
class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  // doc 0/3 share a 6-token prefix; doc 1 shares only "c d e"; doc 2 is
  // novel; doc 4 repeats "c d e" at both ends (gap > n => two islands);
  // doc 5 is one repeated token (entirely duplicated against itself).
  private val docs = Seq(
    (0L, "a b c d e f g h"),
    (1L, "x x y c d e z w"),
    (2L, "p q r s t u"),
    (3L, "a b c d e f q9 r9"),
    (4L, "c d e m1 m2 m3 m4 c d e"),
    (5L, "k k k k k"))
    .toDF("doc_id", "text")

  test("duplicatedSpans merges overlapping covers and splits gapped islands") {
    val spans = Dedup.duplicatedSpans(docs, n = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(spans === Set(
      (0L, 1L, 6L, 6L),            // abc..def starts 1..4 merge into [1,6]
      (1L, 4L, 6L, 3L),            // the lone "c d e" occurrence
      (3L, 1L, 6L, 6L),
      (4L, 1L, 3L, 3L), (4L, 8L, 10L, 3L), // gap 7 > n=3: two islands
      (5L, 1L, 5L, 5L)))           // intra-doc repeats count as duplicated
  }

  test("dropDuplicatedSpans removes covered tokens, keeps empty docs visible") {
    val out = Dedup.dropDuplicatedSpans(docs, n = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet
    assert(out === Set(
      (0L, 8L, 2L, 6L, "g h"),
      (1L, 8L, 5L, 3L, "x x y z w"),
      (2L, 6L, 6L, 0L, "p q r s t u"),
      (3L, 8L, 2L, 6L, "q9 r9"),
      (4L, 10L, 4L, 6L, "m1 m2 m3 m4"),
      (5L, 5L, 0L, 5L, "")))       // fully-duplicated doc stays, empty
  }

  test("dupNgramCharFraction is union coverage of intra-doc repeats") {
    val in = Seq(
      (0L, "a b c d e f g h"),     // no repeated 2-gram
      (5L, "k k k k k"),           // kk everywhere: full coverage
      (6L, "u v u v w"))           // uv at 1 and 3: covers pos 1..4 of 5
      .toDF("doc_id", "text")
    val out = Dedup.dupNgramCharFraction(in, n = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(out === Set(
      (0L, 8L, 0L, 0.0),
      (5L, 5L, 5L, 1.0),
      (6L, 5L, 4L, 0.8)))
  }

  test("span detection is cross-doc AND intra-doc (corpus multiplicity)") {
    // "c d e" appears once each in two docs -> duplicated for both
    val two = Seq((0L, "c d e q w"), (1L, "m n c d e")).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(two, n = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans === Set((0L, 1L, 3L), (1L, 3L, 5L)))
  }
}
