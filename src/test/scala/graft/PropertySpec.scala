package graft

import graft.core.Tables
import graft.operators._
import graft.sources.VectorStoreCatalog
import graft.api.{EmbeddedVector, SchemaSpec}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import java.nio.file.Files

/** Property tests per SURVEY §5: RRF monotonicity, top-k ⊆ brute force,
  * BM25 vs hand computation (in Bm25Spec), IVF recall (in IvfSpec).
  */
class PropertySpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("RRF is monotone: better ranks in both legs => higher fused score") {
    check(Prop.forAll(Gen.choose(1L, 50L), Gen.choose(1L, 50L), Gen.choose(0L, 49L),
      Gen.choose(0L, 49L)) { (rd: Long, rs: Long, dd: Long, ds: Long) =>
      def rrf(d: Long, s: Long) = 1.0 / (60.0 + d) + 1.0 / (60.0 + s)
      rrf(rd, rs) <= rrf(math.max(1, rd - dd), math.max(1, rs - ds))
    })
  }

  test("components equal a driver-side BFS closure on random pair graphs") {
    import spark.implicits._
    val gen = for {
      n     <- Gen.choose(2, 24)
      m     <- Gen.choose(1, 30)
      pairs <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1) if a != b
      } yield (a, b))
    } yield pairs
    // 15 random graphs through the full Spark path (each run is a real
    // iterative job — 200 would be slow for no extra coverage)
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15),
      Prop.forAll(gen) { pairs =>
        // reference: BFS closure on the driver (gen guarantees >= 1 pair)
        val adj = (pairs ++ pairs.map(_.swap))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        def root(v: Long): Long = {
          var seen = Set(v); var frontier = Set(v)
          while (frontier.nonEmpty) {
            frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
            seen ++= frontier
          }
          seen.min
        }
        val expect = adj.keySet.map(v => v -> root(v)).toMap
        val got = Dedup.components(pairs.toDF("doc_a", "doc_b")).collect()
          .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("root")).toMap
        got == expect
      })
    assert(res.passed, res.status.toString)
  }

  test("top-k results are a prefix of the brute-force ranking (k' <= k nests)") {
    val corpus = Tables.ordersCorpus(spark, Sf)
    val queries = Tables.queryBatch(spark, 3)
    val k10 = Knn.search(corpus, queries, SearchParams(limit = 10, outputFields = Nil))
      .collect().groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("doc_id")).toSeq).toMap
    val k5 = Knn.search(corpus, queries, SearchParams(limit = 5, outputFields = Nil))
      .collect().groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("doc_id")).toSeq).toMap
    k5.foreach { case (qid, ids) => assert(ids == k10(qid).take(5)) }
  }

  test("all TopK strategies produce identical results") {
    val scored = Knn.scored(
      Tables.ordersCorpus(spark, Sf).select("doc_id", "dv"),
      Tables.queryBatch(spark, 4), "COSINE")
    def run(strategy: String) = {
      // exercise private strategies through the public switch via reflection-free
      // route: perKey reads env once, so compare agg (default) vs window here
      strategy match {
        case "window" =>
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("qid")).orderBy(col("rawScore").desc, col("doc_id").asc)
          scored.withColumn("rank", row_number().over(w).cast("long"))
            .filter(col("rank") <= 7)
            .select("qid", "rank", "doc_id", "rawScore")
        case _ =>
          TopK.perKey(scored, "qid", "rawScore", "doc_id", 7)
            .select("qid", "rank", "doc_id", "rawScore")
      }
    }
    val a = run("agg").collect().map(_.toSeq).toSet
    val b = run("window").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("pipeline-op invariants: scrub idempotent, ratios bounded, shingle sizes") {
    import spark.implicits._
    val docs = Tables.load(spark, Sf, "documents")

    // scrubPii is idempotent: scrubbing clean text changes nothing
    val withPii = docs.limit(50).withColumn("text",
      concat(col("text"), lit(" user"), col("doc_id"), lit("@example.com 555-123-4567")))
    val once = TextAnalysis.scrubPii(withPii)
    val twice = TextAnalysis.scrubPii(once.select(col("doc_id"), col("clean").as("text")))
    assert(twice.filter(col("n_emails") > 0 || col("n_phones") > 0).count() == 0)
    assert(once.filter(col("n_emails") === 0).count() == 0)

    // dup_frac and rep_ratio live in [0, 1]; n_dup <= n_grams; max_rep <= n_grams
    val ov = Dedup.ngramOverlap(docs.limit(100), n = 8)
    assert(ov.filter(col("dup_frac") < 0 || col("dup_frac") > 1 ||
      col("n_dup") > col("n_grams")).count() == 0)
    val rep = Dedup.repetition(docs.limit(100))
    assert(rep.filter(col("rep_ratio") <= 0 || col("rep_ratio") > 1 ||
      col("max_rep") > col("n_grams")).count() == 0)

    // a doc with n tokens yields max(0, n - k + 1) k-shingles
    val one = Seq((0L, "a b c d e")).toDF("doc_id", "text")
    assert(Dedup.shinglesN(one, 3).count() == 3)
    assert(Dedup.shinglesN(one, 5).count() == 1)
    assert(Dedup.shinglesN(one, 6).count() == 0)
    // an identical doc pair is 100% 3-gram-duplicated
    val pair = Seq((0L, "x y z w"), (1L, "x y z w")).toDF("doc_id", "text")
    assert(Dedup.ngramOverlap(pair, n = 3).filter(col("dup_frac") =!= 1.0).count() == 0)
  }

  test("curation-filter invariants on the real corpus") {
    import spark.implicits._
    val docs = Tables.load(spark, Sf, "documents")

    // Gopher signals: every fraction in [0, 1], stop_hits bounded by the
    // list size, keep implies every individual rule holds
    val g = TextAnalysis.gopherRules(docs, minWords = 20L)
    assert(g.filter(
      col("alpha_frac") < 0 || col("alpha_frac") > 1 ||
        col("bullet_frac") < 0 || col("bullet_frac") > 1 ||
        col("ellipsis_frac") < 0 || col("ellipsis_frac") > 1 ||
        col("stop_hits") < 0 ||
        col("stop_hits") > TextAnalysis.GopherReqStops.size).count() == 0)
    assert(g.filter(col("keep") === 1L &&
      (col("n_words") < 20L || col("alpha_frac") <= 0.8 ||
        col("stop_hits") < TextAnalysis.GopherMinStopHits)).count() == 0)

    // C4: kept lines never exceed lines; cleaned text never exceeds the
    // original length; keep implies a kept line exists
    val c = TextAnalysis.c4Rules(docs)
      .join(docs.select(col("doc_id"), length(col("text")).as("orig_chars")), "doc_id")
    assert(c.filter(col("n_kept_lines") > col("n_lines") ||
      col("clean_chars") > col("orig_chars") ||
      (col("keep") === 1L && col("n_kept_lines") === 0L)).count() == 0)

    // boilerplate: struck lines bounded by lines; the stats op and the
    // materializing op agree on the surviving char count
    val multi = docs.select(col("doc_id"),
      concat_ws("\n", col("text"), lit("shared footer line")).as("text"))
    val stats = Dedup.boilerplateLines(multi, maxDf = 2L)
    assert(stats.filter(col("n_boiler") > col("n_lines")).count() == 0)
    val clean = Dedup.dropBoilerplateLines(multi, maxDf = 2L)
      .select(col("doc_id"), length(col("clean_text")).as("len"))
    assert(stats.join(clean, "doc_id")
      .filter(col("clean_chars") =!= col("len")).count() == 0)

    // perplexity buckets: a partition of the scored docs, terciles in 1..3,
    // per-lang bucket sizes differ by at most 1 per NTILE's contract
    val p = TextAnalysis.perplexityBuckets(docs)
    assert(p.count() == TextAnalysis.unigramLogProb(docs).count())
    assert(p.filter(col("tercile") < 1 || col("tercile") > 3).count() == 0)
    val spread = p.groupBy("lang", "tercile").count()
      .groupBy("lang").agg((max("count") - min("count")).as("d"))
    assert(spread.filter(col("d") > 1).count() == 0)
  }
}

class EntrySpec extends SparkSpec {
  test("flagship entry (hybrid RRF) returns rows (driver smoke contract)") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length > 0)
    assert(rows.exists(r => !r.isNullAt(r.fieldIndex("sparse_score"))),
      "hybrid entry should include sparse-leg hits")
  }
}

class IndexAndUsersSpec extends SparkSpec {

  test("persisted IVF index is idempotent (D5) and probe-equivalent; users round-trip (D6/D7)") {
    val cat = new VectorStoreCatalog(spark, Files.createTempDirectory("graft_idx").toString)
    def vec(seed: Int): Seq[Double] =
      (0 until 8).map(i => ((seed * 131 + i * 313 + 7) % 97 - 48).toDouble)
    cat.generateSchema(SchemaSpec("t", "m", dimension = 8, nlist = 4))
    cat.insert("t", "m", (0 until 100).map(i =>
      EmbeddedVector(s"k$i", s"text $i", "m", Map(), vec(i))))

    assert(!cat.indexExists("t", "m"))
    cat.ensureIndex("t", "m")
    assert(cat.indexExists("t", "m"))
    cat.ensureIndex("t", "m") // idempotent no-rebuild path

    val idx = cat.loadIndex("t", "m")
    import spark.implicits._
    val queries = Seq((0L, vec(5))).toDF("qid", "qv")
    val res = Ivf.probe(idx, queries, nprobe = 4, k = 5).collect()
    assert(res.length == 5) // nprobe = nlist => exact: self-match first
    assert(res.minBy(_.getAs[Long]("rank")).getAs[Double]("score") > 0.999999)

    val (id, secret) = cat.createUser("t")
    assert(id.startsWith("t_") && id.length == 28)
    assert(cat.authenticate("t", id, secret))
    assert(!cat.authenticate("t", id, "wrong"))
    assert(cat.grants("t", id).contains("Search") && cat.grants("t", id).size == 9)

    // password reset: policy first (base_milvus.py:755-783), auth second
    assert(cat.validatePasswordPolicy("Ok1!pass").isEmpty)
    assert(cat.validatePasswordPolicy("short1!").exists(_.contains("8 characters")))
    assert(cat.validatePasswordPolicy("alllower1!").exists(_.contains("uppercase")))
    assert(cat.validatePasswordPolicy("NoDigits!").exists(_.contains("digit")))
    assert(cat.validatePasswordPolicy("NoSpecial1").exists(_.contains("special")))
    val (badPolicy, _) = cat.resetPassword("t", id, secret, "weak")
    assert(!badPolicy && cat.authenticate("t", id, secret)) // unchanged
    val (badAuth, _) = cat.resetPassword("t", id, "wrong-old", "Str0ng!pass")
    assert(!badAuth && cat.authenticate("t", id, secret))
    val (ok, _) = cat.resetPassword("t", id, secret, "Str0ng!pass")
    assert(ok && cat.authenticate("t", id, "Str0ng!pass"))
    assert(!cat.authenticate("t", id, secret))

    cat.dropUser("t", id)
    assert(!cat.authenticate("t", id, "Str0ng!pass"))
  }
}
