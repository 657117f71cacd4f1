package graft

import graft.core.Tables
import graft.functions.{Vec, VecDot, VecNorm2}
import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {

  test("RewriteVectorHofs replaces HOF dot/norm with codegen kernels, bitwise-identically") {
    GraftExtensions.install(spark)
    val corpus = Tables.ordersCorpus(spark, Sf).limit(50)
      .select(col("doc_id"), col("dv"))
    val q = Tables.queryBatch(spark, 1)

    val df = corpus.crossJoin(broadcast(q))
      .select(col("doc_id"),
        Vec.dot(col("qv"), col("dv")).as("d"),
        Vec.norm2(col("dv")).as("n"))

    val optimized = df.queryExecution.optimizedPlan
    val exprs = optimized.expressions.flatMap(_.collect {
      case e: VecDot => e
      case e: VecNorm2 => e
    })
    assert(exprs.exists(_.isInstanceOf[VecDot]), "dot HOF not rewritten")
    assert(exprs.exists(_.isInstanceOf[VecNorm2]), "norm2 HOF not rewritten")

    // bitwise equality with the interpreted HOF evaluation
    val fast = df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    spark.experimental.extraOptimizations = Nil // uninstall
    val slow = df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(fast == slow)
  }

  test("vector kernels are SQL functions after install (vec_dot/vec_norm2/vec_cosine)") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "vec_norm2(array(3.0d, 4.0d)) AS n, " +
        "vec_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 25.0)
    assert(r.getDouble(2) == 1.0)
    spark.experimental.extraOptimizations = Nil
  }

  test("NormalizeUnicode composes, decomposes, and is idempotent") {
    import spark.implicits._
    import graft.functions.Normalize
    val composed   = "caf\u00e9"        // é as one code point
    val decomposed = "cafe\u0301"       // e + combining acute
    val d = Seq((1L, decomposed), (2L, composed), (3L, null: String))
      .toDF("id", "t")
    val out = d.select(col("id"),
        Normalize.nfc(col("t")).as("nfc"),
        Normalize.nfd(col("t")).as("nfd"),
        length(col("t")).as("raw_len"),
        length(Normalize.nfc(col("t"))).as("nfc_len"))
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(1L).getAs[String]("nfc") == composed)   // 5 -> 4 chars
    assert(out(1L).getAs[Int]("raw_len") == 5 && out(1L).getAs[Int]("nfc_len") == 4)
    assert(out(2L).getAs[String]("nfc") == composed)   // already normal: no-op
    assert(out(2L).getAs[String]("nfd") == decomposed) // and back out
    assert(out(3L).getAs[String]("nfc") == null)       // null passthrough
  }

  test("nfc_normalize / nfkc_normalize are SQL functions after install") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT nfc_normalize('cafe\u0301') AS c, " +
        "nfkc_normalize('\ufb01le') AS k").head() // fi-ligature -> fi
    assert(r.getString(0) == "caf\u00e9")
    assert(r.getString(1) == "file")
    spark.experimental.extraOptimizations = Nil
  }

  test("RewriteRangeJoins: a naive inequality time-join loses its nested loop") {
    import spark.implicits._
    GraftExtensions.install(spark)
    try {
      val rnd = new scala.util.Random(3)
      val l = Seq.tabulate(400)(i => (i.toLong, rnd.nextInt(5000).toLong))
        .toDF("lid", "lts")
      val r = Seq.tabulate(400)(i => (i.toLong, rnd.nextInt(5000).toLong))
        .toDF("rid", "rts")
      // no key at all: Spark's only native plan is a nested loop
      val naive = l.join(r, $"rts" >= $"lts" - 100 && $"rts" < $"lts" + 50)

      val p = naive.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"rule did not fire:\n$p")
      assert(p.contains("_graft_bin"), s"expected the bin equi-key:\n$p")

      val fast = naive.select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted
      spark.experimental.extraOptimizations = Nil // uninstall → nested loop
      val slow = naive.select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted
      assert(fast.toSeq == slow.toSeq)
      assert(fast.nonEmpty)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("RewriteRangeJoins fires across equivalent condition spellings") {
    import spark.implicits._
    GraftExtensions.install(spark)
    try {
      val rnd = new scala.util.Random(17)
      val l = Seq.tabulate(150)(i => (i.toLong, rnd.nextInt(2000).toLong)).toDF("lid", "lts")
      val r = Seq.tabulate(150)(i => (i.toLong, rnd.nextInt(2000).toLong)).toDF("rid", "rts")
      // the same window [lts-100, lts+50) written five different ways
      val spellings = Seq(
        $"rts" >= $"lts" - 100 && $"rts" < $"lts" + 50,
        $"rts" - $"lts" >= -100 && $"rts" - $"lts" < 50,
        $"lts" - $"rts" <= 100 && $"lts" - $"rts" > -50,
        $"lts" <= $"rts" + 100 && $"lts" + 50 > $"rts",
        $"rts" + 100 >= $"lts" && $"rts" - 50 < $"lts")
      val expected = {
        spark.experimental.extraOptimizations = Nil
        val e = l.join(r, spellings.head).select("lid", "rid")
          .collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
        GraftExtensions.install(spark)
        e
      }
      for ((cond, i) <- spellings.zipWithIndex) {
        val df = l.join(r, cond)
        val p = df.queryExecution.optimizedPlan.toString
        assert(p.contains("_graft_bin"), s"spelling $i did not rewrite:\n$p")
        val got = df.select("lid", "rid")
          .collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
        assert(got == expected, s"spelling $i wrong results")
      }
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("RewriteRangeJoins leaves keyed and outer joins alone") {
    import spark.implicits._
    GraftExtensions.install(spark)
    try {
      val l = Seq((1L, 10L)).toDF("k", "lts")
      val r = Seq((1L, 12L)).toDF("k2", "rts")
      // cross-side equality present: Spark already has a shuffle key
      val keyed = l.join(r, $"k" === $"k2" && $"rts" >= $"lts" - 5 && $"rts" < $"lts" + 5)
      assert(!keyed.queryExecution.optimizedPlan.toString.contains("_graft_bin"))
      // outer join: bin fan-out would duplicate null-padded rows
      val outer = l.join(r, $"rts" >= $"lts" - 5 && $"rts" < $"lts" + 5, "left")
      assert(!outer.queryExecution.optimizedPlan.toString.contains("_graft_bin"))
      assert(keyed.count() == 1 && outer.count() == 1)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("NormalizeUnicode stays inside whole-stage codegen") {
    import spark.implicits._
    import graft.functions.Normalize
    // non-foldable input (depends on id) so neither constant folding nor
    // LocalTableScan can bypass the generated code path
    val df = spark.range(1).select(Normalize.nfc(
      concat(lit("cafe"), when(col("id") >= 0, lit("\u0301")))).as("t"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix is the WholeStageCodegen marker in the short form
    assert(plan.contains("*(1) Project"), s"plan lost codegen:\n$plan")
    assert(df.as[String].head() == "caf\u00e9")
  }
}
