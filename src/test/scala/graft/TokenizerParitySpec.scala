package graft

import graft.functions.Text
import org.apache.spark.sql.functions._

/** Pins `Text.driverTokens` to the plan-side `Text.tokens` tokenizer.
  *
  * The BM25 `knownTerms` pruning hint is only safe while the DRIVER-side
  * tokenization of a query string produces exactly the terms the PLAN-side
  * tokenizer would — a term the hint misses silently loses its postings to
  * the pruned dictionary join (r14 advisor, low). This spec runs both
  * tokenizers over the fixture corpus plus an adversarial set (unicode
  * casing, the Turkish-I trap, punctuation runs, empties) and asserts
  * byte-identical token sequences per row.
  */
class TokenizerParitySpec extends SparkSpec {

  private def planTokens(texts: Seq[String]): Seq[Seq[String]] = {
    import spark.implicits._
    texts.toDF("text")
      .withColumn("_i", monotonically_increasing_id())
      .select(col("_i"), Text.tokens(col("text")).as("toks"))
      .orderBy("_i")
      .collect()
      .map(_.getSeq[String](1).toSeq).toSeq
  }

  test("driverTokens mirrors plan-side tokens on the fixture corpus") {
    val texts = spark.read.parquet(s"$Sf/documents.parquet")
      .select("text").limit(200).collect().map(_.getString(0)).toSeq
    val plan = planTokens(texts)
    texts.zip(plan).foreach { case (t, expected) =>
      assert(Text.driverTokens(t) == expected, s"drift on fixture text: $t")
    }
  }

  test("driverTokens mirrors plan-side tokens on adversarial strings") {
    val texts = Seq(
      "", "   ", "...", "a", "I", "TITLE-9 Overview",
      "MIXED Case  with\tTabs\nand newlines",
      "trailing punct!!!", "!!leading", "123abc456 DEF",
      "Istanbul DIYARBAKIR IJssel", // Turkish-I / Dutch-IJ casing traps
      "ÅNGSTRÖM Straße İstanbul", // non-ascii uppercase → non-ascii lower,
      // which the [^a-z0-9]+ split treats as a delimiter either way
      "hyphen-ated under_scored dot.sep slash/sep",
      "a1b2c3", "ALLCAPS lowercase MiXeD")
    val plan = planTokens(texts)
    texts.zip(plan).foreach { case (t, expected) =>
      assert(Text.driverTokens(t) == expected, s"drift on: '$t'")
    }
  }

  test("driverTokens is Locale.ROOT-stable for the dotted-I trap") {
    // Under a Turkish default locale, String.toLowerCase() maps 'I' to a
    // DOTLESS ı — a term the plan-side lower() never emits, which is
    // exactly the silent-postings-loss the driverTokens helper closes.
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      assert(Text.driverTokens("TITLE I FILING") == Seq("title", "i", "filing"))
    } finally java.util.Locale.setDefault(prev)
  }
}
