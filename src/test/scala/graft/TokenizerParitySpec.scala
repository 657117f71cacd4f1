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

  /** r15 advisor (low): the pure-ASCII Turkish test above misses the real
    * trap — Spark 4.1.2's `UTF8String.toLowerCaseSlow()` uses
    * default-locale `String.toLowerCase()` for any NON-full-ASCII string,
    * so under a Turkish default locale a MIXED-script query lowercases
    * plan-side to dotless-ı splits the Locale.ROOT mirror never produces.
    * `driverTokens` alone cannot mirror that (softened scaladoc); the
    * pruning-hint contract is carried by [[Text.driverTokenHint]], whose
    * union of both lowercasings must SUPERSET the plan tokens whichever
    * path the plan takes — asserted here with Spark itself running under
    * the Turkish default locale on adversarial mixed-script strings.
    */
  test("driverTokenHint supersets plan tokens under a Turkish default locale on mixed-script strings") {
    val texts = Seq(
      "DIYARBAKIR İstanbul", // the advisor's adversarial pair
      "İIıi DIŞ İÇ", // dotted/dotless cluster
      "ISPARTA ilçe IŞIK infra", // ascii-I words beside non-ascii words
      "TITLE-I İZMİR 42", "İİİ III",
      "Ärzte ÜBER ışık I/O")
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      val plan = planTokens(texts)
      texts.zip(plan).foreach { case (t, planToks) =>
        val hint = Text.driverTokenHint(t).toSet
        assert(planToks.toSet.subsetOf(hint),
          s"hint must superset plan tokens under tr on '$t': " +
            s"plan=$planToks hint=$hint")
      }
      // full-ASCII input stays EXACTLY mirrored even under tr: Spark's
      // full-ASCII fast path is locale-free, as is Locale.ROOT
      val ascii = Seq("TITLE I FILING", "ISPARTA INFRA 42")
      ascii.zip(planTokens(ascii)).foreach { case (t, planToks) =>
        assert(Text.driverTokens(t) == planToks, s"ascii drift on '$t'")
      }
    } finally java.util.Locale.setDefault(prev)
  }
}
