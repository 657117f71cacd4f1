package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenization, stopwords and deterministic text hashing shared by the text
  * filter (SURVEY §2.2 P3), BM25 (§2.5 H1/H2), dedup and text analysis.
  *
  * Every function here is pure integer/string arithmetic expressible in both
  * Spark and ANSI-ish DuckDB SQL, so the oracle can recompute it exactly.
  */
object Text {

  /** English stopword subset (reference uses NLTK english + a JSON overlay,
    * `/root/reference/app/utils/stopwords_util.py:19-75`). Kept small and
    * explicit so the DuckDB oracle can inline the identical list.
    */
  val Stopwords: Seq[String] = Seq(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "from",
    "has", "have", "he", "her", "his", "i", "in", "is", "it", "its", "of",
    "on", "or", "our", "she", "that", "the", "their", "them", "they", "this",
    "to", "was", "we", "were", "will", "with", "you", "your")

  private val StopSet = Stopwords.toSet

  /** Driver-side tokenization of a text-filter string: lowercase, whitespace
    * split, optional stopword removal (vector_store.py:911-926).
    */
  def filterWords(filter: String, includeStopWords: Boolean): Seq[String] = {
    val words = filter.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    if (includeStopWords) words else words.filterNot(StopSet.contains)
  }

  /** Tokenize a text column: lowercase, split on runs of non-alphanumerics,
    * drop empties. Matches the oracle's
    * `list_filter(string_split_regex(lower(t),'[^a-z0-9]+'), x -> x != '')`.
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Driver-side mirror of [[tokens]] — identical output on FULL-ASCII
    * input (Spark's UTF8String lowercases such strings bytewise,
    * locale-free, matching Locale.ROOT here; TokenizerParitySpec pins the
    * agreement over the fixture corpus and under a Turkish default
    * locale). On non-ASCII input both sides strip the non-ascii bytes as
    * delimiters, but the LOWERCASING step can split differently: Spark
    * 4.1.2's `UTF8String.toLowerCaseSlow()` falls back to default-locale
    * `String.toLowerCase()` for any non-full-ASCII string, so under e.g. a
    * Turkish default locale the plan side maps 'I' → 'ı' (a delimiter)
    * where this Locale.ROOT mirror keeps 'i' — divergent token SPLITS, not
    * just divergent tokens. A driver-known vocabulary that feeds a
    * plan-side PRUNING hint (Bm25 `knownTerms` — a pruned dictionary join
    * silently DROPS postings of any term the hint missed) must therefore
    * use [[driverTokenHint]], which unions both lowercasings into a safe
    * superset; this mirror alone is only exact for full-ASCII input.
    */
  def driverTokens(text: String): Seq[String] =
    text.toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  /** Locale-robust SUPERSET of the plan-side tokenization, for pruning
    * hints: the union of the Locale.ROOT tokens (Spark's full-ASCII fast
    * path) and the default-locale tokens (Spark's non-ASCII slow path —
    * `UTF8String.toLowerCaseSlow()` delegates to default-locale
    * `String.toLowerCase()`). Whichever path the plan takes, its token set
    * is contained here, so a hint built from this can ONLY over-include —
    * extra terms miss the dictionary and cost nothing, while a missed term
    * would silently lose its postings (TokenizerParitySpec asserts the
    * superset property under a Turkish default locale on mixed-script
    * adversarial strings).
    */
  def driverTokenHint(text: String): Seq[String] =
    (driverTokens(text) ++
      text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)).distinct

  /** Deterministic integer code for a token, built only from ascii/length so
    * DuckDB can replicate it byte-for-byte. Collisions are fine — both engines
    * use the same function. Padded with "--" so 1–2 char tokens are total.
    */
  def tokenCode(tok: Column): Column = {
    val p = concat(tok, lit("--"))
    (ascii(substring(p, 1, 1)) * 1000000L +
      ascii(substring(p, 2, 1)) * 10000L +
      ascii(substring(p, 3, 1)) * 100L +
      length(tok)).cast("long")
  }

  /** SQL fragment computing the same token code over a column expression —
    * used verbatim inside oracle queries. Keep in lockstep with [[tokenCode]].
    */
  def tokenCodeSql(tok: String): String =
    s"(ascii(substr($tok || '--',1,1))*1000000 + ascii(substr($tok || '--',2,1))*10000 + " +
      s"ascii(substr($tok || '--',3,1))*100 + length($tok))"

  /** Scramble a token code into a 32-bit hash (Knuth multiplicative). All
    * intermediates < 2^63 — exact in both engines.
    */
  def tokenHash32(code: Column): Column =
    (code * 2654435761L) % 4294967296L

  def tokenHash32Sql(code: String): String =
    s"(($code * 2654435761) % 4294967296)"
}
