package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a codegen'd Catalyst expression. A text
  * pipeline's very first step — the same grapheme can arrive composed
  * (U+00E9) or decomposed (U+0065 U+0301), and every downstream operator
  * (dedup fingerprints, shingles, line-df boilerplate keys, BPE symbols)
  * silently treats the two as different documents unless the corpus is
  * normalized first. Spark has no built-in for this; a Scala UDF would
  * break whole-stage codegen in the one pass that touches every byte of a
  * 100 TB corpus. This expression stays inside codegen: the generated code
  * calls the JDK's `java.text.Normalizer` (ICU-equivalent for the
  * normalization forms) directly, and `java.text.Normalizer.isNormalized`
  * short-circuits the (overwhelmingly common) already-normalized case
  * without allocating.
  *
  * The DuckDB oracle checks NFC against DuckDB's independent
  * `nfc_normalize` implementation (q_nfc_normalize).
  */
case class NormalizeUnicode(child: Expression, form: String)
    extends UnaryExpression {
  // fail at construction, not mid-job, on a bad form name
  private val jform = java.text.Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType
  override def prettyName: String = s"normalize_${form.toLowerCase}"
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string argument, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any = {
    val str = s.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(str, jform)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, jform))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      s"""
         |String $str = $c.toString();
         |if (java.text.Normalizer.isNormalized($str, java.text.Normalizer.Form.$form)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = UTF8String.fromString(
         |    java.text.Normalizer.normalize($str, java.text.Normalizer.Form.$form));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NormalizeUnicode =
    copy(child = newChild)
}

/** Column-API entry points for [[NormalizeUnicode]]. */
object Normalize {
  def nfc(c: Column): Column  = ColumnBridge.column(NormalizeUnicode(ColumnBridge.expression(c), "NFC"))
  def nfd(c: Column): Column  = ColumnBridge.column(NormalizeUnicode(ColumnBridge.expression(c), "NFD"))
  def nfkc(c: Column): Column = ColumnBridge.column(NormalizeUnicode(ColumnBridge.expression(c), "NFKC"))
}
