package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{shims => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native Catalyst
  * expression.
  *
  * Spark has no built-in normalization function (DuckDB ships
  * `nfc_normalize`), and a crawl-scale text pipeline needs it on the hot
  * path: the same visible string can arrive precomposed (é = U+00E9) or
  * decomposed (e + U+0301) depending on the source, and exact dedup /
  * shingling / tokenization all treat those as different bytes unless the
  * corpus is normalized first. A Scala UDF would pay serialization +
  * boxing per row; this expression stays inside whole-stage codegen and
  * calls `java.text.Normalizer` (ICU-equivalent for the normalization
  * forms) directly on the row's string.
  *
  * The form is a compile-time literal (part of the expression), so the
  * generated code references the `Normalizer.Form` constant statically —
  * no per-row dispatch.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unknown normalization form: $form")

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        s"java.text.Normalizer.Form.$form))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextNormalize {
  /** Normalize a string column to the given Unicode form. */
  def normalize(c: Column, form: String): Column =
    ExpressionUtils.column(
      UnicodeNormalize(ExpressionUtils.expression(c), form))

  /** Accent folding: decompose (NFD), then strip combining marks
    * (`\p{Mn}`). Matches DuckDB's `strip_accents` on Latin text — both
    * reduce 'á' to 'a'. Runs as normalize + one codegen'd regexp pass.
    */
  def stripAccents(c: Column): Column =
    regexp_replace(normalize(c, "NFD"), "\\p{Mn}", "")
}
