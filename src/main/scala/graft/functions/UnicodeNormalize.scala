package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD via `java.text.Normalizer`,
  * zero dependencies) as a native codegen projection — the crawl-cleanup
  * step C4/CCNet-class pipelines run BEFORE any text statistics: the web
  * serves the same glyph in composed ("é" = U+00E9) and decomposed
  * ("e" + U+0301) encodings, and without normalization the two hash,
  * shingle, dedup, count and language-ID differently. NFC is the
  * canonical-composition web standard (and has a DuckDB twin,
  * `nfc_normalize`); NFKC additionally folds compatibility forms
  * (ligatures, full-width ASCII, superscripts — spec-pinned, DuckDB has
  * no NFKC).
  *
  * Scale shape: a pure per-row projection inside whole-stage codegen —
  * zero shuffle, zero state; the already-normalized fast path
  * (`Normalizer.isNormalized`, true for virtually all real text) returns
  * the input UTF8String without ever materializing a java.lang.String
  * copy. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(UnicodeNormalize.Forms.contains(form),
    s"unsupported normalization form '$form' (one of ${UnicodeNormalize.Forms.mkString(", ")})")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unicode_norm expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalize.norm(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.UnicodeNormalize.norm($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)

  override def prettyName: String = "unicode_norm"
}

object UnicodeNormalize {

  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Called from interpreted eval AND the generated code. The form name
    * is a compile-time constant in the generated call; `valueOf` on an
    * enum is a cheap map hit next to the normalization scan itself. */
  def norm(s: UTF8String, form: String): UTF8String = {
    val f = java.text.Normalizer.Form.valueOf(form)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
}
