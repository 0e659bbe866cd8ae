package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization for web-scale corpus cleaning (the
  * CCNet/RefinedWeb preprocessing step before dedup and LM scoring):
  * the same byte sequence can encode visually identical text in many
  * forms (precomposed `é` vs `e`+U+0301; full accents vs stripped), and
  * every downstream exact-hash operator — chunk dedup (q142), MinHash
  * shingles, vocabulary counts — silently fragments unless the corpus is
  * normalized first.
  *
  * Native codegen expressions, not UDFs: normalization runs once over
  * every document in the corpus (the widest scan of the pipeline), so
  * the per-row cost must stay inside whole-stage codegen. Both carry an
  * ASCII fast path — a `UTF8String` whose byte count equals its char
  * count is pure ASCII and already normalized under every form, so the
  * dominant case (English web text) returns the input buffer untouched
  * with no JVM String round-trip.
  *
  * [[NormalizeExpr]] applies a `java.text.Normalizer` form (NFC/NFD/
  * NFKC/NFKD). [[StripAccentsExpr]] canonically decomposes (NFD) and
  * drops combining marks (`\p{Mn}\p{Mc}\p{Me}`) — DuckDB
  * `strip_accents` semantics: `café`→`cafe`, but `ß` and CJK pass
  * through (no canonical decomposition to a mark sequence).
  */
object UnicodeNormalize {

  private def isAscii(s: UTF8String): Boolean = s.numBytes == s.numChars

  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String =
    if (isAscii(s)) s
    else UTF8String.fromString(Normalizer.normalize(s.toString, form))

  /** NFC entry point for codegen (a `Normalizer.Form` literal is awkward
    * to splice into generated Java; each form gets a named hook). */
  def nfc(s: UTF8String): UTF8String = normalize(s, Normalizer.Form.NFC)
  def nfd(s: UTF8String): UTF8String = normalize(s, Normalizer.Form.NFD)
  def nfkc(s: UTF8String): UTF8String = normalize(s, Normalizer.Form.NFKC)
  def nfkd(s: UTF8String): UTF8String = normalize(s, Normalizer.Form.NFKD)

  def stripAccents(s: UTF8String): UTF8String = {
    if (isAscii(s)) return s
    val decomposed = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var i = 0
    while (i < decomposed.length) {
      val cp = decomposed.codePointAt(i)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK &&
          t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    // Recompose what survives so `ñ` stripped of nothing new still
    // round-trips precomposed input that had no marks to drop.
    UTF8String.fromString(
      Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }

  val forms: Map[String, Normalizer.Form] = Map(
    "NFC" -> Normalizer.Form.NFC,
    "NFD" -> Normalizer.Form.NFD,
    "NFKC" -> Normalizer.Form.NFKC,
    "NFKD" -> Normalizer.Form.NFKD)
}

/** `unicode_normalize(str, 'NFC'|'NFD'|'NFKC'|'NFKD')` — form fixed at
  * analysis time (a foldable literal), so codegen dispatches straight to
  * the per-form static hook with zero per-row branching. */
case class NormalizeExpr(child: Expression, formName: String)
    extends UnaryExpression {

  private val hook = formName.toUpperCase match {
    case "NFC" => "nfc"
    case "NFD" => "nfd"
    case "NFKC" => "nfkc"
    case "NFKD" => "nfkd"
    case other => throw new IllegalArgumentException(
      s"unicode_normalize: unknown form '$other' (NFC/NFD/NFKC/NFKD)")
  }
  private val form = UnicodeNormalize.forms(formName.toUpperCase)

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("unicode_normalize expects a string")

  override def nullSafeEval(v: Any): Any =
    UnicodeNormalize.normalize(v.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNormalize.$hook($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `strip_accents(str)` — NFD + drop combining marks + NFC recompose. */
case class StripAccentsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("strip_accents expects a string")

  override def nullSafeEval(v: Any): Any =
    UnicodeNormalize.stripAccents(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnicodeNormalize.stripAccents($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object StripAccentsExpr {
  def apply(c: Column): Column =
    ColumnBridge.column(StripAccentsExpr(ColumnBridge.expression(c)))
}

object NormalizeExpr {
  def apply(c: Column, form: String): Column =
    ColumnBridge.column(NormalizeExpr(ColumnBridge.expression(c), form))
}
