package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode normalization (NFC / NFD /
  * NFKC / NFKD) — the canonicalization step every dedup / hashing
  * pipeline needs BEFORE shingling: "café" spelled with a composed
  * U+00E9 and with "e" + combining U+0301 are the same text to a
  * reader but different byte strings to MinHash/SimHash, so
  * un-normalized corpora silently under-deduplicate. `functions._` has
  * no normalizer, and a Scala UDF would box every row out of
  * whole-stage codegen; this follows the [[NormalCdf]] pattern — a
  * `UnaryExpression` whose `doGenCode` is ONE static call.
  *
  * Cross-engine contract: Unicode normalization of assigned code
  * points is stability-guaranteed by the standard (an NFC string under
  * one Unicode version is NFC under all later ones), so the JVM's
  * `java.text.Normalizer` and another engine's normalizer (e.g. a SQL
  * `nfc_normalize`) agree on every fixture this repo gates — the
  * q_text_normalize oracle leans on exactly that guarantee.
  *
  * Fast paths, in order: pure-ASCII strings (`numBytes == numChars` —
  * the overwhelming majority of real corpus rows) return the input
  * UNCHANGED with no allocation and no `String` round-trip; non-ASCII
  * strings that are already normalized (`Normalizer.isNormalized`, a
  * scan without allocation) return the input unchanged; only rows that
  * actually need rewriting pay the normalize + re-encode.
  */
case class UnicodeNormalizeExpr(child: Expression, form: String)
    extends UnaryExpression with Serializable {

  require(UnicodeNormalizeExpr.Forms.contains(form),
    s"graft_unicode_normalize form must be one of " +
      s"${UnicodeNormalizeExpr.Forms.keys.mkString("/")}, got '$form'")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_unicode_normalize requires STRING, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_unicode_normalize"

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalizeExpr.normalize(input.asInstanceOf[UTF8String],
      UnicodeNormalizeExpr.Forms(form))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.UnicodeNormalizeExpr.normalize($c, " +
        s"java.text.Normalizer.Form.$form)")

  override protected def withNewChildInternal(newChild: Expression)
      : UnicodeNormalizeExpr = copy(child = newChild)
}

object UnicodeNormalizeExpr {
  val Forms: Map[String, Normalizer.Form] = Map(
    "NFC" -> Normalizer.Form.NFC, "NFD" -> Normalizer.Form.NFD,
    "NFKC" -> Normalizer.Form.NFKC, "NFKD" -> Normalizer.Form.NFKD)

  /** Static kernel shared by eval and codegen. */
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    // ASCII is normalized under every form; bytes == chars iff ASCII
    if (s.numBytes == s.numChars) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}
