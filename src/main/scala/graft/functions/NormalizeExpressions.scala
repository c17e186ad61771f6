package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_nfc(str[, form])` — Unicode normalization as a native Catalyst
  * expression (NFC default; NFD/NFKC/NFKD by literal form name).
  *
  * Text corpora mix precomposed and combining-mark encodings of the same
  * glyph ("é" as U+00E9 vs "e"+U+0301); every downstream content hash,
  * exact-dedup fingerprint and shingle treats them as different documents
  * unless normalization runs first, so this belongs at the very front of a
  * training-data pipeline (the reference's accent handling strips marks
  * after NFD for matching — `twitter-analytics` ngram selection lowercases
  * and folds; this is the lossless counterpart that PRESERVES the text).
  *
  * A native expression (not a UDF) keeps the op inside whole-stage codegen:
  * the generated code calls `java.text.Normalizer` directly on the decoded
  * string, one virtual call per row, no serialization boundary. The form
  * is required to be a literal so it is resolved once at plan time — a
  * per-row form column would defeat branch prediction for no use case.
  *
  * The fast path matters at scale: `Normalizer.isNormalized` is O(n) with
  * no allocation for the overwhelmingly-common already-NFC case (ASCII
  * short-circuits in the ICU quick-check), so the expression only pays the
  * allocating normalize() on rows that actually need it.
  */
case class NfcNormalizeExpr(child: Expression, form: Normalizer.Form)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects a string, got $other")
  }

  override protected def nullSafeEval(s: Any): Any = {
    val str = s.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(str, form)) s.asInstanceOf[UTF8String]
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val formRef = s"java.text.Normalizer.Form.${form.name()}"
      s"""
         |String $s = $c.toString();
         |if (java.text.Normalizer.isNormalized($s, $formRef)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($s, $formRef));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  /** SQL-registration builder: form argument must be a string literal. */
  def fromArgs(cs: Seq[Expression]): NfcNormalizeExpr = cs match {
    case Seq(c) => NfcNormalizeExpr(c, Normalizer.Form.NFC)
    case Seq(c, f) =>
      val name = f match {
        // Locale.ROOT: under a Turkish default locale "nfc".toUpperCase
        // yields dotted-İ variants and Normalizer.Form.valueOf throws.
        case Literal(v: UTF8String, StringType) =>
          v.toString.toUpperCase(java.util.Locale.ROOT)
        case other => throw new IllegalArgumentException(
          s"graft_nfc: form must be a string literal, got $other")
      }
      NfcNormalizeExpr(c, Normalizer.Form.valueOf(name))
    case _ => throw new IllegalArgumentException(
      "graft_nfc expects (str) or (str, form)")
  }
}
