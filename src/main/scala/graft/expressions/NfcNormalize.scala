package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column — the canonical-form
  * cleaning step a multilingual corpus pipeline runs before hashing,
  * deduplication, or tokenization: the same visible text can arrive as
  * composed (é = U+00E9) or decomposed (e + U+0301) codepoint sequences,
  * and every byte-keyed operator in this library (content-hash dedup,
  * shingles, fingerprints) would treat them as different documents.
  *
  * Canonical composition is defined by the Unicode standard, so the JDK
  * implementation (`java.text.Normalizer`, NFC) and DuckDB's
  * utf8proc-based `nfc_normalize` agree — which is what makes the q165
  * query hash-checkable end to end. The expression stays inside
  * whole-stage codegen as a static call; there is no per-row lambda or
  * interpreted fallback.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry point shared by interpreted eval and generated code.
    * Fast path: `Normalizer.isNormalized` is O(n) with no allocation for
    * already-NFC text (the overwhelming case in a real corpus — ASCII is
    * trivially NFC), so the String round-trip is paid only by rows that
    * actually change. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column-API entry point. */
  def nfc(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c)))
}
