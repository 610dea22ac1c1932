package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static runtime for [[NfcNormalize]] — one call site shared by the
  * interpreted and generated paths. The `isNormalized` fast path makes
  * already-composed text (all ASCII, most web text) a zero-allocation
  * check, so the common case costs one scan and no UTF-16 round trip.
  */
object TextNormalizeRuntime {
  def nfc(s: UTF8String): UTF8String = {
    // pure-ASCII fast path WITHOUT the UTF-16 decode: one byte per
    // codepoint means all-ASCII, and ASCII is always NFC — the common
    // web-text case pays a byte scan, zero allocation
    if (s.numBytes == s.numChars) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization (canonical composition): decomposed
  * sequences like `e` + COMBINING ACUTE become the composed codepoint.
  * The building block under [[graft.ops.TextOps.normalizeText]] — dedup
  * keys, shingles and fingerprints must not distinguish canonically
  * equal strings. Codegen'd: the generated code is one static call, so
  * normalization runs inside whole-stage codegen on the scan.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    TextNormalizeRuntime.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextNormalizeRuntime.nfc($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
