package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the
  * text-canonicalization primitive (é as U+0065 U+0301 and é as U+00E9
  * must fingerprint identically before any dedup or decontamination
  * hash sees them).
  *
  * Spark ships no normalization function and the engine's no-UDF
  * contract forbids the `udf()` escape hatch, so this wraps
  * `java.text.Normalizer` (the JDK's implementation of UAX #15) in a
  * codegen'd unary expression. Unicode NFC is a STANDARD: DuckDB's
  * `nfc_normalize` produces byte-identical output, which is what puts
  * the canonicalization queries on the cross-engine oracle gate.
  *
  * Cost note: normalization allocates (String round-trip through the
  * JDK API); NFC-quick-check of pure-ASCII input short-circuits inside
  * `Normalizer.isNormalized`, so the common case (ASCII corpora) pays
  * one scan and no copy.
  */
case class NfcNormalizeExpression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nfc_normalize requires a string input, got $other")
    }

  override def nullSafeEval(s: Any): Any =
    NfcNormalizeExpression.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper =
      NfcNormalizeExpression.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $helper.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalizeExpression {

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column-level API. */
  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NfcNormalizeExpression(ColumnBridge.expression(c)))
}
