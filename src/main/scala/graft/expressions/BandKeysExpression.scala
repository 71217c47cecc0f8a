package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen LSH band keys over an `array<long>` MinHash
  * signature — bit-identical to
  * [[graft.operators.Dedup.lshBandKeys]]'s HOF formulation
  * (slice each band, render the longs as a comma-joined string, and
  * xxhash64 it with Spark's default seed 42).
  *
  * Why it exists: the HOF version nests `transform` inside `transform`
  * — CodegenFallback expressions — which knocks the WHOLE projection
  * (including the already-codegen MinHash signature child) out of
  * whole-stage codegen into the interpreted row path: the shingle →
  * signature → bands stage was paying ~10× for it. With both
  * expressions native, the stage stays inside one generated loop.
  */
case class BandKeysExpression(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"band_keys requires array<long>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    BandKeysExpression.compute(input.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = BandKeysExpression.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $helper.compute($c, $bands, $rowsPerBand);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BandKeysExpression {

  def compute(sig: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val out = new Array[Long](bands)
    val sb = new java.lang.StringBuilder(rowsPerBand * 21)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var j = 0
      while (j < rowsPerBand) {
        if (j > 0) sb.append(',')
        sb.append(sig.getLong(b * rowsPerBand + j))
        j += 1
      }
      val u = UTF8String.fromString(sb.toString)
      out(b) = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level API. */
  def bandKeysNative(sig: Column, bands: Int, rowsPerBand: Int): Column =
    ColumnBridge.column(BandKeysExpression(
      ColumnBridge.expression(sig), bands, rowsPerBand))
}
