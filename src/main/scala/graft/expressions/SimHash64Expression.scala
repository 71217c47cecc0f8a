package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen SimHash64 (custom Catalyst `Expression` tier —
  * SURVEY.md §7.3 preference order (b)).
  *
  * Semantics identical to `TextFunctions.simHash64` (whitespace tokens,
  * xxhash64 seed 42 per token — the same `XXH64.hashUnsafeBytes` Spark's
  * `xxhash64` uses — per-bit ±1 votes, sign bits packed MSB-first), but
  * the whole computation is ONE generated Java loop: no per-token array
  * allocation, no interpreted higher-order-function evaluation, and the
  * expression participates in whole-stage codegen. On the 5k-doc
  * corpus this is the difference between the HOF version's seconds and
  * tens of milliseconds; at 100 TB it is the difference between a
  * CPU-bound stage and a scan-bound one.
  */
case class SimHash64Expression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash64_native requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    SimHash64Expression.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = SimHash64Expression.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64Expression {

  private val wsPattern = UTF8String.fromString("\\s+")

  /** One-pass SimHash over whitespace tokens; shared by interpreted
    * eval and generated code (a static call keeps the generated method
    * tiny and JIT-friendly — the loop itself JITs as tight Java).
    */
  def compute(s: UTF8String): Long = {
    if (s == null) return 0L
    val toks = s.trim().split(wsPattern, -1)
    val votes = new Array[Int](64)
    var ti = 0
    while (ti < toks.length) {
      val t = toks(ti)
      if (t.numBytes() > 0) {
        val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes(), 42L)
        var i = 0
        while (i < 64) {
          votes(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
          i += 1
        }
      }
      ti += 1
    }
    var packed = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) packed |= (1L << (63 - i))
      i += 1
    }
    packed
  }

  /** Column-level API. */
  def simhash64Native(c: Column): Column =
    ColumnBridge.column(SimHash64Expression(ColumnBridge.expression(c)))
}
