package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen variant of
  * [[graft.functions.TextFunctions.simHashMd5]] — the cross-engine
  * 60-bit SimHash over whitespace tokens with md5-derived token hashes
  * (token hash = first 15 hex chars of md5 = top 60 bits of the
  * digest; vote sign of bit i packed at position i, so the value is a
  * non-negative BIGINT any engine reproduces).
  *
  * Why a custom Expression: the higher-order-function formulation
  * evaluates the `transform(tokens, md5)` subexpression once PER BIT
  * FOLD (60×) — interpreted HOF lambdas get no common-subexpression
  * elimination — and allocates a hex string per hash. This is one
  * generated Java loop: each token is md5'd exactly once, votes
  * accumulate in a stack array (~8 s → ~0.5 s over the 5.5k-doc bench
  * corpus). Parity with the HOF version is proven in spec.
  */
case class SimHashMd5Expression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash_md5_native requires a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    SimHashMd5Expression.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = SimHashMd5Expression.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashMd5Expression {

  private val wsPattern = UTF8String.fromString("\\s+")

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of the md5 digest == parsing the first 15 hex chars of
    * the (big-endian) hex rendering, i.e. exactly
    * `conv(substring(md5(t),1,15),16,10)` /
    * `('0x'||substr(md5(t),1,15))::BIGINT`.
    */
  private def md5Top60(bytes: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** One-pass md5-SimHash; shared by interpreted eval and generated
    * code.
    */
  def compute(s: UTF8String): Long = {
    if (s == null) return 0L
    val toks = s.trim().split(wsPattern, -1)
    val votes = new Array[Int](60)
    val md = digests.get()
    var ti = 0
    while (ti < toks.length) {
      val t = toks(ti)
      if (t.numBytes() > 0) {
        md.reset()
        val h = md5Top60(md.digest(t.getBytes))
        var i = 0
        while (i < 60) {
          votes(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
          i += 1
        }
      }
      ti += 1
    }
    var packed = 0L
    var i = 0
    while (i < 60) {
      if (votes(i) > 0) packed |= (1L << i)
      i += 1
    }
    packed
  }

  /** Column-level API. */
  def simhashMd5Native(c: Column): Column =
    ColumnBridge.column(SimHashMd5Expression(ColumnBridge.expression(c)))
}
