package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen MinHash signature over an `array<string>` shingle set
  * (custom Catalyst `Expression` tier, SURVEY.md §7.3 (b)).
  *
  * Bit-identical to the HOF formulation
  * `transform(sequence(0, k-1), i -> array_min(transform(sh, g -> xxhash64(g, i))))`
  * — Spark's multi-arg `xxhash64(g, i)` chains
  * `hashLong(i, hashUnsafeBytes(g, seed=42))`, so each shingle is
  * byte-hashed ONCE and each slot is a single `hashLong` mix. The HOF
  * version evaluates k×|shingles| interpreted expression trees with an
  * array allocation per slot; this is one generated loop:
  * |shingles| byte-hashes + k×|shingles| long mixes, no allocations
  * beyond the k-slot output.
  */
case class MinHashSignatureExpression(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashSignatureExpression.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = MinHashSignatureExpression.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $helper.compute($c, $numHashes);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignatureExpression {

  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var si = 0
    while (si < n) {
      val g = shingles.getUTF8String(si)
      if (g != null) {
        // matches xxhash64(g, i) where i is an INT sequence element:
        // chain hashUnsafeBytes(g, 42) then hashInt(i, ...) — Spark
        // hashes IntegerType inputs via hashInt, not hashLong
        val hg = XXH64.hashUnsafeBytes(g.getBaseObject, g.getBaseOffset, g.numBytes(), 42L)
        var i = 0
        while (i < k) {
          val h = XXH64.hashInt(i, hg)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      si += 1
    }
    new GenericArrayData(mins)
  }

  /** Column-level API. */
  def minhashSignatureNative(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashSignatureExpression(ColumnBridge.expression(shingles), numHashes))
}
