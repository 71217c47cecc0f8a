package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Count of common elements between two SORTED, de-duplicated
  * `array<string>` or `array<bigint>` columns — one merge walk,
  * O(|a|+|b|) comparisons, zero allocation.
  *
  * This is the exact set-intersection size `size(array_intersect(a, b))`
  * computes, minus its per-row cost: `array_intersect` builds a hash set
  * of one side and probes every element of the other (an allocation +
  * two hash passes per PAIR). On the near-dup verification path the
  * intersection runs once per candidate pair over ~10²-element shingle
  * arrays, so the hash-set tax dominates the whole verification stage.
  * Sorting is paid ONCE per document (in the cached shingle frame), not
  * once per pair.
  *
  * The long-array variant exists because a 60-bit token id is 4× less
  * exchange payload than a 32-char md5 hex string and a primitive
  * compare instead of a byte-wise one — on a verification stage running
  * 10⁵–10⁶ merge walks per task, that is the difference between the
  * walk being free and being the stage.
  *
  * Contract: both inputs ascending in element order (UTF8String binary
  * order for strings, numeric for longs) — exactly what `array_sort`
  * produces — with any nulls sorted last (the walk stops at the first
  * null).
  */
case class SortedOverlapExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  private def isLongVariant: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_overlap requires matching (array<string>|array<bigint>) " +
            s"inputs, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    if (isLongVariant)
      SortedOverlapExpression.computeLong(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      SortedOverlapExpression.compute(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = SortedOverlapExpression.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val method = if (isLongVariant) "computeLong" else "compute"
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $helper.$method($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedOverlapExpression {

  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var common = 0
    while (i < na && j < nb) {
      val x = a.getUTF8String(i)
      val y = b.getUTF8String(j)
      if (x == null || y == null) return common // nulls sort last: done
      val c = x.compareTo(y)
      if (c == 0) { common += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    common
  }

  def computeLong(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var common = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i) || b.isNullAt(j)) return common // nulls sort last
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { common += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    common
  }

  /** Column-level API. */
  def sortedOverlap(a: Column, b: Column): Column =
    ColumnBridge.column(SortedOverlapExpression(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
