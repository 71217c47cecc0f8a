package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Count of common elements between two SORTED, de-duplicated
  * `array<string>` columns — one merge walk, O(|a|+|b|) binary string
  * comparisons, zero allocation.
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
  * Contract: both inputs ascending in UTF8String (binary) order —
  * exactly what `array_sort` produces — with any nulls sorted last
  * (the walk stops at the first null).
  */
case class SortedOverlapExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_overlap requires (array<string>, array<string>), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedOverlapExpression.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = SortedOverlapExpression.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $helper.compute($a, $b);")
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

  /** Column-level API. */
  def sortedOverlap(a: Column, b: Column): Column =
    ColumnBridge.column(SortedOverlapExpression(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
