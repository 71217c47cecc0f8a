package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass table profiling — the ANALYZE/data-quality primitive a
  * pipeline runs before trusting 100 TB of new input: per-column row
  * count, null count, exact distinct count, numeric min/max, string
  * (or formatted temporal) min/max and length bounds.
  *
  * Shape: ALL columns profile in ONE scan — a single wide aggregate
  * row (Catalyst plans the multi-distinct via Expand: one pass over
  * the data, ×#distinct-aggregates row amplification collapsed by
  * map-side partials — the standard ANALYZE profile), unpivoted to
  * one output row per column with `stack`. No per-column re-scan, no
  * driver-side loop over columns.
  *
  * Determinism: counts are exact integers; min/max are order-free;
  * numeric bounds surface as raw DOUBLE (no arithmetic); temporal
  * bounds are FORMATTED to strings (raw timestamp columns are a
  * parquet µs/ns + tz annotation minefield cross-engine); string
  * bounds compare in binary collation on both engines.
  */
object Profiling {

  /** Per-column profile rows:
    * (col_name, n, n_null, n_distinct, min_num, max_num, min_str,
    * max_str, min_len, max_len), ordered by column name. Numeric
    * columns fill min_num/max_num; strings fill min_str/max_str and
    * the length bounds; timestamps fill min_str/max_str with a
    * "yyyy-MM-dd HH:mm:ss" UTC rendering.
    */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val schema = df.schema
    val aggs: Seq[Column] = cols.flatMap { name =>
      val c = col(name)
      val isNum = schema(name).dataType match {
        case _: NumericType => true
        case _ => false
      }
      val isTs = schema(name).dataType match {
        case TimestampType | TimestampNTZType | DateType => true
        case _ => false
      }
      Seq(
        count(lit(1)).as(s"${name}__n"),
        count(when(c.isNull, 1)).as(s"${name}__n_null"),
        count_distinct(c).as(s"${name}__n_distinct"),
        (if (isNum) min(c.cast(DoubleType)) else lit(null).cast(DoubleType))
          .as(s"${name}__min_num"),
        (if (isNum) max(c.cast(DoubleType)) else lit(null).cast(DoubleType))
          .as(s"${name}__max_num"),
        (if (isTs) date_format(min(c), "yyyy-MM-dd HH:mm:ss")
         else if (isNum) lit(null).cast(StringType)
         else min(c).cast(StringType)).as(s"${name}__min_str"),
        (if (isTs) date_format(max(c), "yyyy-MM-dd HH:mm:ss")
         else if (isNum) lit(null).cast(StringType)
         else max(c).cast(StringType)).as(s"${name}__max_str"),
        (if (!isNum && !isTs) min(length(c.cast(StringType)))
         else lit(null).cast(IntegerType)).cast(IntegerType)
          .as(s"${name}__min_len"),
        (if (!isNum && !isTs) max(length(c.cast(StringType)))
         else lit(null).cast(IntegerType)).cast(IntegerType)
          .as(s"${name}__max_len"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map { name =>
      s"'$name', ${name}__n, ${name}__n_null, ${name}__n_distinct, " +
        s"${name}__min_num, ${name}__max_num, ${name}__min_str, " +
        s"${name}__max_str, ${name}__min_len, ${name}__max_len"
    }.mkString(", ")
    wide.select(expr(
      s"stack(${cols.size}, $stackExpr) as " +
        "(col_name, n, n_null, n_distinct, min_num, max_num, " +
        "min_str, max_str, min_len, max_len)"))
      .orderBy(col("col_name"))
  }
}
