package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-series change-point screening via CUSUM (cumulative sum of
  * deviations from the series mean): the range of the CUSUM curve
  * measures how far the series drifts from stationarity, and its
  * argmax marks the most likely shift point. The standard first-pass
  * monitor for "did this metric's level change, and when?" across
  * millions of independent series.
  *
  * Exactness: the textbook curve C_i = Σ_{j≤i}(x_j − x̄) needs the
  * per-series mean — a float. Multiply through by n instead:
  * `n·C_i = n·prefix_i − i·total`, all 64-bit integers on micro-unit
  * inputs, identical on every engine and partitioning. Range and
  * argmax are invariant up to the positive n scale, so the n-scaled
  * curve ranks change points exactly like the textbook one; the
  * reported `range_n_micros` is the n-scaled range (callers divide by
  * n when they want the classic units).
  *
  * Scale: ONE shuffle on the series key — the prefix-sum window, the
  * count/total (whole-partition frames of the same window spec), and
  * the final per-series aggregate all reuse that partitioning. No
  * global window, no second pass over the data.
  */
object ChangePoint {

  /** Per-series CUSUM summary: n, n-scaled CUSUM range, and the
    * timestamp of the curve's maximum (tie → lowest `idCol`),
    * formatted as a string so no raw timestamp crosses an engine
    * boundary.
    */
  def cusumStats(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, microsCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
    val ordered = byKey.orderBy(col(tsCol), col(idCol))
    val prefixed = df
      .withColumn("_n", count(lit(1)).over(byKey))
      .withColumn("_tot", sum(col(microsCol)).over(byKey))
      .withColumn("_prefix", sum(col(microsCol))
        .over(ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_i", row_number().over(ordered))
      .withColumn("_c", col("_n") * col("_prefix") - col("_i") * col("_tot"))
    prefixed.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        (max(col("_c")) - min(col("_c"))).as("range_n_micros"),
        // change-point estimate: argmax of |C| (direction-agnostic —
        // an upward or downward level shift both bulge the curve),
        // deterministic under ties via the (−id) second key
        max_by(date_format(col(tsCol), "yyyy-MM-dd HH:mm:ss"),
          struct(abs(col("_c")), -col(idCol))).as("change_ts"))
  }
}
