package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Robust per-group outlier statistics: median + MAD (median absolute
  * deviation) and the classic |x − median| > k·MAD flag.
  *
  * Mean/stddev outlier rules break exactly when you need them — a few
  * extreme rows drag the mean toward themselves and inflate the
  * stddev until nothing is an outlier. The median/MAD pair has a 50%
  * breakdown point; it is the standard robust screen for ingest-time
  * anomaly detection (the reference eyeballs its rejects by hand —
  * `/root/reference/monarch_etl/cleaning.py:105-170` builds reject
  * frames per reason; this is the statistical generalization).
  *
  * Exactness across engines: inputs are integer micro-units (callers
  * convert via DECIMAL, never a double multiply). Medians of longs are
  * either integers or exact halves, so `2×median` round-trips through
  * the double that `percentile` returns with zero error (sums of two
  * longs ≤ 2⁵³). We carry `med2 = 2·median` and `mad4 = 4·MAD` as
  * longs; the flag |x − med| > k·MAD becomes the integer comparison
  * `2·|2x − med2| > k·mad4`. No float ever crosses an exchange or the
  * engine boundary.
  *
  * Scale: two keyed exact-percentile aggregates (group-bounded
  * buffers) + one group-keyed broadcast-back join per pass; the data
  * is scanned twice (median pass, deviation pass) — the unavoidable
  * sequential dependency of MAD — but each pass is one shuffle on the
  * group key and the stats frames are |groups|-sized.
  */
object RobustStats {

  /** Per-group robust stats over `microsCol` (already integer
    * micro-units, LongType): returns one row per group with
    * `n`, `med2` (2×median), `mad4` (4×MAD), and `n_outliers`
    * (|x − median| > k·MAD, k integer).
    */
  def madOutlierStats(df: DataFrame, groupCol: String, microsCol: String,
      k: Int = 3): DataFrame = {
    val x = df.select(col(groupCol).as("_g"), col(microsCol).as("_x"))
    // pass 1: per-group exact median (×2 scale keeps it integral)
    val med = x.groupBy(col("_g"))
      .agg((expr("percentile(_x, 0.5)") * 2).cast(LongType).as("med2"))
    // deviations against the joined-back median (×2 scale, exact)
    val dev = x.join(med, Seq("_g"))
      .select(col("_g"), col("med2"),
        abs(col("_x") * 2 - col("med2")).as("_dev2"))
    // pass 2: median of deviations = MAD (halves again ⇒ carry ×4)
    val mad = dev.groupBy(col("_g"))
      .agg((expr("percentile(_dev2, 0.5)") * 2).cast(LongType).as("mad4"))
    // final group-bounded aggregate: the flag is pure integer compare
    dev.join(mad, Seq("_g"))
      .groupBy(col("_g"))
      .agg(
        count(lit(1)).as("n"),
        first(col("med2")).as("med2"),
        first(col("mad4")).as("mad4"),
        sum(when(col("_dev2") * 2 > lit(k.toLong) * col("mad4"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .withColumnRenamed("_g", groupCol)
  }
}
