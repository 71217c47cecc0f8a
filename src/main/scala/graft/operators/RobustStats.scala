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

  /** Exact percentile-rank normalization — the distribution-free
    * feature scaling (rank transform) a training pipeline applies
    * before mixing columns with wildly different scales: every row
    * gets rank_lt = #rows with a STRICTLY smaller value (ties share a
    * rank, the standard "min rank − 1" contract) and pct_scaled =
    * rank_lt·10⁶ DIV (N−1) ∈ [0, 10⁶].
    *
    * Exact and global with NO global window: (1) rows collapse to the
    * distinct-value count frame (one keyed exchange); (2) values
    * range-bucket by their driver-bounded min/max into `nBuckets`
    * contiguous shards, so bucket-major order IS value order — the
    * [[Sampling.budgetSelect]] two-phase trick; (3) the exclusive
    * prefix sum runs as per-bucket windows over the DISTINCT frame
    * plus ≤nBuckets carry-in offsets collected, prefix-summed
    * driver-side and broadcast back; (4) ranks join back to rows
    * keyed on the value. Values go through the micro-unit decimal
    * cast so bucketing and ordering are integer-exact.
    */
  def percentileRank(df: DataFrame, idCol: String, valueCol: String,
      nBuckets: Int = 256): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    import org.apache.spark.sql.types.DecimalType
    val rows = df.select(col(idCol).as("_id"),
      (col(valueCol).cast(DecimalType(18, 6)) * 1000000L)
        .cast(LongType).as("_vm"))
    valueRanks(rows.select(col("_vm")), nBuckets) match {
      case None =>
        rows.select(col("_id").as(idCol), col("_vm"),
          col("_vm").as("rank_lt"), col("_vm").as("pct_scaled"))
          .filter(lit(false))
      case Some((ranks, n)) =>
        val den = math.max(n - 1L, 1L)
        rows.join(ranks.select(col("_vm"), col("rank_lt")), Seq("_vm"))
          .select(col("_id").as(idCol), col("_vm"),
            col("rank_lt").cast(LongType).as("rank_lt"),
            expr(s"(rank_lt * 1000000L) div ${den}L")
              .cast(LongType).as("pct_scaled"))
    }
  }

  /** Exclusive prefix counts per DISTINCT value of the `_vm` column,
    * in value order, with NO global window: values range-bucket by
    * their driver-bounded min/max; bucket-major order is value order,
    * so per-bucket windows plus ≤nBuckets collected carry-in offsets
    * give the global prefix — the [[Sampling.budgetSelect]] two-phase
    * shape shared by [[percentileRank]] and [[quantileNormalize]].
    * Returns (the (_vm, _c, rank_lt) frame, total row count), or None
    * on empty input.
    */
  private def valueRanks(values: DataFrame,
      nBuckets: Int): Option[(DataFrame, Long)] = {
    import org.apache.spark.sql.expressions.Window
    val spark = values.sparkSession
    val bounds = values.agg(min(col("_vm")).as("mn"), max(col("_vm")).as("mx"))
      .collect()(0)
    if (bounds.isNullAt(0)) return None
    val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))
    val span = math.max(mx - mn, 0L) + 1L
    val counts = values.groupBy(col("_vm")).agg(count(lit(1)).as("_c"))
      // integer div, NOT Column./ (which is double division). The
      // bucket multiply runs in DECIMAL(38,0): with micro-unit inputs
      // the span can reach ~2e18, and (_vm-mn)*nBuckets in BIGINT
      // would overflow 2^63 (ANSI runtime failure) well inside the
      // accepted input domain. The quotient is < nBuckets, so the
      // final cast back to BIGINT is always safe.
      .withColumn("_qb",
        expr(s"CAST((CAST(_vm AS DECIMAL(38,0)) - ${mn}L) * ${nBuckets}L" +
          s" div ${span}L AS BIGINT)"))
    val totals = counts.groupBy(col("_qb")).agg(sum(col("_c")).as("_t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offs = totals.map(_._1).zip(totals.scanLeft(0L)(_ + _._2).init)
    val planDf = spark.createDataFrame(offs.toSeq).toDF("_qb", "_off")
    val win = Window.partitionBy(col("_qb")).orderBy(col("_vm"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranks = counts.join(broadcast(planDf), Seq("_qb"))
      .withColumn("rank_lt",
        col("_off") + sum(col("_c")).over(win) - col("_c"))
      .select(col("_vm"), col("_c"), col("rank_lt"))
    Some((ranks, totals.map(_._2).sum))
  }

  /** Exact weighted median per group: the smallest value whose
    * cumulative weight reaches half the group total (2·cumw ≥ totw,
    * integer cross-multiplied — no float half). The size-aware
    * central tendency a corpus report actually needs: the unweighted
    * median of document LENGTHS answers "the typical document"; the
    * token-weighted median answers "the typical TOKEN's document" —
    * wildly different under skew.
    *
    * One keyed window (cumulative weight in (value, id) order) + one
    * keyed argmin — deviation from [[madOutlierStats]]'s unweighted
    * median machinery is exactly the weight column. Values and
    * weights are cast to long (micro-scale upstream if fractional).
    */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = df.select(col(groupCol).as("_g"),
      col(valueCol).cast(LongType).as("_v"),
      col(weightCol).cast(LongType).as("_w"),
      col(idCol).as("_id"))
    val w = Window.partitionBy(col("_g")).orderBy(col("_v"), col("_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = rows.groupBy(col("_g"))
      .agg(count(lit(1)).as("n_rows"), sum(col("_w")).as("total_w"))
    rows.withColumn("_cum", sum(col("_w")).over(w))
      .join(tot, Seq("_g"))
      .filter(col("_cum") * 2 >= col("total_w"))
      .groupBy(col("_g"))
      .agg(min(col("_v")).as("wmedian"),
        first(col("n_rows")).as("n_rows"),
        first(col("total_w")).as("total_w"))
      .select(col("_g").as(groupCol),
        col("n_rows").cast(LongType).as("n_rows"),
        col("total_w").cast(LongType).as("total_w"),
        col("wmedian").cast(LongType).as("wmedian"))
  }

  /** Quantile normalization across groups — the batch-effect
    * correction that maps every group's value distribution onto the
    * POOLED distribution (two sources whose length/score scales drift
    * apart become comparable without inventing a parametric model):
    * a row at within-group rank r_g maps to the pooled order
    * statistic at position r_g·(N−1) DIV (n_g−1).
    *
    * All positions are exact integers; the pooled order-statistic
    * lookup is a range join of positions against the distinct-value
    * interval frame ([rank_lt, rank_lt+cnt)), built by [[valueRanks]]
    * without a global window. The within-group rank is ONE keyed
    * window (min-rank ties). Output: id, group, value_mic, norm_mic
    * (the pooled value, micro units).
    */
  def quantileNormalize(df: DataFrame, idCol: String, groupCol: String,
      valueCol: String, nBuckets: Int = 256): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val rows = df.select(col(idCol).as("_id"), col(groupCol).as("_g"),
      (col(valueCol).cast(DecimalType(18, 6)) * 1000000L)
        .cast(LongType).as("_vm"))
    valueRanks(rows.select(col("_vm")), nBuckets) match {
      case None =>
        rows.select(col("_id").as(idCol), col("_g").as(groupCol),
          col("_vm").as("value_mic"), col("_vm").as("norm_mic"))
          .filter(lit(false))
      case Some((pooled, n)) =>
        val wg = Window.partitionBy(col("_g")).orderBy(col("_vm"))
        val ng = rows.groupBy(col("_g")).agg(count(lit(1)).as("_ng"))
        val pos = rows
          .withColumn("_rg", rank().over(wg).cast(LongType) - 1L)
          .join(ng, Seq("_g"))
          .withColumn("_p", expr(
            s"(_rg * ${math.max(n - 1L, 0L)}L) div " +
              "(CASE WHEN _ng > 1 THEN _ng - 1 ELSE 1 END)"))
        val iv = pooled.select(col("_vm").as("_pv"), col("_c"),
          col("rank_lt").as("_rl"))
        // the interval frame (distinct-value-sized) is the BUILD side
        // of the range lookup — without the hint Catalyst broadcast
        // the CORPUS positions instead (observed), which inverts the
        // size asymmetry at scale. A corpus whose distinct-value
        // frame outgrows broadcast needs the bucketed RangeJoin
        // operator here instead.
        pos.join(broadcast(iv),
            col("_p") >= col("_rl") && col("_p") < col("_rl") + col("_c"))
          .select(col("_id").as(idCol), col("_g").as(groupCol),
            col("_vm").as("value_mic"), col("_pv").as("norm_mic"))
    }
  }
}
