package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Time-series downsampling: irregular measurement streams condensed to
  * per-(key, window) OHLC + time-weighted-average bars — the telemetry
  * summarization every monitoring/sensor pipeline runs (the reference's
  * per-day table splits, `monarch_etl/table_naming.py:24-43`, are a
  * degenerate form: partition by day, keep everything).
  *
  * The time-weighted average is the honest aggregate for irregular
  * sampling — a sensor that reports once per hour at value 100 must not
  * be out-voted by one that reports every second at value 0. Each
  * reading holds its value until the next reading in the same window
  * (the last one holds until window end); TWA = Σ value·duration /
  * (window_end − first_reading).
  *
  * Determinism: the TWA is fixed-point integer end to end — each value
  * becomes exact micro-units (DECIMAL(18,6) · 10⁶ → BIGINT), products
  * against µs durations accumulate in DECIMAL(38,0) (exact,
  * order-independent, overflow-proof), and the final ratio is ONE
  * integer floor division, so any engine reproduces `twa_micros`
  * bit-for-bit. (A double TWA was tried first and differed between
  * engines in the last ulp of the DECIMAL→DOUBLE conversion — large
  * decimals do not convert correctly-rounded everywhere; integers
  * don't have that problem.) Open/close take (ts, id)-ordered
  * first/last via min/max over structs — no `first()` nondeterminism.
  *
  * Shape: one keyed window (partition by key+window, order by ts, id —
  * needed for each reading's `lead` duration) and a group-by on the
  * SAME key, which reuses the window's hash partitioning: the stream
  * shuffles once.
  */
object Downsample {

  /** Returns one row per (keyCol, window-start) with
    * (n, open, high, low, close, twa).
    */
  def ohlcTwa(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, windowUs: Long): DataFrame = {
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    val us = unix_micros(col(tsCol))
    val base = events.select(col(keyCol).as("_k"), us.as("_us"),
        col(idCol).as("_id"), col(valueCol).cast(DoubleType).as("_v"))
      .withColumn("_w", col("_us") - pmod(col("_us"), lit(windowUs)))
    val w = Window.partitionBy(col("_k"), col("_w"))
      .orderBy(col("_us"), col("_id"))
    val hold = coalesce(lead(col("_us"), 1).over(w),
      col("_w") + windowUs) - col("_us")
    base
      .withColumn("_dur", hold.cast(LongType))
      .withColumn("_nv",
        (col("_v").cast(DecimalType(18, 6)) * 1000000).cast(LongType))
      .groupBy(col("_k"), col("_w"))
      .agg(
        count(lit(1)).as("n"),
        min(struct(col("_us"), col("_id"), col("_v"))).getField("_v").as("open"),
        max(col("_v")).as("high"),
        min(col("_v")).as("low"),
        max(struct(col("_us"), col("_id"), col("_v"))).getField("_v").as("close"),
        sum(col("_nv").cast(DecimalType(38, 0)) * col("_dur")).as("_num"),
        sum(col("_dur")).as("_den"))
      .select(col("_k").as(keyCol), col("_w").as("window_us"), col("n"),
        col("open"), col("high"), col("low"), col("close"),
        expr("CAST(_num div _den AS BIGINT)").as("twa_micros"))
      .orderBy(col(keyCol), col("window_us"))
  }

  /** Linear gap fill for keyed time series: rows flagged missing get
    * the straight-line interpolation between their nearest non-missing
    * neighbors in series order; leading/trailing gaps take the nearest
    * single neighbor (the sensor-dropout repair every downstream
    * resample/aggregate assumes has already happened).
    *
    * Exactness: the interpolation is the WEIGHTED-AVERAGE form
    * `(vp·(tn−t) + vn·(t−tp)) div (tn−tp)` on non-negative integer
    * milli-values and second-resolution timestamps — every term is
    * non-negative, so floor and truncate agree and the result is
    * bit-identical on any engine (the `vp + Δ·w` form would divide a
    * possibly-negative numerator, where Spark truncates toward zero
    * but floor-division engines floor). Same-second neighbors
    * (span 0) fall back to the previous value.
    *
    * Scale: ONE shuffle on the series key; the four neighbor lookups
    * are ignore-null window functions over the same keyed ordering
    * (backward frame for prev, forward frame for next). No as-of
    * join, no second pass.
    *
    * Output: the missing rows only, with `filled_milli`
    * (null when the series has no non-missing row at all).
    */
  def gapFillLinear(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, milliCol: String, missingCol: String): DataFrame = {
    val ord = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val back = ord.rowsBetween(Window.unboundedPreceding, -1)
    val fwd = ord.rowsBetween(1, Window.unboundedFollowing)
    val sec = expr(s"unix_micros($tsCol) div 1000000")
    val obsV = when(!col(missingCol), col(milliCol))
    val obsT = when(!col(missingCol), sec)
    val filled = df
      .withColumn("_t", sec)
      .withColumn("_vp", last(obsV, ignoreNulls = true).over(back))
      .withColumn("_tp", last(obsT, ignoreNulls = true).over(back))
      .withColumn("_vn", first(obsV, ignoreNulls = true).over(fwd))
      .withColumn("_tn", first(obsT, ignoreNulls = true).over(fwd))
    filled.where(col(missingCol))
      .withColumn("filled_milli",
        when(col("_vp").isNotNull && col("_vn").isNotNull,
          when(col("_tn") === col("_tp"), col("_vp"))
            .otherwise(expr(
              "(_vp * (_tn - _t) + _vn * (_t - _tp)) div (_tn - _tp)")))
          .otherwise(coalesce(col("_vp"), col("_vn"))))
      .drop("_t", "_vp", "_tp", "_vn", "_tn")
  }
}
