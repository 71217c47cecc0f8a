package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-key time-series statistics over keyed ordered series.
  *
  * The reference's temporal analysis stops at calendar component
  * extraction (`/root/reference/monarch_etl/cleaning.py:105-246` derives
  * year/month/day/week columns); these operators are the engine-native
  * next step: serial-dependence structure of a keyed series, computed
  * distributed with one keyed exchange.
  */
object SeriesStats {

  /** Lagged autocorrelation per key: for each requested lag L,
    * acf_L = Σ_t (v_t − μ)(v_{t−L} − μ) / Σ_t (v_t − μ)², where t−L is
    * L ROWS back in `orderCol` order within the key (missing
    * predecessors drop out of the numerator; the denominator uses all
    * points — the standard plug-in ACF estimator).
    *
    * Output: key, n_points, mean, acf_<L> per lag (NULL when the
    * denominator is zero — a constant series has no autocorrelation).
    *
    * Determinism (the [[graft.queries.Det]] discipline): μ is a
    * decimal-exact sum over identical per-row doubles divided once;
    * deviation products are per-row IEEE arithmetic on identical
    * operands, summed through DECIMAL(28,8) (order-independent), and
    * the final ratio is one double division — bit-reproducible on any
    * engine.
    *
    * Scale: one exchange keyed on `keyCol` shared by the window and
    * both aggregates (Catalyst reuses the partitioning); per-key state
    * is the series itself, never the corpus. The per-key stats join
    * back keyed — series content ((key, order, value) triples) crosses
    * once.
    */
  /** Arrival-order lateness: for every event, how far its event time
    * lags behind the maximum event time of everything that ARRIVED
    * before it (arrival order = `seqCol`, e.g. an ingest sequence
    * number). This is the watermark planning tool for a streaming
    * deployment: an event with `lateness_us` above the candidate
    * watermark delay is exactly an event the watermark would drop.
    *
    * Output: the input rows plus `lateness_us` (0 when the event
    * arrived in order or first) and `late` (1/0 vs `thresholdUs`).
    *
    * Scale — a GLOBAL running max with NO global window: `seqCol`
    * splits into `nShards` contiguous blocks (block size from the
    * driver-bounded min/max), the running max runs inside each
    * block's window, and cross-block carry-in offsets come from a
    * ≤nShards-row totals frame (collected, prefix-maxed driver-side,
    * broadcast back) — the two-phase pattern of
    * [[Sampling.budgetSelect]]. The corpus crosses one exchange,
    * keyed on its block.
    */
  def arrivalLateness(df: DataFrame, seqCol: String, tsCol: String,
      thresholdUs: Long, nShards: Int = 64): DataFrame = {
    require(thresholdUs >= 0 && nShards >= 1,
      s"bad parameters ($thresholdUs, $nShards)")
    val spark = df.sparkSession
    val base = df.withColumn("_us", unix_micros(col(tsCol)))
    val bounds = base.agg(min(col(seqCol)).cast(LongType),
      max(col(seqCol)).cast(LongType)).collect()(0)
    if (bounds.isNullAt(0)) {
      return base.withColumn("lateness_us", lit(0L))
        .withColumn("late", lit(0))
    }
    val (minSeq, maxSeq) = (bounds.getLong(0), bounds.getLong(1))
    val span = maxSeq - minSeq + 1
    val blockSize = math.max(1L, (span + nShards - 1) / nShards)
    val sharded = base.withColumn("_shard",
      expr(s"CAST((CAST($seqCol AS BIGINT) - ${minSeq}L) div ${blockSize}L AS BIGINT)"))
    // per-block maxima: ≤ nShards rows by construction
    val blockMax = sharded.groupBy(col("_shard")).agg(max(col("_us")).as("_m"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // exclusive prefix max over blocks that actually exist
    var carry = Long.MinValue
    val plan = blockMax.map { case (shard, m) =>
      val row = (shard, if (carry == Long.MinValue) null
        else java.lang.Long.valueOf(carry))
      carry = math.max(carry, m)
      row
    }
    val planDf = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(
          plan.toList.map { case (s, o) => org.apache.spark.sql.Row(s, o) }).asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_shard", LongType),
        org.apache.spark.sql.types.StructField("_carry", LongType))))
    val w = Window.partitionBy(col("_shard")).orderBy(col(seqCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // greatest() skips NULLs: first row of a block falls back to the
    // carry-in; the global first row (both NULL) is never late
    val prevMax = greatest(max(col("_us")).over(w), col("_carry"))
    sharded.join(broadcast(planDf), Seq("_shard"))
      .withColumn("lateness_us",
        when(prevMax > col("_us"), prevMax - col("_us")).otherwise(0L))
      .withColumn("late",
        when(col("lateness_us") > thresholdUs, 1).otherwise(0))
      .drop("_shard", "_carry", "_us")
  }

  def laggedAutocorrelation(df: DataFrame, keyCol: String,
      orderCol: String, valueCol: String,
      lags: Seq[Int] = Seq(1)): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), s"bad lags $lags")
    // EXACT formulation (round-8 fix): the original accumulated
    // double deviation-products through DECIMAL(28,8) casts, and the
    // double→decimal rounding of a product sitting ON the 10⁻⁸ half
    // differs between engines (Spark rounds the shortest decimal
    // string, others round the exact binary expansion) — a
    // data-dependent ULP flake the regenerated sf0.1 fixtures
    // actually hit. Instead, scale values to exact micro-integers and
    // cross-multiply the mean away: with S = Σv_mic and n points,
    // dv_i := v_mic_i·n − S is an exact integer, and
    // acf_L = Σ dv·dv_lag / Σ dv² — the n² and 10¹² factors cancel,
    // every sum is exact DECIMAL(38,0), and the ONLY float operation
    // left is the final division of two bit-identical integers.
    val big = DecimalType(38, 0)
    val series = df.select(col(keyCol).as("_k"), col(orderCol).as("_t"),
      (col(valueCol).cast(DecimalType(18, 6)) * 1000000L)
        .cast(LongType).as("_vm"))
    val stats = series.groupBy(col("_k")).agg(
      count(lit(1)).as("n_points"), sum(col("_vm")).as("_s"))
    val w = Window.partitionBy(col("_k")).orderBy(col("_t"))
    val withDev = series.join(stats, Seq("_k"))
      // _vm widens to DECIMAL(38,0) BEFORE the ×n multiply: in Long
      // arithmetic |v|·10⁶·n overflows 2⁶³ for values near 1e9 with
      // ~9200 points — inside the DECIMAL(18,6) input domain (the
      // oracle mirrors with a HUGEINT cast before its multiply)
      .withColumn("_dev",
        col("_vm").cast(big) * col("n_points") - col("_s").cast(big))
    val lagged = lags.foldLeft(withDev) { (acc, l) =>
      acc.withColumn(s"_dev_l$l", lag(col("_dev"), l).over(w))
    }
    val aggs: Seq[Column] =
      Seq(max(col("n_points")).cast(LongType).as("n_points"),
        max(col("_s")).as("_s"),
        sum(col("_dev") * col("_dev")).cast(big).as("_den")) ++
        lags.map(l =>
          sum(col("_dev") * col(s"_dev_l$l")).cast(big).as(s"_num$l"))
    val outCols: Seq[Column] =
      Seq(col("_k").as(keyCol), col("n_points"),
        // mean = S/10⁶/n: S < 2⁵³ casts to double exactly, then two
        // IEEE divisions on identical operands — deterministic on any
        // engine (CAST(S AS DOUBLE)/1000000.0/n replays it verbatim)
        (col("_s").cast(DoubleType) / lit(1000000.0) /
          col("n_points").cast(DoubleType)).as("mean")) ++
        lags.map(l =>
          when(col("_den") =!= lit(0L).cast(big),
            col(s"_num$l").cast(DoubleType) / col("_den").cast(DoubleType))
            .as(s"acf_$l"))
    lagged.groupBy(col("_k")).agg(aggs.head, aggs.tail: _*)
      .select(outCols: _*)
  }

  /** Dyadic EWMA per key: exponentially-weighted moving average with
    * decay ½ over the last `span` points, in EXACT integer arithmetic.
    * For the window v₀(oldest)…v_{m−1}(current),
    * ewma = Σ vⱼ·2ʲ / (2ᵐ − 1) — each step back halves the weight and
    * the truncated tail's mass is re-normalized by the denominator.
    * The α=½ choice is what makes the float-free formulation possible:
    * weights are powers of two, the weighted sum is an integer, and
    * the single IntegralDivide at the end is exact — bit-stable under
    * any partitioning, replayable by any ANSI engine (the float EWMA
    * recursion y←αx+(1−α)y compounds rounding differently per engine
    * and can never hash-match).
    *
    * Values enter as micro-units (value·10⁶ through DECIMAL(18,6), the
    * [[graft.queries.Det]] rounding) and the result is ewma·10⁶.
    * Overflow bound: |v|·10⁶·2^span·span < 2⁶³ — span 16 leaves
    * room for |v| up to ~8·10⁶; larger spans trade scale headroom.
    *
    * Scale: ONE exchange keyed on `keyCol` for the ordered window
    * (collect_list over a bounded ROWS frame — per-row state is ≤span
    * longs); the weighted fold is a codegen'd lambda, no UDF.
    */
  /** Seasonal-baseline anomaly screen: flag (day, hour) cells whose
    * event count exceeds `factor`× the average for that (weekday,
    * hour) slot across the whole history — the cross-period
    * complement to a trailing-window burst detector (q163): a Monday-
    * 9am spike that trails a quiet weekend looks like a burst to a
    * trailing window but is NORMAL against the Monday-9am baseline,
    * and vice versa.
    *
    * Pure integer verdict: cell n vs slot (total, ndays) compares as
    * n·ndays·100 > factorPct·total — no float average (factorPct 120
    * = "20% above the slot baseline"). Weekday is Monday=0 (Spark
    * `weekday` ≡ DuckDB `isodow−1`).
    *
    * Scale: one keyed (day,hour) aggregate over the corpus, a
    * slot-sized (≤168 rows) baseline roll-up broadcast back — the
    * corpus crosses one exchange.
    */
  def seasonalBaselineAnomalies(df: DataFrame, tsCol: String,
      factorPct: Int): DataFrame = {
    require(factorPct >= 100, s"factorPct must be >= 100, got $factorPct")
    val cells = df.groupBy(
        to_date(col(tsCol)).as("day"), hour(col(tsCol)).as("hr"))
      .agg(count(lit(1)).as("n"))
    val base = cells
      .groupBy(weekday(col("day")).as("dow"), col("hr"))
      .agg(sum(col("n")).as("slot_total"), count(lit(1)).as("slot_days"))
    cells.withColumn("dow", weekday(col("day")))
      .join(broadcast(base), Seq("dow", "hr"))
      .filter(col("n") * col("slot_days") * 100 >
        lit(factorPct) * col("slot_total"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("hr").cast(IntegerType).as("hr"),
        col("n").cast(LongType).as("n"),
        col("slot_total").cast(LongType).as("slot_total"),
        col("slot_days").cast(LongType).as("slot_days"))
  }

  /** Per-group two-feature least squares — y ~ x1 + x2 by the closed
    * normal equations (2×2 Cramer), entirely in deterministic integer
    * arithmetic. The multiple-regression big sibling of the q146
    * single-feature slope: trend estimation with a confounder
    * controlled (e.g. metric vs time, adjusting for hour-of-day).
    *
    * Two corpus scans BY DESIGN: pass 1 takes per-group integer means
    * (one |groups|-sized hash aggregate), pass 2 sums CENTERED products
    * after a broadcast join of the means. Raw (uncentered) moments
    * would allow one pass, but their Cramer products scale with n³ and
    * overflow DECIMAL(38,0) near 10¹² rows — centering keeps every
    * covariance ~range², row-count-independent, because each centered
    * covariance is normalized by n (integer div) before the
    * determinant. Truncation from the integer means/normalization is
    * identical on both engines (the determinism > exactness rule used
    * throughout; error is ≤1 unit per moment against moments of order
    * range²).
    *
    * Bounds (documented, ANSI-mode safe): |x−mean| ≤ 3·10⁹ keeps the
    * BIGINT centered squares exact before the DECIMAL(38,0) cast;
    * normalized covariances keep all Cramer products under 10³⁸ for
    * any n whenever range1²·range2²·outScale < 10³⁸.
    *
    * @param x1Col,x2Col integral feature columns (cast to BIGINT)
    * @param valueCol    double target, scaled to exact micro-units
    * @param outScale    slope output unit multiplier (e.g. 86400 for
    *                    per-day when x1 is seconds)
    * @return (group, n, slope1_scaled, slope2_scaled) — micro-target
    *         per outScale·x-unit, NULL when the design is degenerate
    */
  def groupedRegression2(df: DataFrame, groupCol: String,
      x1Col: String, x2Col: String, valueCol: String,
      outScale: Long = 1L): DataFrame = {
    val base = df.select(col(groupCol).as("_g"),
      col(x1Col).cast(LongType).as("_x1"),
      col(x2Col).cast(LongType).as("_x2"),
      (col(valueCol).cast(DecimalType(18, 6)) * 1000000L)
        .cast(LongType).as("_y"))

    // decimal sums: a BIGINT sum of seconds/micro-units overflows near
    // 10¹² rows; the integer-div mean always fits back in BIGINT
    val means = base.groupBy(col("_g"))
      .agg(count(lit(1)).as("_n"),
        expr("CAST(sum(CAST(_x1 AS DECIMAL(38,0))) div count(1) AS BIGINT)").as("_m1"),
        expr("CAST(sum(CAST(_x2 AS DECIMAL(38,0))) div count(1) AS BIGINT)").as("_m2"),
        expr("CAST(sum(CAST(_y  AS DECIMAL(38,0))) div count(1) AS BIGINT)").as("_my"))

    def dec(c: Column): Column = c.cast(DecimalType(38, 0))
    val centered = base.join(broadcast(means), Seq("_g"))
      .select(col("_g"), col("_n"),
        (col("_x1") - col("_m1")).as("_d1"),
        (col("_x2") - col("_m2")).as("_d2"),
        (col("_y") - col("_my")).as("_dy"))
    val covs = centered.groupBy(col("_g"), col("_n"))
      .agg(sum(dec(col("_d1")) * col("_d1")).as("_s11"),
        sum(dec(col("_d1")) * col("_d2")).as("_s12"),
        sum(dec(col("_d2")) * col("_d2")).as("_s22"),
        sum(dec(col("_d1")) * col("_dy")).as("_s1y"),
        sum(dec(col("_d2")) * col("_dy")).as("_s2y"))
      .select(col("_g"), col("_n"),
        expr("_s11 div _n").as("_c11"), expr("_s12 div _n").as("_c12"),
        expr("_s22 div _n").as("_c22"), expr("_s1y div _n").as("_c1y"),
        expr("_s2y div _n").as("_c2y"))

    // widen the normalized covariances back to DECIMAL(38,0): the
    // Cramer products (c22·c1y etc.) exceed BIGINT once outScale or a
    // feature range is large, and ANSI mode would fail loudly
    val det = "nullif(CAST(_c11 AS DECIMAL(38,0)) * _c22 - " +
      "CAST(_c12 AS DECIMAL(38,0)) * _c12, 0)"
    covs.select(col("_g").as(groupCol), col("_n").as("n"),
      expr(s"CAST(($outScale * (CAST(_c22 AS DECIMAL(38,0)) * _c1y - " +
        s"CAST(_c12 AS DECIMAL(38,0)) * _c2y)) div $det AS BIGINT)")
        .as("slope1_scaled"),
      expr(s"CAST(($outScale * (CAST(_c11 AS DECIMAL(38,0)) * _c2y - " +
        s"CAST(_c12 AS DECIMAL(38,0)) * _c1y)) div $det AS BIGINT)")
        .as("slope2_scaled"))
  }

  def dyadicEwma(df: DataFrame, keyCol: String, orderCols: Seq[String],
      valueCol: String, span: Int): DataFrame = {
    require(span >= 1 && span <= 32, s"span must be in [1,32], got $span")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-(span - 1), Window.currentRow)
    df.withColumn("_vmic",
        (col(valueCol).cast(DecimalType(18, 6)) * 1000000L).cast(LongType))
      .withColumn("_arr", collect_list(col("_vmic")).over(w))
      .withColumn("ewma_mic", expr(
        """aggregate(_arr, named_struct('a', 0L, 'w', 1L),
          |  (s, v) -> named_struct('a', s.a + v * s.w, 'w', s.w * 2L),
          |  s -> s.a div (s.w - 1L))""".stripMargin))
      .drop("_vmic", "_arr")
  }
}
