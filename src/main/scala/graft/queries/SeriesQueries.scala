package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Keyed time-series analytics over the events stream table:
  * sliding-window aggregation (the streaming `window(slide)` shape in
  * its batch twin) and serial-dependence statistics.
  */
object SeriesQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Sliding-window counts ([[graft.streaming.EventStreams.slidingCounts]]
    * run on the batch frame — identical plan modulo the watermark
    * node): 1-hour windows sliding every 30 minutes, so every event
    * lands in exactly two windows. The oracle replays Spark's
    * epoch-aligned window assignment with time_bucket minus k·slide.
    * Scale: `window()` explodes each row into width/slide rows BEFORE
    * the keyed exchange — amplification is the window overlap factor
    * (2 here), a declared constant, never data-dependent.
    */
  def q171SlidingWindow(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStreams
      .slidingCounts(Tables.events(s, dir), "1 hour", "30 minutes")
      .select(
        date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"))
      .orderBy("window_start", "event_type")

  val q171Sql: String =
    """SELECT strftime(time_bucket(INTERVAL 30 MINUTES, ts) - to_minutes(30 * k.k),
      |    '%Y-%m-%d %H:%M:%S') AS window_start,
      |  event_type, count(*) AS n_events
      |FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) k
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin

  /** Daily-series autocorrelation per event type
    * ([[graft.operators.SeriesStats.laggedAutocorrelation]] at lags 1
    * and 2 over the per-day value totals): deviation products
    * accumulate through DECIMAL(28,8) so the ACF ratio is
    * bit-reproducible. The oracle recomputes the daily series, the
    * mean, the lagged deviations and both ratios from scratch.
    */
  def q172DailyAutocorr(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(Det.exactSum(col("value")).as("v"))
    graft.operators.SeriesStats
      .laggedAutocorrelation(daily, "event_type", "day", "v", Seq(1, 2))
      .orderBy("event_type")
  }

  // exact-integer ACF replay (the round-8 reformulation): micro-unit
  // daily totals, cross-multiplied deviations dv = v·n − S as HUGEINT,
  // exact product sums, ONE double division at the end — no
  // double→decimal rounding anywhere for either engine to disagree on
  val q172Sql: String =
    """WITH daily AS (
      |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
      |  FROM events GROUP BY 1, 2),
      |vm AS (
      |  SELECT event_type, day,
      |    CAST(CAST(v AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS vm
      |  FROM daily),
      |st AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(vm) AS BIGINT) AS s
      |  FROM vm GROUP BY 1),
      |dev AS (
      |  SELECT vm.event_type,
      |    CAST(vm.vm AS HUGEINT) * st.n - st.s AS dv,
      |    lag(CAST(vm.vm AS HUGEINT) * st.n - st.s, 1)
      |      OVER (PARTITION BY vm.event_type ORDER BY vm.day) AS dv1,
      |    lag(CAST(vm.vm AS HUGEINT) * st.n - st.s, 2)
      |      OVER (PARTITION BY vm.event_type ORDER BY vm.day) AS dv2
      |  FROM vm JOIN st USING (event_type)),
      |ag AS (
      |  SELECT event_type, sum(dv * dv) AS den,
      |    sum(dv * dv1) AS num1, sum(dv * dv2) AS num2
      |  FROM dev GROUP BY 1)
      |SELECT st.event_type, st.n AS n_points,
      |  CAST(st.s AS DOUBLE) / 1000000.0 / CAST(st.n AS DOUBLE) AS mean,
      |  CASE WHEN ag.den <> 0
      |    THEN CAST(ag.num1 AS DOUBLE) / CAST(ag.den AS DOUBLE) END AS acf_1,
      |  CASE WHEN ag.den <> 0
      |    THEN CAST(ag.num2 AS DOUBLE) / CAST(ag.den AS DOUBLE) END AS acf_2
      |FROM st JOIN ag USING (event_type)
      |ORDER BY event_type""".stripMargin

  /** Watermark planning audit
    * ([[graft.operators.SeriesStats.arrivalLateness]]): per event
    * type, how many events arrive later (in event_id arrival order)
    * than a 10-minute watermark would tolerate, and the worst
    * lateness observed — the measurement that sizes
    * `withWatermark()` before deploying the streaming queries. The
    * operator computes the global arrival-order running max with the
    * two-phase sharded pattern (no global window); the oracle is the
    * independent single-window formulation.
    */
  def q174LateDataAudit(s: SparkSession, dir: String): DataFrame =
    graft.operators.SeriesStats
      .arrivalLateness(Tables.events(s, dir), "event_id", "ts",
        thresholdUs = 600000000L)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("late")).cast(org.apache.spark.sql.types.LongType).as("n_late"),
        expr("CAST(max(lateness_us) div 1000000 AS BIGINT)")
          .as("max_lateness_sec"))
      .orderBy("event_type")

  val q174Sql: String =
    """WITH o AS (
      |  SELECT event_type, epoch_us(ts) AS us,
      |    max(epoch_us(ts)) OVER (ORDER BY event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      |  FROM events)
      |SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CASE WHEN prev_max - us > 600000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
      |  CAST(max(CASE WHEN prev_max > us THEN prev_max - us ELSE 0 END) // 1000000 AS BIGINT) AS max_lateness_sec
      |FROM o
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Interval-bounded stream-stream join, batch twin
    * ([[graft.streaming.EventStreams.joinWithinInterval]] — identical
    * code path; `withWatermark` is a no-op on batch frames):
    * purchases join clicks by the same user within the 10 minutes
    * BEFORE the purchase, summarized per user. This is the
    * time-bounded event correlation every stream pipeline runs
    * (click→purchase attribution windows); the interval bound is what
    * makes streaming state finite, and the batch twin is what makes
    * it oracle-checkable. Scale: one exchange keyed on user_id per
    * side; the time predicate prunes pairs inside the per-key join.
    */
  def q182IntervalJoinTwin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
    graft.streaming.EventStreams
      .joinWithinInterval(purchases, clicks, "user_id", windowSec = 600)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(expr("(unix_micros(ts) - unix_micros(ts_right)) div 1000000"))
          .cast(org.apache.spark.sql.types.LongType).as("sum_delta_sec"))
      .orderBy("user_id")
  }

  val q182Sql: String =
    """WITH p AS (
      |  SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT user_id, ts FROM events WHERE event_type = 'click')
      |SELECT p.user_id, count(*) AS n_pairs,
      |  CAST(sum((epoch_us(p.ts) - epoch_us(c.ts)) // 1000000) AS BIGINT) AS sum_delta_sec
      |FROM p JOIN c ON p.user_id = c.user_id
      |  AND p.ts >= c.ts
      |  AND p.ts <= c.ts + INTERVAL 600 SECONDS
      |GROUP BY p.user_id
      |ORDER BY p.user_id""".stripMargin

  /** Dyadic EWMA smoothing ([[graft.operators.SeriesStats.dyadicEwma]]):
    * per-user exponentially-weighted value average, decay ½ over the
    * last 16 events — in EXACT integer arithmetic (power-of-two
    * weights, one IntegralDivide), which is what lets two engines
    * hash-match a result the float recursion y←αx+(1−α)y never could.
    * The oracle replays the weighted window as a rank self-join with
    * bit-shift weights.
    */
  def q189DyadicEwma(s: SparkSession, dir: String): DataFrame =
    graft.operators.SeriesStats.dyadicEwma(
        Tables.events(s, dir), "user_id", Seq("ts", "event_id"), "value",
        span = 16)
      .select(col("event_id"), col("user_id"), col("ewma_mic"))
      .orderBy("event_id")

  val q189Sql: String =
    """WITH t AS (
      |  SELECT event_id, user_id,
      |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS vmic,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events)
      |SELECT a.event_id, a.user_id,
      |  CAST(sum(b.vmic * (CAST(1 AS BIGINT)
      |      << (LEAST(a.rn, 16) - 1 - (a.rn - b.rn))))
      |    // ((CAST(1 AS BIGINT) << LEAST(a.rn, 16)) - 1) AS BIGINT) AS ewma_mic
      |FROM t a JOIN t b ON a.user_id = b.user_id
      |  AND a.rn - b.rn BETWEEN 0 AND LEAST(a.rn, 16) - 1
      |GROUP BY a.event_id, a.user_id, a.rn
      |ORDER BY a.event_id""".stripMargin

  /** Seasonal-baseline anomaly screen
    * ([[graft.operators.SeriesStats.seasonalBaselineAnomalies]]):
    * (day, hour) cells more than 20% above their (weekday, hour) slot
    * average — the cross-period complement to q163's trailing-window
    * burst detector. Integer cross-multiplied verdict
    * (n·days·100 > 120·total); the oracle replays cells, baselines
    * and the comparison.
    */
  def q193SeasonalAnomaly(s: SparkSession, dir: String): DataFrame =
    graft.operators.SeriesStats
      .seasonalBaselineAnomalies(Tables.events(s, dir), "ts",
        factorPct = 120)
      .orderBy("day", "hr")

  val q193Sql: String =
    """WITH cells AS (
      |  SELECT CAST(ts AS DATE) AS day, hour(ts) AS hr,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |base AS (
      |  SELECT isodow(day) - 1 AS dow, hr,
      |    CAST(sum(n) AS BIGINT) AS slot_total,
      |    CAST(count(*) AS BIGINT) AS slot_days
      |  FROM cells GROUP BY 1, 2)
      |SELECT strftime(c.day, '%Y-%m-%d') AS day, CAST(c.hr AS INT) AS hr,
      |  c.n, b.slot_total, b.slot_days
      |FROM cells c JOIN base b ON isodow(c.day) - 1 = b.dow AND c.hr = b.hr
      |WHERE c.n * b.slot_days * 100 > 120 * b.slot_total
      |ORDER BY day, hr""".stripMargin

  /** Ordered sequence-pattern match
    * ([[graft.operators.Funnel.sequencePattern]], the MATCH_RECOGNIZE
    * shape): per user, how many times a signup is followed by a
    * purchase with NO error and no earlier purchase in between —
    * `s[^ep]*p` over the user's time-ordered symbol string. The
    * negation over the gap is exactly what q97's min-chain funnel
    * cannot express. The oracle rebuilds every symbol string with an
    * ordered string_agg and recounts the leftmost non-overlapping
    * matches.
    */
  def q194SequencePattern(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.sequencePattern(
        Tables.events(s, dir), "user_id", "ts", "event_id", "event_type",
        Map("signup" -> "s", "view" -> "v", "click" -> "c",
          "purchase" -> "p", "error" -> "e"),
        pattern = "s[^ep]*p")
      .orderBy("user_id")

  val q194Sql: String =
    """WITH sym AS (
      |  SELECT user_id, ts, event_id,
      |    CASE event_type WHEN 'signup' THEN 's' WHEN 'view' THEN 'v'
      |      WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p'
      |      WHEN 'error' THEN 'e' ELSE 'x' END AS s
      |  FROM events),
      |agg AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |    string_agg(s, '' ORDER BY ts, event_id) AS symbols
      |  FROM sym GROUP BY user_id)
      |SELECT user_id, n_events, symbols,
      |  CAST(len(regexp_extract_all(symbols, 's[^ep]*p')) AS BIGINT) AS n_matches,
      |  CAST(CASE WHEN regexp_matches(symbols, 's[^ep]*p')
      |    THEN 1 ELSE 0 END AS INT) AS matched
      |FROM agg
      |ORDER BY user_id""".stripMargin

  /** Per-group two-feature regression
    * ([[graft.operators.SeriesStats.groupedRegression2]]): value
    * trended against time CONTROLLING for hour-of-day, per event type —
    * the confounder-adjusted big sibling of q146's single-feature
    * slope. Two corpus scans (means, then centered moments — the
    * formulation whose Cramer products stay inside DECIMAL(38,0) at any
    * row count), one broadcast join, zero floats. The oracle replays
    * the integer means, every centered product sum, the
    * div-n normalization, and both Cramer divisions in HUGEINT.
    */
  def q216GroupedRegression(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_type"),
      expr("(unix_micros(ts) - 1704067200000000) div 1000000").as("x1"),
      hour(col("ts")).cast("long").as("x2"),
      col("value"))
    graft.operators.SeriesStats
      .groupedRegression2(ev, "event_type", "x1", "x2", "value",
        outScale = 86400L)
      .orderBy("event_type")
  }

  val q216Sql: String =
    """WITH b AS (
      |  SELECT event_type,
      |    (epoch_us(ts) - 1704067200000000) // 1000000 AS x1,
      |    CAST(extract(hour FROM ts) AS BIGINT) AS x2,
      |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS y
      |  FROM events),
      |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |        CAST(CAST(sum(x1) AS HUGEINT) // count(*) AS BIGINT) AS m1,
      |        CAST(CAST(sum(x2) AS HUGEINT) // count(*) AS BIGINT) AS m2,
      |        CAST(CAST(sum(y)  AS HUGEINT) // count(*) AS BIGINT) AS my
      |      FROM b GROUP BY event_type),
      |c AS (SELECT b.event_type, m.n,
      |        b.x1 - m.m1 AS d1, b.x2 - m.m2 AS d2, b.y - m.my AS dy
      |      FROM b JOIN m USING (event_type)),
      |v AS (SELECT event_type, n,
      |        sum(CAST(d1 AS HUGEINT) * d1) // n AS c11,
      |        sum(CAST(d1 AS HUGEINT) * d2) // n AS c12,
      |        sum(CAST(d2 AS HUGEINT) * d2) // n AS c22,
      |        sum(CAST(d1 AS HUGEINT) * dy) // n AS c1y,
      |        sum(CAST(d2 AS HUGEINT) * dy) // n AS c2y
      |      FROM c GROUP BY event_type, n)
      |SELECT event_type, n,
      |  CAST((86400 * (c22 * c1y - c12 * c2y))
      |    // nullif(c11 * c22 - c12 * c12, 0) AS BIGINT) AS slope1_scaled,
      |  CAST((86400 * (c11 * c2y - c12 * c1y))
      |    // nullif(c11 * c22 - c12 * c12, 0) AS BIGINT) AS slope2_scaled
      |FROM v ORDER BY event_type""".stripMargin

  /** Sliding-window distinct maintenance
    * ([[graft.operators.Sketches.slidingDistinct]]): 7-day unique
    * users per day from the per-day HLL sketch table — the trailing
    * window is a merge of ≤7 day-sketches over the DAYS frame, never a
    * window-length rescan of the event log. The q29 sketch-contract
    * gate: exact counts (recomputed here by the naive ×7 expansion the
    * sketch exists to avoid) plus a per-day within-5% claim the sketch
    * must honor; DuckDB recomputes the exact side with a different
    * algorithm and states the contract.
    */
  def q220SlidingDistinct(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val ev = Tables.events(s, dir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("user_id"))
    val daily = graft.operators.Sketches.distinctSketches(ev, "day", "user_id")
    val est = graft.operators.Sketches.slidingDistinct(daily, "day", 7)
      .withColumnRenamed("day", "_eday")
    val pairs = ev.distinct()
    val days = pairs.select(col("day").as("_d")).distinct()
    val exact = days.join(pairs,
        col("day") <= col("_d") &&
          col("day") >= date_format(date_sub(to_date(col("_d")), 6),
            "yyyy-MM-dd"))
      .groupBy(col("_d"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    exact.join(est, col("_d") === col("_eday"))
      .select(col("_d").as("day"), col("window_days"), col("exact_users"),
        (abs(col("estimate").cast(DoubleType) -
          col("exact_users").cast(DoubleType)) <=
          lit(0.05) * col("exact_users").cast(DoubleType) + lit(2.0))
          .as("est_ok"))
      .orderBy("day")
  }

  val q220Sql: String =
    """WITH p AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day, user_id
      |           FROM events),
      |d AS (SELECT DISTINCT day FROM p)
      |SELECT d.day, CAST(7 AS INT) AS window_days,
      |  CAST(count(DISTINCT p.user_id) AS BIGINT) AS exact_users,
      |  TRUE AS est_ok
      |FROM d JOIN p ON p.day <= d.day
      |  AND p.day >= strftime(CAST(d.day AS DATE) - INTERVAL 6 DAY,
      |                        '%Y-%m-%d')
      |GROUP BY d.day ORDER BY d.day""".stripMargin

  /** Incremental sessionization as union-find
    * ([[graft.operators.Dedup.incrementalComponents]]): events link
    * when consecutive for a user within 1 hour; the month splits at
    * Jan 16 into a PERSISTED base assignment (components of the
    * pre-cutoff edges) and an increment batch folded in WITHOUT
    * recomputing history — cross-cutoff edges exercise the
    * component-merge path, post-cutoff newcomers the attach path. The
    * oracle computes every session independently by gaps-and-islands
    * (a different algorithm with no notion of "incremental"), so a
    * stale base label, a missed merge, or a lost singleton breaks the
    * hash on some event's session id.
    */
  def q225IncrementalSessions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val linked = ev
      .withColumn("_nid", lead(col("event_id"), 1).over(w))
      .withColumn("_nts", lead(col("ts"), 1).over(w))
      .filter(col("_nid").isNotNull &&
        expr("unix_micros(_nts) - unix_micros(ts) <= 3600000000"))
      .select(col("event_id").as("id_a"), col("_nid").as("id_b"),
        col("_nts").as("_bts"))
    val cutoff = lit("2024-01-16 00:00:00").cast("timestamp")
    val incEdges = linked.filter(!(col("_bts") < cutoff))
      .select(col("id_a"), col("id_b"))
    // the persisted-era assignment comes from the sessionizer itself
    // (gaps-and-islands, one keyed window chain — what a production
    // job would have persisted); the operator under test is the
    // INCREMENTAL fold, not the base construction
    val preEv = ev.filter(col("ts") < cutoff)
    val islands = preEv
      .withColumn("_pts", lag(col("ts"), 1).over(w))
      .withColumn("_brk", when(col("_pts").isNull ||
        expr("unix_micros(ts) - unix_micros(_pts) > 3600000000"), 1)
        .otherwise(0))
      .withColumn("_g", sum(col("_brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val baseAssign = islands
      .withColumn("component", min(col("event_id")).over(
        Window.partitionBy(col("user_id"), col("_g"))))
      .select(col("event_id").as("id"), col("component"))
    val updated = graft.operators.Dedup.incrementalComponents(
      baseAssign, "id", "component", incEdges, "id_a", "id_b")
    ev.select(col("event_id").as("id"))
      .join(updated, Seq("id"), "left_outer")
      .select(col("id").as("event_id"),
        coalesce(col("component_id"), col("id")).as("session_id"))
      .orderBy("event_id")
  }

  val q225Sql: String =
    """WITH o AS (
      |  SELECT event_id, user_id, ts,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
      |  FROM events),
      |isl AS (
      |  SELECT event_id, user_id,
      |    sum(CASE WHEN pts IS NULL
      |        OR epoch_us(ts) - epoch_us(pts) > 3600000000
      |        THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS g
      |  FROM o)
      |SELECT event_id,
      |  CAST(min(event_id) OVER (PARTITION BY user_id, g) AS BIGINT)
      |    AS session_id
      |FROM isl ORDER BY event_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q225_incremental_sessions" -> q225IncrementalSessions _,
    "q220_sliding_distinct" -> q220SlidingDistinct _,
    "q216_grouped_regression" -> q216GroupedRegression _,
    "q194_sequence_pattern" -> q194SequencePattern _,
    "q193_seasonal_anomaly" -> q193SeasonalAnomaly _,
    "q189_dyadic_ewma" -> q189DyadicEwma _,
    "q182_interval_join_twin" -> q182IntervalJoinTwin _,
    "q171_sliding_window" -> q171SlidingWindow _,
    "q172_daily_autocorr" -> q172DailyAutocorr _,
    "q174_late_data_audit" -> q174LateDataAudit _)

  val oracle: Map[String, String] = Map(
    "q225_incremental_sessions" -> q225Sql,
    "q220_sliding_distinct" -> q220Sql,
    "q216_grouped_regression" -> q216Sql,
    "q194_sequence_pattern" -> q194Sql,
    "q193_seasonal_anomaly" -> q193Sql,
    "q189_dyadic_ewma" -> q189Sql,
    "q182_interval_join_twin" -> q182Sql,
    "q171_sliding_window" -> q171Sql,
    "q172_daily_autocorr" -> q172Sql,
    "q174_late_data_audit" -> q174Sql)
}
