package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral analytics over keyed event logs: ordered-funnel
  * completion and cohort retention — the two queries every
  * product-analytics warehouse runs hourly, expressed as keyed
  * aggregates that scale (no per-user collect, no sequence UDF, no
  * window over the whole log).
  */
object Funnel {

  /** Ordered funnel: for each user, the earliest time of step 1, then
    * the earliest step-2 event STRICTLY AFTER that, then the earliest
    * step-3 event strictly after THAT, and so on — the standard
    * "completed the funnel in order" semantics (same-timestamp events
    * do not advance the funnel; ties are not "after").
    *
    * Returns one row per user who reached step 1, with columns
    * `step_ts_1 … step_ts_N` (NULL from the first unreached step on —
    * monotone by construction: step n+1 non-null implies step n
    * non-null).
    *
    * Scale shape: one filtered min-aggregate per step, each joined
    * back on the user key — N−1 keyed joins of user-sized frames
    * against filtered event subsets, all partial-aggregated map-side.
    * Never a per-user event sort: a funnel over 10¹¹ events with
    * 10⁸ users moves user-sized frames between stages.
    */
  def funnelSteps(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelSteps: at least one step")
    val ev = graft.sources.Tables.widen(events)
      .select(col(userCol), col(tsCol), col(typeCol))
    var acc = ev.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("step_ts_1"))
    steps.tail.zipWithIndex.foreach { case (step, i) =>
      val n = i + 2
      val nxt = ev.filter(col(typeCol) === step)
        .join(acc.select(col(userCol), col(s"step_ts_${n - 1}").as("_prev")),
          Seq(userCol))
        .filter(col(tsCol) > col("_prev"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"step_ts_$n"))
      acc = acc.join(nxt, Seq(userCol), "left")
    }
    acc
  }

  /** Cohort retention: assign each user to the cohort of their first
    * active day, then count distinct users per (cohort day, day
    * offset) — the classic retention triangle. Day granularity (dates,
    * not timestamps) keeps the output engine-portable.
    *
    * Scale shape: a per-user min aggregate for cohorts, a distinct
    * (user, day) projection for activity, one keyed join, one count
    * aggregate — everything user- or user×day-sized, map-side
    * combined.
    */
  def cohortRetention(
      events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val ev = graft.sources.Tables.widen(events)
      .select(col(userCol), to_date(col(tsCol)).as("_d"))
    val cohort = ev.groupBy(col(userCol)).agg(min(col("_d")).as("_cohort"))
    val activity = ev.distinct()
    activity.join(cohort, Seq(userCol))
      .select(col("_cohort").as("cohort_date"),
        datediff(col("_d"), col("_cohort")).as("day_offset"))
      .groupBy(col("cohort_date"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Zero-clamped running balance per key — the inventory/credit
    * ledger fold r_i = max(0, r_{i−1} + δ_i), which LOOKS inherently
    * sequential (non-associative, so no naive prefix sum) but is
    * window-expressible through the Skorokhod reflection identity:
    *
    *   r_i = prefix_i − least(0, min_{j≤i} prefix_j)
    *
    * (the clamp "injects" exactly enough mass to keep the path
    * non-negative, and that injection equals the depth of the
    * unclamped path's running minimum). Two frames over ONE keyed
    * window sort — a plain prefix sum and a running min of it — so
    * the per-key fold that would otherwise need mapGroups stays
    * declarative, codegen'd, and single-exchange. FunnelSpec proves
    * the identity against a direct sequential fold.
    *
    * Input: `(keyCol, tsCol, idCol, deltaCol)` rows; output adds
    * `balance` (the clamped running value after each event).
    */
  def clampedRunningBalance(events: DataFrame, keyCol: String,
      tsCol: String, idCol: String, deltaCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("_pfx", sum(col(deltaCol)).over(w))
      .withColumn("balance",
        col("_pfx") - least(lit(0L), min(col("_pfx")).over(w)))
      .drop("_pfx")
  }

  /** Position-weighted multi-touch attribution (the U-shape model):
    * every touch inside the lookback window before a conversion
    * shares the credit — 40% to the first touch, 40% to the last,
    * 20% split across the middles — instead of last-touch's
    * winner-take-all ([[graft.queries.StreamingQueries.q137Attribution]]
    * is the last-touch sibling on the same events).
    *
    * Credits are exact integer micro-shares that sum to 1,000,000
    * per conversion BY CONSTRUCTION: the middle split is an integer
    * division with its remainder assigned to the earliest middle
    * touch — no float ever appears, so per-channel rollups are
    * engine- and partitioning-independent. Degenerate cases: one
    * touch → 10⁶, two touches → 5·10⁵ each.
    *
    * Scale: conversions join touches on the USER key (equi-join with
    * a time-band residual — bounded per user, never a cross join),
    * then one window keyed by conversion id ranks the touches. Two
    * keyed shuffles, both on high-cardinality keys.
    *
    * Output: one row per (conversion, touch) with `touch_rank`,
    * `n_touches`, `credit_micro`.
    */
  /** Ordered event-sequence pattern match — the MATCH_RECOGNIZE /
    * funnel-with-negation primitive [[funnelSteps]] cannot express:
    * "signup, then purchase, with NO error in between" needs an
    * exclusion over the gap, which min-chains (that only look at the
    * earliest next step) structurally miss.
    *
    * Per key, events map to one-character symbols (`symbols`; types
    * absent from the map collapse to `defaultSym`), sort into the
    * (tsCol, tieCol) order and concatenate into a symbol string; the
    * pattern is an ordinary regular expression evaluated ONCE per key
    * — n_matches counts leftmost non-overlapping matches, the shared
    * greedy semantics of every mainstream regex engine, which is what
    * lets a different engine replay the count exactly.
    *
    * Determinism: the per-key event order comes from `sort_array`
    * over (ts, tie, sym) structs — independent of collect order and
    * partitioning; `tieCol` must be unique per key.
    *
    * Scale: one keyed exchange (the groupBy collect); per-key state
    * is the key's own event symbols (1 byte each — a 10⁵-event user
    * is a 100 KB string), and the regex runs keyed-parallel. This is
    * the deliberate trade against [[funnelSteps]]: full
    * pattern-language power for per-key-sequence-sized state.
    */
  def sequencePattern(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, typeCol: String, symbols: Map[String, String],
      pattern: String, defaultSym: String = "x"): DataFrame = {
    require(symbols.nonEmpty, "sequencePattern: empty symbol map")
    require((symbols.values.toSeq :+ defaultSym).forall(_.length == 1),
      "sequencePattern: symbols must be single characters")
    val symExpr = symbols.foldLeft(lit(defaultSym)) {
      case (acc, (t, s)) => when(col(typeCol) === t, lit(s)).otherwise(acc)
    }
    df.select(col(keyCol).as("_k"),
        struct(col(tsCol).as("_t"), col(tieCol).as("_i"), symExpr.as("_s"))
          .as("_e"))
      .groupBy(col("_k"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        sort_array(collect_list(col("_e"))).as("_lst"))
      .select(col("_k").as(keyCol), col("n_events"),
        array_join(expr("transform(_lst, x -> x._s)"), "").as("symbols"))
      .withColumn("n_matches",
        regexp_count(col("symbols"), lit(pattern)).cast("long"))
      .withColumn("matched",
        when(col("n_matches") > 0, 1).otherwise(0).cast("int"))
  }

  def multiTouchAttribution(conversions: DataFrame, touches: DataFrame,
      userCol: String, convTsCol: String, convIdCol: String,
      touchTsCol: String, touchIdCol: String,
      lookbackUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = conversions.join(touches, Seq(userCol))
      .where(unix_micros(col(touchTsCol)) <= unix_micros(col(convTsCol)) &&
        unix_micros(col(convTsCol)) - unix_micros(col(touchTsCol)) <= lookbackUs)
    val perConv = Window.partitionBy(col(convIdCol))
    val ranked = joined
      .withColumn("touch_rank", row_number().over(
        perConv.orderBy(col(touchTsCol), col(touchIdCol))))
      .withColumn("n_touches", count(lit(1)).over(perConv))
    val m = col("n_touches")
    val r = col("touch_rank")
    ranked.withColumn("credit_micro",
      when(m === 1, lit(1000000L))
        .when(m === 2, lit(500000L))
        .when(r === 1 || r === m, lit(400000L))
        .otherwise(expr("200000 div (n_touches - 2)").cast("long") +
          when(r === 2, expr("200000 % (n_touches - 2)").cast("long"))
            .otherwise(lit(0L))))
  }
}
