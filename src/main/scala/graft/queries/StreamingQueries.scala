package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables
import Det._

/** Batch-equivalent views of the streaming operators (SURVEY.md §2.9) —
  * the same window/session semantics Structured Streaming runs
  * incrementally, expressed over the static `events` table so the
  * DuckDB oracle can check them.
  */
object StreamingQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Tumbling 1-hour windows by event_type — the batch twin of
    * `EventStreams.windowedCounts` (same `window()` bucketing the
    * streaming query uses, checked against DuckDB `time_bucket`).
    */
  def q26TumblingWindow(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStreams.windowedCounts(Tables.events(s, dir))
      .select(
        date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy("window_start", "event_type")

  val q26Sql: String =
    """SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |  event_type, count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin

  /** Gap-based sessionization (30-minute inactivity gap) as a batch
    * window computation: lag → new-session flag → running sum = session
    * id; per-session stats. The streaming twin is
    * `EventStreams.sessionize` (flatMapGroupsWithState).
    * Scale: one shuffle on user_id; windows sort within user only.
    */
  def q27Sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = 1800L * 1000000L
    Tables.events(s, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        floor((max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
          / lit(1000000.0)).cast(LongType).as("duration_sec"))
      .orderBy("user_id", "session_id")
  }

  val q27Sql: String =
    """SELECT user_id, session_id, count(*) AS n_events,
      |  CAST(floor((max(epoch_us(ts)) - min(epoch_us(ts))) / 1000000.0) AS BIGINT) AS duration_sec
      |FROM (
      |  SELECT user_id, ts, event_id,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM (
      |    SELECT user_id, ts, event_id,
      |      CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
      |           THEN 1 ELSE 0 END AS new_session
      |    FROM (
      |      SELECT user_id, ts, event_id,
      |        lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |      FROM events)))
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** As-of join: each purchase gets the user's latest prior signup
    * snapshot (no future leakage). The DuckDB oracle uses its NATIVE
    * `ASOF LEFT JOIN` — an independent implementation of the same
    * semantics, so this checks the composition, not a mirrored formula.
    */
  def q33AsOfJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("snap_ts"),
        col("value").as("signup_value"))
    graft.operators.AsOfJoin.asOfJoin(
        purchases, signups, Seq("user_id"), "ts", "snap_ts",
        rightPayload = Seq("signup_value"))
      .select(
        col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        col("value"), col("signup_value"),
        date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss").as("signup_ts"))
      .orderBy("event_id")
  }

  val q33Sql: String =
    """SELECT p.event_id, p.user_id,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
      |  p.value, s.value AS signup_value,
      |  strftime(s.ts, '%Y-%m-%d %H:%M:%S') AS signup_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      |  ON p.user_id = s.user_id AND p.ts >= s.ts
      |ORDER BY p.event_id""".stripMargin

  /** Range join: purchases inside a 10-minute window after an error by
    * the same user (bucketed formulation; oracle is DuckDB's plain
    * inequality join — an independent evaluation strategy).
    */
  def q35RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val incidents = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"),
        col("ts").as("start_ts"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("end_ts"))
    graft.operators.RangeJoin.pointInInterval(
        purchases, incidents, Seq("user_id"), "ts", "start_ts", "end_ts")
      .select(col("purchase_id"), col("error_id"), col("user_id"))
      .orderBy("purchase_id", "error_id")
  }

  val q35Sql: String =
    """SELECT p.event_id AS purchase_id, e.event_id AS error_id, p.user_id
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |JOIN (SELECT * FROM events WHERE event_type = 'error') e
      |  ON p.user_id = e.user_id
      | AND p.ts >= e.ts AND p.ts <= e.ts + INTERVAL 10 MINUTE
      |ORDER BY purchase_id, error_id""".stripMargin

  /** Replay-safe event dedup, batch twin of
    * `EventStreams.dedupEvents` (the streaming path is
    * `dropDuplicatesWithinWatermark`; stream == batch proven in
    * StreamingSpec). Planted replays: every event_id < 500 delivered
    * twice, byte-identical — so whichever copy the dedup keeps, the
    * downstream aggregate is the same on both engines. That byte-
    * identity rests on event_id being unique in the BASE events table —
    * asserted in StreamingSpec ("base events table has unique
    * event_ids"), and the oracle's row_number additionally orders by
    * (ts, user_id, event_type, value) so the oracle itself stays
    * deterministic even on a dataset that violates the assumption.
    */
  def q44StreamDedup(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val replayed = ev.unionAll(ev.filter(col("event_id") < 500))
    graft.streaming.EventStreams.dedupEvents(replayed, Seq("event_id"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        exactSum(col("value")).as("total_value"))
      .orderBy("event_type")
  }

  val q44Sql: String =
    s"""WITH replayed AS (
       |  SELECT * FROM events
       |  UNION ALL
       |  SELECT * FROM events WHERE event_id < 500),
       |deduped AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY event_id
       |      ORDER BY ts, user_id, event_type, value) AS rn FROM replayed)
       |  WHERE rn = 1)
       |SELECT event_type, count(*) AS n_events,
       |  ${exactSumSql("value")} AS total_value
       |FROM deduped
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  /** The static dimension q58 enriches with — shared by the Spark
    * side, the SQL oracle (as a VALUES list) and the streaming parity
    * spec so all three agree by construction.
    */
  val eventCategories: Seq[(String, String)] = Seq(
    "click" -> "engagement", "view" -> "engagement",
    "signup" -> "acquisition", "purchase" -> "revenue",
    "error" -> "reliability")

  /** Stream-static enrichment join — the batch twin of
    * [[graft.streaming.EventStreams.enrichedWindowedCounts]]: events
    * joined to a broadcast static dimension (event_type → category),
    * aggregated per category in 1-hour event-time windows. The
    * streaming run of the SAME function is parity-checked in
    * StreamingSpec; here DuckDB checks the semantics.
    */
  def q58StreamStatic(s: SparkSession, dir: String): DataFrame = {
    val dim = s.createDataFrame(eventCategories).toDF("event_type", "category")
    graft.streaming.EventStreams.enrichedWindowedCounts(Tables.events(s, dir), dim)
      .select(
        date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("category"), col("n_events"), col("total_value"))
      .orderBy("window_start", "category")
  }

  val q58Sql: String = {
    val dimValues = eventCategories
      .map { case (t, c) => s"('$t', '$c')" }.mkString(", ")
    s"""WITH dim(event_type, category) AS (VALUES $dimValues)
       |SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       |  category, count(*) AS n_events,
       |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
       |FROM events JOIN dim USING (event_type)
       |GROUP BY 1, 2
       |ORDER BY window_start, category""".stripMargin
  }

  /** OHLC + time-weighted-average downsampling
    * ([[graft.operators.Downsample.ohlcTwa]]): the events stream
    * condensed to hourly bars per event_type. The TWA weighs each
    * reading by how long it held (a once-an-hour sensor must not be
    * out-voted by a once-a-second one); it is fixed-point integer end
    * to end (micro-units × µs durations in DECIMAL(38,0), one floor
    * division), and open/close are (ts, id)-ordered struct extremes —
    * no first() nondeterminism. The oracle replays hold durations via
    * lead, the integer accumulation, and both bar edges.
    */
  def q132OhlcTwa(s: SparkSession, dir: String): DataFrame =
    graft.operators.Downsample.ohlcTwa(
      Tables.events(s, dir), "event_type", "ts", "event_id", "value",
      windowUs = 3600000000L)

  val q132Sql: String =
    """WITH b AS (
      |  SELECT event_type AS k, epoch_us(ts) AS us, event_id AS id, value AS v,
      |    epoch_us(ts) - epoch_us(ts) % 3600000000 AS w
      |  FROM events),
      |d AS (
      |  SELECT *, coalesce(lead(us) OVER (PARTITION BY k, w ORDER BY us, id),
      |    w + 3600000000) - us AS dur
      |  FROM b),
      |d2 AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY k, w ORDER BY us, id) AS rn,
      |    row_number() OVER (PARTITION BY k, w ORDER BY us DESC, id DESC)
      |      AS rrn
      |  FROM d)
      |SELECT k AS event_type, w AS window_us,
      |  CAST(count(*) AS BIGINT) AS n,
      |  max(CASE WHEN rn = 1 THEN v END) AS open,
      |  max(v) AS high, min(v) AS low,
      |  max(CASE WHEN rrn = 1 THEN v END) AS close,
      |  CAST(sum(CAST(CAST(CAST(v AS DECIMAL(18,6)) * 1000000 AS BIGINT)
      |               AS HUGEINT) * dur)
      |       // sum(dur) AS BIGINT) AS twa_micros
      |FROM d2 GROUP BY k, w
      |ORDER BY event_type, window_us""".stripMargin

  /** Trailing time-RANGE rolling aggregates: per user, each event's
    * count and exact sum over the preceding hour — the one window
    * frame kind the battery lacked (`rangeBetween` on event time, a
    * value-based frame, vs the row-based frames everywhere else).
    * Peers at the same microsecond are all in-frame on both engines,
    * so ties cost nothing; the sum follows the Det decimal discipline
    * (small-magnitude decimals convert to double identically
    * everywhere — it is the huge-decimal conversions that don't).
    */
  def q136RollingWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"))
      .rangeBetween(-3600000000L, 0)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("value"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h",
        sum(col("value").cast(DecimalType(18, 6))).over(w)
          .cast(DoubleType))
      .select(col("event_id"), col("user_id"), col("us"), col("n_1h"),
        col("sum_1h"))
      .orderBy("event_id")
  }

  val q136Sql: String =
    """SELECT event_id, user_id, epoch_us(ts) AS us,
      |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Last-touch attribution: every purchase attributed to the user's
    * most recent click within 30 minutes, else unattributed — the
    * tolerance leg of the as-of machinery on the oracle gate (q33/q96
    * exercise unbounded as-of; attribution is where the tolerance
    * window actually matters: a click from yesterday must NOT claim
    * today's purchase, and there is no fallback to an older click).
    * The oracle expresses the same semantics as DuckDB's native ASOF
    * LEFT JOIN with a post-filter nulling out over-age matches.
    */
  def q137Attribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"),
        col("event_id").as("click_id"))
    graft.operators.AsOfJoin.asOfJoin(purchases, clicks, Seq("user_id"),
        "ts", "cts", Seq("click_id"), tolerance = Some(1800L))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("click_id"),
        (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("age_us"))
      .orderBy("event_id")
  }

  val q137Sql: String =
    """WITH c AS (
      |  SELECT user_id, epoch_us(ts) AS cus, event_id AS click_id
      |  FROM events WHERE event_type = 'click'),
      |p AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS us
      |  FROM events WHERE event_type = 'purchase'),
      |j AS (
      |  SELECT p.event_id, p.user_id, p.us, c.click_id, c.cus
      |  FROM p ASOF LEFT JOIN c
      |    ON p.user_id = c.user_id AND p.us >= c.cus)
      |SELECT event_id, user_id, us,
      |  CASE WHEN cus IS NOT NULL AND us - cus <= 1800000000
      |       THEN click_id END AS click_id,
      |  CASE WHEN cus IS NOT NULL AND us - cus <= 1800000000
      |       THEN us - cus END AS age_us
      |FROM j ORDER BY event_id""".stripMargin

  /** First-order Markov transition matrix over per-user event
    * sequences: which event type follows which, with fixed-point
    * row-normalized probabilities — the sequence-mining summary
    * behind next-action modeling and anomalous-flow detection. One
    * keyed window for the lag (shuffle on user), then the counts are
    * (|types|²)-bounded and everything downstream is tiny. The
    * probability is integer (10⁶·n div row-total) so both engines
    * agree bit-for-bit.
    */
  def q139Transitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val counts = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .where(col("prev").isNotNull)
      .groupBy(col("prev").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_type"))
      .agg(sum(col("n")).as("tot"))
    counts.join(totals, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("CAST((1000000 * n) div tot AS BIGINT)").as("p_micros"))
      .orderBy("from_type", "to_type")
  }

  val q139Sql: String =
    """WITH seq AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS prev
      |  FROM events),
      |c AS (
      |  SELECT prev AS from_type, event_type AS to_type,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM seq WHERE prev IS NOT NULL
      |  GROUP BY prev, event_type),
      |t AS (SELECT from_type, sum(n) AS tot FROM c GROUP BY from_type)
      |SELECT c.from_type, c.to_type, c.n,
      |  CAST((1000000 * c.n) // t.tot AS BIGINT) AS p_micros
      |FROM c JOIN t USING (from_type)
      |ORDER BY from_type, to_type""".stripMargin

  /** Session path mining: the 20 most common 3-step event-type
    * sequences WITHIN a session (30-min gap sessionization, the q27
    * rule) — the flow-mining summary behind funnel design ("what do
    * users actually do in a sitting"). Per-session sequences come
    * from sort_array over collected (us, id, type) structs —
    * collect_list alone has NO ordering guarantee, the sort makes it
    * deterministic — and are bounded by session length; paths explode
    * to a (types³)-bounded count and a TakeOrderedAndProject top-20.
    */
  def q144SessionPaths(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = 1800L * 1000000L
    val seqs = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .withColumn("prev", lag(col("us"), 1).over(byUser))
      .withColumn("ns",
        when(col("prev").isNull || col("us") - col("prev") > gapUs, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("ns")).over(run))
      .groupBy(col("user_id"), col("sid"))
      .agg(sort_array(collect_list(struct(col("us"), col("event_id"),
        col("event_type").as("t")))).as("sq"))
    val paths = seqs.select(explode(
      when(size(col("sq")) >= 3,
        transform(sequence(lit(1), size(col("sq")) - 2), i =>
          concat_ws(">",
            element_at(col("sq"), i).getField("t"),
            element_at(col("sq"), i + 1).getField("t"),
            element_at(col("sq"), i + 2).getField("t"))))
        .otherwise(array().cast("array<string>"))).as("path"))
    paths.groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(20)
  }

  val q144Sql: String =
    """WITH s0 AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
      |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS prev
      |  FROM events),
      |s1 AS (
      |  SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000
      |                 THEN 1 ELSE 0 END AS ns
      |  FROM s0),
      |s2 AS (
      |  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
      |    ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM s1),
      |seqs AS (
      |  SELECT user_id, sid, list(event_type ORDER BY us, event_id) AS sq
      |  FROM s2 GROUP BY user_id, sid),
      |paths AS (
      |  SELECT unnest(list_transform(range(1, len(sq) - 1),
      |    i -> sq[i] || '>' || sq[i+1] || '>' || sq[i+2])) AS path
      |  FROM seqs WHERE len(sq) >= 3)
      |SELECT path, CAST(count(*) AS BIGINT) AS n
      |FROM paths GROUP BY path
      |ORDER BY n DESC, path LIMIT 20""".stripMargin

  /** Per-group trend slopes: closed-form least squares of value
    * against time for each event_type, entirely in integer fixed
    * point — time becomes seconds-since-window-start (BIGINT), values
    * become micro-units, and the OLS slope
    * (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) evaluates as one DECIMAL(38,0)
    * integer division scaled to micro-units-per-DAY. One hash
    * aggregate per group carrying five sufficient statistics — the
    * trend of a 100 TB metric stream costs the same scan as its mean,
    * and both engines agree bit-for-bit because nothing is ever a
    * float accumulation.
    */
  def q146TrendSlopes(s: SparkSession, dir: String): DataFrame = {
    // x = whole seconds since 2024-01-01 UTC (integer div, not the
    // fractional `/` that would silently promote to double)
    Tables.events(s, dir)
      .select(col("event_type"),
        expr("(unix_micros(ts) - 1704067200000000) div 1000000").as("x"),
        (col("value").cast(DecimalType(18, 6)) * 1000000)
          .cast(LongType).as("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("sxx"),
        sum(col("x").cast(DecimalType(38, 0)) * col("y")).as("sxy"))
      .select(col("event_type"), col("n"),
        expr("CAST((86400 * (n * sxy - CAST(sx AS DECIMAL(38,0)) * sy))" +
          " div (n * sxx - CAST(sx AS DECIMAL(38,0)) * sx) AS BIGINT)")
          .as("slope_micros_per_day"))
      .orderBy(col("event_type"))
  }

  val q146Sql: String =
    """WITH b AS (
      |  SELECT event_type,
      |    (epoch_us(ts) - 1704067200000000) // 1000000 AS x,
      |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS y
      |  FROM events),
      |g AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
      |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      |  FROM b GROUP BY event_type)
      |SELECT event_type, n,
      |  CAST((86400 * (n * sxy - sx * sy)) // (n * sxx - sx * sx)
      |       AS BIGINT) AS slope_micros_per_day
      |FROM g ORDER BY event_type""".stripMargin

  /** Exact cumulative distinct users by day — the growth curve,
    * WITHOUT a running-distinct window (which would re-deduplicate
    * the entire prefix per day): each user reduces to their FIRST-SEEN
    * day (one keyed aggregate), days reduce to new-user counts (a
    * days-bounded frame), and the cumulative is a running sum over
    * that tiny frame. Per-day actives ride along from an ordinary
    * (day, user)-distinct count. The 100 TB shape: two corpus
    * aggregates, all windows over |days| rows.
    */
  def q147UserGrowth(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
    val firstSeen = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
    val daily = ev.distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("active_users"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(firstSeen, Seq("day"), "left")
      .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
      .withColumn("cum_users", sum(col("new_users")).over(w))
      .select(col("day"), col("active_users"), col("new_users"),
        col("cum_users"))
      .orderBy(col("day"))
  }

  val q147Sql: String =
    """WITH ev AS (
      |  SELECT strftime(ts, '%Y-%m-%d') AS day, user_id FROM events),
      |fs AS (
      |  SELECT day, CAST(count(*) AS BIGINT) AS new_users FROM (
      |    SELECT user_id, min(day) AS day FROM ev GROUP BY user_id)
      |  GROUP BY day),
      |daily AS (
      |  SELECT day, CAST(count(*) AS BIGINT) AS active_users
      |  FROM (SELECT DISTINCT day, user_id FROM ev) GROUP BY day)
      |SELECT d.day, d.active_users,
      |  CAST(coalesce(f.new_users, 0) AS BIGINT) AS new_users,
      |  CAST(sum(coalesce(f.new_users, 0)) OVER (ORDER BY d.day
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
      |FROM daily d LEFT JOIN fs f USING (day)
      |ORDER BY d.day""".stripMargin

  /** Zero-clamped ledger summary per user
    * ([[graft.operators.Funnel.clampedRunningBalance]]): deltas are
    * value-minus-50 in micro-units (negative drift with spikes, so
    * the clamp actually engages); per user the event count, final and
    * peak balances, and stockout count (events leaving the balance at
    * zero). The non-associative fold runs as two declarative window
    * frames via the reflection identity — FunnelSpec proves that
    * identity against a direct sequential fold; the oracle replays
    * the windows and pins the cross-engine arithmetic.
    */
  def q148ClampedLedger(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(s, dir).select(
      col("user_id"), col("ts"), col("event_id"),
      ((col("value").cast(DecimalType(18, 6)) * 1000000).cast(LongType)
        - 50000000L).as("delta"))
    graft.operators.Funnel
      .clampedRunningBalance(d, "user_id", "ts", "event_id", "delta")
      .withColumn("us", unix_micros(col("ts")))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        max(struct(col("us"), col("event_id"), col("balance").as("b")))
          .getField("b").as("final_micros"),
        max(col("balance")).as("peak_micros"),
        sum(when(col("balance") === 0, 1L).otherwise(0L)).as("n_stockouts"))
      .orderBy(col("user_id"))
  }

  val q148Sql: String =
    """WITH d AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id,
      |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)
      |      - 50000000 AS delta
      |  FROM events),
      |p AS (
      |  SELECT *, sum(delta) OVER (PARTITION BY user_id
      |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS pfx
      |  FROM d),
      |b AS (
      |  SELECT *, pfx - least(0, min(pfx) OVER (PARTITION BY user_id
      |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING)) AS balance,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY us DESC, event_id DESC) AS rrn
      |  FROM p)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(max(CASE WHEN rrn = 1 THEN balance END) AS BIGINT)
      |    AS final_micros,
      |  CAST(max(balance) AS BIGINT) AS peak_micros,
      |  CAST(sum(CASE WHEN balance = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_stockouts
      |FROM b GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Per-user CUSUM change-point screen
    * ([[graft.operators.ChangePoint.cusumStats]]): the n-scaled
    * integer CUSUM curve over each user's value stream — its range
    * scores level-shift likelihood, the argmax of |C| timestamps the
    * shift. The oracle replays the identical window algebra; the
    * argmax tie-break (largest |C|, then lowest event id) is pinned
    * via a row_number formulation on the DuckDB side — a different
    * argmax mechanism than Spark's max_by-over-struct, landing on the
    * same row.
    */
  def q153CusumChangepoint(s: SparkSession, dir: String): DataFrame =
    graft.operators.ChangePoint.cusumStats(
      Tables.events(s, dir).select(col("user_id"), col("ts"),
        col("event_id"),
        (col("value").cast(DecimalType(18, 6)) * 1000000)
          .cast(LongType).as("micros")),
      "user_id", "ts", "event_id", "micros")
      .orderBy(col("user_id"))

  val q153Sql: String =
    """WITH d AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS x
      |  FROM events),
      |c AS (
      |  SELECT user_id, ts, event_id,
      |    count(*) OVER (PARTITION BY user_id)
      |      * sum(x) OVER (PARTITION BY user_id
      |          ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
      |    - row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      * sum(x) OVER (PARTITION BY user_id) AS cc
      |  FROM d),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY abs(cc) DESC, event_id ASC) AS rn
      |  FROM c)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n,
      |  CAST(max(cc) - min(cc) AS BIGINT) AS range_n_micros,
      |  max(CASE WHEN rn = 1
      |      THEN strftime(ts, '%Y-%m-%d %H:%M:%S') END) AS change_ts
      |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin

  /** U-shaped multi-touch attribution
    * ([[graft.operators.Funnel.multiTouchAttribution]]): every click
    * in the 7 days before a purchase shares the credit 40/20/40
    * (first/middles/last) in exact integer micro-shares that sum to
    * 10⁶ per purchase by construction (integer split, remainder to
    * the earliest middle). Rolled up by click hour-of-day — the
    * "when do converting touches happen" report. The oracle replays
    * the join, both windows, and the credit arithmetic.
    */
  def q156MultitouchAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"),
        col("event_id").as("purchase_id"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"),
        col("event_id").as("click_id"))
    graft.operators.Funnel.multiTouchAttribution(
        purchases, clicks, "user_id", "pts", "purchase_id",
        "cts", "click_id", lookbackUs = 7L * 86400 * 1000000)
      .groupBy(hour(col("cts")).cast(IntegerType).as("click_hour"))
      .agg(count(lit(1)).as("n_touches"),
        longSum(col("credit_micro")).as("credit_micros"),
        countDistinct(col("purchase_id")).as("n_purchases"))
      .orderBy(col("click_hour"))
  }

  val q156Sql: String =
    """WITH p AS (
      |  SELECT user_id, epoch_us(ts) AS pus, event_id AS purchase_id
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT user_id, ts AS cts, epoch_us(ts) AS cus,
      |    event_id AS click_id
      |  FROM events WHERE event_type = 'click'),
      |j AS (
      |  SELECT p.purchase_id, c.cts, c.click_id
      |  FROM p JOIN c ON p.user_id = c.user_id
      |    AND c.cus <= p.pus AND p.pus - c.cus <= 604800000000),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY purchase_id
      |      ORDER BY cts, click_id) AS rk,
      |    count(*) OVER (PARTITION BY purchase_id) AS m
      |  FROM j),
      |cr AS (
      |  SELECT *, CASE
      |    WHEN m = 1 THEN 1000000
      |    WHEN m = 2 THEN 500000
      |    WHEN rk = 1 OR rk = m THEN 400000
      |    ELSE 200000 // (m - 2)
      |      + CASE WHEN rk = 2 THEN 200000 % (m - 2) ELSE 0 END
      |    END AS credit_micro
      |  FROM r)
      |SELECT CAST(hour(cts) AS INTEGER) AS click_hour,
      |  CAST(count(*) AS BIGINT) AS n_touches,
      |  CAST(sum(credit_micro) AS BIGINT) AS credit_micros,
      |  CAST(count(DISTINCT purchase_id) AS BIGINT) AS n_purchases
      |FROM cr GROUP BY 1 ORDER BY click_hour""".stripMargin

  /** Linear sensor gap fill
    * ([[graft.operators.Downsample.gapFillLinear]]): 'error' events
    * stand in for dropped readings; each gets the straight-line
    * interpolation between its nearest real readings in the user's
    * stream (weighted-average integer form — floor/truncate agree
    * because every term is non-negative), edges take the single
    * neighbor. Per-user fill counts and exact milli-sums cross the
    * oracle; DuckDB recomputes via IGNORE NULLS window frames — a
    * different null-skipping mechanism than Spark's ignoreNulls flag.
    */
  def q159GapFill(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(s, dir).select(
      col("user_id"), col("ts"), col("event_id"),
      (col("event_type") === "error").as("missing"),
      (col("value").cast(DecimalType(18, 6)) * 1000)
        .cast(LongType).as("milli"))
    graft.operators.Downsample
      .gapFillLinear(d, "user_id", "ts", "event_id", "milli", "missing")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_missing"),
        sum(when(col("filled_milli").isNotNull, 1L).otherwise(0L))
          .as("n_filled"),
        longSum(coalesce(col("filled_milli"), lit(0L))).as("filled_sum"))
      .orderBy(col("user_id"))
  }

  val q159Sql: String =
    """WITH d AS (
      |  SELECT user_id, ts, event_id,
      |    event_type = 'error' AS missing,
      |    CAST(CAST(value AS DECIMAL(18,6)) * 1000 AS BIGINT) AS milli,
      |    epoch_us(ts) // 1000000 AS t
      |  FROM events),
      |w AS (
      |  SELECT *,
      |    last_value(CASE WHEN NOT missing THEN milli END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS vp,
      |    last_value(CASE WHEN NOT missing THEN t END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS tp,
      |    first_value(CASE WHEN NOT missing THEN milli END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS vn,
      |    first_value(CASE WHEN NOT missing THEN t END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS tn
      |  FROM d),
      |f AS (
      |  SELECT user_id,
      |    CASE
      |      WHEN vp IS NOT NULL AND vn IS NOT NULL THEN
      |        CASE WHEN tn = tp THEN vp
      |             ELSE (vp * (tn - t) + vn * (t - tp)) // (tn - tp) END
      |      ELSE coalesce(vp, vn) END AS filled_milli
      |  FROM w WHERE missing)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_missing,
      |  CAST(sum(CASE WHEN filled_milli IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_filled,
      |  CAST(sum(coalesce(filled_milli, 0)) AS BIGINT) AS filled_sum
      |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Deterministic A/B experiment readout: users hash into
    * control/treatment through the shared md5-bucket split
    * ([[graft.operators.Sampling.md5Split]] — append-stable, so a
    * user's arm never changes as data grows), conversion = any
    * purchase, and the 2×2 chi-squared decomposition rides the fixed
    * IEEE expression tree (the q106 drift discipline) so both engines
    * agree bit-for-bit. Per-arm work is two hash aggregates + one
    * broadcast of the 1-row totals; the user's event history never
    * leaves its partition unaggregated.
    */
  def q160AbExperiment(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val users = ev.select(col("user_id")).distinct()
    val armed = graft.operators.Sampling.md5Split(users, "user_id",
      Seq("control" -> 0.5, "treatment" -> 0.5))
    val conv = ev.where(col("event_type") === "purchase" &&
        col("value") > 450.0)
      .select(col("user_id")).distinct().withColumn("_c", lit(1L))
    val metrics = armed.join(conv, Seq("user_id"), "left")
      .groupBy(col("split").as("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(coalesce(col("_c"), lit(0L))).as("n_converted"))
    val totals = metrics.agg(longSum(col("n_users")).as("tu"),
      longSum(col("n_converted")).as("tc"))
    val e = col("tc").cast(DoubleType) * col("n_users").cast(DoubleType) /
      col("tu").cast(DoubleType)
    val d = col("n_converted").cast(DoubleType) - e
    val en = col("n_users").cast(DoubleType) - e
    val d2 = (col("n_users") - col("n_converted")).cast(DoubleType) - en
    metrics.crossJoin(broadcast(totals))
      .select(col("arm"), col("n_users"), col("n_converted"),
        expr("n_converted * 1000000 div n_users").as("conv_micro"),
        when(e === 0.0 || en === 0.0, lit(0.0))
          .otherwise(d * d / e + d2 * d2 / en).as("chi2_term"))
      .orderBy(col("arm"))
  }

  val q160Sql: String =
    """WITH users AS (SELECT DISTINCT user_id FROM events),
      |armed AS (
      |  SELECT user_id,
      |    CASE WHEN ('0x'||substr(md5(user_id::VARCHAR), 1, 15))::BIGINT
      |              % 1000000 < 500000
      |         THEN 'control' ELSE 'treatment' END AS arm
      |  FROM users),
      |conv AS (SELECT DISTINCT user_id FROM events
      |         WHERE event_type = 'purchase' AND value > 450.0),
      |m AS (
      |  SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
      |    CAST(sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_converted
      |  FROM armed a LEFT JOIN conv c USING (user_id)
      |  GROUP BY arm),
      |t AS (SELECT CAST(sum(n_users) AS BIGINT) AS tu,
      |             CAST(sum(n_converted) AS BIGINT) AS tc FROM m)
      |SELECT arm, n_users, n_converted,
      |  n_converted * 1000000 // n_users AS conv_micro,
      |  CASE WHEN CAST(tc AS DOUBLE) * CAST(n_users AS DOUBLE) / CAST(tu AS DOUBLE) = 0
      |         OR CAST(n_users AS DOUBLE)
      |            - CAST(tc AS DOUBLE) * CAST(n_users AS DOUBLE) / CAST(tu AS DOUBLE) = 0
      |       THEN 0.0 ELSE
      |  (CAST(n_converted AS DOUBLE)
      |     - CAST(tc AS DOUBLE) * CAST(n_users AS DOUBLE) / CAST(tu AS DOUBLE))
      |  * (CAST(n_converted AS DOUBLE)
      |     - CAST(tc AS DOUBLE) * CAST(n_users AS DOUBLE) / CAST(tu AS DOUBLE))
      |  / (CAST(tc AS DOUBLE) * CAST(n_users AS DOUBLE) / CAST(tu AS DOUBLE))
      |  + (CAST(n_users - n_converted AS DOUBLE)
      |     - (CAST(n_users AS DOUBLE)
      |        - CAST(tc AS DOUBLE) * CAST(n_users AS DOUBLE) / CAST(tu AS DOUBLE)))
      |  * (CAST(n_users - n_converted AS DOUBLE)
      |     - (CAST(n_users AS DOUBLE)
      |        - CAST(tc AS DOUBLE) * CAST(n_users AS DOUBLE) / CAST(tu AS DOUBLE)))
      |  / (CAST(n_users AS DOUBLE)
      |     - CAST(tc AS DOUBLE) * CAST(n_users AS DOUBLE) / CAST(tu AS DOUBLE))
      |  END AS chi2_term
      |FROM m CROSS JOIN t
      |ORDER BY arm""".stripMargin

  /** Hourly burst detection: an (event type, hour) cell bursts when
    * its count exceeds 2× the trailing-24h average, with a full
    * history requirement — the integer cross-multiplied form
    * `n·12 > trailing_sum` so no rate float exists. One keyed window
    * (partition = event type, range frame on the hour index): burst
    * screening over millions of independent series is embarrassingly
    * parallel.
    */
  def q163BurstDetection(s: SparkSession, dir: String): DataFrame = {
    val hr = Tables.events(s, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("hidx"))
      .groupBy(col("event_type"), col("hidx"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hidx"))
      .rangeBetween(-24, -1)
    hr.withColumn("trail_sum", sum(col("n")).over(w))
      .withColumn("_nh", count(lit(1)).over(w))
      .where(col("_nh") === 24 && col("n") * 12 > col("trail_sum"))
      .select(col("event_type"), col("hidx"), col("n"), col("trail_sum"))
      .orderBy(col("event_type"), col("hidx"))
  }

  val q163Sql: String =
    """WITH hr AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hidx,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT *,
      |    CAST(sum(n) OVER (PARTITION BY event_type ORDER BY hidx
      |      RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING) AS BIGINT)
      |      AS trail_sum,
      |    count(*) OVER (PARTITION BY event_type ORDER BY hidx
      |      RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING) AS nh
      |  FROM hr)
      |SELECT event_type, hidx, n, trail_sum
      |FROM w WHERE nh = 24 AND n * 12 > trail_sum
      |ORDER BY event_type, hidx""".stripMargin

  /** Peak session concurrency per day
    * ([[graft.operators.Intervals.maxConcurrency]]): sessions from
    * the 30-minute-gap sessionization become [first, last] µs spans,
    * attributed to their start day; the boundary sweep (+1/−1,
    * running max) runs inside each day's partition — never a global
    * window. Tie rule (starts before ends at the same instant, then
    * span id) is pinned and replayed; the oracle rebuilds the
    * sessions AND the sweep in SQL.
    */
  def q162SessionConcurrency(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapUs = 1800L * 1000000L
    val sessions = Tables.events(s, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(unix_micros(col("ts"))).as("s_us"),
        max(unix_micros(col("ts"))).as("e_us"))
      .select(
        expr("s_us div 86400000000").as("day_idx"),
        col("s_us"), col("e_us"),
        (col("user_id") * 1000000L + col("session_id")).as("span_id"))
    graft.operators.Intervals
      .maxConcurrency(sessions, "day_idx", "s_us", "e_us", "span_id")
      .orderBy(col("day_idx"))
  }

  val q162Sql: String =
    """WITH sess AS (
      |  SELECT user_id, session_id,
      |    min(epoch_us(ts)) AS s_us, max(epoch_us(ts)) AS e_us
      |  FROM (
      |    SELECT user_id, ts,
      |      CAST(sum(new_session) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |        AS session_id
      |    FROM (
      |      SELECT user_id, ts, event_id,
      |        CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
      |             THEN 1 ELSE 0 END AS new_session
      |      FROM (
      |        SELECT user_id, ts, event_id,
      |          lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |            ORDER BY ts, event_id) AS prev_us
      |        FROM events)))
      |  GROUP BY user_id, session_id),
      |spans AS (
      |  SELECT s_us // 86400000000 AS day_idx, s_us, e_us,
      |    user_id * 1000000 + session_id AS span_id
      |  FROM sess),
      |bounds AS (
      |  SELECT day_idx, s_us AS t, 1 AS d, span_id FROM spans
      |  UNION ALL
      |  SELECT day_idx, e_us AS t, -1 AS d, span_id FROM spans),
      |swept AS (
      |  SELECT *, CAST(sum(d) OVER (PARTITION BY day_idx
      |    ORDER BY t, d DESC, span_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS open
      |  FROM bounds)
      |SELECT day_idx, CAST(count(*) / 2 AS BIGINT) AS n_spans,
      |  max(open) AS max_concurrent,
      |  min((-open, t, span_id))[2] AS peak_at_us
      |FROM swept GROUP BY day_idx ORDER BY day_idx""".stripMargin

  /** Native event-time session windows: Spark's `session_window(ts,
    * gap)` grouped aggregate (the streaming sessionizer's batch form —
    * a dedicated Catalyst operator, not the lag/flag/cumsum window
    * chain q27 builds by hand). Session end = last event + gap; a new
    * session starts only when the inter-event gap EXCEEDS 30 minutes —
    * Spark merges sessions that touch (next.start = prev.end), which
    * CanonicalizeSpec pins with an exactly-at-the-boundary fixture
    * (the sf fixtures carry no exact-gap pair, so only the spec
    * guards this edge). The oracle rebuilds sessions with the
    * independent gap-flag formulation and the same strict boundary.
    * Scale: one exchange keyed on user_id; session merging is
    * per-key, never global.
    */
  def q181SessionWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss")
          .as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")

  val q181Sql: String =
    """WITH o AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |      THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM o)
      |SELECT user_id,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |  strftime(max(ts) + INTERVAL 30 MINUTES, '%Y-%m-%d %H:%M:%S') AS session_end,
      |  count(*) AS n_events
      |FROM s
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** Sliding-quota rate limiting, batch twin
    * ([[graft.streaming.EventStreams.rateLimit]] — the
    * `transformWithState` processor whose ListState holds each user's
    * window-pruned arrivals): an event is allowed iff fewer than 4
    * same-user arrivals precede it within 24 h. Here the SAME verdict
    * comes from a keyed RANGE window over arrival micros — the
    * declarative twin the stream must match (StreamingSpec asserts
    * it); per-user admission totals go through the oracle.
    */
  def q205RateLimitTwin(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-86400L * 1000000L, -1L)
    Tables.events(s, dir)
      .withColumn("n_recent", count(lit(1)).over(w).cast(LongType))
      .withColumn("allowed",
        when(col("n_recent") < 4, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("allowed")).cast(LongType).as("n_allowed"),
        max(col("n_recent")).as("max_recent"))
      .orderBy("user_id")
  }

  val q205Sql: String =
    """WITH r AS (
      |  SELECT user_id,
      |    count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
      |      RANGE BETWEEN 86400000000 PRECEDING AND 1 PRECEDING) AS n_recent
      |  FROM events)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CASE WHEN n_recent < 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_allowed,
      |  CAST(max(n_recent) AS BIGINT) AS max_recent
      |FROM r
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q205_rate_limit_twin" -> q205RateLimitTwin _,
    "q181_session_window" -> q181SessionWindow _,
    "q162_session_concurrency" -> q162SessionConcurrency _,
    "q160_ab_experiment"  -> q160AbExperiment _,
    "q163_burst_detection" -> q163BurstDetection _,
    "q153_cusum_changepoint" -> q153CusumChangepoint _,
    "q156_multitouch_attribution" -> q156MultitouchAttribution _,
    "q159_gap_fill"       -> q159GapFill _,
    "q148_clamped_ledger" -> q148ClampedLedger _,
    "q146_trend_slopes"   -> q146TrendSlopes _,
    "q147_user_growth"    -> q147UserGrowth _,
    "q144_session_paths"  -> q144SessionPaths _,
    "q139_transitions"    -> q139Transitions _,
    "q137_attribution"    -> q137Attribution _,
    "q136_rolling_window" -> q136RollingWindow _,
    "q132_ohlc_twa"       -> q132OhlcTwa _,
    "q58_stream_static"   -> q58StreamStatic _,
    "q26_tumbling_window" -> q26TumblingWindow _,
    "q27_sessionize"      -> q27Sessionize _,
    "q33_asof_join"       -> q33AsOfJoin _,
    "q35_range_join"      -> q35RangeJoin _,
    "q44_stream_dedup"    -> q44StreamDedup _)

  val oracle: Map[String, String] = Map(
    "q205_rate_limit_twin" -> q205Sql,
    "q181_session_window" -> q181Sql,
    "q162_session_concurrency" -> q162Sql,
    "q160_ab_experiment"  -> q160Sql,
    "q163_burst_detection" -> q163Sql,
    "q153_cusum_changepoint" -> q153Sql,
    "q156_multitouch_attribution" -> q156Sql,
    "q159_gap_fill"       -> q159Sql,
    "q148_clamped_ledger" -> q148Sql,
    "q146_trend_slopes"   -> q146Sql,
    "q147_user_growth"    -> q147Sql,
    "q144_session_paths"  -> q144Sql,
    "q139_transitions"    -> q139Sql,
    "q137_attribution"    -> q137Sql,
    "q136_rolling_window" -> q136Sql,
    "q132_ohlc_twa"       -> q132Sql,
    "q58_stream_static"   -> q58Sql,
    "q26_tumbling_window" -> q26Sql,
    "q27_sessionize"      -> q27Sql,
    "q33_asof_join"       -> q33Sql,
    "q35_range_join"      -> q35Sql,
    "q44_stream_dedup"    -> q44Sql)
}
