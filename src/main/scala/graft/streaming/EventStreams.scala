package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.9).
  *
  * The reference has no streaming — its "incremental" story is a daily
  * cron batch with full-partition replace
  * (`/root/reference/.github/workflows/new_etl_pipeline.yml:5-13`,
  * `monarch_etl/db_loader.py:50-59`). This module supplies the
  * Spark-native upgrade path: the SAME transformation functions run on a
  * batch DataFrame or a `readStream` DataFrame; watermarks bound state.
  *
  * Scale: windowed aggregation state is (windows × event_types) per
  * trigger — bounded by the watermark horizon; sessionization state is
  * one small record per active user key, dropped on event-time timeout.
  */
object EventStreams {

  /** The events table schema as a streaming source schema. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Watermarked tumbling-window aggregation — works identically on a
    * batch or streaming DataFrame (pass the same function to both; the
    * streaming run additionally drops state behind the watermark).
    */
  def windowedCounts(
      events: DataFrame,
      windowDur: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Sliding-window variant. */
  def slidingCounts(
      events: DataFrame,
      windowDur: String = "1 hour",
      slide: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"))

  /** Incremental file ingest: the reference's scheduled-batch cron
    * (`new_etl_pipeline.yml`) upgraded to a file-source stream with
    * `Trigger.AvailableNow` — process everything that has landed, then
    * stop; checkpointing makes re-runs exactly-incremental (each file
    * processed once), replacing the reference's "re-run the day and
    * overwrite" idempotency with true incremental progress tracking.
    * Transform is injected so the SAME batch pipeline (e.g.
    * `MonarchPipeline.transform`) runs per micro-batch via foreachBatch.
    */
  def ingestAvailableNow(
      spark: SparkSession,
      inputDir: String,
      schema: StructType,
      checkpointDir: String,
      perBatch: (DataFrame, Long) => Unit): Unit = {
    val q = spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch(perBatch)
      .start()
    q.awaitTermination()
  }

  /** Exactly-once event dedup — the streaming guard against source
    * replays/at-least-once delivery (a re-delivered event must not
    * double-count downstream aggregates).
    *
    * Streaming: `dropDuplicatesWithinWatermark` keeps one row per key
    * with state bounded by the watermark horizon (a key's dedup record
    * is dropped once no duplicate can still arrive) — at 100 TB/day
    * this is the only dedup whose state does not grow without bound.
    * Batch: plain `dropDuplicates` — same semantics over a static
    * frame, so the two paths are twin-checkable.
    */
  def dedupEvents(
      events: DataFrame, keys: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    else events.dropDuplicates(keys)

  /** Watermarked stream-stream interval join: left events matched to
    * the right-side events that preceded them by at most `windowSec`
    * seconds for the same key — the streaming twin of
    * [[graft.operators.RangeJoin.pointInInterval]] (q35's batch
    * semantics). Both sides carry watermarks and the join condition
    * bounds the event-time distance, which is exactly what lets Spark
    * BOUND THE JOIN STATE: a buffered right row is evicted once the
    * left watermark passes its interval end, so state is (right rate ×
    * interval + watermark slack), not the whole history — the property
    * that makes a stream-stream join survive an unbounded stream.
    *
    * Works identically on batch frames (watermarks are no-ops there),
    * so stream == batch is twin-checkable in StreamingSpec.
    */
  /** Output schema: the left frame's columns keep their names (its
    * timestamp included); the right frame's timestamp comes back as
    * `<rightTs>_right` so a same-named pair never collides. Other
    * same-named non-key columns should be renamed by the caller before
    * joining (as with any join).
    */
  def joinWithinInterval(
      left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String = "ts", rightTs: String = "ts",
      windowSec: Long = 600, watermark: String = "2 hours"): DataFrame = {
    val rightTsOut = rightTs + "_right"
    val l = left.withColumnRenamed(leftTs, "_l_ts")
      .withWatermark("_l_ts", watermark)
    val r = right
      .withColumnRenamed(keyCol, "_r_key")
      .withColumnRenamed(rightTs, "_r_ts")
      .withWatermark("_r_ts", watermark)
    l.join(r,
      col(keyCol) === col("_r_key") &&
        col("_l_ts") >= col("_r_ts") &&
        col("_l_ts") <= col("_r_ts") + expr(s"INTERVAL $windowSec SECONDS"))
      .drop("_r_key")
      .withColumnRenamed("_l_ts", leftTs)
      .withColumnRenamed("_r_ts", rightTsOut)
  }

  /** Stream-static enrichment: join the (unbounded) event stream to a
    * small static dimension and aggregate per enriched category in
    * event-time windows. The static side BROADCASTS into every
    * micro-batch — no stream-side shuffle for the join and no join
    * state at all (unlike stream-stream, a static side needs no
    * watermark bookkeeping): the canonical shape for attaching
    * reference data (type → category, id → tenant, host → blocklist)
    * to a 100 TB/day stream.
    *
    * Works identically on a batch events frame, so stream == batch is
    * twin-checkable; `dim` must be (event_type, category).
    */
  def enrichedWindowedCounts(
      events: DataFrame, dim: DataFrame,
      windowDur: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .join(broadcast(dim), Seq("event_type"))
      .groupBy(window(col("ts"), windowDur), col("category"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("category"), col("n_events"), col("total_value"))

  // ------------------------------------------------------------------
  // Stateful processing: per-user running profile + sessionization
  // ------------------------------------------------------------------

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class UserProfile(user_id: Long, n_events: Long, total_value: Double)

  /** `mapGroupsWithState` running per-user profile: emits the updated
    * profile for each user seen in a trigger. State is one tiny record
    * per user.
    */
  def runningUserProfiles(events: Dataset[Event]): Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserProfile, UserProfile](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[UserProfile]) =>
          val prev = state.getOption.getOrElse(UserProfile(userId, 0L, 0.0))
          val (n, v) = rows.foldLeft((prev.n_events, prev.total_value)) {
            case ((cn, cv), e) => (cn + 1, cv + e.value)
          }
          val next = UserProfile(userId, n, v)
          state.update(next)
          next
      }
  }

  final case class FenceAlert(
      user_id: Long, us: Long, from_fence: Int, to_fence: Int)

  /** Per-track walk state: current position and last fence (-1 =
    * outside). Public: Catalyst codegen instantiates it. */
  final case class WalkState(x: Long, y: Long, fence: Int)

  /** Streaming geofence alerts — the `mapGroupsWithState` twin of
    * [[graft.operators.Geo.fenceTransitions]]: each track's walk
    * position and last fence ride in one tiny state record; every
    * incoming fix advances the md5-derived walk, re-evaluates
    * first-hit fence containment, and emits an alert iff the fence
    * changed. State is O(1) per active track (two longs + an int) —
    * the geofence monitor for a fleet of any size; the batch function
    * over the same fixes must produce the identical alert rows, which
    * is what StreamingSpec asserts.
    *
    * The walk arithmetic replays
    * [[graft.operators.Geo.walkPositions]] exactly: 60-bit md5 hash
    * (hex chars 1-15 as a long) of `id+"dx"` / `id+"dy"` mod 21 - 10
    * per step, base at md5(track+"bx"/"by") mod worldDim — the same
    * cross-engine recipe the SQL oracle uses, here evaluated in plain
    * JVM code because the state function is imperative per-group
    * logic (the documented last-resort tier: no Column API exists
    * inside a state update).
    */
  def geofenceAlerts(events: Dataset[Event],
      fences: Array[(Int, Long, Long, Long, Long)],
      worldDim: Int = 4000): Dataset[FenceAlert] = {
    import events.sparkSession.implicits._
    val sortedFences = fences.sortBy(_._1)
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val hex = d.map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def fenceOf(x: Long, y: Long): Int =
      sortedFences.collectFirst { case (fid, x0, y0, x1, y1)
        if x >= x0 && x <= x1 && y >= y0 && y <= y1 => fid }.getOrElse(-1)
    // full-microsecond epoch (Timestamp.getTime truncates to ms; the
    // batch twin orders and reports by unix_micros)
    def us(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos % 1000000) / 1000
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[WalkState, FenceAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[WalkState]) =>
          val sorted = rows.toSeq.sortBy(e => (us(e.ts), e.event_id))
          var st = state.getOption.getOrElse(WalkState(
            h60(s"${userId}bx") % worldDim, h60(s"${userId}by") % worldDim, -1))
          val alerts = List.newBuilder[FenceAlert]
          sorted.foreach { e =>
            val dx = h60(s"${e.event_id}dx") % 21 - 10
            val dy = h60(s"${e.event_id}dy") % 21 - 10
            val x = st.x + dx
            val y = st.y + dy
            val f = fenceOf(x, y)
            if (f != st.fence)
              alerts += FenceAlert(userId, us(e.ts), st.fence, f)
            st = WalkState(x, y, f)
          }
          if (sorted.nonEmpty) state.update(st)
          alerts.result().iterator
      }
  }

  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Int)

  /** Internal session accumulator (public: Catalyst codegen instantiates it). */
  final case class SessionState(startMs: Long, lastMs: Long, n: Int)

  /** Gap-based sessionization with `flatMapGroupsWithState` + event-time
    * timeout: a session closes when no event arrives within `gapSec` of
    * event time (enforced by the watermark). Emits closed sessions.
    */
  def sessionize(events: Dataset[Event], gapSec: Long = 1800): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var closed = List.empty[Session]
          var cur = state.getOption
          if (sorted.isEmpty) {
            // timeout fired: close the open session
            cur.foreach { s =>
              closed ::= Session(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n)
            }
            state.remove()
          } else {
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= gapSec * 1000 =>
                  cur = Some(s.copy(lastMs = math.max(s.lastMs, t), n = s.n + 1))
                case Some(s) =>
                  closed ::= Session(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapSec * 1000)
            }
          }
          closed.reverse.iterator
      }
  }

  // ------------------------------------------------------------------
  // transformWithState (arbitrary stateful processing v2, Spark 4):
  // sliding-quota rate limiting
  // ------------------------------------------------------------------

  final case class RateVerdict(
    user_id: Long, event_id: Long, n_recent: Long, allowed: Int)

  /** Per-key sliding-quota state machine on the `transformWithState`
    * API (the Spark-4 successor to mapGroupsWithState: typed
    * ValueState/ListState/MapState handles, native TTL, timers): each
    * user's recent arrival timestamps ride in a ListState, pruned to
    * the window on every event — state is ≤quota-ish timestamps per
    * active key, never the history. An event is `allowed` iff fewer
    * than `quota` arrivals precede it within `windowSec` — the
    * admission decision of any ingestion throttle / abuse gate.
    *
    * Within-batch rows sort by (event time, event id) before the fold
    * so the verdicts are replay-deterministic; the batch twin (q205)
    * is the RANGE-window formulation over the same arrival counts,
    * and StreamingSpec asserts stream == batch on in-order feeds.
    */
  class RateLimitProcessor(windowSec: Long, quota: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, RateVerdict] {
    @transient private var recent:
      org.apache.spark.sql.streaming.ListState[Long] = _

    override def init(
        outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      recent = getHandle.getListState[Long]("recent",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    private def us(t: Timestamp): Long =
      t.getTime * 1000L + (t.getNanos % 1000000) / 1000

    override def handleInputRows(key: Long, rows: Iterator[Event],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[RateVerdict] = {
      val sorted = rows.toArray.sortBy(e => (us(e.ts), e.event_id))
      var state: Array[Long] =
        if (recent.exists()) recent.get().toArray else Array.empty
      val out = sorted.map { e =>
        val u = us(e.ts)
        val lo = u - windowSec * 1000000L
        state = state.filter(_ >= lo)
        val n = state.count(_ < u)
        val verdict = RateVerdict(key, e.event_id, n.toLong,
          if (n < quota) 1 else 0)
        state :+= u
        verdict
      }
      recent.clear()
      if (state.nonEmpty) recent.appendList(state)
      out.iterator
    }
  }

  /** [[RateLimitProcessor]] wired through `transformWithState`. */
  def rateLimit(events: Dataset[Event], windowSec: Long,
      quota: Int): Dataset[RateVerdict] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RateLimitProcessor(windowSec, quota),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }
}
