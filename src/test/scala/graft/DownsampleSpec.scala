package graft

import java.sql.Timestamp

import graft.operators.Downsample

class DownsampleSpec extends SparkSpec {

  import spark.implicits._

  private def ts(us: Long) = {
    val t = new Timestamp(us / 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }

  test("ohlcTwa: hand-computed bar incl. hold-to-window-end weighting") {
    val W = 1000000L // 1-second windows in µs
    // window [0, 1s): readings at 0.0s=10, 0.4s=20, 0.9s=40
    //   durations: 0.4, 0.5, 0.1 -> twa = (10*.4 + 20*.5 + 40*.1) / 1.0 = 18
    // window [1s, 2s): single reading at 1.5s=7 -> twa = 7 (holds 0.5s)
    val events = Seq(
      (1L, ts(0L), "a", 10.0),
      (2L, ts(400000L), "a", 20.0),
      (3L, ts(900000L), "a", 40.0),
      (4L, ts(1500000L), "a", 7.0),
      (5L, ts(100000L), "b", 3.0))
      .toDF("event_id", "ts", "event_type", "value")
    val got = Downsample.ohlcTwa(events, "event_type", "ts", "event_id",
        "value", W)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6), r.getLong(7))).toMap
    assert(got(("a", 0L)) == ((3L, 10.0, 40.0, 10.0, 40.0, 18000000L)))
    assert(got(("a", 1000000L)) == ((1L, 7.0, 7.0, 7.0, 7.0, 7000000L)))
    assert(got(("b", 0L)) == ((1L, 3.0, 3.0, 3.0, 3.0, 3000000L)))
  }

  test("ohlcTwa: open/close ties on timestamp break by event id") {
    val W = 1000000L
    val events = Seq(
      (2L, ts(0L), "a", 5.0),   // same ts: id 1 is open, id 2 is NOT
      (1L, ts(0L), "a", 9.0),
      (3L, ts(500000L), "a", 1.0))
      .toDF("event_id", "ts", "event_type", "value")
    val r = Downsample.ohlcTwa(events, "event_type", "ts", "event_id",
      "value", W).collect().head
    assert(r.getDouble(3) == 9.0, "open must be the lowest-id tie")
    assert(r.getDouble(6) == 1.0, "close is the latest reading")
    // twa: id1 holds 0 µs (id2 at same ts), id2 holds 0.5 s, id3 0.5 s
    assert(r.getLong(7) == 3000000L)
  }

  test("gap fill: interior gap interpolates linearly, edges take the neighbor") {
    val s = 1000000L // 1 s in µs
    val rows = Seq(
      // k1: missing at t=0 (leading), observed 100@10s, missing@20s,
      // observed 300@30s, missing@40s (trailing)
      ("k1", ts(0L), 1L, true, 0L),
      ("k1", ts(10 * s), 2L, false, 100L),
      ("k1", ts(20 * s), 3L, true, 0L),
      ("k1", ts(30 * s), 4L, false, 300L),
      ("k1", ts(40 * s), 5L, true, 0L),
      // k2: all missing → no fill possible
      ("k2", ts(0L), 6L, true, 0L))
      .toDF("k", "t", "id", "miss", "v")
    val got = Downsample.gapFillLinear(rows, "k", "t", "id", "v", "miss")
      .select("id", "filled_milli").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    assert(got(1L) == Some(100L)) // leading edge → next value
    assert(got(3L) == Some(200L)) // midpoint of 100..300
    assert(got(5L) == Some(300L)) // trailing edge → prev value
    assert(got(6L) == None)       // nothing observed at all
  }

  test("gap fill: uneven spacing floors the weighted average; same-second span falls back") {
    val s = 1000000L
    val rows = Seq(
      ("k", ts(0L), 1L, false, 10L),
      ("k", ts(1 * s), 2L, true, 0L),   // 1/3 of the way 10→21
      ("k", ts(3 * s), 3L, false, 21L),
      // same-second pair around a missing row (sub-second ordering
      // by id): span 0 → previous value wins
      ("k", ts(5 * s), 4L, false, 50L),
      ("k", ts(5 * s + 1), 5L, true, 0L),
      ("k", ts(5 * s + 2), 6L, false, 60L))
      .toDF("k", "t", "id", "miss", "v")
    val got = Downsample.gapFillLinear(rows, "k", "t", "id", "v", "miss")
      .select("id", "filled_milli").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // (10*(3-1) + 21*(1-0)) div 3 = 41 div 3 = 13 (floor of 13.67)
    assert(got(2L) == 13L)
    assert(got(5L) == 50L)
  }
}
