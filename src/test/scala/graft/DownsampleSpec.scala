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
}
