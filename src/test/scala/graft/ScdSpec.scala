package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Scd

class ScdSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("scd2 collapses runs into validity intervals, last one open") {
    import spark.implicits._
    val events = Seq(
      (1L, ts(1), 10L, "A"), (1L, ts(2), 11L, "A"), (1L, ts(3), 12L, "B"),
      (1L, ts(4), 13L, "B"), (1L, ts(5), 14L, "A"),
      (2L, ts(7), 15L, "X"))
      .toDF("uid", "t", "eid", "status")
    val got = Scd.scd2FromEvents(events, "uid", "t", Seq("status"), "eid")
      .orderBy("uid", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3))))
    assert(got.toSeq == Seq(
      (1L, "A", ts(1), Some(ts(3))),
      (1L, "B", ts(3), Some(ts(5))),
      (1L, "A", ts(5), None),
      (2L, "X", ts(7), None)))
  }

  test("scd2 breaks timestamp ties by the tie column and is null-safe on attrs") {
    import spark.implicits._
    // two changes at the SAME timestamp: event_id decides the run order;
    // a null attribute forms its own run (null-safe comparison)
    val events = Seq(
      (1L, ts(1), 1L, Some("A")), (1L, ts(1), 2L, Some("B")),
      (1L, ts(2), 3L, None), (1L, ts(3), 4L, None), (1L, ts(4), 5L, Some("A")))
      .toDF("uid", "t", "eid", "status")
    val got = Scd.scd2FromEvents(events, "uid", "t", Seq("status"), "eid")
      .orderBy("valid_from", "status")
      .collect()
      .map(r => (Option(r.getString(1)), r.getTimestamp(2), Option(r.getTimestamp(3))))
    assert(got.toSeq == Seq(
      (Some("A"), ts(1), Some(ts(1))),
      (Some("B"), ts(1), Some(ts(2))),
      (None, ts(2), Some(ts(4))),
      (Some("A"), ts(4), None)))
  }
}
