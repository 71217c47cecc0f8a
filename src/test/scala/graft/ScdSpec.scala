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

  test("asOfLookup picks the covering interval, never amplifies, nulls early probes") {
    import spark.implicits._
    val events = Seq(
      (1L, ts(10), 1L, "A"), (1L, ts(20), 2L, "B"), (1L, ts(30), 3L, "C"))
      .toDF("uid", "t", "eid", "status")
    val dim = Scd.scd2FromEvents(events, "uid", "t", Seq("status"), "eid")
    val facts = Seq(
      (100L, 1L, ts(5)),   // before first interval -> NULL
      (101L, 1L, ts(10)),  // inclusive lower bound -> A
      (102L, 1L, ts(20)),  // exclusive upper bound -> B, not A
      (103L, 1L, ts(99)),  // open interval -> C
      (104L, 2L, ts(50)))  // unknown key -> NULL
      .toDF("fid", "uid", "t")
    val got = Scd.asOfLookup(facts, dim, "uid", "t")
      .select(col("fid"), col("_attrs.status"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(100L -> None, 101L -> Some("A"), 102L -> Some("B"),
      103L -> Some("C"), 104L -> None))
    assert(Scd.asOfLookup(facts, dim, "uid", "t").count() == facts.count())
  }

  test("bitemporalAsOf: both axes independent, correction-wins tie rule") {
    import spark.implicits._
    // key 1: original (vf=10, tx=1, "a"); correction of the SAME
    //   business date (vf=10, tx=2, "a2"); later business state
    //   (vf=20, tx=1, "b")
    // key 2: only becomes valid at vf=50
    val t = Seq(
      (1L, 10L, 1L, "a"), (1L, 10L, 2L, "a2"), (1L, 20L, 1L, "b"),
      (2L, 50L, 1L, "z"))
      .toDF("k", "vf", "tx", "attr")
    def at(v: Long, tx: Long) = Scd
      .bitemporalAsOf(t, "k", "vf", "tx", lit(v), lit(tx))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    // V=15, T=1: only vf=10 valid, correction not yet known → "a"
    assert(at(15L, 1L) == Map(1L -> "a"))
    // V=15, T=2: the tx-2 correction of vf=10 wins the tie → "a2"
    assert(at(15L, 2L) == Map(1L -> "a2"))
    // V=25 at any T: vf=20 is the latest valid state → "b";
    // the vf=10 correction is shadowed by newer business state
    assert(at(25L, 2L) == Map(1L -> "b"))
    // V=60, T=1: key 2 appears once its validity starts
    assert(at(60L, 1L) == Map(1L -> "b", 2L -> "z"))
    // V before everything: empty, not null-rows
    assert(at(5L, 2L).isEmpty)
  }
}
