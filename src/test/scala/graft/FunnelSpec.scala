package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Funnel

class FunnelSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("funnel advances only on strictly-later events, in order") {
    import spark.implicits._
    val events = Seq(
      // u1: clean full funnel
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      // u2: click BEFORE the first view doesn't count; the later one does
      (2L, ts(1), "click"), (2L, ts(2), "view"), (2L, ts(5), "click"),
      // u3: same-timestamp click is not "after" the view -> funnel stops
      (3L, ts(4), "view"), (3L, ts(4), "click"),
      // u4: never viewed -> not in the funnel at all
      (4L, ts(1), "purchase"))
      .toDF("uid", "t", "etype")
    val got = Funnel.funnelSteps(events, "uid", "t", "etype",
        Seq("view", "click", "purchase"))
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.getTimestamp(1)), Option(r.getTimestamp(2)), Option(r.getTimestamp(3))))
      .toMap
    assert(got == Map(
      1L -> (Some(ts(1)), Some(ts(2)), Some(ts(3))),
      2L -> (Some(ts(2)), Some(ts(5)), None),
      3L -> (Some(ts(4)), None, None)))
  }

  test("cohort retention counts distinct users per cohort and offset") {
    import spark.implicits._
    def day(d: Int) = ts(86400L * d)
    val events = Seq(
      (1L, day(0)), (1L, day(0)), (1L, day(2)),   // cohort 0, active 0 and 2
      (2L, day(0)), (2L, day(1)),                 // cohort 0, active 0 and 1
      (3L, day(1)))                               // cohort 1, active 1
      .toDF("uid", "t")
    val got = Funnel.cohortRetention(events, "uid", "t")
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("1970-01-01", 0) -> 2L, ("1970-01-01", 1) -> 1L, ("1970-01-01", 2) -> 1L,
      ("1970-01-02", 0) -> 1L))
  }

  test("clampedRunningBalance: reflection identity == direct sequential fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 500).map { i =>
      ((i % 7).toLong, new Timestamp(1700000000000L + i * 1000L),
        i.toLong, rnd.nextInt(21).toLong - 11) // negative drift
    }
    val df = rows.toDF("user_id", "ts", "event_id", "delta")
    val got = Funnel.clampedRunningBalance(df, "user_id", "ts", "event_id",
        "delta")
      .select(col("user_id"), col("event_id"), col("balance"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expected = rows.groupBy(_._1).flatMap { case (_, rs) =>
      var acc = 0L
      rs.sortBy(r => (r._2.getTime, r._3)).map { r =>
        acc = math.max(0L, acc + r._4)
        (r._1, r._3) -> acc
      }
    }
    assert(expected.exists(_._2 == 0L), "clamp never engaged — tune drift")
    assert(got == expected)
  }

  test("multi-touch credits: degenerate 1/2-touch cases and U-shape with remainder") {
    import spark.implicits._
    val conv = Seq(
      (1L, ts(100), 101L), // 1 touch
      (2L, ts(100), 102L), // 2 touches
      (3L, ts(100), 103L)) // 5 touches: middles split 200000/3
      .toDF("u", "pts", "pid")
    val touch = (Seq((1L, ts(50), 1L)) ++
      Seq((2L, ts(40), 2L), (2L, ts(60), 3L)) ++
      (0 until 5).map(i => (3L, ts(10 + i), 10L + i))).toDF("u", "cts", "cid")
    val got = Funnel.multiTouchAttribution(conv, touch, "u", "pts", "pid",
        "cts", "cid", lookbackUs = 1000L * 1000000)
      .select("pid", "cid", "credit_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((101L, 1L)) == 1000000L)
    assert(got((102L, 2L)) == 500000L && got((102L, 3L)) == 500000L)
    // 5 touches: first/last 400000; middles 66666 each, remainder 2
    // to the earliest middle
    assert(got((103L, 10L)) == 400000L && got((103L, 14L)) == 400000L)
    assert(got((103L, 11L)) == 66668L)
    assert(got((103L, 12L)) == 66666L && got((103L, 13L)) == 66666L)
    // every conversion's credits sum to exactly 1e6
    val sums = got.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
    assert(sums.values.forall(_ == 1000000L))
  }

  test("multi-touch: lookback window excludes stale and future touches") {
    import spark.implicits._
    val conv = Seq((1L, ts(1000), 1L)).toDF("u", "pts", "pid")
    val touch = Seq(
      (1L, ts(100), 1L),   // too old (900s > 600s lookback)
      (1L, ts(500), 2L),   // in window
      (1L, ts(1000), 3L),  // boundary: exactly at conversion time
      (1L, ts(1500), 4L))  // future
      .toDF("u", "cts", "cid")
    val got = Funnel.multiTouchAttribution(conv, touch, "u", "pts", "pid",
        "cts", "cid", lookbackUs = 600L * 1000000)
      .select("cid", "credit_micro").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2L -> 500000L, 3L -> 500000L))
  }

  test("sequencePattern: negation over the gap, overlap rule, tie-ordered symbols") {
    import spark.implicits._
    // user 1: s v p  s e p  → symbols "svpsep": matches s[^ep]*p once
    //   (the second signup is blocked by the error)
    // user 2: s p s p      → two non-overlapping matches
    // user 3: p s v e      → signup never completes: zero matches
    // user 4: same TIMESTAMP events — event_id breaks the tie: s(id1)
    //   p(id2) → one match; a collect-order dependence would flip it
    val rows = Seq(
      (1L, 10L, 1L, "signup"), (1L, 20L, 2L, "view"), (1L, 30L, 3L, "purchase"),
      (1L, 40L, 4L, "signup"), (1L, 50L, 5L, "error"), (1L, 60L, 6L, "purchase"),
      (2L, 10L, 1L, "signup"), (2L, 20L, 2L, "purchase"),
      (2L, 30L, 3L, "signup"), (2L, 40L, 4L, "purchase"),
      (3L, 10L, 1L, "purchase"), (3L, 20L, 2L, "signup"),
      (3L, 30L, 3L, "view"), (3L, 40L, 4L, "error"),
      (4L, 10L, 1L, "signup"), (4L, 10L, 2L, "purchase"))
      .toDF("u", "t", "i", "et")
    val syms = Map("signup" -> "s", "view" -> "v", "click" -> "c",
      "purchase" -> "p", "error" -> "e")
    def run(df: org.apache.spark.sql.DataFrame) =
      Funnel.sequencePattern(df, "u", "t", "i", "et", syms, "s[^ep]*p")
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3), r.getInt(4))))
        .toMap
    val got = run(rows)
    assert(got(1L) == (("svpsep", 1L, 1)))
    assert(got(2L) == (("spsp", 2L, 1)))
    assert(got(3L) == (("psve", 0L, 0)))
    assert(got(4L) == (("sp", 1L, 1)))
    assert(run(rows.repartition(7)) == got)
  }
}
