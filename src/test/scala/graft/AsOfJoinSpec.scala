package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  import spark.implicits._

  lazy val trades = Seq(
    (1L, 100L, ts("2024-01-01 10:00:05"), 10.0),
    (2L, 100L, ts("2024-01-01 10:00:30"), 11.0),
    (3L, 100L, ts("2024-01-01 09:59:00"), 9.0),  // before any quote
    (4L, 200L, ts("2024-01-01 10:00:10"), 20.0),
    (5L, 200L, ts("2024-01-01 10:05:00"), 21.0)
  ).toDF("trade_id", "sym", "t_ts", "price")

  lazy val quotes = Seq(
    (100L, ts("2024-01-01 10:00:00"), 1.0),
    (100L, ts("2024-01-01 10:00:30"), 2.0), // exactly at trade 2 → wins
    (200L, ts("2024-01-01 10:00:00"), 5.0)
  ).toDF("sym", "q_ts", "quote")

  lazy val joined = AsOfJoin.asOfJoin(
    trades, quotes, Seq("sym"), "t_ts", "q_ts", Seq("quote"))
    .collect().map(r => r.getAs[Long]("trade_id") ->
      (Option(r.getAs[java.lang.Double]("quote")),
        Option(r.getAs[Timestamp]("asof_ts")))).toMap

  test("each left row gets the latest right row at or before its timestamp") {
    assert(joined(1L)._1.contains(1.0)) // 10:00:00 quote
    assert(joined(2L)._1.contains(2.0)) // tie at 10:00:30 → snapshot wins
    assert(joined(4L)._1.contains(5.0))
    assert(joined(5L)._1.contains(5.0)) // carried forward 5 minutes
  }

  test("left rows before any right row get NULLs (left-join semantics)") {
    assert(joined(3L)._1.isEmpty && joined(3L)._2.isEmpty)
  }

  test("asof_ts reports which snapshot matched") {
    assert(joined(1L)._2.contains(ts("2024-01-01 10:00:00")))
    assert(joined(2L)._2.contains(ts("2024-01-01 10:00:30")))
  }

  test("tolerance nulls out stale matches") {
    val tight = AsOfJoin.asOfJoin(
      trades, quotes, Seq("sym"), "t_ts", "q_ts", Seq("quote"),
      tolerance = Some(60))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Double]("quote"))).toMap
    assert(tight(4L).contains(5.0))  // 10 s old → kept
    assert(tight(5L).isEmpty)        // 5 min old → too stale
  }

  test("NULL payload in the matching snapshot stays NULL (no backfill from older rows)") {
    // two-payload quotes where the LATEST snapshot legitimately carries a
    // NULL venue: the whole snapshot must be taken atomically — a
    // per-column carry-forward would resurrect the OLDER row's venue
    // next to the newer row's quote, mixing two snapshots
    val quotes2 = Seq(
      (100L, ts("2024-01-01 10:00:00"), Some(1.0), Some("NYSE")),
      (100L, ts("2024-01-01 10:00:20"), Some(1.5), None) // newer, venue NULL
    ).toDF("sym", "q_ts", "quote", "venue")
    val out = AsOfJoin.asOfJoin(
      trades.filter(col("trade_id") === 2L), quotes2,
      Seq("sym"), "t_ts", "q_ts", Seq("quote", "venue"))
      .collect().head
    assert(out.getAs[Double]("quote") == 1.5)              // from 10:00:20
    assert(out.getAs[String]("venue") == null,             // NOT "NYSE"
      "venue was backfilled from an older snapshot")
    assert(out.getAs[Timestamp]("asof_ts") == ts("2024-01-01 10:00:20"))
  }

  test("row counts: exactly one output row per left row") {
    val out = AsOfJoin.asOfJoin(trades, quotes, Seq("sym"), "t_ts", "q_ts", Seq("quote"))
    assert(out.count() == trades.count())
    assert(out.columns.toSet ==
      trades.columns.toSet + "quote" + "asof_ts")
  }
}
