package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin
import graft.sources.Tables

class RangeJoinSpec extends SparkSpec {

  import spark.implicits._
  private def ts(s: String) = Timestamp.valueOf(s)

  test("bucketed range join equals the naive inequality join") {
    val ev = Tables.events(spark, sfDir)
    val points = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("p_id"), col("user_id"), col("ts"))
    val intervals = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("i_id"), col("user_id"),
        col("ts").as("s_ts"), (col("ts") + expr("INTERVAL 30 MINUTES")).as("e_ts"))

    val bucketed = RangeJoin.pointInInterval(
        points, intervals, Seq("user_id"), "ts", "s_ts", "e_ts", bucketSec = 600)
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val naive = points.join(intervals, Seq("user_id"))
      .filter(col("ts") >= col("s_ts") && col("ts") <= col("e_ts"))
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(bucketed == naive)
    assert(naive.nonEmpty)
  }

  test("boundary inclusivity: both endpoints match; outside does not") {
    val points = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),  // == start
      (2L, 10L, ts("2024-01-01 10:10:00")),  // == end
      (3L, 10L, ts("2024-01-01 10:10:01")),  // past end
      (4L, 99L, ts("2024-01-01 10:05:00")))  // wrong key
      .toDF("p_id", "user_id", "ts")
    val intervals = Seq(
      (100L, 10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")))
      .toDF("i_id", "user_id", "s_ts", "e_ts")
    val got = RangeJoin.pointInInterval(
        points, intervals, Seq("user_id"), "ts", "s_ts", "e_ts", bucketSec = 60)
      .select("p_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }

  test("intervals spanning many buckets still produce exactly one match per pair") {
    val points = Seq((1L, 10L, ts("2024-01-01 10:30:00"))).toDF("p_id", "user_id", "ts")
    val intervals = Seq(
      (100L, 10L, ts("2024-01-01 09:00:00"), ts("2024-01-01 12:00:00"))) // 3 h = many 10-min buckets
      .toDF("i_id", "user_id", "s_ts", "e_ts")
    val got = RangeJoin.pointInInterval(
      points, intervals, Seq("user_id"), "ts", "s_ts", "e_ts", bucketSec = 600)
    assert(got.count() == 1)
  }
}
