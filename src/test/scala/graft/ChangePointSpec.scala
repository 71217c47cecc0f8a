package graft

import java.sql.Timestamp

import graft.operators.ChangePoint

class ChangePointSpec extends SparkSpec {

  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("CUSUM: a planted level shift is detected at the shift point") {
    // 5 values at 10, then 5 at 50 — the n-scaled curve peaks (in
    // magnitude) right before the level change
    val rows = (0 until 10).map(i =>
      ("u", ts(i), i.toLong, if (i < 5) 10L else 50L))
    val got = ChangePoint.cusumStats(
      rows.toDF("k", "t", "id", "x"), "k", "t", "id", "x").collect().head
    assert(got.getAs[Long]("n") == 10L)
    // direct recompute: n=10, tot=300; C_i = 10*prefix - i*300
    val xs = rows.map(_._4)
    val cs = xs.scanLeft(0L)(_ + _).tail.zipWithIndex.map {
      case (pfx, i0) => 10L * pfx - (i0 + 1) * 300L
    }
    assert(got.getAs[Long]("range_n_micros") == cs.max - cs.min)
    // argmax of |C| — the curve bulges most right at the shift
    // boundary (end of the low segment)
    val argmax = cs.indexOf(cs.maxBy(math.abs))
    assert(argmax == 4) // i=5 (minute 4): the last low-level sample
    assert(got.getAs[String]("change_ts") ==
      f"2024-01-01 00:$argmax%02d:00")
  }

  test("CUSUM: stationary series has a small range; argmax tie takes lowest id") {
    // constant series: every C_i = 0 → range 0, argmax tie → first row
    val rows = (0 until 6).map(i => ("u", ts(i), i.toLong, 7L))
    val got = ChangePoint.cusumStats(
      rows.toDF("k", "t", "id", "x"), "k", "t", "id", "x").collect().head
    assert(got.getAs[Long]("range_n_micros") == 0L)
    assert(got.getAs[String]("change_ts") == "2024-01-01 00:00:00")
  }

  test("CUSUM: multiple keys stay independent") {
    val rows = Seq(
      ("a", ts(0), 1L, 0L), ("a", ts(1), 2L, 100L),
      ("b", ts(0), 3L, 5L), ("b", ts(1), 4L, 5L), ("b", ts(2), 5L, 5L))
    val got = ChangePoint.cusumStats(
      rows.toDF("k", "t", "id", "x"), "k", "t", "id", "x")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("range_n_micros"))
      .toMap
    // a: n=2 tot=100; C = (2*0-100, 2*100-200) = (-100, 0) → range 100
    assert(got("a") == 100L)
    assert(got("b") == 0L)
  }
}
