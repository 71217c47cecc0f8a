package graft

import graft.operators.Intervals

class IntervalsSpec extends SparkSpec {

  import spark.implicits._

  test("max concurrency: hand-built overlap pattern with peak instant") {
    // key k: [0,10], [5,15], [8,12] → open counts 1,2,3,... peak 3 at t=8
    // [20,25] later alone
    val spans = Seq(
      ("k", 0L, 10L, 1L), ("k", 5L, 15L, 2L), ("k", 8L, 12L, 3L),
      ("k", 20L, 25L, 4L))
      .toDF("day", "s", "e", "id")
    val r = Intervals.maxConcurrency(spans, "day", "s", "e", "id")
      .collect().head
    assert(r.getAs[Long]("n_spans") == 4L)
    assert(r.getAs[Long]("max_concurrent") == 3L)
    assert(r.getAs[Long]("peak_at_us") == 8L)
  }

  test("tie rule: a span starting exactly when another ends counts as overlapping") {
    val spans = Seq(("k", 0L, 10L, 1L), ("k", 10L, 20L, 2L))
      .toDF("day", "s", "e", "id")
    val r = Intervals.maxConcurrency(spans, "day", "s", "e", "id")
      .collect().head
    assert(r.getAs[Long]("max_concurrent") == 2L)
    assert(r.getAs[Long]("peak_at_us") == 10L)
  }

  test("keys sweep independently; zero-length spans still count while open") {
    val spans = Seq(
      ("a", 1L, 1L, 1L), ("a", 1L, 1L, 2L), // two instant spans at t=1
      ("b", 0L, 5L, 3L))
      .toDF("day", "s", "e", "id")
    val got = Intervals.maxConcurrency(spans, "day", "s", "e", "id")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("max_concurrent"))
      .toMap
    assert(got == Map("a" -> 2L, "b" -> 1L))
  }
}
