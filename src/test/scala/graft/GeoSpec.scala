package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

import graft.operators.Geo

class GeoSpec extends SparkSpec {

  import spark.implicits._

  // Deterministic pseudo-random points, including exact-boundary pairs
  // (distance exactly r, cell-edge coordinates) that a sloppy grid join
  // would miss or double-count.
  private lazy val pts: Seq[(Long, Long, Long)] = {
    val r = new scala.util.Random(7)
    val rand = (0 until 300).map(i =>
      (i.toLong, r.nextInt(1000).toLong, r.nextInt(1000).toLong))
    val boundary = Seq(
      (300L, 49L, 0L), (301L, 99L, 0L),    // cells 0|1, distance exactly 50
      (302L, 100L, 100L), (303L, 150L, 100L), // cell-edge, distance exactly 50
      (304L, 0L, 0L), (305L, 30L, 40L),    // 3-4-5 triangle, d=50
      (306L, 500L, 500L), (307L, 500L, 500L)) // coincident points
    rand ++ boundary
  }

  private def brute(r: Long): Set[(Long, Long, Long)] =
    (for {
      (ai, ax, ay) <- pts; (bi, bx, by) <- pts
      if ai < bi
      d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
      if d2 <= r * r
    } yield (ai, bi, d2)).toSet

  test("radiusJoin matches brute force, including exact-boundary pairs") {
    val df = pts.toDF("id", "x", "y")
    val got = Geo.radiusJoin(df, 50).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == got.toSet.size, "pair emitted more than once")
    assert(got.toSet == brute(50))
    val expected = brute(50)
    assert(expected.exists(_._3 == 2500L), "boundary fixtures missing")
  }

  test("radiusJoin plans an equi-join on cells, never a cartesian product") {
    val df = pts.toDF("id", "x", "y")
    val plan = Geo.radiusJoin(df, 50).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  private def ts(i: Int) = new Timestamp(1700000000000L + i * 60000L)

  private lazy val events = (0 until 400).map { i =>
    (i.toLong, ts(i), (i % 7).toLong, "move")
  }.toDF("event_id", "ts", "user_id", "event_type")

  test("trajectoryStats invariants hold against walkPositions ground truth") {
    val pos = Geo.walkPositions(events, "user_id", "ts", "event_id")
      .select("user_id", "rn", "dx", "dy", "x", "y", "step_l1")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .groupBy(_._1).map { case (u, rows) => u -> rows.sortBy(_._2) }
    val stats = Geo.trajectoryStats(events, "user_id", "ts", "event_id")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(stats.keySet == pos.keySet)
    for ((u, rows) <- pos) {
      val (n, path, net, bw, bh, maxStep) = stats(u)
      assert(n == rows.length)
      val after = rows.drop(1)
      assert(path == after.map(_._7).sum)
      assert(net == math.abs(after.map(_._3).sum) + math.abs(after.map(_._4).sum))
      assert(bw == rows.map(_._5).max - rows.map(_._5).min)
      assert(bh == rows.map(_._6).max - rows.map(_._6).min)
      assert(maxStep == (if (after.isEmpty) 0L else after.map(_._7).max))
      assert(path >= net, "path length must dominate net displacement")
    }
  }

  test("detectStops equals a direct run-length recomputation") {
    val maxStep = 30L // generous threshold so the random walk yields runs
    val minFixes = 2
    val byUser = Geo.walkPositions(events, "user_id", "ts", "event_id")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("x"), col("y"), col("step_l1"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .groupBy(_._1).map { case (u, rows) => u -> rows.sortBy(_._2) }
    val expected = byUser.flatMap { case (u, rows) =>
      // split into maximal runs of still-flag
      val runs = scala.collection.mutable.ListBuffer
        .empty[Vector[(Long, Long, Long, Long, Long)]]
      for (row <- rows) {
        val still = row._5 <= maxStep
        val prevStill = runs.lastOption.exists(_.last._5 <= maxStep)
        if (runs.nonEmpty && still == prevStill) runs(runs.length - 1) :+= row
        else runs += Vector(row)
      }
      runs.filter(r => r.head._5 <= maxStep && r.length >= minFixes).map { r =>
        (u, r.map(_._2).min, r.map(_._2).max, r.length.toLong,
          math.floorDiv(r.map(_._3).sum, r.length), math.floorDiv(r.map(_._4).sum, r.length))
      }
    }.toSet
    val got = Geo.detectStops(events, "user_id", "ts", "event_id",
      maxStep, minFixes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(expected.nonEmpty, "fixture produced no stops — tune threshold")
    assert(got == expected)
  }

  private lazy val stations: Array[(Int, Long, Long)] =
    Array((0, 100L, 100L), (1, 900L, 100L), (2, 500L, 500L), (3, 100L, 900L))

  test("nearestAssign matches brute force with lowest-id tie-break") {
    val df = (pts :+ (308L, 500L, 100L)).toDF("id", "x", "y") // equidistant 0/1
    val got = Geo.nearestAssign(df, stations).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    for ((id, x, y) <- pts :+ (308L, 500L, 100L)) {
      val best = stations.map { case (sid, sx, sy) =>
        ((x - sx) * (x - sx) + (y - sy) * (y - sy), sid)
      }.min
      assert(got(id) == (best._2, best._1), s"point $id")
    }
  }

  test("nearestAssign is map-only: zero exchanges, zero joins") {
    val df = pts.toDF("id", "x", "y")
    val plan = Geo.nearestAssign(df, stations).queryExecution.executedPlan
    assert(plan.collect { case e: Exchange => e }.isEmpty, plan.toString)
    assert(!plan.toString.contains("Join"), plan.toString)
  }

  test("cellDensity matches a direct group-by and orders densest first") {
    val df = pts.toDF("id", "x", "y")
    val got = Geo.cellDensity(df, 100).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = pts.groupBy(p => (p._2 / 100, p._3 / 100))
      .map { case ((cx, cy), rows) => (cx, cy, rows.size.toLong) }
    assert(got.toSet == expected.toSet)
    assert(got.sortBy(t => (-t._3, t._1, t._2)).toSeq == got.toSeq)
  }
}
