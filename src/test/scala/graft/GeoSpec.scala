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

  test("coLocation matches a brute-force spatio-temporal pair scan") {
    val radius = 120L
    val gapUs = 10 * 60 * 1000000L // 10 minutes; fixes are 1 min apart
    val walk = Geo.walkPositions(events, "user_id", "ts", "event_id")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("x"), col("y"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = (for {
      a <- walk; b <- walk
      if a._1 < b._1 && math.abs(a._2 - b._2) <= gapUs
      d2 = (a._3 - b._3) * (a._3 - b._3) + (a._4 - b._4) * (a._4 - b._4)
      if d2 <= radius * radius
    } yield (a._1, b._1, d2, math.min(a._2, b._2), math.max(a._2, b._2)))
      .groupBy(p => (p._1, p._2))
      .map { case ((au, bu), hits) =>
        (au, bu, hits.length.toLong, hits.map(_._3).min,
          hits.map(_._4).min, hits.map(_._5).max) }.toSet
    val got = Geo.coLocation(events, "user_id", "ts", "event_id",
      radius, gapUs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(expected.nonEmpty, "fixture produced no co-locations — tune radius")
    assert(got == expected)
  }

  test("coLocation emits each pair once and plans an equi-join") {
    val df = Geo.coLocation(events, "user_id", "ts", "event_id", 120L,
      10 * 60 * 1000000L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    val keys = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.length == keys.toSet.size, "duplicate track pair emitted")
  }

  private lazy val fences: Array[(Int, Long, Long, Long, Long)] = Array(
    (0, 0L, 0L, 400L, 400L),       // overlaps fence 1 — first-hit must win
    (1, 300L, 300L, 700L, 700L),
    (2, 800L, 0L, 1000L, 200L))

  test("fenceAssign takes the lowest containing fence id, NULL outside") {
    val df = Seq(
      (0L, 100L, 100L),   // only fence 0
      (1L, 350L, 350L),   // fences 0 AND 1 — must pick 0
      (2L, 600L, 600L),   // only fence 1
      (3L, 900L, 100L),   // only fence 2
      (4L, 400L, 400L),   // corner of 0, inclusive — picks 0
      (5L, 750L, 750L))   // outside all
      .toDF("id", "x", "y")
    val got = df.select(col("id"), Geo.fenceAssign(fences).as("f"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1)))
      .toMap
    assert(got == Map(0L -> 0, 1L -> 0, 2L -> 1, 3L -> 2, 4L -> 0, 5L -> -1))
  }

  test("fenceAssign is map-only: zero exchanges, zero joins") {
    val df = pts.toDF("id", "x", "y")
    val plan = df.select(Geo.fenceAssign(fences))
      .queryExecution.executedPlan
    assert(plan.collect { case e: Exchange => e }.isEmpty, plan.toString)
    assert(!plan.toString.contains("Join"), plan.toString)
  }

  test("geofenceEpisodes equals a direct run-length recomputation") {
    // fences sized so the walk (coords ~[0,4800]) crosses them
    val big: Array[(Int, Long, Long, Long, Long)] = Array(
      (0, 0L, 0L, 2500L, 2500L), (1, 2000L, 2000L, 4800L, 4800L))
    val minFixes = 2
    val byUser = Geo.walkPositions(events, "user_id", "ts", "event_id")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("x"), col("y"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).map { case (u, rows) => u -> rows.sortBy(_._2) }
    def fenceOf(x: Long, y: Long): Int =
      big.collectFirst { case (fid, x0, y0, x1, y1)
        if x >= x0 && x <= x1 && y >= y0 && y <= y1 => fid }.getOrElse(-1)
    val expected = byUser.flatMap { case (u, rows) =>
      val runs = scala.collection.mutable.ListBuffer
        .empty[(Int, Vector[Long])] // fence -> fix times
      for ((_, us, x, y) <- rows) {
        val f = fenceOf(x, y)
        if (runs.lastOption.exists(_._1 == f))
          runs(runs.length - 1) = (f, runs.last._2 :+ us)
        else runs += ((f, Vector(us)))
      }
      runs.filter(r => r._1 >= 0 && r._2.length >= minFixes)
        .map(r => (u, r._1, r._2.min, r._2.max, r._2.length.toLong))
    }.toSet
    val got = Geo.geofenceEpisodes(events, "user_id", "ts", "event_id",
      big, minFixes).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(expected.nonEmpty, "fixture produced no episodes — tune fences")
    assert(got == expected)
  }

  test("trajectorySimilarity matches a brute-force checkpoint comparison") {
    val k = 5
    val maxL1 = 700L
    val ck = Geo.trajectoryCheckpoints(events, "user_id", "ts", "event_id", k)
      .collect()
      .map { r =>
        val arr = r.getSeq[org.apache.spark.sql.Row](1)
          .map(c => (c.getLong(0), c.getLong(1), c.getLong(2))).sortBy(_._1)
        r.getLong(0) -> arr
      }.toMap
    // checkpoint contract: K entries, indices 0..K-1, endpoints = first
    // and last fix of the walk
    val walk = Geo.walkPositions(events, "user_id", "ts", "event_id")
      .select(col("user_id"), col("rn"), col("x"), col("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    for ((u, cks) <- ck) {
      assert(cks.map(_._1) == (0 until k).map(_.toLong))
      val rows = walk(u).sortBy(_._2)
      assert((cks.head._2, cks.head._3) == (rows.head._3, rows.head._4))
      assert((cks.last._2, cks.last._3) == (rows.last._3, rows.last._4))
    }
    val expected = (for {
      (a, ca) <- ck.toSeq; (b, cb) <- ck.toSeq
      if a < b
      m = ca.zip(cb).map { case ((_, ax, ay), (_, bx, by)) =>
        math.abs(ax - bx) + math.abs(ay - by) }.max
      if m <= maxL1
    } yield (a, b, m)).toSet
    val got = Geo.trajectorySimilarity(events, "user_id", "ts", "event_id",
      k, maxL1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(expected.nonEmpty, "fixture produced no similar tracks — tune maxL1")
    assert(got == expected)
  }

  test("resampleTracks: as-of fill equals a direct per-slot recompute") {
    val step = 3600000000L // 1 hour; fixture fixes are 1 min apart
    val byUser = Geo.walkPositions(events, "user_id", "ts", "event_id")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("x"), col("y"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).map { case (u, rows) => u -> rows.sortBy(_._2) }
    val expected = byUser.flatMap { case (u, rows) =>
      val lo = rows.head._2
      val hi = rows.last._2
      val k0 = (lo + step - 1) / step
      val k1 = hi / step
      (k0 to k1).map { k =>
        val slot = k * step
        val fix = rows.takeWhile(_._2 <= slot).last
        (u, slot, fix._3, fix._4, slot - fix._2)
      }
    }.toSet
    val got = Geo.resampleTracks(events, "user_id", "ts", "event_id", step)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(expected.nonEmpty, "fixture produced no slots — tune step")
    assert(got == expected)
  }

  test("homeRange core cells cover half the fixes with the fewest cells") {
    val cellSize = 40L
    val byUser = Geo.walkPositions(events, "user_id", "ts", "event_id")
      .select(col("user_id"), col("x"), col("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val got = Geo.homeRange(events, "user_id", "ts", "event_id", cellSize)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got.keySet == byUser.keySet)
    for ((u, rows) <- byUser) {
      val cells = rows.groupBy(p =>
        (math.floorDiv(p._2, cellSize), math.floorDiv(p._3, cellSize)))
        .view.mapValues(_.size.toLong).toMap
      val (n, nc, peak, core) = got(u)
      assert(n == rows.size)
      assert(nc == cells.size)
      assert(peak == cells.values.max)
      // greedy densest-first prefix reaching >= half the fixes
      val ranked = cells.toSeq.sortBy { case ((cx, cy), c) => (-c, cx, cy) }
      val half = (rows.size + 1) / 2
      val expectedCore = ranked.scanLeft(0L)(_ + _._2).tail
        .indexWhere(_ >= half) + 1
      assert(core == expectedCore, s"user $u")
      assert(ranked.take(core.toInt).map(_._2).sum * 2 >= rows.size)
    }
  }
}
