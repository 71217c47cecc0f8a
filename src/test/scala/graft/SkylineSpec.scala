package graft

import graft.operators.Skyline

class SkylineSpec extends SparkSpec {

  import spark.implicits._

  private def brute(pts: Seq[(Long, Long, Long)]): Set[Long] =
    pts.filterNot { r =>
      pts.exists(s => s._2 >= r._2 && s._3 >= r._3 &&
        (s._2 > r._2 || s._3 > r._3))
    }.map(_._1).toSet

  test("grid-pruned skyline equals brute force on random points") {
    val rnd = new scala.util.Random(3)
    val pts = (0 until 800).map(i =>
      (i.toLong, rnd.nextInt(100000).toLong, rnd.nextInt(100000).toLong))
    val got = Skyline.skyline2D(pts.toDF("id", "x", "y"), "id", "x", "y")
      .collect().map(_.getLong(0)).toSet
    assert(got == brute(pts))
  }

  test("anti-correlated points: a thick frontier survives intact") {
    // x + y = const: EVERY point is on the frontier — the pruning's
    // worst case must lose nothing
    val pts = (0 until 200).map(i => (i.toLong, i.toLong, 199L - i))
    val got = Skyline.skyline2D(pts.toDF("id", "x", "y"), "id", "x", "y")
      .collect().map(_.getLong(0)).toSet
    assert(got == pts.map(_._1).toSet)
  }

  test("ties on both dimensions keep both rows; duplicates of a dominated point all drop") {
    val pts = Seq(
      (1L, 10L, 10L), (2L, 10L, 10L),  // equal maxima: both stay
      (3L, 5L, 5L), (4L, 5L, 5L),      // dominated twins: both drop
      (5L, 12L, 1L))                   // frontier corner
    val got = Skyline.skyline2D(pts.toDF("id", "x", "y"), "id", "x", "y")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 5L))
  }

  test("degenerate inputs: single point, all-equal points") {
    val one = Skyline.skyline2D(Seq((7L, 3L, 4L)).toDF("id", "x", "y"),
      "id", "x", "y").collect()
    assert(one.map(_.getLong(0)).toSeq == Seq(7L))
    val eq = (1L to 5L).map(i => (i, 9L, 9L))
    val got = Skyline.skyline2D(eq.toDF("id", "x", "y"), "id", "x", "y")
      .collect().map(_.getLong(0)).toSet
    assert(got == eq.map(_._1).toSet)
  }
}
