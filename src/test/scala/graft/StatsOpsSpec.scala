package graft

import graft.operators.{Association, RobustStats}

/** Robust statistics + association mining operators. */
class StatsOpsSpec extends SparkSpec {

  import spark.implicits._

  // ---- RobustStats.madOutlierStats -------------------------------

  test("median/MAD: hand-computed odd and even groups") {
    // group A (odd n=5): 10,20,30,40,1000 → med 30, devs 20,10,0,10,970
    //   → MAD 10; outliers: |x-30| > 30 → only 1000
    // group B (even n=4): 1,3,5,7 → med 4 (half-integer ⇒ med2=8),
    //   devs 3,1,1,3 → MAD 2; outliers: |x-4| > 6 → none
    val df = Seq(
      ("a", 10L), ("a", 20L), ("a", 30L), ("a", 40L), ("a", 1000L),
      ("b", 1L), ("b", 3L), ("b", 5L), ("b", 7L)).toDF("g", "x")
    val got = RobustStats.madOutlierStats(df, "g", "x", k = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("a") == ((5L, 60L, 40L, 1L)))
    assert(got("b") == ((4L, 8L, 8L, 0L)))
  }

  test("median/MAD: negative values and a constant group") {
    // constants: MAD 0 ⇒ every unequal value would be an outlier, but
    // all values equal the median ⇒ zero outliers
    val df = Seq(("c", -5L), ("c", -5L), ("c", -5L),
      ("d", -10L), ("d", 0L), ("d", 10L)).toDF("g", "x")
    val got = RobustStats.madOutlierStats(df, "g", "x", k = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("c") == ((-10L, 0L, 0L)))
    // d: med 0, devs 10,0,10 → MAD 10 → 3·MAD=30 ⇒ none outside
    assert(got("d") == ((0L, 40L, 0L)))
  }

  test("MAD flag matches a direct recompute on random data") {
    val rnd = new scala.util.Random(11)
    val data = (0 until 500).map(i =>
      (s"g${i % 3}", rnd.nextInt(1000).toLong - 500L))
    val got = RobustStats.madOutlierStats(data.toDF("g", "x"), "g", "x", 3)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    def medianTwice(xs: Seq[Long]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) 2.0 * s(n / 2) else (s(n / 2 - 1) + s(n / 2)).toDouble
    }
    val want = data.groupBy(_._1).map { case (g, rows) =>
      val xs = rows.map(_._2)
      val med2 = medianTwice(xs)
      val dev2 = xs.map(x => math.abs(2 * x - med2.toLong))
      val mad4 = medianTwice(dev2)
      g -> dev2.count(d => 2 * d > 3 * mad4.toLong).toLong
    }
    assert(got == want)
  }

  // ---- Association.basketLift ------------------------------------

  test("basket lift: hand-checked pair counts and lift") {
    // baskets: {A,B,C}, {A,B}, {A,C}, {B} → 4 baskets
    // pairs: (A,B)=2, (A,C)=2, (B,C)=1; cnt A=3, B=3, C=2
    // lift(A,B) = 2*4*1000/(3*3)= 888; lift(A,C)=2*4*1000/(3*2)=1333
    val df = Seq(
      (1L, "A"), (1L, "B"), (1L, "C"),
      (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"),
      (4L, "B")).toDF("bk", "it")
    val rows = Association.basketLift(df, "bk", "it", 1L, 10)
      .collect().map(r => (r.getString(1), r.getString(0), r.getLong(2),
        r.getLong(5)))
    // schema: item_b joined first? verify by names instead
    val byPair = Association.basketLift(df, "bk", "it", 1L, 10)
      .collect().map(r => (r.getAs[String]("item_a"),
        r.getAs[String]("item_b")) ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("lift_milli")))).toMap
    assert(byPair(("A", "B")) == ((2L, 888L)))
    assert(byPair(("A", "C")) == ((2L, 1333L)))
    assert(byPair(("B", "C")) == ((1L, 666L)))
    assert(rows.length == 3)
  }

  test("basket lift: minPairs filter and deterministic top-k order") {
    val df = Seq(
      (1L, "A"), (1L, "B"),
      (2L, "A"), (2L, "B"),
      (3L, "C"), (3L, "D")).toDF("bk", "it")
    val got = Association.basketLift(df, "bk", "it", 2L, 10).collect()
    assert(got.map(r => (r.getAs[String]("item_a"), r.getAs[String]("item_b")))
      .toSeq == Seq(("A", "B")))
    // topK cuts on (n_pairs desc, item_a, item_b)
    val top1 = Association.basketLift(df, "bk", "it", 1L, 1).collect()
    assert(top1.head.getAs[String]("item_a") == "A")
  }

  test("basket lift: each unordered pair appears exactly once") {
    val df = Seq((1L, "X"), (1L, "Y"), (2L, "Y"), (2L, "X")).toDF("bk", "it")
    val got = Association.basketLift(df, "bk", "it", 1L, 10).collect()
    assert(got.length == 1)
    assert(got.head.getAs[String]("item_a") == "X")
    assert(got.head.getAs[Long]("n_pairs") == 2L)
  }

  test("percentileRank: ties share min-rank, bucket-count invariant, extremes exact") {
    import spark.implicits._
    import graft.operators.RobustStats
    // values 10,10,20,30,30,30,40 → rank_lt: 0,0,2,3,3,3,6; N−1=6
    val df = Seq((1L, 10.0), (2L, 10.0), (3L, 20.0), (4L, 30.0),
      (5L, 30.0), (6L, 30.0), (7L, 40.0)).toDF("id", "v")
    def run(b: Int) = RobustStats.percentileRank(df, "id", "v", nBuckets = b)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val got = run(4)
    assert(got(1L) == ((0L, 0L)) && got(2L) == ((0L, 0L)))
    assert(got(3L) == ((2L, 2L * 1000000 / 6)))
    assert(got(4L) == ((3L, 500000L)))
    assert(got(7L) == ((6L, 1000000L))) // the max hits exactly 10⁶
    // the shard count is an implementation knob, never a semantic one
    assert(run(1) == got && run(256) == got)
    // single row: rank 0, pct 0 (den clamps to 1)
    val one = RobustStats.percentileRank(Seq((9L, 5.0)).toDF("id", "v"), "id", "v")
      .collect().head
    assert(one.getLong(2) == 0L && one.getLong(3) == 0L)
  }

  test("quantileNormalize: groups land on pooled order statistics, identity on one group") {
    import spark.implicits._
    import graft.operators.RobustStats
    // group A = {10, 20, 30, 40}, group B = {1000, 2000, 3000, 4000}:
    // same shape, shifted scale. Pooled sorted (micro):
    // 10,20,30,40,1000,2000,3000,4000 → positions 0..7. Each group's
    // rank r∈{0..3} maps to position r·7 div 3 = 0,2,4,7 → pooled
    // values 10,30,1000,4000 — IDENTICAL for both groups (and the
    // extremes land on the pooled extremes): the point of the
    // transform.
    val df = (Seq(10, 20, 30, 40).map(v => ("A", v.toLong)) ++
      Seq(1000, 2000, 3000, 4000).map(v => ("B", v.toLong)))
      .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v.toDouble) }
      .toDF("id", "g", "v")
    val got = RobustStats.quantileNormalize(df, "id", "g", "v")
      .collect()
      .map(r => (r.getString(1), r.getLong(2) / 1000000L) -> (r.getLong(3) / 1000000L))
      .toMap
    assert(got == Map(
      ("A", 10L) -> 10L, ("A", 20L) -> 30L, ("A", 30L) -> 1000L,
      ("A", 40L) -> 4000L,
      ("B", 1000L) -> 10L, ("B", 2000L) -> 30L, ("B", 3000L) -> 1000L,
      ("B", 4000L) -> 4000L))
    // a single group maps onto itself at every rank position where
    // r·(N−1) div (n−1) = r — which holds when the group IS the pool
    val solo = Seq((1L, "X", 5.0), (2L, "X", 7.0), (3L, "X", 9.0))
      .toDF("id", "g", "v")
    val self = RobustStats.quantileNormalize(solo, "id", "g", "v")
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(self.forall { case (v, nv) => v == nv })
  }

  test("weightedMedian: weight skew moves the median; equal weights reduce to plain") {
    import spark.implicits._
    import graft.operators.RobustStats
    // group A: values 1..5, weight 1 each EXCEPT value 5 carries 10:
    //   tot=14, cum at v=5 first reaches 2·cum ≥ 14 → wmedian 5
    // group B: same values, all weight 1: tot=5, cum 1,2,3 → v=3
    val rows =
      (1L to 5L).map(v => ("A", v, if (v == 5L) 10L else 1L, v)) ++
        (1L to 5L).map(v => ("B", v, 1L, v + 10))
    val got = RobustStats.weightedMedian(
        rows.toDF("g", "v", "w", "id"), "g", "v", "w", "id")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("A") == ((5L, 14L, 5L)))
    assert(got("B") == ((5L, 5L, 3L)))
  }
}
