package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.{SeriesStats, Similarity}

class SeriesStatsSpec extends SparkSpec {

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows.toList).asJava),
      schema)

  private def series(rows: (String, Int, Double)*) = df(
    StructType(Seq(StructField("k", StringType),
      StructField("t", IntegerType), StructField("v", DoubleType))),
    rows.map { case (k, t, v) => Row(k, t, v) }: _*)

  /** Plug-in ACF replay (same estimator as the operator). */
  private def acf(vs: Seq[Double], lag: Int): Option[Double] = {
    val mu = vs.sum / vs.length
    val dev = vs.map(_ - mu)
    val den = dev.map(d => d * d).sum
    if (den == 0.0) None
    else Some(dev.drop(lag).zip(dev.dropRight(lag)).map { case (a, b) => a * b }.sum / den)
  }

  test("laggedAutocorrelation: alternating series has strong negative acf_1, positive acf_2") {
    val vs = Seq(1.0, 9.0, 1.0, 9.0, 1.0, 9.0, 1.0, 9.0)
    val d = series(vs.zipWithIndex.map { case (v, i) => ("a", i, v) }: _*)
    val r = SeriesStats.laggedAutocorrelation(d, "k", "t", "v", Seq(1, 2))
      .collect()(0)
    assert(r.getLong(1) == 8L)
    assert(math.abs(r.getDouble(3) - acf(vs, 1).get) < 1e-9)
    assert(math.abs(r.getDouble(4) - acf(vs, 2).get) < 1e-9)
    assert(r.getDouble(3) < -0.5 && r.getDouble(4) > 0.5)
  }

  test("laggedAutocorrelation: constant series yields NULL acf; keys independent") {
    val d = series(
      (0 until 5).map(i => ("const", i, 7.0)) ++
        (0 until 6).map(i => ("ramp", i, i.toDouble)): _*)
    val rows = SeriesStats.laggedAutocorrelation(d, "k", "t", "v", Seq(1))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("const").isNullAt(3))
    val ramp = (0 until 6).map(_.toDouble)
    assert(math.abs(rows("ramp").getDouble(3) - acf(ramp, 1).get) < 1e-9)
  }

  test("matryoshkaTopK: full-width prefix and corpus-wide shortlist equal brute force") {
    import org.apache.spark.sql.functions.col
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 3)
    val brute = Similarity.dotTopKExact(emb, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val cascade = Similarity.matryoshkaTopK(emb, queries, "vec_id", "embedding",
        prefixDims = 64, shortlist = 1000, k = 5)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(cascade == brute)
  }

  test("arrivalLateness: matches a JVM replay and is shard-count invariant") {
    import org.apache.spark.sql.functions.col
    // arrival order 0..n; event times jitter backwards deterministically
    val n = 200
    val rows = (0 until n).map { i =>
      val us = 1000000L * (i.toLong * 60 - (i * 37 % 11) * 90) // up to 900 s late
      Row(i.toLong, new java.sql.Timestamp(us / 1000))
    }
    val d = df(StructType(Seq(StructField("seq", LongType),
      StructField("ts", TimestampType))), rows: _*)
    // JVM replay of running-max lateness
    val us = rows.map(_.getTimestamp(1).getTime * 1000)
    var mx = Long.MinValue
    val expected = us.map { u =>
      val late = if (mx > u) mx - u else 0L
      mx = math.max(mx, u); late
    }
    def run(shards: Int) = SeriesStats
      .arrivalLateness(d, "seq", "ts", thresholdUs = 300000000L, nShards = shards)
      .orderBy("seq").collect()
      .map(r => (r.getAs[Long]("lateness_us"), r.getAs[Int]("late")))
    val r7 = run(7)
    assert(r7.map(_._1).toSeq == expected)
    assert(r7.map(_._2).toSeq == expected.map(l => if (l > 300000000L) 1 else 0))
    assert(run(1).toSeq == r7.toSeq && run(64).toSeq == r7.toSeq)
  }

  test("recallAtK: zero-overlap queries score 0, full overlap scores 1") {
    import org.apache.spark.sql.functions.col
    def arm(rows: (Long, Long)*) = df(
      StructType(Seq(StructField("query_id", LongType),
        StructField("neighbor_id", LongType))),
      rows.map { case (q, n) => Row(q, n) }: _*)
    val exact = arm(1L -> 10, 1L -> 11, 2L -> 20, 2L -> 21)
    val approx = arm(1L -> 10, 1L -> 11, 2L -> 99, 2L -> 98)
    val out = Similarity.recallAtK(exact, approx, k = 2)
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 2L, 1.0), (2L, 0L, 0.0)))
  }

  test("matryoshkaTopK: result is the exact full-dot rerank of its own stage-1 shortlist") {
    import org.apache.spark.sql.functions.{col, slice}
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 3)
    // replay stage 1 with the independent exact-top-k operator on the
    // 16-dim prefix frames
    val pre = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("vec_id"), slice(col("embedding"), 1, 16).as("embedding"))
    val shortlist = Similarity
      .dotTopKExact(pre(emb), pre(queries), "vec_id", "embedding", k = 50)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // replay stage 2 in the JVM: full dot over the shortlist per query
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val expected = shortlist.groupBy(_._1).toSeq.flatMap { case (q, cands) =>
      cands.toSeq.map { case (_, n) => (q, n, dot(vecs(q), vecs(n))) }
        .sortBy { case (_, n, d) => (-d, n) }.take(3)
        .map { case (_, n, _) => (q, n) }
    }.toSet
    val cascade = Similarity.matryoshkaTopK(emb, queries, "vec_id", "embedding",
        prefixDims = 16, shortlist = 50, k = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cascade == expected)
  }

  test("seasonalBaselineAnomalies: spike vs its weekday-hour slot, not vs neighbors") {
    import spark.implicits._
    import java.sql.Timestamp
    // two Mondays (2024-01-01, 2024-01-08) and a Tuesday; Monday-9am
    // slot: 2 + 8 events → the second Monday (8) is 167% of the slot
    // avg (5) → anomalous at 120%; the Tuesday-9am slot has one day
    // (n·1·100 > 120·n is false — a single-day slot can never flag,
    // the correct cold-start behavior); Monday-10am stays quiet.
    def at(day: String, hour: Int, n: Int) =
      (1 to n).map(i => Timestamp.valueOf(f"$day $hour%02d:0$i:00"))
    val ts = at("2024-01-01", 9, 2) ++ at("2024-01-08", 9, 8) ++
      at("2024-01-02", 9, 5) ++ at("2024-01-01", 10, 3) ++
      at("2024-01-08", 10, 3)
    val got = graft.operators.SeriesStats
      .seasonalBaselineAnomalies(ts.toDF("ts"), "ts", factorPct = 120)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == Set(("2024-01-08", 9)))
    assert(got(("2024-01-08", 9)) == ((8L, 10L, 2L)))
  }

  test("dyadicEwma: exact JVM replay, short-series normalization, invariance") {
    import spark.implicits._
    // key A: 4 points; key B: 1 point (ewma == the point itself)
    val rows = Seq(
      ("A", 1L, 1.5), ("A", 2L, 2.0), ("A", 3L, 0.25), ("A", 4L, 10.0),
      ("B", 1L, 7.77))
      .toDF("k", "t", "v")
    def replay(vs: Seq[Double]): Long = {
      // window values oldest..current, micro-units, Σ v_j·2^j / (2^m−1)
      val mic = vs.map(v => math.rint(v * 1e6).toLong)
      val num = mic.zipWithIndex.map { case (v, j) => v << j }.sum
      num / ((1L << mic.size) - 1)
    }
    val got = graft.operators.SeriesStats
      .dyadicEwma(rows.toDF(), "k", Seq("t"), "v", span = 16)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got(("A", 1L)) == replay(Seq(1.5)))
    assert(got(("A", 2L)) == replay(Seq(1.5, 2.0)))
    assert(got(("A", 3L)) == replay(Seq(1.5, 2.0, 0.25)))
    assert(got(("A", 4L)) == replay(Seq(1.5, 2.0, 0.25, 10.0)))
    // a single point is its own average at any span
    assert(got(("B", 1L)) == 7770000L)
    // span truncation: span=2 sees only the last two points
    val s2 = graft.operators.SeriesStats
      .dyadicEwma(rows.toDF(), "k", Seq("t"), "v", span = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(s2(("A", 4L)) == replay(Seq(0.25, 10.0)))
    // partitioning must not move a single micro-unit
    val p7 = graft.operators.SeriesStats
      .dyadicEwma(rows.repartition(7).toDF(), "k", Seq("t"), "v", span = 16)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(p7 == got)
  }

  test("groupedRegression2 recovers exact planted slopes on a balanced design") {
    import spark.implicits._
    // y = 2.5 + 3·x1 + 7·x2 exactly, on a design whose integer means are
    // exact (x1 sum 24 over 8 rows, x2 sum 8 over 8) so centering loses
    // nothing and both slopes come back in exact micro-units
    val rows = for (x1 <- Seq(0L, 2L, 4L, 6L); x2 <- Seq(0L, 2L))
      yield ("g", x1, x2, 2.5 + 3.0 * x1 + 7.0 * x2)
    val got = graft.operators.SeriesStats
      .groupedRegression2(rows.toDF("g", "x1", "x2", "v"),
        "g", "x1", "x2", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq(("g", 8L, 3000000L, 7000000L)))
  }

  test("groupedRegression2 separates correlated features and scales output") {
    import spark.implicits._
    // x2 confounds x1 (x2 = x1 for half the rows): a single-feature
    // slope of v~x1 would absorb x2's effect; the 2-feature fit must not
    val rows = Seq[(String, Long, Long, Double)](
      ("g", 0L, 0L, 0.0), ("g", 2L, 2L, 24.0), ("g", 4L, 4L, 48.0),
      ("g", 6L, 6L, 72.0), ("g", 0L, 2L, 20.0), ("g", 2L, 0L, 4.0),
      ("g", 4L, 6L, 68.0), ("g", 6L, 4L, 52.0))
    // v = 2·x1 + 10·x2 exactly; means: x1 24/8=3, x2 24/8=3 exact
    val got = graft.operators.SeriesStats
      .groupedRegression2(rows.toDF("g", "x1", "x2", "v"),
        "g", "x1", "x2", "v", outScale = 100L)
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((200000000L, 1000000000L)))
  }

  test("groupedRegression2: degenerate design yields NULL slopes") {
    import spark.implicits._
    // x2 constant → singular normal matrix → NULL, not a crash/garbage
    val rows = Seq[(String, Long, Long, Double)](
      ("g", 0L, 5L, 1.0), ("g", 1L, 5L, 2.0), ("g", 2L, 5L, 3.0))
    val r = graft.operators.SeriesStats
      .groupedRegression2(rows.toDF("g", "x1", "x2", "v"),
        "g", "x1", "x2", "v").collect().head
    assert(r.isNullAt(2) && r.isNullAt(3))
  }
}
