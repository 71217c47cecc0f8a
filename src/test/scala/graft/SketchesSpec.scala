package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

class SketchesSpec extends SparkSpec {

  test("merged batch sketches estimate identically to a from-scratch sketch") {
    import spark.implicits._
    // overlapping batches: values 0..999 split with deliberate overlap
    // (idempotence: re-sketching a value must not inflate the union)
    val all = (0L until 1000L).map(v => ("g" + (v % 3), v)).toDF("g", "v")
    val b1 = all.filter(col("v") < 600)
    val b2 = all.filter(col("v") >= 400) // 400..599 in BOTH batches
    val merged = Sketches.mergeSketches(
      Seq(Sketches.distinctSketches(b1, "g", "v"),
        Sketches.distinctSketches(b2, "g", "v")), "g")
    val got = Sketches.estimateDistinct(merged, "g")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = Sketches.estimateDistinct(
        Sketches.distinctSketches(all, "g", "v"), "g")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == full, s"merged $got != full $full")
    // ~333 distincts per group is inside HLL's exact (sparse) regime at
    // default lgK, so the estimates are the true counts here
    assert(full.values.toSeq.sorted.map(_.toDouble).zip(
      Seq(333.0, 333.0, 334.0)).forall { case (e, x) => math.abs(e - x) <= x * 0.05 })
  }

  test("persisted sketch tables merge order-invariantly after a parquet round-trip") {
    import spark.implicits._
    val all = (0L until 500L).map(v => ("g", v)).toDF("g", "v")
    // materialize each batch sketch ONCE — the intended pattern: a batch
    // is sketched at ingest and the BYTES persist. (Re-sketching a batch
    // can produce different-but-equally-accurate bytes: serialization
    // depends on the coupon-promotion path, which depends on partial-agg
    // order — asserting byte-path equality across re-evaluations would
    // test DataSketches internals, not the maintenance contract.)
    val b1 = Sketches.distinctSketches(all.filter(col("v") < 250), "g", "v")
    val b2 = Sketches.distinctSketches(all.filter(col("v") >= 250), "g", "v")
      .localCheckpoint(true)
    val path = graft.queries.Det.scratchPath("sketchspec", sfDir) + "/rt"
    b1.write.mode("overwrite").parquet(path)
    val b1rt = spark.read.parquet(path)
    def est(tables: Seq[org.apache.spark.sql.DataFrame]) =
      Sketches.estimateDistinct(Sketches.mergeSketches(tables, "g"), "g")
        .head().getLong(1)
    // fixed persisted inputs: merge order is irrelevant, repeatedly
    assert(est(Seq(b1rt, b2)) == est(Seq(b2, b1rt)))
    assert(est(Seq(b1rt, b2)) == est(Seq(b1rt, b2, b1rt)), "idempotence")
    // and the answer stays inside the error bound around the true count
    val e = est(Seq(b1rt, b2))
    assert(math.abs(e - 500.0) <= 500.0 * 0.05, s"estimate $e off true 500")
  }

  test("CMS: estimate never undercounts and is exact without collisions") {
    import spark.implicits._
    // 100 distinct keys, key k occurring k+1 times; width 512 over 100
    // keys per row makes collisions unlikely but NOT impossible — the
    // contract asserted unconditionally is est >= true
    val rows = (0 until 100).flatMap(k => Seq.fill(k + 1)(k.toLong)).toDF("k")
    val sk = Sketches.cmsSketch(rows, "k", depth = 4, width = 512)
    val probes = (0 until 100).map(_.toLong).toDF("k")
    val est = Sketches.cmsEstimate(sk, probes, "k", depth = 4, width = 512)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 100).foreach { k =>
      assert(est(k.toLong) >= k + 1, s"undercount at $k: ${est(k.toLong)}")
    }
    // the min-over-depth estimator should resolve nearly all keys
    // exactly at this load factor
    val exact = (0 until 100).count(k => est(k.toLong) == k + 1)
    assert(exact >= 95, s"only $exact/100 exact at 100 keys / 512 cells")
    // absent key: estimate is >= 0 and 0 unless all 4 rows collide
    val absent = Sketches.cmsEstimate(sk, Seq(100000L).toDF("k"), "k")
      .head().getLong(1)
    assert(absent >= 0)
  }

  test("CMS: batch merge equals the single-pass sketch cell for cell") {
    import spark.implicits._
    val all = (0L until 600L).map(v => (v, v % 37)).toDF("i", "k")
    val batches = (0 until 3).map(i =>
      Sketches.cmsSketch(all.filter(pmod(col("i"), lit(3)) === i), "k"))
    // cellwise-additive merge == one sketch over the union, exactly
    val merged = Sketches.cmsMerge(batches)
    val direct = Sketches.cmsSketch(all, "k")
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty,
      "merged CMS != direct CMS")
    // merge order never matters (cell addition is commutative)
    val rev = Sketches.cmsMerge(batches.reverse)
    assert(rev.exceptAll(direct).isEmpty && direct.exceptAll(rev).isEmpty)
  }

  test("histogram sketch: quantiles within one bin width, merge equals single pass, edges clamp") {
    import spark.implicits._
    // values 1..1000 over [0, 1000) x 100 bins -> width 10
    val all = (1 to 1000).map(v => (v.toLong, v.toDouble)).toDF("i", "v")
    val batches = (0 until 3).map(i =>
      Sketches.histogramSketch(all.filter(pmod(col("i"), lit(3)) === i),
        "v", 0.0, 1000.0, 100))
    val merged = Sketches.histogramMerge(batches)
    val direct = Sketches.histogramSketch(all, "v", 0.0, 1000.0, 100)
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty,
      "merged histogram != direct histogram")
    val est = Sketches.histogramQuantiles(merged, Seq(0.1, 0.5, 0.9), 0.0, 1000.0, 100)
      .collect().map(r => r.getDouble(0) -> r.getDouble(3)).toMap
    // true quantiles: 100, 500, 900; estimate = lower bin edge, so
    // |est - true| < bin width
    Seq(0.1 -> 100.0, 0.5 -> 500.0, 0.9 -> 900.0).foreach { case (q, t) =>
      assert(math.abs(est(q) - t) < 10.0, s"q=$q est=${est(q)} true=$t")
    }
    // out-of-range values clamp to edge bins, never vanish
    val wild = Seq(-5.0, 2000.0, 50.0).toDF("v")
    val sk = Sketches.histogramSketch(wild, "v", 0.0, 1000.0, 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sk(0L) == 1L && sk(99L) == 1L && sk(5L) == 1L)
    assert(sk.values.sum == 3L, "clamping must preserve total mass")
  }

  test("winsorize clamps to the sketch thresholds and flags direction") {
    import spark.implicits._
    // 1..100 with fine bins: p10/p90 thresholds are the exact bin
    // lower edges 10.0 and 90.0 (rank walk: ceil(0.1*100)=10 -> bin 10)
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val out = Sketches.winsorize(df, "v", 0.0, 100.0, 100, 0.1, 0.9)
      .collect().map(r => (r.getDouble(1), r.getDouble(2), r.getInt(3)))
    for ((v, w, c) <- out) {
      if (v < 10.0) { assert(w == 10.0 && c == -1, s"$v") }
      else if (v > 90.0) { assert(w == 90.0 && c == 1, s"$v") }
      else { assert(w == v && c == 0, s"$v") }
    }
    // mass check: exactly 9 low (1..9) and 10 high (91..100)
    assert(out.count(_._3 == -1) == 9)
    assert(out.count(_._3 == 1) == 10)
  }

  test("winsorize passes NULLs through unclamped and survives empty input") {
    import spark.implicits._
    val df = Seq(Some(5.0), None, Some(500.0)).toDF("v")
    val out = Sketches.winsorize(df, "v", 0.0, 100.0, 10, 0.2, 0.8)
      .collect()
    val nullRow = out.find(_.isNullAt(0)).get
    assert(nullRow.isNullAt(1) && nullRow.getInt(2) == 0)
    val empty = Sketches.winsorize(
      Seq.empty[Option[Double]].toDF("v"), "v", 0.0, 100.0, 10, 0.2, 0.8)
    assert(empty.columns.toSeq == Seq("v", "v_w", "_clamped"))
    assert(empty.count() == 0)
  }

  test("KMV sketch keeps the k smallest distinct values per group") {
    import spark.implicits._
    val df = Seq(
      ("a", 5L), ("a", 3L), ("a", 9L), ("a", 3L), ("a", 1L),
      ("b", 100L)).toDF("g", "v")
    val got = Sketches.kmvSketch(df, "g", "v", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 1L), ("a", 3L), ("a", 5L), ("b", 100L)))
  }

  test("KMV overlap: identical sets estimate 1.0, disjoint sets 0.0") {
    import spark.implicits._
    val same = (1L to 50L).flatMap(v => Seq(("x", v), ("y", v)))
    val disj = (1L to 50L).map(v => ("z", v + 1000L))
    val sk = Sketches.kmvSketch((same ++ disj).toDF("g", "v"), "g", "v", 16)
    val est = Sketches.kmvOverlap(sk, "g", "v", 16)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("jaccard_est_micro")).toMap
    assert(est(("x", "y")) == 1000000L)
    assert(est(("x", "z")) == 0L && est(("y", "z")) == 0L)
  }

  test("KMV overlap estimate equals the exact bottom-k computation on a half-overlap") {
    import spark.implicits._
    // A = 1..40, B = 21..60 → true J = 20/60; with k big enough to
    // hold everything the estimator is exact: m = |A∪B|, shared = |A∩B|
    val a = (1L to 40L).map(("a", _))
    val b = (21L to 60L).map(("b", _))
    val sk = Sketches.kmvSketch((a ++ b).toDF("g", "v"), "g", "v", 100)
    val r = Sketches.kmvOverlap(sk, "g", "v", 100).collect().head
    assert(r.getAs[Long]("m") == 60L)
    assert(r.getAs[Long]("shared") == 20L)
    assert(r.getAs[Long]("jaccard_est_micro") == 20L * 1000000 / 60)
  }

  test("cmsJoinCardinality: exact inner product without collisions, never undercounts") {
    import spark.implicits._
    // A: key k1 ×3, k2 ×2, k3 ×1; B: k1 ×2, k3 ×4, k9 ×5
    // |A ⋈ B| = 3·2 + 1·4 = 10
    val a = (Seq.fill(3)("k1") ++ Seq.fill(2)("k2") ++ Seq("k3")).toDF("k")
    val b = (Seq.fill(2)("k1") ++ Seq.fill(4)("k3") ++ Seq.fill(5)("k9")).toDF("k")
    // width 8192 with 4 keys: collisions are (astronomically) unlikely
    // in EVERY one of the 4 rows — the estimate is exact
    val wide = Sketches.cmsJoinCardinality(
      Sketches.cmsSketch(a, "k", depth = 4, width = 8192),
      Sketches.cmsSketch(b, "k", depth = 4, width = 8192))
      .collect().head.getLong(0)
    assert(wide == 10L)
    // width 1 forces every key into one cell: the estimate collapses
    // to ‖A‖₁·‖B‖₁ — the documented always-≥-truth degradation
    val tight = Sketches.cmsJoinCardinality(
      Sketches.cmsSketch(a, "k", depth = 4, width = 1),
      Sketches.cmsSketch(b, "k", depth = 4, width = 1))
      .collect().head.getLong(0)
    assert(tight == 6L * 11L)
    // disjoint key sets at full width: zero shared cells → estimate 0
    val disjoint = Sketches.cmsJoinCardinality(
      Sketches.cmsSketch(Seq("x").toDF("k"), "k", depth = 4, width = 8192),
      Sketches.cmsSketch(Seq("y").toDF("k"), "k", depth = 4, width = 8192))
      .collect().head.getLong(0)
    assert(disjoint == 0L)
  }
}
