package graft

import org.apache.spark.sql.functions._

import graft.operators.{Drift, Privacy}

class DriftPrivacySpec extends SparkSpec {
  import spark.implicits._

  test("categorical drift: hand-computed terms, vanished and new categories") {
    val before = (Seq.fill(60)("a") ++ Seq.fill(30)("b") ++ Seq.fill(10)("gone"))
      .toDF("cat")
    val after = (Seq.fill(30)("a") ++ Seq.fill(15)("b") ++ Seq.fill(5)("fresh"))
      .toDF("cat")
    val rows = Drift.categoricalDrift(before, after, "cat").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double]), r.getBoolean(5))).toMap
    // totals: before 100, after 50 -> expectation scales by 0.5
    assert(rows("a") == ((60L, 30L, Some(30.0), Some(0.0), false)))
    assert(rows("b") == ((30L, 15L, Some(15.0), Some(0.0), false)))
    // vanished: (0 - 5)^2 / 5 = 5
    assert(rows("gone") == ((10L, 0L, Some(5.0), Some(5.0), false)))
    // new: no expectation, flagged
    assert(rows("fresh")._1 == 0L && rows("fresh")._2 == 5L)
    assert(rows("fresh")._3.isEmpty && rows("fresh")._4.isEmpty && rows("fresh")._5)
  }

  test("categorical drift: identical distributions have zero total chi2") {
    val d = (Seq.fill(40)("x") ++ Seq.fill(60)("y")).toDF("cat")
    val total = Drift.categoricalDrift(d, d, "cat")
      .agg(sum("chi2_term")).head().getDouble(0)
    assert(total == 0.0)
  }

  test("pseudonymize: consistent, null-preserving, cardinality-preserving, join-safe") {
    val df = Seq(Some("u1"), Some("u2"), Some("u1"), None).toDF("id")
      .withColumn("other", lit("keep"))
    val tok = Privacy.pseudonymize(df, Seq("id"), "salt")
    assert(tok.columns.toSeq == Seq("id", "other"), "column order must survive")
    val vals = tok.select("id").collect().map(r => Option(r.getString(0)))
    assert(vals.count(_.isEmpty) == 1, "NULL must stay NULL")
    // same value -> same token; distinct values -> distinct tokens
    val nonNull = vals.flatten
    assert(nonNull.toSet.size == 2)
    assert(nonNull.forall(_.length == 16))
    // a different salt severs linkage
    val tok2 = Privacy.pseudonymize(df, Seq("id"), "other-salt")
      .select("id").collect().flatMap(r => Option(r.getString(0)))
    assert(tok2.toSet.intersect(nonNull.toSet).isEmpty)
    // join semantics survive tokenization with a shared salt
    val left = Seq("u1", "u2", "u3").toDF("k")
    val right = Seq("u1", "u1", "u3").toDF("k")
    val rawJoin = left.join(right, "k").count()
    val tokJoin = Privacy.pseudonymize(left, Seq("k"), "s")
      .join(Privacy.pseudonymize(right, Seq("k"), "s"), "k").count()
    assert(tokJoin == rawJoin)
  }

  test("pseudonymize rejects absent columns") {
    intercept[IllegalArgumentException] {
      Privacy.pseudonymize(Seq("a").toDF("x"), Seq("nope"), "s")
    }
  }

  test("kAnonymize: finest qualifying level per row, suppression at -1") {
    // cat group A: 5 rows in bucket 0 at level 0 (values 0..49, /100)
    //   -> all qualify at level 0
    // cat group B: values 0,100,200,300,400 -> singleton buckets at
    //   level 0, one bucket of 5 at level 1 (/1000)
    // cat group C: 1 row -> unique even at the coarsest level: suppressed
    val rows =
      (1L to 5L).map(i => (i, "A", (i * 10 - 10).toDouble)) ++
      (6L to 10L).map(i => (i, "B", ((i - 6) * 100).toDouble)) ++
      Seq((11L, "C", 42.0))
    val df = rows.toDF("id", "cat", "v")
    val got = Privacy.kAnonymize(df, "id", Seq("cat"), "v",
        Seq(100L, 1000L, 10000L), k = 5)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    (1L to 5L).foreach(i => assert(got(i) == ((0, Some(0L))), s"row $i"))
    (6L to 10L).foreach(i => assert(got(i) == ((1, Some(0L))), s"row $i"))
    assert(got(11L) == ((-1, None)))
  }

  test("kAnonymize: negative values floor toward -inf, ladder validated") {
    val df = ((1L to 4L).map(i => (i, "A", -50.0)) ++
      (5L to 8L).map(i => (i, "A", 50.0))).toDF("id", "cat", "v")
    // level 0 buckets: -1 (4 rows) and 0 (4 rows) -> neither reaches 5;
    // level 1 (/1000): all 8 in bucket -1? no: floor(-50/1000) = -1,
    // floor(50/1000) = 0 -> still split 4/4; level 2 (/10000): same
    // split -> ALL suppressed with k=5
    val got = Privacy.kAnonymize(df, "id", Seq("cat"), "v",
        Seq(100L, 1000L, 10000L), k = 5)
      .collect().map(r => r.getInt(1))
    assert(got.forall(_ == -1))
    // with k=4 everyone qualifies at level 0
    val g4 = Privacy.kAnonymize(df, "id", Seq("cat"), "v",
        Seq(100L, 1000L, 10000L), k = 4)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    assert(g4 == Set((0, -1L), (0, 0L)))
    intercept[IllegalArgumentException] {
      Privacy.kAnonymize(df, "id", Seq("cat"), "v", Seq(1000L, 100L), 5)
    }
  }

  test("tClosenessAudit: hand-computed TVD, absent-value complement, verdicts") {
    // global: 4×A, 4×B (N=8). g1 = 3A+1B, g2 = 1A+3B (mirror skews),
    // g3 would break N — instead fold the absent-value case into g3:
    // 2A+0B, whose B term comes entirely from the complement identity.
    val rows =
      Seq(("g1", "A"), ("g1", "A"), ("g1", "A"), ("g1", "B"),
        ("g2", "A"), ("g2", "B"), ("g2", "B"), ("g2", "B"),
        ("g3", "A"), ("g3", "A"),
        ("g4", "B"), ("g4", "B"))
    // recompute global: A = 3+1+2 = 6, B = 1+3+2 = 6, N = 12
    val df = rows.toDF("g", "v")
    val got = Privacy.tClosenessAudit(df, Seq(col("g")), Seq("g"), "v",
        tScaled = 200000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getInt(3)))).toMap
    def tvd(cells: Map[String, Long]): Long = {
      val global = Map("A" -> 6L, "B" -> 6L); val n = 12L
      val ng = cells.values.sum
      val num = global.keys.map(v =>
        math.abs(cells.getOrElse(v, 0L) * n - global(v) * ng)).sum
      num * 1000000L / (2L * ng * n)
    }
    // g1: |3·12−6·4| + |1·12−6·4| = 12+12 = 24 → 24M/96 = 250000
    assert(got("g1") == ((4L, 250000L, 0)))
    assert(got("g2") == ((4L, 250000L, 0)))
    // g3: all-A, B absent: |2·12−6·2|+|0−6·2| = 12+12 → 24M/48 = 500000
    assert(got("g3") == ((2L, 500000L, 0)))
    assert(got("g4") == ((2L, 500000L, 0)))
    assert(got.values.forall { case (_, t, v) => (t <= 200000L) == (v == 1) })
    // a perfectly representative group scores zero and passes any t
    val even = Seq(("e1", "A"), ("e1", "B"), ("e2", "A"), ("e2", "B"))
      .toDF("g", "v")
    val z = Privacy.tClosenessAudit(even, Seq(col("g")), Seq("g"), "v", 0L)
      .collect().map(r => (r.getLong(2), r.getInt(3))).toSet
    assert(z == Set((0L, 1)))
  }
}
