package graft

import org.apache.spark.sql.functions._

import graft.operators.Diff

class DiffSpec extends SparkSpec {

  test("snapshotDiff classifies inserts, deletes, updates; drops unchanged") {
    import spark.implicits._
    val before = Seq(
      (1L, Some("a"), 10), (2L, Some("b"), 20), (3L, Some("c"), 30),
      (4L, None: Option[String], 40))
      .toDF("k", "s", "v")
    val after = Seq(
      (1L, Some("a"), 10),                 // unchanged -> absent
      (2L, Some("B"), 20),                 // update
      (4L, Some(""), 40),                  // NULL -> empty string IS a change
      (5L, Some("e"), 50))                 // insert; 3 deleted
      .toDF("k", "s", "v")
    val got = Diff.snapshotDiff(before, after, Seq("k"), Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "update", 3L -> "delete",
      4L -> "update", 5L -> "insert"))
  }

  test("snapshotDiff rejects duplicate keys instead of guessing") {
    import spark.implicits._
    val dup = Seq((1L, "a"), (1L, "b")).toDF("k", "s")
    val clean = Seq((1L, "a")).toDF("k", "s")
    // the guard rides the diff's own job (no separate pass), so it
    // surfaces as a runtime error from the action, not an eager require
    val e = intercept[Exception] {
      Diff.snapshotDiff(dup, clean, Seq("k"), Seq("s")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("duplicate key")),
      s"unexpected failure: $e")
    // and a duplicate whose rows are IDENTICAL still trips it
    val dupSame = Seq((1L, "a"), (1L, "a")).toDF("k", "s")
    val e2 = intercept[Exception] {
      Diff.snapshotDiff(dupSame, clean, Seq("k"), Seq("s")).collect()
    }
    assert(messages(e2).exists(_.contains("duplicate key")))
  }

  test("weighted sample is monotone in weight and hash-stable") {
    import spark.implicits._
    import graft.operators.Sampling
    val rows = (0L until 1000L).map(i => (i, 0.3)).toDF("id", "w")
    val kept3 = Sampling.weightedHashSample(rows, "id", "w")
      .collect().map(_.getLong(0)).toSet
    val kept7 = Sampling.weightedHashSample(
        rows.withColumn("w", lit(0.7)), "id", "w")
      .collect().map(_.getLong(0)).toSet
    assert(kept3.subsetOf(kept7), "raising every weight must only add rows")
    assert(kept3.size > 200 && kept3.size < 400, s"~30% expected, got ${kept3.size}")
    // clamping: w <= 0 keeps nothing, w >= 1 keeps everything
    assert(Sampling.weightedHashSample(
      rows.withColumn("w", lit(-1.0)), "id", "w").count() == 0)
    assert(Sampling.weightedHashSample(
      rows.withColumn("w", lit(5.0)), "id", "w").count() == 1000)
    // membership decided per row: appending rows never changes it
    val appended = rows.unionByName(
      (2000L until 2100L).map(i => (i, 0.3)).toDF("id", "w"))
    val keptAppended = Sampling.weightedHashSample(appended, "id", "w")
      .filter(col("id") < 1000).collect().map(_.getLong(0)).toSet
    assert(keptAppended == kept3)
  }

  test("applyChanges: last-wins, resurrect, insert, delete, passthrough") {
    import spark.implicits._
    val base = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "s", "v")
    val changes = Seq(
      (1L, 1L, "U", "a1", 11.0),  // then superseded:
      (1L, 2L, "U", "a2", 12.0),  //   last wins
      (2L, 1L, "D", "", 0.0),     // delete
      (3L, 1L, "D", "", 0.0),     // delete then
      (3L, 2L, "U", "c2", 33.0),  //   resurrect
      (9L, 1L, "I", "new", 99.0), // insert (absent key)
      (8L, 1L, "D", "", 0.0))     // delete of an absent key: no-op
      .toDF("k", "seq", "op", "s", "v")
    val got = Diff.applyChanges(base, changes, Seq("k"), "seq", "op",
        Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap
    assert(got == Map(
      1L -> ("a2", 12.0),  // last update
      3L -> ("c2", 33.0),  // resurrected
      4L -> ("d", 40.0),   // untouched passthrough
      9L -> ("new", 99.0)))
  }

  test("applyChanges is idempotent and rejects ambiguous sequence numbers") {
    import spark.implicits._
    val base = Seq((1L, 5.0)).toDF("k", "v")
    val feed = Seq((1L, 1L, "U", 6.0), (2L, 1L, "I", 7.0))
      .toDF("k", "seq", "op", "v")
    val once = Diff.applyChanges(base, feed, Seq("k"), "seq", "op", Seq("v"))
    val twice = Diff.applyChanges(once, feed, Seq("k"), "seq", "op", Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(twice == Map(1L -> 6.0, 2L -> 7.0), "replay must converge")
    val dup = Seq((1L, 1L, "U", 6.0), (1L, 1L, "D", 0.0))
      .toDF("k", "seq", "op", "v")
    val e = intercept[Exception] {
      Diff.applyChanges(base, dup, Seq("k"), "seq", "op", Seq("v")).collect()
    }
    assert(e.getMessage.contains("duplicate sequence number") ||
      Option(e.getCause).exists(_.getMessage.contains("duplicate sequence number")))
  }
}
