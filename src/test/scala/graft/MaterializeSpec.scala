package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Materialize
import graft.operators.Materialize.MvSpec

class MaterializeSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("mv_spec").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/mv"
  }

  private val spec = MvSpec(
    keys = Seq("k"),
    sums = Seq("v" -> "sum_v"),
    mins = Seq("t" -> "min_t"),
    maxs = Seq("t" -> "max_t"),
    countAs = "n")

  private def ts(i: Int) = new Timestamp(1700000000000L + i * 1000L)

  private def rows(ids: Range) =
    ids.map(i => (i % 5L, i * 1.25, ts(i))).toDF("k", "v", "t")

  private def snapshot(path: String): Map[Long, (Long, BigDecimal, Timestamp, Timestamp)] =
    Materialize.read(spark, path).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), BigDecimal(r.getDecimal(2)),
        r.getTimestamp(3), r.getTimestamp(4))).toMap

  test("incremental merges equal a one-shot full aggregate") {
    val path = tmp()
    Materialize.init(rows(0 until 40), path, spec)
    Materialize.applyDelta(spark, path, rows(40 until 90), spec)
    Materialize.applyDelta(spark, path, rows(90 until 130), spec)
    val full = Materialize.partials(rows(0 until 130), spec).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), BigDecimal(r.getDecimal(2)),
        r.getTimestamp(3), r.getTimestamp(4))).toMap
    assert(snapshot(path) == full)
  }

  test("delta with new and disjoint keys lands correctly") {
    val path = tmp()
    Materialize.init(Seq((1L, 2.0, ts(0))).toDF("k", "v", "t"), path, spec)
    Materialize.applyDelta(spark, path,
      Seq((1L, 3.0, ts(5)), (9L, 7.5, ts(2))).toDF("k", "v", "t"), spec)
    val got = snapshot(path)
    assert(got(1L)._1 == 2L && got(1L)._2 == BigDecimal("5.000000"))
    assert(got(1L)._3 == ts(0) && got(1L)._4 == ts(5))
    assert(got(9L) == ((1L, BigDecimal("7.500000"), ts(2), ts(2))))
  }

  test("view schema is stable across merges and history stays pinned") {
    val path = tmp()
    Materialize.init(rows(0 until 20), path, spec)
    val s1 = Materialize.read(spark, path).schema
    Materialize.applyDelta(spark, path, rows(20 until 50), spec)
    Materialize.applyDelta(spark, path, rows(50 until 60), spec)
    assert(Materialize.read(spark, path).schema == s1)
    // v1 is still the view over just the first batch
    val v1 = Materialize.read(spark, path, Some(1)).agg(sum("n")).head.getLong(0)
    assert(v1 == 20L)
    val v3 = Materialize.read(spark, path).agg(sum("n")).head.getLong(0)
    assert(v3 == 60L)
  }

  test("merge plan never references the base table") {
    val current = rows(0 until 30)
    val partials = Materialize.partials(current, spec)
    val merged = Materialize.merge(partials, Materialize.partials(
      rows(30 until 40), spec), spec)
    // group-bounded output with the declared schema
    assert(merged.columns.toSeq == Seq("k", "n", "sum_v", "min_t", "max_t"))
    assert(merged.count() == 5)
  }

  test("retraction: deletes cancel inserts exactly, zero-count keys vanish") {
    import spark.implicits._
    val spec = Materialize.MvSpec(keys = Seq("k"),
      sums = Seq("v" -> "sum_v"), countAs = "n")
    // batch 1: k=a {1.5, 2.5}, k=b {10.0}; delta: insert a 4.0,
    // delete a 1.5, delete b 10.0 (b fully retracted)
    val b1 = Seq(("a", 1.5, 1), ("a", 2.5, 1), ("b", 10.0, 1))
      .toDF("k", "v", "op")
    val d2 = Seq(("a", 4.0, 1), ("a", 1.5, -1), ("b", 10.0, -1))
      .toDF("k", "v", "op")
    val view = Materialize.mergeRetract(
      Materialize.retractPartials(b1, "op", spec),
      Materialize.retractPartials(d2, "op", spec), spec)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDecimal(2).doubleValue))).toMap
    assert(view == Map("a" -> ((2L, 6.5))))
    // min/max specs are rejected, not silently wrong
    intercept[IllegalArgumentException] {
      Materialize.retractPartials(b1, "op",
        Materialize.MvSpec(Seq("k"), mins = Seq("v" -> "min_v")))
    }
  }
}
