package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.DateTimeFunctions
import graft.operators.SchemaEnforce
import graft.schema.Occurrence

/** Property tests (SURVEY.md §5.4): the rescue normalizer and schema
  * enforcement. Uses scalacheck generators with a fixed seed and evaluates
  * every sample through one Catalyst plan per property (batched — the
  * production code path, not a Scala reimplementation).
  */
class DateFunctionsPropertySpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int): Seq[T] = {
    val params = Gen.Parameters.default
    (0 until n).flatMap(i => g.apply(params, Seed(42L + i)))
  }

  /** Run rescueEventDate over a batch of inputs in one plan. */
  private def rescueAll(values: Seq[String]): Seq[String] = {
    val rows = values.map(v => org.apache.spark.sql.Row(v))
    val df = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava,
      StructType(Seq(StructField("eventDate", StringType))))
    df.select(DateTimeFunctions.rescueEventDate(col("eventDate")))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
  }

  test("property: year-only strings always rescue to YYYY-01-01") {
    val years = samples(Gen.choose(1000, 2999), 100)
    val out = rescueAll(years.map(_.toString))
    years.zip(out).foreach { case (y, got) => assert(got == s"$y-01-01") }
  }

  test("property: YYYY-MM rescues to YYYY-MM-01") {
    val ym = samples(Gen.zip(Gen.choose(1000, 2999), Gen.choose(1, 12)), 100)
    val inputs = ym.map { case (y, m) => f"$y-$m%02d" }
    val out = rescueAll(inputs)
    inputs.zip(out).foreach { case (in, got) => assert(got == s"$in-01") }
  }

  test("property: ranges take the start, then re-normalize") {
    val years = samples(Gen.choose(1900, 2100), 100)
    val dateRanges = years.map(y => s"$y-06-02/$y-06-05")
    val yearRanges = years.map(y => s"$y/${y + 1}")
    val out1 = rescueAll(dateRanges)
    years.zip(out1).foreach { case (y, got) => assert(got == s"$y-06-02") }
    val out2 = rescueAll(yearRanges)
    years.zip(out2).foreach { case (y, got) => assert(got == s"$y-01-01") }
  }

  test("property: full ISO dates pass through unchanged") {
    val ymd = samples(
      Gen.zip(Gen.choose(1900, 2100), Gen.choose(1, 12), Gen.choose(1, 28)), 100)
    val inputs = ymd.map { case (y, m, d) => f"$y-$m%02d-$d%02d" }
    val out = rescueAll(inputs)
    inputs.zip(out).foreach { case (in, got) => assert(got == in) }
  }

  test("null-ish tokens pass through for the parser to reject") {
    val tokens = Seq("none", "None", "NaN", "nat", "")
    val out = rescueAll(tokens)
    tokens.zip(out).foreach { case (t, got) => assert(got == t.trim) }
    assert(rescueAll(Seq(null)).head == null)
  }

  test("property: enforceSchema always emits exactly finalColumns in order") {
    val subsets = samples(Gen.someOf(Occurrence.finalColumns), 25).filter(_.nonEmpty)
    subsets.foreach { subset =>
      val fields = subset.map(c => StructField(c, StringType)).toSeq
      val row = org.apache.spark.sql.Row.fromSeq(fields.map(_ => null))
      val df = spark.createDataFrame(java.util.List.of(row), StructType(fields))
      val out = SchemaEnforce.enforceSchema(df)
      assert(out.columns.toSeq == Occurrence.finalColumns)
      assert(out.schema == Occurrence.schema)
    }
  }
}
