package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.Profiling

class ProfilingSpec extends SparkSpec {

  private val fixture = {
    val rows = List(
      Row(1L, 2.5, "b", null),
      Row(2L, null, "a", "xx"),
      Row(2L, -1.0, null, "y"),
      Row(5L, 2.5, "ab", "y"))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(
        StructField("k", LongType), StructField("v", DoubleType),
        StructField("s", StringType), StructField("t", StringType))))
  }

  test("profile: exact counts, nulls, distincts, typed bounds per column") {
    val out = Profiling.profileColumns(fixture, Seq("k", "v", "s", "t"))
      .collect().map(r => r.getString(0) -> r).toMap
    val k = out("k")
    assert(k.getLong(1) == 4 && k.getLong(2) == 0 && k.getLong(3) == 3)
    assert(k.getDouble(4) == 1.0 && k.getDouble(5) == 5.0)
    assert(k.isNullAt(6) && k.isNullAt(8))
    val v = out("v")
    assert(v.getLong(2) == 1 && v.getLong(3) == 2) // null excluded from distinct
    assert(v.getDouble(4) == -1.0 && v.getDouble(5) == 2.5)
    val s = out("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 3)
    assert(s.getString(6) == "a" && s.getString(7) == "b") // binary collation
    assert(s.getInt(8) == 1 && s.getInt(9) == 2)
    assert(s.isNullAt(4) && s.isNullAt(5))
    val t = out("t")
    assert(t.getLong(2) == 1 && t.getLong(3) == 2)
    assert(t.getString(6) == "xx" && t.getString(7) == "y")
  }

  test("profile plans one COLUMN-PRUNED scan per column, no Expand") {
    // the wide single-aggregate formulation plans multi-distinct via
    // Expand (×(cols+1) row blowup + a dedup shuffle keyed on every
    // profiled value) — this formulation must never reintroduce it,
    // and each branch's parquet scan must read only its own column
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    val out = Profiling.profileColumns(li, Seq("l_orderkey", "l_returnflag"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"Expand in profile plan:\n$plan")
    val reads = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(reads.size == 2 && reads.forall(!_.contains(",")),
      s"scans are not single-column pruned: $reads")
  }

  test("giniImpurity: exact impurity across the shape spectrum, nulls as a class") {
    import spark.implicits._
    val df = Seq(
      (Option("a"), "k", 1), (Option("a"), "k", 2),
      (Option("a"), "k", 3), (Option("b"), "k", 4))
      .toDF("skew", "const", "uniq")
      .withColumn("holey",
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("uniq") <= 2,
          org.apache.spark.sql.functions.col("skew")))
    val got = graft.operators.Profiling
      .giniImpurity(df, "t", Seq("skew", "const", "uniq", "holey"))
      .collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // skew 3a/1b: (16−(9+1))·10⁶/16 = 375000
    assert(got("skew") == ((4L, 2L, 375000L)))
    // constant: impurity 0
    assert(got("const") == ((4L, 1L, 0L)))
    // all distinct: (16−4)·10⁶/16 = 750000
    assert(got("uniq") == ((4L, 4L, 750000L)))
    // 2×a + 2×NULL: nulls are a value class → (16−8)·10⁶/16 = 500000
    assert(got("holey") == ((4L, 2L, 500000L)))
  }

  test("benfordAudit: powers of 2 are near-Benford, absent digits emit zero rows") {
    import spark.implicits._
    // 2^0..2^62 (the audited domain tops out below 2⁶³): the
    // canonical Benford-conforming sequence — every
    // digit’s observed share lands within ~2.5% of the law
    val pows = (0 until 63).map(i => math.pow(2.0, i)).toDF("v")
    val got = graft.operators.Profiling.benfordAudit(pows, "v")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(4)))).toMap
    assert(got.keySet == (1 to 9).toSet)
    assert(got.values.map(_._1).sum == 63L)
    got.foreach { case (d, (_, dev)) =>
      assert(dev <= 35000L, s"digit $d deviates $dev ppm from Benford")
    }
    // all-same-digit data: digit 7 over-represented, the rest at
    // n_obs 0 with dev = the full expected share; sub-1 values drop
    val sevens = Seq(7.0, 70.5, 0.3, 700.0).toDF("v")
    val g7 = graft.operators.Profiling.benfordAudit(sevens, "v")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(g7(7) == ((3L, 1000000L)))
    assert(g7(1) == ((0L, 0L)))
  }
}
