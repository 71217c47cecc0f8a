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

  test("profile plans ONE scan of the input") {
    val out = Profiling.profileColumns(fixture, Seq("k", "v", "s"))
    val scans = out.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      case s if s.nodeName.contains("Relation") => s
    }
    assert(scans.size == 1, s"expected one scan, got ${scans.size}")
  }
}
