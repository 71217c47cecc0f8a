package graft

import org.apache.spark.sql.functions._

import graft.expressions.SimHash64Expression.simhash64Native
import graft.functions.TextFunctions
import graft.sources.Tables

class SimHashExpressionSpec extends SparkSpec {

  test("codegen expression matches the HOF implementation on the corpus") {
    val docs = Tables.documents(spark, sfDir)
    val both = docs.select(
      col("doc_id"),
      TextFunctions.simHash64(col("text")).as("hof"),
      simhash64Native(col("text")).as("native"))
    val mismatches = both.filter(col("hof") =!= col("native")).count()
    assert(mismatches == 0, s"$mismatches docs disagree")
  }

  test("codegen expression edge cases: null, empty, whitespace-only") {
    import spark.implicits._
    val df = Seq(Some("hello world"), Some(""), Some("   "), None).toDF("t")
    val rows = df.select(simhash64Native(col("t")).as("sh")).collect()
    assert(rows(1).getLong(0) == 0L) // empty → no tokens → 0
    assert(rows(2).getLong(0) == 0L) // blank → 0
    assert(rows(3).isNullAt(0))      // null in → null out
  }

  test("expression participates in whole-stage codegen") {
    val docs = Tables.documents(spark, sfDir)
    val plan = docs.select(simhash64Native(col("text"))).queryExecution
      .executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [simhash64expression"),
      s"expression not in a codegen stage:\n$plan")
  }

  test("md5 codegen variant matches the HOF simHashMd5 on the corpus") {
    import graft.expressions.SimHashMd5Expression.simhashMd5Native
    val docs = Tables.documents(spark, sfDir)
    val both = docs.select(
      col("doc_id"),
      TextFunctions.simHashMd5(col("text")).as("hof"),
      simhashMd5Native(col("text")).as("native"))
    val mismatches = both.filter(col("hof") =!= col("native")).count()
    assert(mismatches == 0, s"$mismatches docs disagree")
    // 60-bit packing: always non-negative, below 2^60
    val range = docs.select(simhashMd5Native(col("text")).as("sh"))
      .filter(col("sh") < 0 || col("sh") >= (1L << 60)).count()
    assert(range == 0)
  }

  test("native and HOF agree on tab/newline-bounded and whitespace-only text") {
    import spark.implicits._
    import graft.expressions.SimHashMd5Expression.simhashMd5Native
    // trim (both engines) strips 0x20 only, so a \s+ split of
    // tab/newline-bounded text yields empty tokens — all three
    // formulations must agree to EXCLUDE them from the vote
    val df = Seq(
      Some("\thello world"), Some("hello world\n"), Some("\nhello\tworld\t"),
      Some("\t"), Some("\t\n \t"), Some("   "), Some(""), None).toDF("t")
    val rows = df.select(
      TextFunctions.simHash64(col("t")).as("hof64"),
      simhash64Native(col("t")).as("nat64"),
      TextFunctions.simHashMd5(col("t")).as("hofMd5"),
      simhashMd5Native(col("t")).as("natMd5")).collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.isNullAt(0) == r.isNullAt(1) &&
        (r.isNullAt(0) || r.getLong(0) == r.getLong(1)),
        s"row $i: 64-bit hof=${r.get(0)} native=${r.get(1)}")
      assert(r.isNullAt(2) == r.isNullAt(3) &&
        (r.isNullAt(2) || r.getLong(2) == r.getLong(3)),
        s"row $i: md5 hof=${r.get(2)} native=${r.get(3)}")
    }
    // tab-bounded text must hash like its clean twin (empty tokens ignored)
    val clean = Seq("hello world").toDF("t")
      .select(simhash64Native(col("t"))).collect().head.getLong(0)
    assert(rows(0).getLong(1) == clean && rows(1).getLong(1) == clean)
    // whitespace-only → zero tokens → 0, and NULL stays NULL, in all four
    Seq(3, 4, 5, 6).foreach(i => assert(rows(i).getLong(0) == 0L && rows(i).getLong(2) == 0L))
    assert(rows(7).isNullAt(0) && rows(7).isNullAt(2))
  }

  test("type error is reported at analysis, not runtime") {
    val docs = Tables.documents(spark, sfDir)
    val e = intercept[Exception] {
      docs.select(simhash64Native(col("doc_id"))).collect()
    }
    assert(e.getMessage.contains("simhash64_native") ||
      e.getMessage.toLowerCase.contains("type"))
  }
}
