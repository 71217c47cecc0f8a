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

  test("type error is reported at analysis, not runtime") {
    val docs = Tables.documents(spark, sfDir)
    val e = intercept[Exception] {
      docs.select(simhash64Native(col("doc_id"))).collect()
    }
    assert(e.getMessage.contains("simhash64_native") ||
      e.getMessage.toLowerCase.contains("type"))
  }
}
