package graft

import org.apache.spark.sql.functions._

import graft.expressions.MinHashSignatureExpression.minhashSignatureNative
import graft.functions.TextFunctions
import graft.operators.Dedup
import graft.sources.Tables

class MinHashExpressionSpec extends SparkSpec {

  test("codegen minhash signature matches the HOF implementation") {
    val sh = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        array_distinct(TextFunctions.charNGrams(col("text"), 7)).as("sh"))
    val both = sh.select(col("doc_id"),
      Dedup.minHashSignature(col("sh"), 32).as("hof"),
      minhashSignatureNative(col("sh"), 32).as("native"))
    val mismatches = both.filter(col("hof") =!= col("native")).count()
    assert(mismatches == 0, s"$mismatches signatures disagree")
  }

  test("codegen band keys match the HOF lshBandKeys") {
    import graft.expressions.BandKeysExpression.bandKeysNative
    val sig = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        minhashSignatureNative(
          array_distinct(TextFunctions.charNGrams(col("text"), 7)), 32).as("sig"))
    val both = sig.select(col("doc_id"),
      Dedup.lshBandKeys(col("sig"), 8, 4).as("hof"),
      bandKeysNative(col("sig"), 8, 4).as("native"))
    val mismatches = both.filter(col("hof") =!= col("native")).count()
    assert(mismatches == 0, s"$mismatches band-key arrays disagree")
  }

  test("empty shingle set yields all-MaxValue slots (no elements to min over)") {
    import spark.implicits._
    val df = Seq(Seq.empty[String], Seq("abcdefg")).toDF("sh")
    val rows = df.select(minhashSignatureNative(col("sh"), 4).as("sig")).collect()
    assert(rows(0).getSeq[Long](0).forall(_ == Long.MaxValue))
    assert(rows(1).getSeq[Long](0).forall(_ != Long.MaxValue))
  }
}
