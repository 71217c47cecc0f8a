package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Frequency

class FrequencySpec extends SparkSpec {

  private def docs(texts: String*) = {
    val rows = texts.map(t => Row(t)).toList
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(StructField("text", StringType))))
  }

  /** Naive exact reference: full groupBy count + threshold. */
  private def naive(df: org.apache.spark.sql.DataFrame, tau: Double): Seq[(String, Long)] = {
    val toks = df.select(explode(
      graft.functions.TextFunctions.nonEmptyTokens(lower(col("text")))).as("term"))
    val n = toks.count()
    val threshold = math.ceil(tau * n).toLong
    toks.groupBy("term").agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") >= threshold)
      .orderBy(col("n_occurrences").desc, col("term"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  test("exact heavy hitters match the naive exact query (ample counters)") {
    val df = docs(
      "a a a a b b b c c d",
      "a a b b c e f g h i",
      "a b c d e f g h i j")
    // N=30; tau=0.2 → threshold 6: a(7), b(6) qualify; c(5) does not
    val got = Frequency.exactHeavyHitters(df, "text", tau = 0.2, k = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 7L), ("b", 6L)))
    assert(got == naive(df, 0.2))
  }

  test("tiny counter table (forced Misra-Gries decrements) is still exact") {
    // vocabulary 12 >> k=3 — every partition's sketch decrements
    // constantly; the −D candidate slack plus the exact verification
    // pass must still reproduce the naive answer bit-for-bit.
    val body = (1 to 12).flatMap(i => Seq.fill(i)(s"w$i")).mkString(" ")
    val df = docs(body, body, "w12 w12 w12 w11 w11 w10")
    for (tau <- Seq(0.05, 0.1, 0.12)) {
      val got = Frequency.exactHeavyHitters(df, "text", tau = tau, k = 3)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == naive(df, tau), s"tau=$tau")
    }
  }

  test("no qualifying terms and empty corpus both yield empty output") {
    val spread = docs((1 to 50).map(i => s"u$i").mkString(" "))
    assert(Frequency.exactHeavyHitters(spread, "text", tau = 0.5, k = 8).count() == 0)
    val empty = docs()
    val out = Frequency.exactHeavyHitters(empty, "text", tau = 0.1, k = 8)
    assert(out.count() == 0)
    assert(out.schema.fieldNames.toSeq == Seq("term", "n_occurrences"))
  }
}
