package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CanonicalizeSpec extends SparkSpec {

  private def one(text: String): String = {
    import spark.implicits._
    Seq(text).toDF("t")
      .select(graft.functions.TextFunctions.canonicalizeText(col("t")))
      .collect()(0).getString(0)
  }

  test("canonicalizeText: NFC-composes, folds NBSP, strips zero-widths, collapses space") {
    assert(one("Cafe\u0301") == "Caf\u00E9")          // decomposed -> composed
    assert(one("a\u00A0b") == "a b")                  // NBSP -> space
    assert(one("x\u200By\u200Cz\uFEFF\u00ADw") == "xyzw") // invisibles stripped
    assert(one("  a \t b\n\nc  ") == "a b c")          // whitespace collapse
    // composed chain: all rules in one string
    assert(one(" Cafe\u0301\u00A0x\u200Bend ") == "Caf\u00E9 xend")
  }

  test("nfcNormalize: ASCII short-circuits to the identical reference") {
    import spark.implicits._
    val s = "plain ascii stays untouched 123"
    assert(one(s) == s)
  }

  test("nfcNormalize: interpreted eval and codegen agree") {
    import graft.expressions.NfcNormalizeExpression
    import org.apache.spark.unsafe.types.UTF8String
    val decomposed = UTF8String.fromString("A\u030A")   // A + combining ring
    assert(NfcNormalizeExpression.compute(decomposed).toString == "\u00C5")
    // through a full plan (codegen path)
    assert(one("A\u030A") == "\u00C5")
  }

  test("lDiversityAudit: homogeneous group flagged, diverse group passes") {
    import graft.operators.Privacy
    val rows = Seq(
      // group (1): three distinct sensitive values → diverse at l=3
      Row(1L, "a"), Row(1L, "b"), Row(1L, "c"),
      // group (2): size 4 but one sensitive value → leak
      Row(2L, "x"), Row(2L, "x"), Row(2L, "x"), Row(2L, "x"))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows.toList).asJava),
      StructType(Seq(StructField("g", LongType), StructField("s", StringType))))
    val out = Privacy.lDiversityAudit(df, Seq(col("g")), Seq("g"), "s", l = 3)
      .orderBy("g").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(out.toSeq == Seq((1L, 3L, 3L, 1), (2L, 4L, 1L, 0)))
  }

  test("session_window boundary: exactly-at-gap events MERGE; one past splits") {
    // Pins the q181 oracle's strict > boundary: Spark merges sessions
    // that touch (next.start = prev.end), so an event at prev + gap
    // stays in the session and only prev + gap + ε starts a new one.
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def plusMs(ms: Long) = new java.sql.Timestamp(t0.getTime + ms)
    val gapMs = 30L * 60000
    val df = Seq(
      (1L, t0), (1L, plusMs(gapMs)),              // touch → merge
      (2L, t0), (2L, plusMs(gapMs + 1)))          // 1 ms past → split
      .toDF("user_id", "ts")
    val counts = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("user_id"), col("session_window.start"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(counts.toSeq == Seq((1L, 2L), (2L, 1L), (2L, 1L)))
  }
}
