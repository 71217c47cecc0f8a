package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.expressions.DotProductExpression.dotProduct

/** The [[graft.expressions.DotProductExpression]] parity contract: the
  * native loop must compute exactly what the pre-r6 higher-order
  * formulation `aggregate(zip_with(a, b, double(x)*double(y)), 0.0,
  * acc+v)` computed — including its null-poisoning edge cases, which
  * the oracle queries never exercise (their vectors are dense and
  * equal-length).
  */
class DotProductExpressionSpec extends SparkSpec {

  /** The historical HOF formulation, kept verbatim as the reference. */
  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  test("native dot matches the HOF fold bit-for-bit on real embeddings") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val self = emb.select(
        dotProduct(col("embedding"), col("embedding")).as("n"),
        hofDot(col("embedding"), col("embedding")).as("h"))
      .filter(col("n") =!= col("h")) // bit-inequality: exact comparison
    assert(self.count() == 0, "native and HOF dots disagree on some vector")
    // and across DISTINCT vector pairs (different magnitudes interact)
    val a = emb.limit(20).select(col("embedding").as("_a"))
    val b = emb.limit(20).select(col("embedding").as("_b"))
    val cross = a.crossJoin(b).select(
        dotProduct(col("_a"), col("_b")).as("n"),
        hofDot(col("_a"), col("_b")).as("h"))
      .filter(col("n") =!= col("h"))
    assert(cross.count() == 0, "native and HOF dots disagree on some pair")
  }

  test("null semantics: null array, null element, length mismatch, empty arrays") {
    import spark.implicits._
    val df = Seq(
      // (label, a, b)
      ("null_array",   null.asInstanceOf[Seq[java.lang.Float]], Seq[java.lang.Float](1.0f)),
      ("null_element", Seq[java.lang.Float](1.0f, null),        Seq[java.lang.Float](1.0f, 2.0f)),
      ("len_mismatch", Seq[java.lang.Float](1.0f, 2.0f),        Seq[java.lang.Float](1.0f)),
      ("one_empty",    Seq[java.lang.Float](),                  Seq[java.lang.Float](1.0f)),
      ("both_empty",   Seq[java.lang.Float](),                  Seq[java.lang.Float]()),
      ("dense",        Seq[java.lang.Float](1.5f, -2.0f),       Seq[java.lang.Float](2.0f, 0.5f)))
      .toDF("label", "a", "b")
    val out = df.select(col("label"),
        dotProduct(col("a"), col("b")).as("n"),
        hofDot(col("a"), col("b")).as("h"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)),
         if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // native == HOF on every edge, and the absolute expectations hold
    out.foreach { case (label, (n, h)) =>
      assert(n == h, s"$label: native $n != HOF $h")
    }
    assert(out("null_array")._1.isEmpty)
    assert(out("null_element")._1.isEmpty)
    assert(out("len_mismatch")._1.isEmpty)
    assert(out("one_empty")._1.isEmpty)
    assert(out("both_empty")._1.contains(0.0))
    assert(out("dense")._1.contains(1.5 * 2.0 + -2.0 * 0.5))
  }

  test("double-array and mixed float/double inputs are supported") {
    import spark.implicits._
    val df = Seq((Seq(1.5, 2.5), Seq(2.0f, 4.0f))).toDF("d", "f")
    val r = df.select(
        dotProduct(col("d"), col("d")).as("dd"),
        dotProduct(col("d"), col("f")).as("df"),
        dotProduct(col("f"), col("d")).as("fd"))
      .collect()(0)
    assert(r.getDouble(0) == 1.5 * 1.5 + 2.5 * 2.5)
    assert(r.getDouble(1) == 1.5 * 2.0 + 2.5 * 4.0)
    assert(r.getDouble(2) == r.getDouble(1))
  }

  test("non-numeric-array inputs are rejected at analysis time") {
    import spark.implicits._
    val df = Seq((Seq("x"), Seq(1.0f))).toDF("s", "f")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(dotProduct(col("s"), col("f"))).collect()
    }
  }
}
