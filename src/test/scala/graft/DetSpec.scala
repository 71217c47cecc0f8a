package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.queries.Det

/** Properties of the determinism helpers every oracle-checked query
  * leans on (graft.queries.Det).
  */
class DetSpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  /** Reference semantics: round each double to 6 decimals HALF_UP (what
    * a decimal(18,6) cast does), sum exactly with BigDecimal.
    */
  private def referenceSum(xs: Seq[Double]): Double =
    xs.map(x => BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .foldLeft(BigDecimal(0))(_ + _).toDouble

  test("property: exactSum equals an exact BigDecimal fold, any partitioning") {
    val valueGen = Gen.chooseNum(-100000.0, 100000.0)
    val batches = (0 until 10).map(_ => samples(valueGen, 200))
    batches.foreach { xs =>
      val rows = xs.map(x => Row(java.lang.Double.valueOf(x)))
      val df = spark.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava,
        StructType(Seq(StructField("x", DoubleType))))
      // shuffle the data across partitions: order must not matter
      val got = df.repartition(7)
        .agg(Det.exactSum(col("x")).as("s")).collect()(0).getDouble(0)
      assert(got == referenceSum(xs), s"exactSum mismatch on ${xs.take(3)}…")
    }
  }

  test("exactAvg is exact sum divided by count (one IEEE division)") {
    val xs = samples(Gen.chooseNum(0.0, 1000.0), 500)
    val rows = xs.map(x => Row(java.lang.Double.valueOf(x)))
    val df = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava,
      StructType(Seq(StructField("x", DoubleType))))
    val got = df.agg(Det.exactAvg(col("x")).as("a")).collect()(0).getDouble(0)
    assert(got == referenceSum(xs) / xs.size)
  }

  test("dotExact is order-independent and engine-exact") {
    import graft.functions.VectorFunctions
    val a = samples(Gen.chooseNum(-1.0f, 1.0f), 64)
    val b = samples(Gen.chooseNum(-1.0f, 1.0f), 64)
    val df = spark.createDataFrame(
      java.util.List.of(Row(a, b)),
      StructType(Seq(
        StructField("a", ArrayType(FloatType)),
        StructField("b", ArrayType(FloatType)))))
    val got = df.select(VectorFunctions.dotExact(col("a"), col("b"))).collect()(0).getDouble(0)
    val ref = a.zip(b)
      .map { case (x, y) =>
        BigDecimal(x.toDouble * y.toDouble).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }
      .foldLeft(BigDecimal(0))(_ + _).toDouble
    assert(got == ref)
  }
}
