package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.Moments

class MomentsSpec extends SparkSpec {

  private def vecs(vs: Seq[Array[Float]]) = {
    val rows = vs.map(v => Row(if (v == null) null else v.toSeq)).toList
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(StructField("embedding", ArrayType(FloatType)))))
  }

  /** Reference implementation of the operator's published contract:
    * exact sums of floor(v·2^36) fixed-point cells.
    */
  private def expected(vs: Seq[Array[Float]], dim: Int): Map[(Int, Int), (Long, Double, Double)] = {
    val s = Moments.FixedPointScale
    val rows = vs.filter(v => v != null && v.length >= dim)
    val n = rows.length.toLong
    def qsum(f: Array[Float] => Double): Double =
      rows.map(v => math.floor(f(v) * s)).sum / s
    val sx = (0 until dim).map(i => qsum(v => v(i).toDouble)).toArray
    (for (i <- 0 until dim; j <- i until dim) yield {
      val sxy = qsum(v => v(i).toDouble * v(j).toDouble)
      val cov = sxy / n - (sx(i) / n) * (sx(j) / n)
      (i, j) -> (n, sxy, cov)
    }).toMap
  }

  test("covariance cells match the fixed-point reference exactly") {
    val data = Seq(
      Array(1.0f, 2.0f, -0.5f),
      Array(0.25f, -1.5f, 3.0f),
      Array(0.1983642578125f, 0.3f, -0.7f), // the decimal-tie value
      Array(-2.0f, 0.0f, 1.0f))
    val got = Moments.covarianceUpper(vecs(data), "embedding", dim = 3).collect()
    assert(got.length == 6)
    val want = expected(data, 3)
    got.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val (n, sxy, cov) = want((i, j))
      assert(r.getLong(2) == n, s"n at ($i,$j)")
      assert(r.getDouble(3) == sxy, s"sum_xy at ($i,$j): ${r.getDouble(3)} vs $sxy")
      assert(r.getDouble(4) == cov, s"cov at ($i,$j): ${r.getDouble(4)} vs $cov")
    }
  }

  test("null and short vectors are excluded from every cell") {
    val data = Seq(
      Array(1.0f, 2.0f),
      null,
      Array(3.0f), // too short for dim=2
      Array(-1.0f, 0.5f))
    val got = Moments.covarianceUpper(vecs(data), "embedding", dim = 2).collect()
    assert(got.forall(_.getLong(2) == 2L))
    val want = expected(data, 2)
    got.foreach { r =>
      val (_, sxy, cov) = want((r.getInt(0), r.getInt(1)))
      assert(r.getDouble(3) == sxy && r.getDouble(4) == cov)
    }
  }

  test("pc1 projection: deterministic, unit-ish loadings, captures the dominant axis") {
    // synthetic anisotropic cloud: dimension 0 has ~100× the variance
    // of dimension 1, so PC1 must align with axis 0 — projections are
    // then approximately the (centered) first coordinates
    val data = (0 until 40).map { k =>
      Array(((k % 21) - 10).toFloat, ((k % 3) - 1).toFloat * 0.1f)
    }
    val df = vecs(data).withColumn("vec_id",
      org.apache.spark.sql.functions.monotonically_increasing_id())
    val out = graft.operators.Moments
      .pc1Projection(df, "vec_id", "embedding", dim = 2, iters = 5)
      .collect().map(_.getDouble(1))
    assert(out.length == 40)
    // determinism: re-running yields bit-identical projections
    val again = graft.operators.Moments
      .pc1Projection(df, "vec_id", "embedding", dim = 2, iters = 5)
      .collect().map(_.getDouble(1))
    assert(out.toSeq == again.toSeq)
    // PC1 ≈ axis 0: projection spread must dwarf axis-1's 0.1 scale
    val spread = out.max - out.min
    assert(spread > 15.0, s"pc1 spread $spread — not aligned with the dominant axis")
  }

  test("diagonal cells are nonnegative variances on real data") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val out = Moments.covarianceUpper(emb, "embedding", dim = 64)
    val cells = out.collect()
    assert(cells.length == 64 * 65 / 2)
    val diag = cells.filter(r => r.getInt(0) == r.getInt(1))
    assert(diag.length == 64)
    // variance ≥ -epsilon (fixed-point quantization can graze zero)
    assert(diag.forall(_.getDouble(4) >= -1e-9))
  }
}
