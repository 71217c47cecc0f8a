package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** One-off generator for the q74 multi-probe fixture: a (query, twin)
  * vector pair at EXACT LSH signature hamming distance 2 under the
  * engine's fixed hyperplanes ([[VectorFunctions.lshSignature]],
  * nBits=12, dim=64, planeSeed=42), with cosine(query, twin) ≈ 0.997 —
  * high enough that the twin is the brute-force top-1 against every
  * test corpus, yet bucket-invisible to exact-signature LSH: only the
  * multi-probe expansion at radius ≥ 2 can recover it.
  *
  * Construction: extract the ±1 hyperplane matrix (deterministic from
  * xxhash64(42, i, j)), compute the query's 12 projection margins with
  * the same float→double fold Spark executes, pick the two planes with
  * the smallest |margin|, and push the vector across exactly those two
  * hyperplanes: twin = query − cₐ·sign(dₐ)·planeₐ − c_b·sign(d_b)·plane_b,
  * with cₐ, c_b searched over the 1/128 grid until exactly bits {a, b}
  * flip. All coordinates stay on the 1/128 dyadic grid, so every value
  * is exactly representable as FLOAT and as a short decimal literal —
  * the same bits in Spark, in the hard-coded Scala constant, and in
  * the DuckDB oracle's CAST([…] AS FLOAT[]).
  *
  * Run: sbt "runMain graft.tools.PlantMultiProbeTwin". The printed
  * constants live in graft.queries.TrainingData.MultiProbeFixture;
  * SimilaritySpec re-verifies the distance-2 property on every CI run,
  * so the generator only needs re-running if the hyperplane seed or
  * the signature layout ever changes.
  */
object PlantMultiProbeTwin {

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    val nBits = 12
    val dim = 64

    // the hyperplane matrix EXACTLY as lshSignature derives it
    val planeCols = (0 until nBits).map { i =>
      transform(sequence(lit(0), lit(dim - 1)),
        j => when(pmod(xxhash64(lit(42L), lit(i), j), lit(2)) === 0, lit(1.0))
          .otherwise(lit(-1.0))).as(s"p$i")
    }
    val row = spark.range(1).select(planeCols: _*).collect()(0)
    val planes: Array[Array[Double]] =
      (0 until nBits).map(i => row.getSeq[Double](i).toArray).toArray

    // Spark's projection fold, replicated bit-for-bit: float element
    // cast to double, multiplied by ±1.0, summed left-to-right
    def proj(v: Array[Double], p: Array[Double]): Double = {
      var acc = 0.0
      var j = 0
      while (j < dim) { acc += v(j).toFloat.toDouble * p(j); j += 1 }
      acc
    }
    def bits(v: Array[Double]): Seq[Boolean] =
      (0 until nBits).map(i => proj(v, planes(i)) > 0.0)

    // dyadic base vector (k/128, exactly float-representable)
    val query = Array.tabulate(dim)(j => (((j * 37 + 11) % 255) - 127) / 128.0)
    val d = (0 until nBits).map(i => proj(query, planes(i)))
    val Seq(a, b) = (0 until nBits).sortBy(i => math.abs(d(i))).take(2).sorted
    println(s"margins: ${d.map(x => f"$x%.3f").mkString(", ")} -> flip planes $a, $b")

    val qBits = bits(query)
    val grid = (1 to 48).map(_ / 128.0)
    val candidates = for {
      ca <- grid; cb <- grid
      twin = Array.tabulate(dim) { j =>
        query(j) - math.signum(d(a)) * ca * planes(a)(j) -
          math.signum(d(b)) * cb * planes(b)(j)
      }
      if twin.forall(x => math.abs(x) < 2.0)
      tBits = bits(twin)
      flipped = (0 until nBits).filter(i => tBits(i) != qBits(i))
      if flipped == Seq(a, b)
      // comfortable margins on every plane (no float-edge sign bits)
      if (0 until nBits).forall(i => math.abs(proj(twin, planes(i))) > 0.05)
    } yield (ca, cb, twin)
    val (ca, cb, twin) = candidates.minBy { case (x, y, _) => x * x + y * y }

    def cos(u: Array[Double], v: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.zip(y).map { case (p, q) => p * q }.sum
      dot(u, v) / math.sqrt(dot(u, u) * dot(v, v))
    }
    println(f"ca=$ca cb=$cb cosine(query, twin)=${cos(query, twin)}%.6f")

    // independent verification through the engine's own expression
    import spark.implicits._
    val pair = Seq(
      (0L, query.map(_.toFloat)), (1L, twin.map(_.toFloat))).toDF("id", "v")
    val sigs = pair.select(col("id"),
        VectorFunctions.lshSignature(col("v"), nBits, dim).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hamming = java.lang.Long.bitCount(sigs(0L) ^ sigs(1L))
    println(s"query signature = ${sigs(0L)}L, twin signature = ${sigs(1L)}L")
    println(s"spark signature hamming distance = $hamming (must be 2)")
    require(hamming == 2, "construction failed")

    // twin must dominate every natural corpus vector for the query
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dirPath = s"/root/testdata/$sf"
      if (new java.io.File(s"$dirPath/embeddings.parquet").exists) {
        val qLit = typedlit(query.map(_.toFloat).toSeq)
        val maxNat = spark.read.parquet(s"$dirPath/embeddings.parquet")
          .select(VectorFunctions.cosine(col("embedding"), qLit).as("c"))
          .agg(max(col("c"))).collect()(0).getDouble(0)
        println(f"$sf max natural cosine vs query = $maxNat%.6f")
      }
    }

    def lit128(x: Double): String = (BigDecimal(math.round(x * 128)) / 128).toString
    println("QUERY  = " + query.map(lit128).mkString("Array(", "f, ", "f)"))
    println("TWIN   = " + twin.map(lit128).mkString("Array(", "f, ", "f)"))
    println("SQL Q  = [" + query.map(lit128).mkString(", ") + "]")
    println("SQL T  = [" + twin.map(lit128).mkString(", ") + "]")
    spark.stop()
  }
}
