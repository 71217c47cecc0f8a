package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed second-moment statistics over an embedding column — the
  * building block for PCA / whitening / covariance-based outlier
  * screens on a 100 TB vector corpus.
  *
  * The covariance matrix of d-dimensional vectors is d(d+1)/2 upper
  * cells — tiny (d=64 → 2080 cells) next to the corpus. The right
  * distributed shape is therefore: compute every pairwise product
  * per row in codegen (a flat-mapped array of (i, j, x_i·x_j)
  * structs), and let ONE hash aggregate with map-side partials
  * collapse the ×d²/2 row amplification inside each task — the
  * exchange carries at most d(d+1)/2 + d cells per task, never the
  * corpus. No self-join (a posexplode self-join on vec_id would
  * shuffle the corpus ×d), no second scan (linear sums ride the same
  * explode under a j = −1 sentinel).
  *
  * == Determinism: fixed-point, not decimal ==
  *
  * The usual [[graft.queries.Det]] decimal-sum discipline has a
  * latent cross-engine hazard for FLOAT-derived values: a float is a
  * dyadic rational whose decimal expansion terminates (and always
  * ends in ...5), so casting it to DECIMAL(p, s) hits an exact
  * rounding TIE whenever the expansion terminates at digit s+1 —
  * and Spark rounds ties HALF_UP while DuckDB rounds HALF_EVEN.
  * This is not theoretical: sf0.01 embeddings contain
  * 0.1983642578125 (terminates at digit 13), which DECIMAL(28,12)
  * rounds differently on the two engines. No scale dodges every
  * dyadic input, so this operator uses tie-free fixed-point instead:
  *
  *  - quantize per row with `floor(v · 2^36)` — floor has no ties,
  *    the power-of-two scale is an exact exponent shift, and the
  *    result is an integer-valued double, bit-identical everywhere;
  *  - sum the integers as doubles: adding integer-valued doubles is
  *    EXACT (hence order-independent) while the running sum stays
  *    below 2^53 — products are ≤ 2^35 here, so ~10^5 vectors keep
  *    the total under 2^52 with margin (assert-guarded; past that,
  *    sum a DECIMAL(38,0) instead of relying on the double);
  *  - unscale by 2^36 (exact) and finish with the one fixed IEEE
  *    expression sum_xy/n − (sum_x_i/n)·(sum_x_j/n).
  *
  * The published sums are therefore the exact sums of 2^-36-quantized
  * inputs (quantization error ≤ n·2^-36 ≈ 1e-6 at 10^5 rows — far
  * below any statistical use of a covariance), and every engine that
  * follows the same recipe reproduces them bit-for-bit.
  */
object Moments {

  /** 2^36 — fixed-point scale for tie-free cross-engine sums. */
  val FixedPointScale: Double = 68719476736.0

  /** Upper-triangle co-moment/covariance cells:
    * (i, j, n, sum_xy, cov) for 0 ≤ i ≤ j < dim, ordered by (i, j).
    * Rows with NULL or short vectors are excluded (n counts the rest).
    */
  def covarianceUpper(
      df: DataFrame, vecCol: String = "embedding", dim: Int = 64): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val v = col(vecCol)
    val scale = lit(FixedPointScale)
    def x(i: org.apache.spark.sql.Column) =
      element_at(v, i + lit(1)).cast(DoubleType)
    def q(c: org.apache.spark.sql.Column) =
      floor(c * scale).cast(DoubleType)
    val quadCells = flatten(transform(
      sequence(lit(0), lit(dim - 1)),
      i => transform(
        sequence(i, lit(dim - 1)),
        j => struct(i.cast(IntegerType).as("i"), j.cast(IntegerType).as("j"),
          q(x(i) * x(j)).as("xq")))))
    val linCells = transform(
      sequence(lit(0), lit(dim - 1)),
      i => struct(i.cast(IntegerType).as("i"), lit(-1).as("j"), q(x(i)).as("xq")))
    val cells = graft.sources.Tables.widen(df)
      .filter(v.isNotNull && size(v) >= dim)
      .select(explode(concat(quadCells, linCells)).as("c"))
      .select(col("c.i").as("i"), col("c.j").as("j"), col("c.xq").as("xq"))
    val sums = cells
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"),
        (sum(col("xq")) / scale).as("s"))
    val lin = sums.filter(col("j") === -1)
      .select(col("i").as("_li"), col("s").as("_sum_x"))
    sums.filter(col("j") >= 0)
      .join(broadcast(lin), col("i") === col("_li"))
      .drop("_li").withColumnRenamed("_sum_x", "_sx_i")
      .join(broadcast(lin), col("j") === col("_li"))
      .drop("_li").withColumnRenamed("_sum_x", "_sx_j")
      .select(col("i"), col("j"), col("n"), col("s").as("sum_xy"),
        (col("s") / col("n") -
          (col("_sx_i") / col("n")) * (col("_sx_j") / col("n"))).as("cov"))
      .orderBy(col("i"), col("j"))
  }

  /** Distributed PCA, first component: ONE covariance scan over the
    * corpus ([[covarianceUpper]]), a driver-side power iteration on
    * the d×d matrix (d² cells are driver-bounded by construction —
    * the corpus never leaves the cluster), then ONE projection scan
    * emitting each vector's PC1 coordinate.
    *
    * Every arithmetic step — the matrix–vector products, the norm,
    * the final projection — uses the same tie-free fixed-point recipe
    * as the covariance (floor(x·2^36) quantization, exact integer
    * sums, one IEEE sqrt/division per normalize), so an independent
    * engine replaying the recipe from the same parquet reproduces the
    * loadings AND every projection bit-for-bit. The power iteration
    * starts from the uniform unit vector (1/√d)ᵢ and runs a FIXED
    * `iters` steps — a convergence test would make the iteration
    * count data-dependent and the output engine-sensitive.
    *
    * Returns (id, pc1_proj) for every full-length vector, ordered by
    * id. Sign convention is whatever the iteration converges to from
    * the uniform start — deterministic, but callers comparing against
    * another PCA implementation should compare |proj|.
    */
  def pc1Projection(
      df: DataFrame, idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Int = 64, iters: Int = 5): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val s = FixedPointScale
    val cells = covarianceUpper(df, vecCol, dim)
      .select(col("i"), col("j"), col("cov")).collect()
    val a = Array.ofDim[Double](dim, dim)
    cells.foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      a(i)(j) = c; a(j)(i) = c
    }
    var vec = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 0 until iters) {
      val m = Array.tabulate(dim) { i =>
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += math.floor(a(i)(j) * vec(j) * s); j += 1 }
        acc / s
      }
      var q = 0.0
      var i = 0
      while (i < dim) { q += math.floor(m(i) * m(i) * s); i += 1 }
      val norm = math.sqrt(q / s)
      vec = m.map(_ / norm)
    }
    val loadings = array(vec.toSeq.map(x => lit(x)): _*)
    val v = col(vecCol)
    graft.sources.Tables.widen(df)
      .filter(v.isNotNull && size(v) >= dim)
      .select(col(idCol),
        (aggregate(
          zip_with(slice(v, 1, dim), loadings,
            (x, l) => floor(x.cast(DoubleType) * l * lit(s))),
          lit(0.0), (acc, e) => acc + e) / lit(s)).as("pc1_proj"))
      .orderBy(col(idCol))
  }
}
