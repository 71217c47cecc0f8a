package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-vector math over `Array[Float]` columns — native
  * higher-order functions (`zip_with` + `aggregate`), no UDFs
  * (BASELINE.json north star: similarity search / embedding near-dup).
  *
  * Determinism note: `dot` is a sequential left fold in array order, so
  * the result is bit-stable for a given vector pair — and matches
  * DuckDB's `list_reduce` fold for the oracle (IEEE addition in the same
  * order, starting from +0.0).
  */
object VectorFunctions {

  /** Inner product in double precision (sequential fold, deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /** Decimal-exact inner product: per-element double product rounded to
    * DECIMAL(20,12), summed exactly — order-independent, engine-exact.
    * Used by oracle-checked similarity queries (see graft.queries.Det).
    *
    * Precision budget matters: acc(32,12) + v(20,12) needs precision 33
    * < 38, so Spark's decimal-add never triggers its precision-loss
    * rule (which would silently round the scale down to 11 and lose the
    * last digit — a real 1-ulp bug caught by the DuckDB oracle).
    */
  def dotExact(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast(DoubleType) * y.cast(DoubleType)).cast(DecimalType(20, 12))),
      lit(BigDecimal(0)).cast(DecimalType(32, 12)),
      (acc, v) => (acc + v).cast(DecimalType(32, 12)))
      .cast(DoubleType)

  def normL2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; NULL-safe on zero vectors (returns NULL). */
  def cosine(a: Column, b: Column): Column = {
    val denom = normL2(a) * normL2(b)
    when(denom === 0.0, lit(null).cast(DoubleType)).otherwise(dot(a, b) / denom)
  }

  def euclidean(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast(DoubleType) - y.cast(DoubleType); d * d
      }),
      lit(0.0), (acc, v) => acc + v))

  /** Random-hyperplane (SimHash-for-vectors) LSH signature: bit i is the
    * sign of `v · r_i` where `r_i` is a deterministic ±1 plane derived
    * from xxhash64(planeSeed, i, j). `nBits` ≤ 63 (packed into a long).
    *
    * Scale: signature computation is a per-row projection; bucketing on
    * the signature turns an O(n²) all-pairs cosine into a per-bucket
    * problem — the standard ANN scale path when n is 10⁹ vectors.
    */
  def lshSignature(v: Column, nBits: Int, dim: Int, planeSeed: Long = 42L): Column = {
    require(nBits <= 63, "signature must fit a long")
    val bits = (0 until nBits).map { i =>
      // r_i[j] = ±1 from a hash of (seed, i, j); dot via fold over dims
      val proj = aggregate(
        zip_with(v,
          transform(sequence(lit(0), lit(dim - 1)),
            j => when(pmod(xxhash64(lit(planeSeed), lit(i), j), lit(2)) === 0, lit(1.0))
              .otherwise(lit(-1.0))),
          (x, r) => x.cast(DoubleType) * r),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0.0, lit(1L)).otherwise(lit(0L))
    }
    bits.foldLeft(lit(0L))((acc, b) => acc * lit(2L) + b)
  }

  /** Hamming distance between two packed-long signatures. */
  def hammingLong(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
