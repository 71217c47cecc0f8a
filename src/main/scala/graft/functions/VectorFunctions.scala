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

  /** Inner product in double precision (sequential fold, deterministic).
    * A codegen'd primitive loop ([[graft.expressions.DotProductExpression]])
    * computing bit-for-bit what the HOF formulation
    * `aggregate(zip_with(a, b, double(x)*double(y)), 0.0, acc+v)`
    * computed before r6 — minus the interpreted per-element lambda tax.
    */
  def dot(a: Column, b: Column): Column =
    graft.expressions.DotProductExpression.dotProduct(a, b)

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
    * The planes are CONSTANTS, so they are derived once on the driver —
    * through Catalyst's own XxHash64 expression, which guarantees the
    * exact bit pattern the previous in-plan formulation produced — and
    * embedded as array literals. The in-plan version re-evaluated
    * nBits × dim hash calls PER ROW (a 12-bit/64-dim signature spent
    * ~98% of its time rehashing the same 768 constants); with literal
    * planes the per-row work is nBits fused multiply-add folds over the
    * vector. Signatures are bit-identical (same ±1 values, same
    * float→double cast, same left-to-right IEEE fold).
    *
    * Scale: signature computation is a per-row projection; bucketing on
    * the signature turns an O(n²) all-pairs cosine into a per-bucket
    * problem — the standard ANN scale path when n is 10⁹ vectors.
    */
  def lshSignature(v: Column, nBits: Int, dim: Int, planeSeed: Long = 42L): Column = {
    require(nBits <= 63, "signature must fit a long")
    val bits = (0 until nBits).map { i =>
      val proj = graft.expressions.DotProductExpression.dotProduct(
        v, typedlit(plane(planeSeed, i, dim).toSeq))
      when(proj > 0.0, lit(1L)).otherwise(lit(0L))
    }
    bits.foldLeft(lit(0L))((acc, b) => acc * lit(2L) + b)
  }

  /** ±1 hyperplane i for (seed, dim), memoized per JVM. Derived by
    * evaluating the SAME Catalyst expressions the in-plan formulation
    * ran (`pmod(xxhash64(seed, i, j), 2)`), so a signature computed
    * against these literals matches one computed by any historical
    * in-plan variant bit for bit.
    */
  private val planeCache =
    scala.collection.concurrent.TrieMap.empty[(Long, Int, Int), Array[Double]]

  private def plane(seed: Long, i: Int, dim: Int): Array[Double] =
    planeCache.getOrElseUpdate((seed, i, dim), {
      import org.apache.spark.sql.catalyst.expressions.{Literal => CatLiteral, XxHash64}
      Array.tabulate(dim) { j =>
        // seed 42L = the xxhash64() SQL function's fixed seed
        val h = XxHash64(Seq(CatLiteral(seed), CatLiteral(i), CatLiteral(j)), 42L)
          .eval(null).asInstanceOf[Long]
        if (((h % 2) + 2) % 2 == 0) 1.0 else -1.0
      }
    })

  /** Hamming distance between two packed-long signatures. */
  def hammingLong(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
