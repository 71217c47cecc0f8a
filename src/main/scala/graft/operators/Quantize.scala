package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar int8 quantization for embedding columns — the storage side
  * of vector search at corpus scale: a 10⁹ × 768-dim float corpus is
  * ~3 TB of parquet; per-vector min/max int8 quantization stores the
  * same geometry in a quarter of the bytes (and parquet
  * integer-packs the 0..255 range further). ANN recall degrades by
  * the quantization error, which is bounded per element by
  * `qscale / 2` — the contract QuantizeSpec asserts.
  *
  * Everything here is closed-form deterministic arithmetic (float →
  * double widening, one division, `floor(x + 0.5)` rounding — ties
  * away from the banker's-rounding ambiguity), so a cross-engine
  * oracle can replay quantize → dequantize → cosine → rank EXACTLY:
  * IEEE double ops are bit-defined in both engines and both folds run
  * left-to-right (q80).
  *
  * All of it is native expressions in one projection: quantization is
  * a zero-shuffle scan-side map, like every per-row operator in this
  * engine.
  */
object Quantize {

  /** Per-vector scalar quantization: (idCol, qmin, qscale,
    * qvec: array<int> in 0..255). Constant vectors (max == min) get
    * qscale 0 and all-zero codes — dequantization restores `qmin`
    * exactly. NULL vectors pass through as NULL codes.
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val mn = array_min(v).cast(DoubleType)
    val scale = (array_max(v).cast(DoubleType) - mn) / lit(255.0)
    df.select(
      col(idCol),
      mn.as("qmin"),
      scale.as("qscale"),
      transform(v, x =>
        when(scale === 0.0, lit(0))
          .otherwise(floor((x.cast(DoubleType) - mn) / scale + lit(0.5))
            .cast(IntegerType))).as("qvec"))
  }

  /** Reconstruct the (approximate) vector: x̂ᵢ = qmin + qᵢ · qscale,
    * as a double array. |x̂ᵢ − xᵢ| ≤ qscale / 2 by construction.
    */
  def dequantize(qvec: Column, qmin: Column, qscale: Column): Column =
    transform(qvec, q => qmin + q.cast(DoubleType) * qscale)

  /** Exact cosine top-k over a QUANTIZED corpus: dequantize in the
    * scoring projection (the stored index stays int8; nothing is
    * materialized at float width), score against float queries,
    * rank (cosine DESC, neighbor ASC). Same broadcast-query shape as
    * [[Similarity.bruteForceTopK]].
    */
  def dequantCosineTopK(
      quantized: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def fold(pairProduct: Column): Column =
      aggregate(pairProduct, lit(0.0), (acc, p) => acc + p)
    // norms are per-VECTOR: computed once in each side's projection
    // (|corpus| + |queries| norm folds), never per candidate pair —
    // the same shape the cross-engine oracle uses. Only the dot fold
    // runs per pair.
    val dv = dequantize(col("qvec"), col("qmin"), col("qscale"))
    val c = quantized.select(col(idCol).as("neighbor_id"), dv.as("_cv"),
      sqrt(fold(zip_with(dv, dv, (x, y) => x * y))).as("_cn"))
    val qv = col(vecCol)
    val q = queries.select(col(idCol).as("query_id"), qv.as("_qv"),
      sqrt(fold(zip_with(qv, qv,
        (x, y) => x.cast(DoubleType) * y.cast(DoubleType)))).as("_qn"))
    val dot = fold(zip_with(col("_qv"), col("_cv"),
      (x, y) => x.cast(DoubleType) * y))
    val denom = col("_qn") * col("_cn")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cosine"), asc("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        when(denom === 0.0, lit(null).cast(DoubleType)).otherwise(dot / denom))
      .withColumn("rank", row_number().over(w).cast(IntegerType))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }
}
