package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-data preparation: assign documents
  * to fixed-token-budget training sequences ("concat-and-chunk", the
  * standard pretraining batching strategy — documents are concatenated
  * in a deterministic order and the stream is cut every `seqLen`
  * tokens; a pack is the set of documents whose starting offset falls
  * in the same chunk).
  *
  * Determinism: packing is a pure function of (id order, token counts)
  * — no RNG, so a re-run reproduces byte-identical shards (the same
  * property [[Sampling]] guarantees for splits).
  *
  * Scale: a single global cumulative sum would funnel the whole corpus
  * through ONE partition (the classic global-window scale-killer), so
  * packing is sharded: documents hash-partition into `nShards`
  * independent streams (`id % nShards`) and each shard packs
  * independently — the window sorts within shards only, giving
  * shard-parallel packing with the same budget guarantee per pack. At
  * 1000 executors, set nShards ≥ cores so every core packs its own
  * stream.
  */
object Packing {

  /** Per-document pack assignment: adds `shard`, `pack_id` (chunk index
    * within the shard) and `pack_offset` (the document's starting token
    * offset within its shard stream).
    *
    * `tokensCol` must be a non-negative integer column (e.g.
    * [[graft.functions.TextFunctions.tokenCount]]). Documents longer
    * than `seqLen` still get exactly one pack (their tail spills into
    * subsequent chunk ranges — per standard concat-and-chunk, the
    * boundary crossing is resolved at tensorization, not here).
    */
  def packSequences(df: DataFrame, idCol: String, tokensCol: Column,
      seqLen: Int, nShards: Int = 64): DataFrame =
    packedWithTokens(df, idCol, tokensCol, seqLen, nShards).drop("_tok")

  /** Shared core keeping the materialized `_tok` column so the
    * manifest can aggregate it without re-evaluating `tokensCol` (for
    * a text-derived count, tokenization is the dominant per-row cost —
    * evaluating it twice doubles the operator).
    */
  private def packedWithTokens(df: DataFrame, idCol: String, tokensCol: Column,
      seqLen: Int, nShards: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val shard = pmod(col(idCol), lit(nShards.toLong)).cast("int")
    df.withColumn("shard", shard)
      .withColumn("_tok", tokensCol.cast("long"))
      // starting offset = cumulative tokens of all PRIOR docs in the
      // shard stream (exclusive prefix sum)
      .withColumn("pack_offset",
        coalesce(sum(col("_tok")).over(
          Window.partitionBy(col("shard")).orderBy(col(idCol))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // integer division (`div`) keeps the arithmetic exact at any
      // corpus size — a double floor() loses exactness past 2^53
      .withColumn("pack_id", expr(s"pack_offset div $seqLen"))
  }

  /** Pack-level summary: document count, token budget used, id range —
    * the manifest a training job reads to locate its shard files.
    */
  def packManifest(df: DataFrame, idCol: String, tokensCol: Column,
      seqLen: Int, nShards: Int = 64): DataFrame =
    packedWithTokens(df, idCol, tokensCol, seqLen, nShards)
      .groupBy(col("shard"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("_tok")).as("pack_tokens"),
        min(col(idCol)).as("first_id"),
        max(col(idCol)).as("last_id"))
}
