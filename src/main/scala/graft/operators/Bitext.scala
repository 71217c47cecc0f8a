package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BITEXT MINING: find translation pairs between two monolingual
  * embedding sets by margin-scored mutual nearest neighbors — the
  * CCMatrix/LASER recipe (Artetxe & Schwenk, "Margin-based Parallel
  * Corpus Mining with Multilingual Sentence Embeddings", ACL 2019)
  * that built the largest public parallel corpora. A multilingual
  * training mix wants mined bitext; this is the mining step on top of
  * the engine's embedding column (the reference stops at per-record
  * ETL — `/root/reference/monarch_etl/pipeline.py` — and has no
  * embedding concept at all).
  *
  * Raw cosine is a bad mining score (hubness: some vectors are close
  * to everything), so each candidate pair is scored by the RATIO
  * MARGIN — its cosine relative to the mean cosine of both endpoints'
  * k-nearest neighborhoods:
  *
  *   margin(x, y) = 2·cos(x, y) / (avgK(x) + avgK(y))
  *
  * and a pair is emitted only when each endpoint is the other's best
  * margin (mutual argmax — the strict variant, highest precision).
  *
  * Determinism contract: cosines are the engine's sequential
  * element-order fold ([[graft.functions.VectorFunctions.cosine]] —
  * the DuckDB `list_reduce` twin); the k-neighborhood mean sums in
  * RANK order (sorted fold, never an unordered float aggregate); the
  * argmax tie-breaks on the lower partner id. Every number and every
  * selection is replayable bit-for-bit by any ANSI engine.
  */
object Bitext {

  /** Margin-scored mutual pairs from precomputed top-k arms — the
    * composition point: feed it [[Similarity.cosineTopKExact]] arms
    * for the exact baseline (what [[marginMutualPairs]] does) or
    * [[Similarity.ivfTopK]] arms for the 100 TB path; everything in
    * here is top-k-bounded regardless of corpus size.
    *
    * `fwd` = src→tgt arm, `bwd` = tgt→src arm; both carry
    * (query_id, neighbor_id, cosine, rank) with rank 1..k.
    *
    * Scale: candidates are ≤ (|src| + |tgt|)·k rows; the
    * neighborhood means are keyed aggregates over exactly k rows per
    * key; the mutual argmax is a `max_by` AGGREGATE, not a window —
    * a hub vector that appears in millions of backward top-k lists
    * partial-aggregates map-side instead of funneling its candidate
    * list through one window task.
    */
  def marginMutualFromTopK(fwd: DataFrame, bwd: DataFrame): DataFrame = {
    // rank-ordered sorted fold: deterministic neighborhood mean
    def avgK(arm: DataFrame, out: String) =
      arm.groupBy(col("query_id")).agg(
        (aggregate(
          transform(array_sort(collect_list(struct(col("rank"), col("cosine")))),
            s => s.getField("cosine")),
          lit(0.0), (a, v) => a + v) / count(lit(1))).as(out))
    val avgF = avgK(fwd, "_af").withColumnRenamed("query_id", "src_id")
    val avgB = avgK(bwd, "_ab").withColumnRenamed("query_id", "tgt_id")
    // candidate pool = both arms' pairs; the two directions compute
    // the SAME cosine (commutative element products, same fold order),
    // so min() is a deterministic dedup, not a choice
    val cand = fwd
      .select(col("query_id").as("src_id"),
        col("neighbor_id").as("tgt_id"), col("cosine"))
      .unionByName(bwd.select(col("neighbor_id").as("src_id"),
        col("query_id").as("tgt_id"), col("cosine")))
      .filter(col("cosine").isNotNull)
      .groupBy(col("src_id"), col("tgt_id"))
      .agg(min(col("cosine")).as("cosine"))
    val scored = cand
      .join(avgF, Seq("src_id"))
      .join(avgB, Seq("tgt_id"))
      .withColumn("margin",
        lit(2.0) * col("cosine") / (col("_af") + col("_ab")))
      .select(col("src_id"), col("tgt_id"), col("cosine"), col("margin"))
    // mutual argmax via max_by aggregates (margin desc, partner id asc)
    val bestF = scored.groupBy(col("src_id")).agg(
      max_by(col("tgt_id"),
        struct(col("margin"), lit(0L) - col("tgt_id"))).as("_bt"))
    val bestB = scored.groupBy(col("tgt_id")).agg(
      max_by(col("src_id"),
        struct(col("margin"), lit(0L) - col("src_id"))).as("_bs"))
    scored
      .join(bestF, Seq("src_id"))
      .join(bestB, Seq("tgt_id"))
      .filter(col("tgt_id") === col("_bt") && col("src_id") === col("_bs"))
      .select(col("src_id"), col("tgt_id"), col("cosine"), col("margin"))
  }

  /** Exact-arm bitext mining: brute-force cosine top-k in both
    * directions ([[Similarity.cosineTopKExact]] — the oracle-exact
    * baseline), then [[marginMutualFromTopK]]. `src` and `tgt` are
    * (idCol, vecCol) frames with DISJOINT id spaces (two language
    * slices).
    *
    * Scale: the arms are the quadratic part — swap them for
    * [[Similarity.ivfTopK]] (both directions) past ~10⁶ vectors; the
    * margin/mutual machinery is arm-agnostic and k-bounded.
    */
  def marginMutualPairs(src: DataFrame, tgt: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"bad k $k")
    marginMutualFromTopK(
      Similarity.cosineTopKExact(tgt, src, idCol, vecCol, k),
      Similarity.cosineTopKExact(src, tgt, idCol, vecCol, k))
  }

  /** The 100 TB path: [[Similarity.ivfTopK]] arms — each direction's
    * candidate volume is |queries|·nprobe·(corpus/nlist) instead of
    * |queries|·|corpus|, so with the standing nlist ≈ √N rule the
    * mining drops from quadratic to N^1.5 (measured: see BENCH_NOTES
    * R11). At `nprobe = nlist` probing is exhaustive and the result
    * is BIT-IDENTICAL to [[marginMutualPairs]] (same cosine
    * expression, same tie-breaks — the q65 oracle discipline);
    * at `nprobe < nlist` pairs whose endpoints land in unprobed
    * cells can be missed — recall is the fixture-tested tradeoff.
    */
  def marginMutualPairsIvf(src: DataFrame, tgt: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int, nprobe: Int): DataFrame = {
    require(k >= 1, s"bad k $k")
    marginMutualFromTopK(
      Similarity.ivfTopK(tgt, src, idCol, vecCol, k, nlist, nprobe),
      Similarity.ivfTopK(src, tgt, idCol, vecCol, k, nlist, nprobe))
  }
}
