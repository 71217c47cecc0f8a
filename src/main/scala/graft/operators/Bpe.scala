package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.plans.Checkpoints

/** Distributed BPE (byte-pair-encoding) tokenizer training — the
  * tokenizer-fit step of a training-data pipeline, which the reference
  * (a pandas ETL with no text modeling) has no analogue of. Included
  * because a corpus engine that prepares LLM training data has to be
  * able to FIT the tokenizer, not just count tokens with one.
  *
  * Algorithm (Sennrich et al. 2016, arXiv:1508.07909 — the standard):
  * BPE never iterates over the corpus. It iterates over the WORD
  * FREQUENCY TABLE: tokenize-to-words once, count, then learn merges
  * on the (word, freq) pairs. That structure IS the scale story here:
  *
  *   - The corpus crosses the cluster exactly once — a whitespace
  *     split + hash aggregate with map-side partials (the same shape
  *     as q19's token stats). 100 TB of text collapses to a
  *     vocabulary-sized table (~10⁷ rows at web scale: executor-local
  *     from then on).
  *   - Each merge iteration is: adjacent-pair explode over the word
  *     table (weighted by freq), hash-aggregate pair counts
  *     (map-side partials again), ONE driver-collected argmax row
  *     (TakeOrderedAndProject — per-partition 1-row heaps, never a
  *     global sort), and a per-word fold applying the merge. No
  *     window, no cross-word state, nothing corpus-sized.
  *
  * DETERMINISM: the argmax tie-break is (count DESC, left ASC, right
  * ASC) — binary string order, so two engines (and two runs at any
  * partitioning) pick the same merge. The fold applying a merge is
  * leftmost-first, the BPE standard: `aggregate(symbols, …)` appends
  * or fuses one symbol at a time, which consumes overlapping
  * occurrences exactly like the sequential reference implementation
  * ("AAA" + merge(A,A) → [AA, A], never [A, AA]).
  *
  * Symbols are single characters (no end-of-word marker — a
  * documented simplification; the oracle replays the identical
  * definition). Lineage is cut per iteration (`localCheckpoint`) so K
  * merges never stack K fold-plans on the word table.
  */
object Bpe {

  /** One leftmost-first merge pass over a symbol array: fuse every
    * non-overlapping (left, right) adjacency into left+right.
    * Expressed as a fold: element-at-a-time append-or-fuse — the
    * accumulator's last element is the only state the sequential
    * algorithm needs. A token merged earlier in the same pass can
    * never accidentally re-fuse: `element_at(acc, -1) === left`
    * compares full symbol strings, and left+right is strictly longer
    * than left.
    */
  private[graft] def applyMerge(symbols: Column, left: String, right: String): Column =
    aggregate(
      symbols,
      array().cast(ArrayType(StringType)),
      (acc, s) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(left) && s === lit(right),
          concat(slice(acc, lit(1), size(acc) - 1),
            array(concat(element_at(acc, -1), s))))
          .otherwise(concat(acc, array(s))))

  /** Whitespace word-frequency table — the single corpus-scale pass.
    * NULL/blank docs contribute nothing (mirrors tokenCount's
    * empty→0 contract).
    */
  private[graft] def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    graft.sources.Tables.widen(docs)
      .select(explode(split(trim(col(textCol)), "\\s+")).as("_w"))
      .filter(length(col("_w")) > 0)
      .groupBy(col("_w"))
      .agg(count(lit(1)).as("_freq"))

  /** Character symbolization: one-char substrings by position — the
    * explicit form whose SQL mirror (substr per position) is
    * unambiguous, unlike split-on-empty-regex edge semantics.
    */
  private def charSymbols(s: Column): Column =
    transform(sequence(lit(1), length(s)), i => substring(s, i, lit(1)))

  /** Adjacent symbol pairs as (left, right) structs. Caller must
    * ensure `size(sym) >= 2`: Spark's `sequence(1, 0)` infers a
    * NEGATIVE step and yields [1, 0], not an empty array.
    */
  private def adjacentPairs(sym: Column): Column =
    transform(sequence(lit(1), size(sym) - 1),
      i => struct(element_at(sym, i).as("_l"),
        element_at(sym, i + lit(1)).as("_r")))

  /** Learn the first `iters` BPE merge rules from a corpus. Returns
    * one row per iteration: (iter 1-based, left, right, pair_count) —
    * pair_count is the frequency-weighted adjacency count that made
    * (left, right) the winner at that step, AFTER all earlier merges
    * were applied. Empty/degenerate corpora (no pair left to merge)
    * return fewer than `iters` rows.
    */
  def learnBpeMerges(docs: DataFrame, textCol: String, iters: Int): DataFrame = {
    require(iters > 0, s"iters must be positive, got $iters")
    val spark = docs.sparkSession
    var words = wordFreqs(docs, textCol)
      .select(charSymbols(col("_w")).as("_sym"), col("_freq"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var exhausted = false
    for (it <- 1 to iters if !exhausted) {
      val best = words
        .filter(size(col("_sym")) >= 2)
        .select(explode(adjacentPairs(col("_sym"))).as("_pair"), col("_freq"))
        .groupBy(col("_pair._l").as("_l"), col("_pair._r").as("_r"))
        .agg(sum(col("_freq")).as("_n"))
        .orderBy(desc("_n"), asc("_l"), asc("_r"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((it, l, r, n))
        val next = words
          .select(applyMerge(col("_sym"), l, r).as("_sym"), col("_freq"))
          .localCheckpoint(true) // cut the fold lineage per iteration
        Checkpoints.drop(words) // superseded iteration
        words = next
      }
    }
    Checkpoints.drop(words) // merges are driver-side; the frame is dead
    import spark.implicits._
    merges.result().toDF("iter", "left", "right", "pair_count")
  }

  /** Tokenize text with an ordered merge list (the inference side of
    * [[learnBpeMerges]]): symbolize to characters, replay each merge
    * in learned order. The merge table is a plain Seq — a tokenizer's
    * merge list is KB-scale by construction (it IS the model
    * artifact), so it embeds as literals in one projection; the
    * corpus is never shuffled.
    */
  def segmentWithMerges(
      docs: DataFrame, textCol: String, merges: Seq[(String, String)],
      outCol: String = "bpe_tokens"): DataFrame = {
    val tokens = merges.foldLeft(charSymbols(col(textCol))) {
      case (symsCol, (l, r)) => applyMerge(symsCol, l, r)
    }
    docs.withColumn(outCol,
      when(col(textCol).isNull, lit(null).cast(ArrayType(StringType)))
        .otherwise(tokens))
  }

  /** Per-document BPE token counts under a learned merge list — the
    * inference-side shape that scales: the corpus is NEVER segmented
    * row by row. Words explode once (the q19-style corpus pass), the
    * DISTINCT-word vocabulary is segmented (the same
    * vocabulary-not-corpus trick training uses — each unique word
    * pays the merge replay once, however often it occurs), and
    * per-word token counts join back by word for a per-doc sum.
    * Docs with no words (NULL/blank) count 0.
    */
  def bpeTokenCounts(
      docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(col(idCol),
        explode(split(trim(col(textCol)), "\\s+")).as("_w"))
      .filter(length(col("_w")) > 0)
    val vocabCounts = segmentWithMerges(
        words.select(col("_w")).distinct(), "_w", merges, "_toks")
      .select(col("_w"), size(col("_toks")).cast(LongType).as("_ntok"))
    val perDoc = words.join(vocabCounts, "_w")
      .groupBy(col(idCol))
      .agg(sum(col("_ntok")).as("n_bpe_tokens"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
  }
}
