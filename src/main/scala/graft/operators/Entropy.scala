package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions

/** Per-document Shannon entropy over characters — the classic
  * redundancy signal for corpus filtering (low character entropy flags
  * keyboard mash, repeated boilerplate, and template floods that
  * length/stopword heuristics miss; the complement of the n-gram
  * repetition ratios in [[TextAnalysis]]).
  *
  * Exact integer arithmetic end to end: with N = doc length and c_s the
  * count of symbol s,
  *
  *   H·10⁶ ≈ ( Σ_s c_s · (ilog2m(N) − ilog2m(c_s)) ) div N
  *
  * using [[Unigram.ilog2Micro]]'s piecewise-linear integer micro-log2 —
  * deterministic on both engines, no float ever accumulated (the same
  * micro-log2 the unigram tokenizer scores with, so one replayable
  * logarithm recipe serves the whole engine).
  *
  * Engine shape: one explode to (id, symbolHash) — symbols travel as
  * xxhash64 tokens, never as content — one keyed count per (doc,
  * symbol), one keyed rollup per doc. Both exchanges carry ids +
  * hashes + counts only; per-doc state is alphabet-bounded. 100 TB of
  * text costs two hash aggregates.
  *
  * The symbol hash only partitions symbols WITHIN a doc (its identity
  * never reaches the output — entropy needs counts, not names), so the
  * cheap codegen xxhash64 is correct here and the oracle simply groups
  * by the raw character; the md5 recipe is reserved for values an
  * external engine must reproduce bit-for-bit. (A within-doc 64-bit
  * collision across a ≤10³-symbol alphabet is ~10⁻¹³ and would surface
  * as a deterministic hash-gate failure, not silence.)
  */
object Entropy {

  /** Character-entropy profile per document.
    *
    * @return (idCol, n_chars, n_symbols, entropy_microbits): length,
    *         distinct-symbol count, and Shannon entropy in micro-bits
    *         per character. NULL/empty text yields no row (no symbols).
    */
  def charEntropyProfile(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // widen: the per-char explode below multiplies each doc into
    // length(text) rows — on a one-file bench-scale input that chain
    // runs on ONE scan partition (a 30× local slowdown and a straggler
    // on a cluster); at 100 TB the input already has thousands of
    // partitions and widen is a no-op (guide §2.5 input skew)
    val counts = graft.sources.Tables.widen(docs)
      .filter(col(textCol).isNotNull && length(col(textCol)) >= 1)
      .select(col(idCol).as("_id"), length(col(textCol)).cast(LongType).as("_n"),
        explode(TextFunctions.charNGrams(col(textCol), 1)).as("_ch"))
      .select(col("_id"), col("_n"), xxhash64(col("_ch")).as("_h"))
      .groupBy(col("_id"), col("_n"), col("_h"))
      .agg(count(lit(1)).as("_c"))

    counts
      .select(col("_id"), col("_n"),
        (col("_c") * (Unigram.ilog2Micro(col("_n")) -
          Unigram.ilog2Micro(col("_c")))).as("_term"))
      .groupBy(col("_id"), col("_n"))
      .agg(count(lit(1)).as("n_symbols"), sum(col("_term")).as("_tsum"))
      .select(col("_id").as(idCol), col("_n").as("n_chars"),
        col("n_symbols"),
        expr("_tsum div _n").as("entropy_microbits"))
  }
}
