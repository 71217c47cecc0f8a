package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}

import graft.functions.TextFunctions.{md5Hash60, nonEmptyTokens}

/** Corpus-level BLEU counting (Papineni et al., "BLEU: a Method for
  * Automatic Evaluation of Machine Translation", ACL 2002) — the
  * generation-evaluation step a synthetic-data pipeline runs when it
  * compares a model's rewrites/translations against references at
  * corpus scale. The reference ETL has no evaluation concept at all.
  *
  * [[corpusNgramPrecision]] produces the exact integer CORE of BLEU —
  * per-order clipped matches and totals plus the candidate/reference
  * length totals (the brevity-penalty ratio) — rather than one float
  * score: the counts are what aggregate across shards and replay on
  * any engine; the float exponentiation is a driver-side afterthought
  * the caller can apply (and the add-one-smoothed log2 precision is
  * included in the exact integer micro-log2 convention shared with
  * q210/q218/q234, so rank-ordering corpora by quality needs no float
  * at all).
  *
  * Determinism / scale contract: tokens are the lowercased
  * whitespace tokens used everywhere else ([[Ranking]]); n-grams are
  * keyed by their 60-bit md5 ([[md5Hash60]] — the corpus-dedup
  * convention), so the per-order exchange carries (doc, 60-bit hash,
  * count) partials, never gram text. A hash collision would merge two
  * distinct grams' counts (P < 2⁻⁶⁰ per gram pair, and the oracle
  * replays the same hash, so cross-engine equality is unconditional).
  * Everything map-side combines; the final aggregate is maxN 1-row
  * frames.
  */
object Bleu {

  /** All order-`n` grams of the lowercased whitespace tokens of `c`,
    * space-joined (tokens contain no whitespace, so the join is
    * unambiguous). Documents with fewer than n tokens yield no grams.
    */
  private[graft] def ngrams(c: Column, n: Int): Column =
    ngramsOfTokens(nonEmptyTokens(lower(c)), n)

  /** Same, over an already-tokenized array column. */
  private[graft] def ngramsOfTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast(ArrayType(StringType)))

  /** Per-order clipped n-gram precision counts over (candidate,
    * reference) pairs:
    *
    *   - `matched` = Σ_docs Σ_g min(cand_count(g), ref_count(g)) —
    *     the CLIPPED numerator (a candidate repeating a gram more
    *     often than its reference gets no credit for the excess)
    *   - `total`   = Σ_docs Σ_g cand_count(g)
    *   - `prec_micro_log2` = ilog2µ(matched+1) − ilog2µ(total+1) —
    *     add-one-smoothed log2 precision in exact integer micro units
    *   - `cand_tokens` / `ref_tokens` — corpus length totals (the
    *     caller's brevity-penalty ratio), constant across rows
    *
    * Output: one row per order n = 1..maxN.
    */
  def corpusNgramPrecision(pairs0: DataFrame, idCol: String,
      candCol: String, refCol: String, maxN: Int): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"bad maxN $maxN")
    // widen: the maxN-order gram explode (both sides) multiplies each
    // pair into ~2·maxN·tokens rows — a one-file bench-scale input
    // would run the whole tokenize+gram chain on ONE scan partition;
    // no-op at real scale (guide §2.5 input skew)
    val pairs = graft.sources.Tables.widen(pairs0)
    // ALL orders in one explode → one (id, n, hash) aggregate per side
    // → one join: 2 keyed exchanges total instead of 2·maxN (a
    // per-order formulation re-scans the pair table 2·maxN times).
    // Tokenization materializes ONCE in its own projection — inlining
    // it into every order's window expression re-tokenizes 4× per row
    // (measured 3× slower than the per-order plan it replaced).
    def gramCounts(side: Column): DataFrame =
      pairs.select(col(idCol).as("_id"),
          nonEmptyTokens(lower(side)).as("_toks"))
        .select(col("_id"),
          explode(concat((1 to maxN).map(n =>
            transform(ngramsOfTokens(col("_toks"), n),
              g => struct(lit(n).as("n"), g.as("g")))): _*)).as("_e"))
        .groupBy(col("_id"), col("_e.n").as("n"),
          md5Hash60(col("_e.g")).as("_gh"))
        .agg(count(lit(1)).as("_c"))
    val perN = gramCounts(col(candCol))
      .join(gramCounts(col(refCol)).withColumnRenamed("_c", "_r"),
        Seq("_id", "n", "_gh"), "left")
      .groupBy(col("n"))
      .agg(
        coalesce(sum(least(col("_c"), coalesce(col("_r"), lit(0L)))),
          lit(0L)).cast(LongType).as("matched"),
        coalesce(sum(col("_c")), lit(0L)).cast(LongType).as("total"))
    // orders with no grams anywhere (every doc shorter than n) have no
    // rows after the aggregate — reinstate them as zero rows so the
    // output is always maxN rows
    val orders = pairs.sparkSession.range(1, maxN + 1)
      .select(col("id").cast("int").as("n"))
    val filled = orders.join(perN, Seq("n"), "left")
      .select(col("n"),
        coalesce(col("matched"), lit(0L)).as("matched"),
        coalesce(col("total"), lit(0L)).as("total"))
    // null texts contribute 0 tokens (NOT size(null)'s legacy -1):
    // the gram side silently drops null rows, and the brevity-penalty
    // totals must stay consistent with the matched/total counts
    def sideTokens(side: String): Column =
      coalesce(sum(when(col(side).isNotNull,
        size(nonEmptyTokens(lower(col(side))))).otherwise(lit(0))
        .cast(LongType)), lit(0L))
    val lens = pairs.agg(
      sideTokens(candCol).as("cand_tokens"),
      sideTokens(refCol).as("ref_tokens"))
    filled
      .withColumn("prec_micro_log2",
        Unigram.ilog2Micro(col("matched") + 1L) -
          Unigram.ilog2Micro(col("total") + 1L))
      .crossJoin(broadcast(lens))
      .select(col("n"), col("matched"), col("total"),
        col("prec_micro_log2"), col("cand_tokens"), col("ref_tokens"))
  }

  /** ONE-row corpus BLEU SCORE in exact integer micro-log2 — the
    * evaluation number itself (Papineni et al. §2.3, add-one
    * smoothed), assembled from [[corpusNgramPrecision]]'s counts with
    * no float anywhere:
    *
    *   - `mean_prec_micro_log2` = −((−Σₙ prec_n) DIV maxN): the
    *     geometric-mean term (1/N)·Σ log2 p̃_n. The sum is NEGATED
    *     before the integer division so the numerator is
    *     non-negative — Spark's DIV truncates toward zero while
    *     DuckDB's `//` floors, and they agree only on non-negative
    *     operands (every prec_n ≤ 0 by add-one smoothing).
    *   - `bp_micro_log2` = 0 when c ≥ r, else
    *     −(((r−c)·1442695) DIV max(c, 1)): log2 BP = (1 − r/c)/ln 2
    *     with 1/ln 2 in micro units (1442695). Overflow bound
    *     (r−c)·1442695 < 2⁶³ holds to ~6.4·10¹² reference tokens —
    *     beyond a 100 TB text corpus; past that, lift to DECIMAL.
    *   - `bleu_micro_log2` = bp + mean — rank-orders corpora and
    *     checkpoints bit-identically on any engine; 2^(x/10⁶) is the
    *     caller's display-only float conversion.
    *
    * The aggregate runs over the maxN-row counts frame — driver-scale
    * work regardless of corpus size.
    */
  def corpusBleuScore(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String, maxN: Int): DataFrame =
    corpusNgramPrecision(pairs, idCol, candCol, refCol, maxN)
      .agg(
        sum(col("prec_micro_log2")).cast(LongType).as("_sp"),
        max(col("cand_tokens")).as("cand_tokens"),
        max(col("ref_tokens")).as("ref_tokens"))
      .select(
        expr(s"-((-_sp) DIV $maxN)").as("mean_prec_micro_log2"),
        when(col("cand_tokens") >= col("ref_tokens"), lit(0L))
          .otherwise(expr("-(((ref_tokens - cand_tokens) * 1442695) " +
            "DIV greatest(cand_tokens, 1))"))
          .as("bp_micro_log2"),
        col("cand_tokens"), col("ref_tokens"))
      .withColumn("bleu_micro_log2",
        col("bp_micro_log2") + col("mean_prec_micro_log2"))
      .select(col("mean_prec_micro_log2"), col("bp_micro_log2"),
        col("bleu_micro_log2"), col("cand_tokens"), col("ref_tokens"))
}
