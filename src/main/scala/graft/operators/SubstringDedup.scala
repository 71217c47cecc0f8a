package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType}

import graft.functions.TextFunctions._

/** Exact substring-level deduplication at fixed token granularity —
  * the verbatim-substring pass of a pretraining-data pipeline (Lee et
  * al., "Deduplicating Training Data Makes Language Models Better"):
  * any run of `k` consecutive tokens that occurs more than once in the
  * corpus (across documents OR repeated within one) is duplicated
  * text, and every copy except the globally FIRST occurrence is
  * scrubbed. Detection granularity is `k` tokens — a duplicated
  * passage shorter than `k` tokens is below the operator's resolution,
  * exactly the published ExactSubstr semantics (50-token default).
  *
  * Distributed formulation (the suffix-array-free shape): every
  * k-token window becomes a positional 60-bit shingle `(id, pos, h)`;
  * a hash aggregate finds shingles with ≥2 occurrences and their
  * lexicographically-first site `min(struct(id, pos))`; all OTHER
  * occurrences of those shingles are "marked". A verbatim duplicated
  * substring of L ≥ k tokens is exactly a run of L−k+1 marked starts,
  * so token-level coverage (a token at position p is duplicated iff a
  * marked window starts in [p−k+1, p]) merges overlapping windows
  * with a bounded RANGE frame — the [[TextAnalysis.commonPassageScrub]]
  * union trick, so document content crosses exactly ONE id-keyed
  * exchange.
  *
  * Keep-first semantics make this a true dedup (corpus retains exactly
  * one copy of every duplicated passage) rather than a boilerplate
  * scrub: [[TextAnalysis.commonPassageScrub]] removes ALL copies of
  * n-grams common to ≥minDocs DISTINCT documents; this pass removes
  * all-but-one copy of ANY repeated k-window, including within-doc
  * repeats.
  *
  * Scale shape:
  *  - Only 60-bit hashes and (id, pos) pairs cross the
  *    shingle-detection exchanges — never text.
  *  - The duplicate-site aggregate is one hash groupBy on the shingle
  *    hash with a map-side partial min; its output is bounded by the
  *    number of DUPLICATED shingles, not corpus size.
  *  - Coverage and reassembly partition by document id, so 1000
  *    executors each scrub their own documents independently; the
  *    RANGE frame is O(tokens) per document.
  *  - No global sort, no global window, no driver-side suffix array.
  */
object SubstringDedup {

  /** Per-document scrub result: (id, n_tokens, n_dup_tokens,
    * dedup_text) where dedup_text is the document with every
    * non-first duplicated k-window's tokens removed (survivors joined
    * by single spaces).
    */
  def exactSubstringDedup(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 50): DataFrame = {
    val (base, marked) = markedOccurrences(df, idCol, textCol, k)
    val starts = marked
      .select(col("_id"), col("_pos"),
        lit(null).cast(StringType).as("_tok"), lit(1).as("_hit"))
    val toked = base
      .select(col("_id"), posexplode(col("_toks")).as(Seq("_pos", "_tok")))
      .withColumn("_hit", lit(0))
    val w = Window.partitionBy(col("_id")).orderBy(col("_pos"))
      .rangeBetween(-(k - 1), 0)
    val covered = toked.unionByName(starts)
      .withColumn("_cov", max(col("_hit")).over(w))
      .filter(col("_tok").isNotNull) // drop the marker rows
    covered
      .groupBy(col("_id"))
      .agg(
        count(lit(1)).cast(IntegerType).as("n_tokens"),
        sum(col("_cov")).cast(IntegerType).as("n_dup_tokens"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("_cov") === 0, struct(col("_pos"), col("_tok"))))),
            x => x.getField("_tok")), " ").as("dedup_text"))
      .withColumnRenamed("_id", idCol)
  }

  /** Maximal scrubbed spans per document: gaps-and-islands over the
    * marked window starts — consecutive starts whose gap is ≤ k merge
    * into one removed region (gap = k means the windows are exactly
    * adjacent: the previous window covers up to s+k−1 and the next
    * starts at s+k). Returns (id, span_start, span_tokens) — the
    * audit view of [[exactSubstringDedup]]: WHERE the duplicated text
    * sits and how long each verbatim region is, per copy removed.
    */
  def duplicatedSpans(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 50): DataFrame = {
    val (_, marked) = markedOccurrences(df, idCol, textCol, k)
    val w = Window.partitionBy(col("_id")).orderBy(col("_pos"))
    marked
      .withColumn("_prev", lag(col("_pos"), 1).over(w))
      .withColumn("_brk",
        when(col("_prev").isNull || col("_pos") - col("_prev") > k, 1)
          .otherwise(0))
      .withColumn("_isl", sum(col("_brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("_id"), col("_isl"))
      .agg(min(col("_pos")).as("_s"), max(col("_pos")).as("_e"))
      .select(col("_id").as(idCol),
        col("_s").cast(LongType).as("span_start"),
        (col("_e") + lit(k) - col("_s")).cast(LongType).as("span_tokens"))
  }

  /** Shared detection: (widened (id, tokens) base, marked duplicate
    * occurrence starts (_id, _pos)). A start is marked iff its
    * k-window hash occurs ≥2 times corpus-wide and this site is NOT
    * the lexicographically-first (id, pos) occurrence.
    */
  private def markedOccurrences(df: DataFrame, idCol: String,
      textCol: String, k: Int): (DataFrame, DataFrame) = {
    require(k >= 2, s"window must be >= 2 tokens, got $k")
    val base = graft.sources.Tables.widen(df)
      .select(col(idCol).as("_id"), nonEmptyTokens(col(textCol)).as("_toks"))
    // (id, start, 60-bit hash) — one row per k-window occurrence; the
    // window string dies here, only its hash travels.
    val occ = base
      .select(col("_id"), posexplode(tokenWindows(col("_toks"), k))
        .as(Seq("_pos", "_sh")))
      .select(col("_id"), col("_pos"), md5Hash60(col("_sh")).as("_h"))
    val dup = occ
      .groupBy(col("_h"))
      .agg(count(lit(1)).as("_cnt"),
        min(struct(col("_id").as("d"), col("_pos").as("p"))).as("_first"))
      .filter(col("_cnt") >= 2)
      .select(col("_h"), col("_first.d").as("_fd"), col("_first.p").as("_fp"))
    val marked = occ.join(dup, Seq("_h"))
      .filter(!(col("_id") === col("_fd") && col("_pos") === col("_fp")))
      .select(col("_id"), col("_pos"))
    (base, marked)
  }

  /** k-token windows of an already-tokenized array, space-joined (the
    * [[TextAnalysis]] wordNGramsOf shape, shared here for the 50-token
    * default).
    */
  private def tokenWindows(toks: org.apache.spark.sql.Column, k: Int) =
    when(size(toks) < k, array().cast(ArrayType(StringType)))
      .otherwise(transform(
        sequence(lit(1), size(toks) - lit(k - 1)),
        i => array_join(slice(toks, i, lit(k)), " ")))
}
