package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Document-corpus text analysis (BASELINE.json north star): language
  * ID, quality scoring, token counting, fingerprinting — one projection
  * per document, fully distributed, no UDFs.
  */
object TextAnalysis {

  /** Attach the full text-analysis column set to a documents frame. */
  def analyze(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    graft.sources.Tables.widen(df)
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("n_bpeish_tokens", bpeishTokenCount(t))
      .withColumn("n_punct", punctCount(t))
      .withColumn("punct_ratio", punctRatio(t))
      .withColumn("stopword_ratio", stopwordRatio(t, enStopwords))
      .withColumn("mean_token_len", meanTokenLength(t))
      .withColumn("quality_score", qualityScore(t))
      .withColumn("lang_pred", langIdHeuristic(t))
      .withColumn("fingerprint", docFingerprint(t))
      .withColumn("rolling_fp", rollingMinFingerprint(t))
  }

  /** Document-term matrix: per-(doc, term) frequency joined with each
    * term's global document frequency — the TF-IDF core (tokenize →
    * tf → df). The idf weight (`ln((N+1)/(df+1)) + 1`) is one
    * projection away, but tf/df stay the canonical output here: they
    * are exact integers every engine agrees on (cross-engine `ln`
    * differs in the last ulp), so the matrix itself is
    * oracle-checkable bit-for-bit.
    *
    * Scale: one shuffle on (doc, term) for tf (map-side partial
    * count), one on term for df, one term-keyed join back — the
    * vocabulary is the join key side, never document content; AQE
    * reuses the tf exchange feeding both branches.
    */
  def termStats(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val terms = graft.sources.Tables.widen(df)
      .select(col(idCol).as("doc_id"),
        explode(nonEmptyTokens(lower(col(textCol)))).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(dfreq, "term").select(col("doc_id"), col("term"), col("tf"), col("df"))
  }

  /** Intra-document repetition statistics — the Gopher/RefinedWeb-style
    * repetition signals a pretraining corpus is filtered on (heavily
    * repetitive documents are boilerplate/spam and poison LM training):
    *
    *  - `dup_token_frac`: fraction of tokens that are repeats of an
    *    earlier token (`1 − distinct/total`),
    *  - `top_bigram_n` / `top_bigram_frac`: occurrences of the most
    *    frequent token bigram and its share of all bigrams.
    *
    * Scale: token stats are a pure projection; the bigram mode needs
    * one shuffle on (doc, bigram) + one on doc — both count-sized, the
    * text itself never shuffles. (A per-row HOF could avoid the shuffle
    * but needs an O(bigrams) hash map per row in a lambda — the
    * aggregate formulation lets Tungsten spill instead.)
    */
  def repetitionStats(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val base = graft.sources.Tables.widen(df)
      .select(col(idCol).as("doc_id"),
        nonEmptyTokens(lower(col(textCol))).as("_toks"))
    val tokStats = base.select(
      col("doc_id"),
      size(col("_toks")).cast("int").as("n_tokens"),
      size(array_distinct(col("_toks"))).cast("int").as("n_distinct"))
    // bigrams of adjacent tokens; guard size<2 (Spark's sequence(1, 0)
    // DESCENDS rather than returning empty)
    val bigrams = base.select(col("doc_id"),
      explode(when(size(col("_toks")) >= 2,
        transform(sequence(lit(1), size(col("_toks")) - 1),
          i => concat_ws(" ", element_at(col("_toks"), i),
            element_at(col("_toks"), i + 1))))
        .otherwise(array().cast("array<string>"))).as("_bg"))
    val bgStats = bigrams.groupBy(col("doc_id"), col("_bg"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col("doc_id"))
      .agg(max(col("_c")).as("top_bigram_n"),
        sum(col("_c")).as("n_bigrams"))
    tokStats.join(bgStats, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_tokens"), col("n_distinct"),
        ((col("n_tokens") - col("n_distinct")).cast("double") /
          greatest(col("n_tokens"), lit(1)).cast("double")).as("dup_token_frac"),
        coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        (coalesce(col("top_bigram_n"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_bigrams"), lit(0L)), lit(1L)).cast("double"))
          .as("top_bigram_frac"))
  }

  /** Repetition gate: drop documents above either repetition threshold
    * (the remediation counterpart of [[repetitionStats]]).
    */
  def repetitionFilter(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxDupTokenFrac: Double = 0.5,
      maxTopBigramFrac: Double = 0.18): DataFrame = {
    val keep = repetitionStats(df, idCol, textCol)
      .filter(col("dup_token_frac") <= maxDupTokenFrac &&
        col("top_bigram_frac") <= maxTopBigramFrac)
      .select(col("doc_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Quality-gate filter: the standard pretraining-corpus cut. */
  def qualityFilter(df: DataFrame, textCol: String = "text",
      minTokens: Int = 10, minScore: Double = 0.3): DataFrame =
    df.filter(tokenCount(col(textCol)) >= minTokens &&
      qualityScore(col(textCol)) >= minScore)

  /** Corpus-level language/quality summary. */
  def corpusSummary(df: DataFrame, textCol: String = "text"): DataFrame =
    analyze(df, textCol)
      .groupBy(col("lang_pred"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"),
        graft.queries.Det.exactAvg(col("quality_score")).as("avg_quality"))
      .orderBy(col("lang_pred"))

  /** Benchmark decontamination: flag every training document that
    * shares at least one verbatim character n-gram with an evaluation
    * set — the standard pre-training hygiene pass (a contaminated doc
    * inflates eval scores without generalization).
    *
    * Returns (id, n_hits): one row per contaminated document with the
    * count of DISTINCT benchmark n-grams it contains. Exact by
    * construction — no probabilistic recall story, so the result is
    * engine-independent and oracle-checkable.
    *
    * Scale: eval sets are tiny next to a 100 TB corpus, so the
    * benchmark n-gram set BROADCASTS; the corpus side never shuffles
    * content — the only shuffle is the per-doc hit count on (id). At
    * truly huge benchmark sets, swap the broadcast for a bloom-filter
    * prefilter plus this join on survivors.
    */
  def flagContaminated(
      docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String,
      n: Int = 30): DataFrame = {
    val benchGrams = bench
      .select(explode(array_distinct(charNGrams(col(benchTextCol), n))).as("_g"))
      .distinct()
    val docGrams = graft.sources.Tables.widen(docs)
      .select(col(idCol),
        explode(array_distinct(charNGrams(col(textCol), n))).as("_g"))
    docGrams.join(broadcast(benchGrams), "_g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }
}
