package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

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

  /** Cross-document duplicated-passage scrub (the Gopher/RefinedWeb
    * boilerplate pass): any word n-gram that appears in at least
    * `minDocs` DISTINCT documents is "common" (navigation chrome,
    * license footers, subscribe banners); every token covered by a
    * common n-gram occurrence is removed, and the document is
    * re-emitted without those spans. Overlapping occurrences merge
    * naturally — a token survives only if NO common n-gram covers it.
    *
    * Returns (id, n_tokens, n_covered, scrubbed_text), the scrubbed
    * text being the surviving tokens joined by single spaces.
    *
    * Scale shape (the point of the formulation):
    *  - Common-shingle detection shuffles ONLY (md5(shingle), id)
    *    pairs — never text — and collapses them with a map-side
    *    partial distinct-count.
    *  - Matching shingle occurrences back to documents joins on the
    *    16-byte hash and carries only (id, position) pairs.
    *  - Document content crosses exactly ONE id-keyed exchange: the
    *    token rows are partitioned by id for the coverage window, and
    *    the final per-doc reassembly groupBy reuses that partitioning
    *    (same key → no second content shuffle).
    *  - Coverage itself is a bounded row-frame running max (a token at
    *    position p is covered iff some common occurrence starts in
    *    [p-n+1, p]) — O(tokens) per document, partitioned by doc, so
    *    1000 executors each scrub their own documents independently.
    */
  def commonPassageScrub(
      df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      n: Int = 6, minDocs: Int = 5): DataFrame = {
    require(n >= 2, s"passage length must be >= 2 tokens, got $n")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val base = graft.sources.Tables.widen(df)
      .select(col(idCol).as("_id"), nonEmptyTokens(col(textCol)).as("_toks"))
    // (id, start, md5(shingle)) — one row per n-gram occurrence; the
    // shingle string itself dies here, only its hash travels.
    val occ = base
      .select(col("_id"), posexplode(wordNGramsOf(col("_toks"), n))
        .as(Seq("_start", "_sh")))
      .select(col("_id"), col("_start"), md5(col("_sh")).as("_h"))
    val common = occ
      .groupBy(col("_h"))
      .agg(count_distinct(col("_id")).as("_nd"))
      .filter(col("_nd") >= minDocs)
      .select(col("_h"))
    // Start markers and token rows are UNIONED into one id-keyed
    // stream rather than joined on (id, pos): a join would shuffle the
    // token rows once for the join keys and again for the window
    // partitioning — the union formulation sends document content
    // through exactly ONE exchange (CI-asserted in PlanShapeSpec). A
    // RANGE frame over position makes marker rows at position s cover
    // token rows at positions s..s+n−1 regardless of interleaving.
    val starts = occ.join(common, "_h")
      .select(col("_id"), col("_start").as("_pos"),
        lit(null).cast(StringType).as("_tok"), lit(1).as("_hit"))
    val toked = base
      .select(col("_id"), posexplode(col("_toks")).as(Seq("_pos", "_tok")))
      .withColumn("_hit", lit(0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_id")).orderBy(col("_pos"))
      .rangeBetween(-(n - 1), 0)
    val covered = toked.unionByName(starts)
      .withColumn("_cov", max(col("_hit")).over(w))
      .filter(col("_tok").isNotNull) // drop the marker rows
    // collect_list skips the NULLs the `when` emits for covered tokens;
    // array_sort on the (pos, tok) structs restores document order.
    covered
      .groupBy(col("_id"))
      .agg(
        count(lit(1)).cast(IntegerType).as("n_tokens"),
        sum(col("_cov")).cast(IntegerType).as("n_covered"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("_cov") === 0, struct(col("_pos"), col("_tok"))))),
            x => x.getField("_tok")), " ").as("scrubbed_text"))
      .withColumnRenamed("_id", idCol)
  }

  /** Word n-grams of an ALREADY-tokenized array (companion to
    * [[graft.functions.TextFunctions.wordNGrams]], which tokenizes).
    */
  private def wordNGramsOf(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast(ArrayType(StringType)))
      .otherwise(transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))

  /** Bigram language-model quality scoring — the perplexity-proxy
    * filter of a CCNet-style corpus pipeline (train an LM on the
    * corpus, keep documents the model finds predictable), with the
    * log-probability replaced by a FIXED-POINT conditional
    * probability so the score is pure integer arithmetic any engine
    * reproduces bit-identically: per bigram (w1, w2),
    *
    *   q = ⌊scale · (c(w1,w2) + 1) / (c(w1·) + V)⌋
    *
    * — add-one-smoothed P(w2 | w1) in units of 1/scale, where c(w1·)
    * is w1's occurrence count as a bigram head and V the number of
    * distinct heads. A document's score is the sum and mean of q over
    * its (lowercased, whitespace-token) bigrams; high mean = stock
    * phrasing the corpus has seen a thousand times, low mean = noise,
    * boilerplate soup, or wrong-language text. Summing probabilities
    * instead of log-probabilities keeps the filter's ORDERING
    * behavior for the common case while staying exactly replayable —
    * the real-log variant differs only in the per-bigram map and
    * would inherit everything else.
    *
    * Scale shape: both count tables are vocabulary-bounded hash
    * aggregates with map-side combine; scoring is two equi-joins
    * keyed on the token (stop-bigram skew lands in AQE's lap, and the
    * per-doc aggregate behind it combines map-side); the driver holds
    * exactly ONE scalar (V). The corpus crosses exchanges as
    * (id, bigram) pairs only — never full documents. Pick `scale` so
    * scale · max-bigram-count stays under 2⁶³ (the default 10⁹ is
    * safe to ~9·10⁹ occurrences of one bigram; shrink it for a corpus
    * beyond that).
    *
    * Returns (id, n_bigrams, lm_score_sum, lm_avg_q) for EVERY input
    * row — documents with fewer than two tokens score (0, 0, 0).
    */
  def bigramLmScores(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", scale: Long = 1000000000L): DataFrame = {
    val base = graft.sources.Tables.widen(df)
      .select(col(idCol), explode_outer(
        graft.functions.TextFunctions.wordNGrams(lower(col(textCol)), 2))
        .as("_bg"))
      .persist() // read by the c12, c1, and scoring branches
    try {
      val docBg = base.filter(col("_bg").isNotNull)
      val c12 = docBg.groupBy(col("_bg")).agg(count(lit(1)).as("_c12"))
      val c1 = docBg
        .select(substring_index(col("_bg"), " ", 1).as("_w1"))
        .groupBy(col("_w1")).agg(count(lit(1)).as("_c1"))
        .persist() // read by the V count and the scoring join
      try {
        val vocab = c1.count()
        val scored = docBg
          .join(c12, Seq("_bg"))
          .withColumn("_w1", substring_index(col("_bg"), " ", 1))
          .join(c1, Seq("_w1"))
          .withColumn("_q", expr(s"($scale * (_c12 + 1)) div (_c1 + $vocab)"))
          .groupBy(col(idCol))
          .agg(count(lit(1)).as("n_bigrams"), sum(col("_q")).as("lm_score_sum"))
        base.select(col(idCol)).distinct()
          .join(scored, Seq(idCol), "left")
          .select(col(idCol),
            coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
            coalesce(col("lm_score_sum"), lit(0L)).as("lm_score_sum"),
            when(coalesce(col("n_bigrams"), lit(0L)) === 0, lit(0L))
              .otherwise(expr("lm_score_sum div n_bigrams")).as("lm_avg_q"))
          .orderBy(idCol)
          .localCheckpoint(true)
      } finally c1.unpersist()
    } finally base.unpersist()
  }

  /** PMI collocation mining: the corpus's most-associated adjacent
    * word pairs, ranked by an integer-scaled monotone transform of
    * pointwise mutual information. PMI = log(N·c12/(c1·c2)) is
    * monotone in the rational N·c12/(c1·c2), so ranking by the
    * integer (c12·N·scale) DIV (c1·c2) IS ranking by PMI with zero
    * float/log determinism risk — the q113 fixed-point recipe applied
    * to association instead of likelihood.
    *
    * `minCount` is the standard support floor (raw PMI promotes
    * hapax pairs). Overflow bound: c12·N·scale must stay below 2⁶³ —
    * at a trillion-bigram corpus drop `scale` a few decades; the
    * RANKING is scale-invariant, only the reported resolution
    * changes.
    *
    * Scale shape: one bigram explode feeding three keyed counts
    * (map-side partials), joins keyed on the bigram's words (the
    * c12 frame is vocabulary²-bounded and support-filtered BEFORE
    * the joins), top-k via TakeOrderedAndProject — no global sort,
    * no single-partition funnel.
    */
  def pmiCollocations(df: DataFrame, textCol: String,
      minCount: Long, k: Int, scale: Long = 1000000L): DataFrame = {
    require(minCount >= 1 && k >= 1 && scale >= 1,
      s"bad collocation parameters ($minCount, $k, $scale)")
    val bg = graft.sources.Tables.widen(df)
      .select(explode(
        graft.functions.TextFunctions.wordNGrams(lower(col(textCol)), 2))
        .as("_bg"))
      .persist()
    try {
      val n = bg.count() // total bigram instances: one driver scalar
      val c12 = bg.groupBy(col("_bg")).agg(count(lit(1)).as("_c12"))
        .filter(col("_c12") >= minCount)
      val c1 = bg.select(substring_index(col("_bg"), " ", 1).as("w1"))
        .groupBy(col("w1")).agg(count(lit(1)).as("_c1"))
      val c2 = bg.select(substring_index(col("_bg"), " ", -1).as("w2"))
        .groupBy(col("w2")).agg(count(lit(1)).as("_c2"))
      c12
        .withColumn("w1", substring_index(col("_bg"), " ", 1))
        .withColumn("w2", substring_index(col("_bg"), " ", -1))
        .join(c1, Seq("w1")).join(c2, Seq("w2"))
        .withColumn("pmi_scaled",
          expr(s"(_c12 * ${n}L * ${scale}L) div (_c1 * _c2)"))
        .select(col("w1"), col("w2"), col("_c12").as("n_pair"),
          col("pmi_scaled"))
        .orderBy(col("pmi_scaled").desc, col("w1"), col("w2"))
        .limit(k)
        .localCheckpoint(true)
    } finally bg.unpersist()
  }

  /** Longest contaminated SPAN per eval document — the depth gauge the
    * set-overlap decontamination passes (exact q43, fuzzy q90) cannot
    * provide: "eval doc E shares 60% of its shingles with training"
    * and "eval doc E appears verbatim for 400 characters" are very
    * different findings, and benchmark-leakage audits need the second.
    *
    * Diagonal run-length over positional shingles: both sides emit
    * `(id, pos, hash)` triples (60-bit md5 tokens — no text crosses
    * any exchange); matches join on the hash; a verbatim common
    * substring of length L appears as L−n+1 consecutive matches on
    * one DIAGONAL (epos − tpos constant), so the span is a
    * gaps-and-islands run length inside the (eval, train, diag)
    * window — `epos − row_number()` constant within a run. Per eval
    * doc the best (longest, lowest-train-id) span is reported if it
    * reaches `minSpan` shingles.
    *
    * Scale: the eval side is benchmark-sized by assumption (thousands
    * of docs); the train side streams through one hash equi-join —
    * the same index shape as exact decontamination — and only
    * MATCHING positions reach the window, whose partitions are
    * (eval, train, diag)-bounded. Returns
    * (eval id, train id, span_shingles, span_chars).
    */
  def contaminationSpans(train: DataFrame, trainIdCol: String,
      eval: DataFrame, evalIdCol: String, textCol: String,
      shingleSize: Int, minSpan: Int): DataFrame = {
    require(shingleSize >= 2 && minSpan >= 1,
      s"bad span parameters ($shingleSize, $minSpan)")
    def positional(df: DataFrame, idCol: String, idAs: String,
        posAs: String): DataFrame =
      df.select(col(idCol).as(idAs),
          posexplode(charNGrams(col(textCol), shingleSize))
            .as(Seq(posAs, "_g")))
        .select(col(idAs), col(posAs), md5Hash60(col("_g")).as("_h"))
    val tsh = positional(graft.sources.Tables.widen(train), trainIdCol,
      "_tid", "_tpos")
    val esh = positional(eval, evalIdCol, "_eid", "_epos")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_eid"), col("_tid"), col("_diag"))
      .orderBy(col("_epos"))
    val runs = esh.join(tsh, Seq("_h"))
      .withColumn("_diag", col("_epos") - col("_tpos"))
      .withColumn("_run", col("_epos") - row_number().over(w))
      .groupBy(col("_eid"), col("_tid"), col("_diag"), col("_run"))
      .agg(count(lit(1)).as("_span"))
      .where(col("_span") >= minSpan)
    runs
      .groupBy(col("_eid"))
      .agg(max(struct(col("_span").as("s"), (-col("_tid")).as("nt"))).as("_best"))
      .select(col("_eid").as("eval_id"),
        (-col("_best.nt")).cast("long").as("train_id"),
        col("_best.s").cast("long").as("span_shingles"),
        (col("_best.s") + (shingleSize - 1)).cast("long").as("span_chars"))
      .orderBy(col("eval_id"))
  }

  /** Corpus novelty curve: how much genuinely new content each slice
    * of an ordered ingest contributes. A shingle is "novel" for the
    * LOWEST doc id that contains it; a document's novelty is the
    * fraction of its distinct shingles it introduced; the curve
    * aggregates that by id bucket. Falling novelty = the crawl is
    * saturating — the ingestion-ordering twin of the dedup family
    * (it quantifies repetition the dedup operators then remove).
    *
    * Scale: no per-prefix recomputation and no window over history —
    * "first container" is ONE hash aggregate (`min(doc_id)` per
    * shingle token), novelty-per-doc a second, bucket rollup a third.
    * Only 60-bit md5 tokens cross exchanges, never text. The
    * arithmetic is one integer division per bucket.
    */
  def noveltyCurve(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val sh = df
      .select(col(idCol).as("_id"),
        explode(array_distinct(transform(
          charNGrams(col(textCol), shingleSize),
          g => md5Hash60(g)))).as("_tok"))
    val perDoc = sh.groupBy(col("_id")).agg(count(lit(1)).as("_n_tok"))
    val novel = sh.groupBy(col("_tok")).agg(min(col("_id")).as("_first"))
      .groupBy(col("_first")).agg(count(lit(1)).as("_n_novel"))
    perDoc
      .join(novel, col("_id") === col("_first"), "left")
      .groupBy(expr(s"_id div $bucketWidth").as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_n_tok")).as("n_tokens"),
        sum(coalesce(col("_n_novel"), lit(0L))).as("n_novel"))
      .select(col("bucket"), col("n_docs"), col("n_tokens"), col("n_novel"),
        expr("n_novel * 1000000 div n_tokens").as("novelty_micro"))
      .orderBy(col("bucket"))
  }

  /** Zipf-law audit per group: the log-log slope of term frequency
    * against frequency rank — the corpus-health number (natural text
    * sits near −1; template floods and synthetic spam bend it). All
    * integer: x = ilog2m(rank), y = ilog2m(count) under the engine's
    * piecewise-linear micro-log2, slope from the closed-form OLS in
    * DECIMAL(38,0) (the q146 recipe), reported in ppm (Zipf ≈
    * −1,000,000).
    *
    * Scale shape: one corpus aggregate to (group, term, count) —
    * content-free after hashing? No: the term travels (it IS the
    * group-by key), but the frame is vocabulary-sized from there on.
    * The rank window runs per GROUP over the vocab frame
    * (vocab-bounded by construction), then one sufficient-statistics
    * aggregate per group.
    *
    * @return (groupCol, n_terms, zipf_slope_ppm)
    */
  def zipfSlope(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DecimalType, LongType}
    val counts = docs.filter(col(textCol).isNotNull)
      .select(col(groupCol).as("_g"),
        explode(nonEmptyTokens(lower(col(textCol)))).as("_t"))
      .groupBy(col("_g"), col("_t")).agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col("_g"))
      .orderBy(col("_c").desc, col("_t").asc)
    val xy = counts
      .withColumn("_r", row_number().over(w).cast(LongType))
      .select(col("_g"),
        Unigram.ilog2Micro(col("_r")).as("_x"),
        Unigram.ilog2Micro(col("_c")).as("_y"))
    xy.groupBy(col("_g"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
        sum(col("_x").cast(DecimalType(38, 0)) * col("_x")).as("_sxx"),
        sum(col("_x").cast(DecimalType(38, 0)) * col("_y")).as("_sxy"))
      .select(col("_g").as(groupCol), col("n_terms"),
        expr("CAST((1000000 * (n_terms * _sxy - " +
          "CAST(_sx AS DECIMAL(38,0)) * _sy)) div " +
          "nullif(n_terms * _sxx - " +
          "CAST(_sx AS DECIMAL(38,0)) * _sx, 0) AS BIGINT)")
          .as("zipf_slope_ppm"))
  }
}
