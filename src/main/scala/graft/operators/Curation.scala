package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions._

/** Corpus-curation operators for training-data selection: hybrid
  * retrieval fusion, model-based quality scoring, and hard
  * quality-rule filtering.
  *
  * The reference's notion of "curation" is row-level rejection during
  * cleaning (`/root/reference/monarch_etl/cleaning.py:105-289` drops
  * unparseable dates and out-of-range coordinates); these operators are
  * the LLM-corpus generalization the north star asks for: decide which
  * documents enter a training set, with every decision reproducible by
  * an independent engine.
  *
  * Scale design, per operator:
  *  - [[rrfFuse]] consumes top-k frames that are ALREADY driver-bounded
  *    by their producers (k rows per retrieval arm, never the corpus).
  *    Fusing is a full-outer join chain over ≤ arms·k rows — the only
  *    single-partition work in the pipeline is this bounded fuse, by
  *    construction.
  *  - [[hashedLinearScore]] is fastText-style inference collapsed to a
  *    pure per-row projection: token → 60-bit md5 hash → weight bucket
  *    → integer weight, folded with an integer sum inside ONE codegen'd
  *    expression. Zero shuffles, zero UDFs, embarrassingly parallel at
  *    any corpus size. (Training the weights is out of scope — the
  *    operator contract is deterministic INFERENCE of a given linear
  *    model; the bucket→weight map here is a fixed arithmetic formula
  *    so any engine can replay it without shipping a weight table.)
  *  - [[gopherRules]] evaluates every rule from the per-row token list
  *    in one projection — the Gopher/C4-style battery (word count
  *    bounds, mean word length, stopword evidence, symbol density,
  *    single-token domination) with per-rule verdict columns so a
  *    downstream audit can attribute every rejection. No shuffles.
  */
object Curation {

  /** Reciprocal Rank Fusion (Cormack et al., SIGIR'09): score(d) =
    * Σ_arms 1/(c + rank_arm(d)) over the arms that returned d.
    *
    * `arms` are top-k frames each carrying (idCol, rankCol) with ranks
    * 1..k — e.g. a BM25 arm and a dense-ANN arm. Returns the fused
    * top-`k` as (idCol, rrf_score, n_arms, fused_rank).
    *
    * Determinism: 1/(c+rank) is one IEEE division on exact integer
    * operands; contributions add in arm order (fixed expression tree);
    * ties break by id. Any engine reproduces the exact doubles.
    */
  def rrfFuse(arms: Seq[DataFrame], idCol: String, rankCol: String,
      c: Int = 60, k: Int = 20): DataFrame = {
    require(arms.nonEmpty, "rrfFuse needs at least one arm")
    val contribs = arms.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol).as("_id"),
        (lit(1.0) / (lit(c.toDouble) + col(rankCol).cast(DoubleType)))
          .as(s"_c$i"))
    }
    val joined = contribs.reduceLeft((a, b) => a.join(b, Seq("_id"), "full_outer"))
    val score = contribs.indices
      .map(i => coalesce(col(s"_c$i"), lit(0.0))).reduceLeft(_ + _)
    val nArms = contribs.indices
      .map(i => when(col(s"_c$i").isNotNull, 1).otherwise(0)).reduceLeft(_ + _)
    // the fused frame is ≤ arms·k rows by construction — the global
    // rank window is bounded, not a corpus funnel
    val w = Window.orderBy(desc("rrf_score"), asc("_id"))
    joined
      .select(col("_id"), score.as("rrf_score"),
        nArms.cast(IntegerType).as("n_arms"))
      .withColumn("fused_rank", row_number().over(w).cast(IntegerType))
      .filter(col("fused_rank") <= k)
      .withColumnRenamed("_id", idCol)
  }

  /** Canonical-document selection: given near-duplicate components
    * (from [[Dedup.connectedComponents]] over verified near-dup
    * pairs), keep exactly one representative per component — the
    * highest-`score` member, ties to the lowest id — plus every
    * singleton (a doc in no component represents itself).
    *
    * This is the "pick the best copy" step after near-dup clustering:
    * clustering says WHICH docs say the same thing; this decides which
    * copy enters the corpus, by quality instead of by id.
    *
    * Output: (idCol, component_id, n_members, score) for the kept
    * docs. Scale: `score` computes in the scan projection, the join
    * with the (id, component)-sized label frame and the per-component
    * window shuffle (id, component, score) triples only — document
    * content never crosses an exchange.
    */
  def canonicalPerComponent(df: DataFrame, components: DataFrame,
      idCol: String, score: Column): DataFrame = {
    // widen: the caller-supplied score column is typically a per-row
    // tokenization battery (qualityScore) — on a one-file bench-scale
    // input it would run on the scan's 1-2 partitions; no-op at scale
    val scored = graft.sources.Tables.widen(df)
      .select(col(idCol).as("_id"), score.as("_score"))
    val labeled = scored.join(
        components.select(col("id").as("_id"), col("component_id")),
        Seq("_id"), "left")
      .withColumn("component_id", coalesce(col("component_id"), col("_id")))
    val w = Window.partitionBy(col("component_id"))
      .orderBy(desc("_score"), asc("_id"))
    labeled
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy(col("component_id")))
          .cast(LongType))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select(col("_id").as(idCol), col("component_id"),
        col("n_members"), col("_score").as("score"))
  }

  /** Weight (integer "cents" in [-100, 100]) of one token under the
    * fixed hashed linear model: bucket = md5₆₀(token) mod `buckets`,
    * weight = (bucket·37 + 11) mod 201 − 100. Pure arithmetic — no
    * weight table to ship, any engine replays it.
    */
  private def tokenWeightCents(t: Column, buckets: Int): Column =
    (md5Hash60(t) % buckets * 37 + 11) % 201 - 100

  /** FastText-style linear text classifier inference: mean hashed
    * token weight plus a bias, decided at logit > 0.
    *
    * Output: idCol, n_tokens, w_sum_cents (exact integer evidence),
    * logit, keep (1/0). The logit is
    * `bias + (w_sum_cents / 100.0) / max(n_tokens, 1)` — integer sum
    * first (order-independent), then two IEEE divisions on identical
    * operands, so the doubles are bit-identical on any engine.
    */
  def hashedLinearScore(df: DataFrame, idCol: String, textCol: String,
      buckets: Int = 64, bias: Double = -0.05): DataFrame = {
    val toks = nonEmptyTokens(lower(col(textCol)))
    val sumCents = aggregate(toks, lit(0L),
      (acc, t) => acc + tokenWeightCents(t, buckets).cast(LongType))
    val n = size(toks)
    val logit = lit(bias) +
      sumCents.cast(DoubleType) / lit(100.0) /
        greatest(n, lit(1)).cast(DoubleType)
    graft.sources.Tables.widen(df).select(
      col(idCol),
      n.cast(IntegerType).as("n_tokens"),
      sumCents.as("w_sum_cents"),
      logit.as("logit"),
      when(logit > 0.0, 1).otherwise(0).cast(IntegerType).as("keep"))
  }

  /** Gopher-style hard quality-rule battery (Rae et al. 2021 §A1.1
    * flavor, adapted to the engine's deterministic primitives). Each
    * rule emits a 1/0 verdict column; `keep` is their conjunction:
    *
    *  - r_wordcount: token count within [minTokens, maxTokens]
    *  - r_wordlen:   mean token length within [3, 10]
    *  - r_stopwords: ≥ 2 stopword occurrences (English evidence)
    *  - r_symbols:   digit characters ≤ 20% of all characters
    *  - r_repetition: most frequent token ≤ `maxTopTokenFrac` of all
    *    tokens (single-token domination — the n-gram repetition rule's
    *    unigram core; q53 covers the n-gram variants)
    *
    * All five rules fold into ONE per-row projection over the token
    * list; the repetition rule is O(u·n) per row on the distinct-token
    * count u — row-local work, no shuffle anywhere.
    */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 20, maxTokens: Int = 100000,
      maxTopTokenFrac: Double = 0.1): DataFrame = {
    // One struct column holding all rule verdicts, then a re-select
    // extracting the fields (r14 opt): composed per-column, the seven
    // output columns re-instantiated the tokenization ~8× per row and
    // `keep` re-ran every rule — including the O(u·n) top-token scan —
    // a second time. The struct alias is referenced by every output
    // field, so CollapseProject keeps it un-inlined: one evaluation
    // per row. Counts/rules are the ORIGINAL expressions (bit-identical
    // doubles), only the shared subtrees are let-bound ([[Bind]]).
    val t = col(textCol)
    def b(c: Column): Column = when(c, 1).otherwise(0).cast(IntegerType)
    val verdicts = graft.functions.Bind.once(
        nonEmptyTokens(lower(t))) { toks =>
      graft.functions.Bind.once(struct(
          size(toks).as("n"),
          meanTokenLength(t).as("mwl"),
          stopwordCount(t, enStopwords).as("nstop"),
          length(regexp_replace(t, "[^0-9]", "")).as("ndigit"),
          greatest(length(t), lit(1)).cast(DoubleType).as("nchars"),
          array_max(transform(array_distinct(toks),
            d => size(filter(toks, x => x === d)))).as("toptok"))) { s =>
        val n = s.getField("n")
        val nD = greatest(n, lit(1)).cast(DoubleType)
        val mwl = s.getField("mwl")
        val rWc = n >= minTokens && n <= maxTokens
        val rWl = mwl >= 3.0 && mwl <= 10.0
        val rSw = s.getField("nstop") >= 2
        val rSy = s.getField("ndigit").cast(DoubleType) /
          s.getField("nchars") <= 0.2
        val rRe = coalesce(
          s.getField("toptok").cast(DoubleType) / nD <= maxTopTokenFrac,
          lit(true))
        struct(
          n.cast(IntegerType).as("n_tokens"),
          b(rWc).as("r_wordcount"),
          b(rWl).as("r_wordlen"),
          b(rSw).as("r_stopwords"),
          b(rSy).as("r_symbols"),
          b(rRe).as("r_repetition"),
          b(rWc && rWl && rSw && rSy && rRe).as("keep"))
      }
    }
    graft.sources.Tables.widen(df)
      .select(col(idCol), verdicts.as("_g"))
      .select(col(idCol),
        col("_g.n_tokens").as("n_tokens"),
        col("_g.r_wordcount").as("r_wordcount"),
        col("_g.r_wordlen").as("r_wordlen"),
        col("_g.r_stopwords").as("r_stopwords"),
        col("_g.r_symbols").as("r_symbols"),
        col("_g.r_repetition").as("r_repetition"),
        col("_g.keep").as("keep"))
  }

  /** Gopher line/paragraph repetition battery (Rae et al. 2021 §A1.1,
    * the STRUCTURAL half the token-level battery ([[gopherRules]],
    * q53) does not cover): crawl boilerplate repeats as whole lines
    * (nav crumbs, cookie banners) and whole paragraphs (syndicated
    * blocks), and the Gopher filters gate on four fractions —
    * duplicate lines / paragraphs by COUNT and by CHARACTER MASS:
    *
    *   - dup_line_frac:       (n_lines − n_distinct) / n_lines
    *   - dup_line_char_frac:  chars in occurrences beyond each line's
    *                          first / total line chars
    *   - dup_para_frac / dup_para_char_frac: the same at paragraph
    *     granularity (blank-line-separated blocks)
    *
    * `keep` applies the paper's thresholds (count fracs ≤ 0.30, char
    * fracs ≤ 0.20). Lines/paragraphs trim and blank ones drop before
    * counting. All counts are exact integers computed ROW-LOCALLY
    * (the distinct-scan is O(u·n) per row like [[gopherRules]]'s
    * repetition rule); each fraction is one double division — zero
    * exchanges, any engine replays it.
    */
  def lineRepetitionRules(df: DataFrame, idCol: String, textCol: String,
      maxDupFrac: Double = 0.3, maxDupCharFrac: Double = 0.2): DataFrame = {
    // null text folds to '' (zero lines/paragraphs, all fractions 0,
    // keep = 1 — identical to the empty-string row), not the confusing
    // size(null) = -1 sentinel counts
    def units(sep: String): Column =
      filter(transform(split(coalesce(col(textCol), lit("")), sep),
          u => trim(u)),
        u => length(u) > 0)
    // one bound stats struct per granularity, extracted by field in a
    // second projection (the gopherRules r14-opt shape): per-column
    // composition re-split the text and re-ran the O(u·n) duplicate-
    // char scan once per consuming column (`keep` alone re-ran both
    // granularities' scans). Same expressions, same operation order —
    // bit-identical doubles.
    def statsOf(sep: String): Column =
      graft.functions.Bind.once(units(sep)) { u =>
        graft.functions.Bind.once(array_distinct(u)) { dis =>
          graft.functions.Bind.once(struct(
              size(u).as("n"),
              size(dis).as("nd"),
              aggregate(u, lit(0L), (a, x) => a + length(x)).as("tot"),
              aggregate(dis, lit(0L), (a, d) =>
                a + (size(filter(u, x => x === d)) - 1).cast(LongType) *
                  length(d)).as("dup"))) { s =>
            val n = s.getField("n")
            struct(
              n.as("n"),
              ((n - s.getField("nd")).cast(DoubleType) /
                greatest(n, lit(1)).cast(DoubleType)).as("f"),
              (s.getField("dup").cast(DoubleType) /
                greatest(s.getField("tot"), lit(1L)).cast(DoubleType))
                .as("cf"))
          }
        }
      }
    def b(c: Column): Column = when(c, 1).otherwise(0).cast(IntegerType)
    graft.sources.Tables.widen(df)
      .select(col(idCol),
        statsOf("\\r?\\n").as("_l"),
        statsOf("(?:\\r?\\n){2,}").as("_p"))
      .select(col(idCol),
        col("_l.n").cast(IntegerType).as("n_lines"),
        col("_l.f").as("dup_line_frac"),
        col("_l.cf").as("dup_line_char_frac"),
        col("_p.n").cast(IntegerType).as("n_paras"),
        col("_p.f").as("dup_para_frac"),
        col("_p.cf").as("dup_para_char_frac"),
        b(col("_l.f") <= maxDupFrac && col("_p.f") <= maxDupFrac &&
          col("_l.cf") <= maxDupCharFrac && col("_p.cf") <= maxDupCharFrac)
          .as("keep"))
  }

  /** Obfuscation fold for blocklist matching: the normalization that
    * makes `SP4MW0RD`, `sp@mw0rd` and `sp​amword` (zero-width space
    * inside) all match the blocklist entry `spamword`. Applied to BOTH
    * the corpus tokens and the blocklist terms, in order:
    *
    *  1. lowercase
    *  2. strip zero-width/invisible characters (U+200B..U+200D,
    *     U+FEFF — the classic filter-evasion insert)
    *  3. leetspeak character fold (`translate`, one pass):
    *     0→o 1→l 3→e 4→a 5→s 7→t 8→b @→a $→s !→i
    *  4. collapse repeated VOWEL runs (aa+→a per vowel — five
    *     RE2-safe literal-class regexes; a generic same-char squeeze
    *     needs a backreference, which RE2 lacks, so it is out of the
    *     cross-engine subset by design)
    *
    * This is a MATCHING fold, not display normalization — legit words
    * also change (`cool`→`col`), which is fine because the blocklist
    * folds identically. Row-local `translate`/`regexp_replace`
    * natives; zero exchanges.
    */
  def obfuscationFold(c: Column): Column = {
    val lowered = lower(c)
    val noZw = regexp_replace(lowered,
      "[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]", "")
    val leet = translate(noZw, "0134578@$!", "oleastbasi")
    Seq("a", "e", "i", "o", "u").foldLeft(leet)((acc, v) =>
      regexp_replace(acc, s"$v{2,}", v))
  }

  /** Fold the obfuscation out of a string on the DRIVER — the exact
    * Scala twin of [[obfuscationFold]], used to fold blocklist terms
    * before broadcasting them (terms are driver-side literals).
    */
  private[graft] def foldTerm(t: String): String = {
    val zw = Set('\u200B', '\u200C', '\u200D', '\uFEFF')
    val map = "0134578@$!".zip("oleastbasi").toMap
    val leet = t.toLowerCase.filterNot(zw).map(ch => map.getOrElse(ch, ch))
    Seq('a', 'e', 'i', 'o', 'u').foldLeft(leet)((acc, v) =>
      acc.replaceAll(s"$v{2,}", v.toString))
  }

  /** Blocklist matching over folded tokens: documents whose folded
    * whitespace tokens contain any folded blocklist term, with hit
    * counts. Output: (idCol, n_hits, n_terms) for MATCHED documents
    * only — callers anti-join to drop them or join to inspect.
    *
    * Scale: the blocklist folds driver-side and broadcasts (safety
    * lists are thousands of terms); the corpus folds in the scan
    * projection, tokens reduce to per-doc hit partials through the
    * one id-keyed aggregate. Token text joins against the broadcast
    * list map-side — no corpus-sized exchange of text.
    */
  def blocklistHits(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "blocklist must be non-empty")
    val folded = terms.map(foldTerm).distinct
    val toks = nonEmptyTokens(obfuscationFold(col(textCol)))
    df.select(col(idCol).as("_id"), explode(toks).as("_t"))
      .filter(col("_t").isin(folded: _*))
      .groupBy(col("_id"))
      .agg(count(lit(1)).cast(LongType).as("n_hits"),
        countDistinct(col("_t")).cast(LongType).as("n_terms"))
      .select(col("_id").as(idCol), col("n_hits"), col("n_terms"))
  }
}
