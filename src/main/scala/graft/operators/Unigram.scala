package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed unigram-LM (SentencePiece-style) tokenizer training —
  * the twin of [[Bpe]] on the other side of the subword-tokenizer
  * design space (Kudo 2018, arXiv:1804.10959): instead of greedily
  * GROWING a vocabulary by merges, START from a substring-frequency
  * seed vocabulary and run EM-prune rounds — score every piece by its
  * corpus log-probability, re-segment every word by Viterbi under
  * those scores, recount, prune to the vocabulary budget, repeat.
  *
  * Like BPE, the corpus crosses the cluster exactly ONCE (the word
  * frequency table); everything after is vocabulary-bounded. Each EM
  * round is: one broadcast join of candidate substring edges against
  * the piece-score table, one per-word Viterbi fold (a Catalyst
  * `aggregate` over positions — document-local, no shuffle), one hash
  * aggregate for the new counts, and one TakeOrdered prune (per-
  * partition heaps, never a global sort).
  *
  * DETERMINISM (the whole point of the formulation — an ANSI oracle
  * replays every round bit-exactly):
  *  - Piece likelihoods are INTEGER MICRO-LOG2 values:
  *    ilog2m(x) = (⌊log2 x⌋)·10⁶ + ((x − 2^⌊log2 x⌋)·10⁶) div 2^⌊log2 x⌋
  *    — a piecewise-linear log2 in exact integer arithmetic (the
  *    classic bit-length + linear-interpolation approximation). A
  *    piece's score is ilog2m(count) − ilog2m(total) ≤ 0; a Viterbi
  *    path's score is the exact integer sum. No float log anywhere —
  *    libm log() differs across engines in the last ulp.
  *  - Viterbi is HARD-EM: ties break to the LONGEST piece (smallest
  *    start j at equal score), totally ordered, so both engines pick
  *    the same segmentation.
  *  - Every word is always segmentable: all single characters seen in
  *    the seed stay in the vocabulary through every prune (the
  *    SentencePiece character-coverage rule), with add-one smoothing
  *    after each E-step so their scores stay finite.
  *
  * Simplifications vs the paper, documented: hard-EM (Viterbi counts)
  * instead of forward-backward expected counts, and a single
  * prune-to-budget per round instead of the gradual 20% shrink — both
  * choices keep the oracle replay exact without changing the
  * vocabulary-bounded scale shape.
  */
object Unigram {

  private val Micro = 1000000L

  /** Integer micro-log2 of a positive integer column: exact integer
    * arithmetic via bit length (`bin`) + linear interpolation between
    * powers of two. The interpolation multiply runs in DECIMAL(38,0)
    * (x can be a 100 TB corpus total; (x−2^b)·10⁶ overflows BIGINT
    * past ~9.2e12). Replay: see the HUGEINT mirror in the q210 oracle.
    */
  private[graft] def ilog2Micro(x: Column): Column = {
    val b = (length(bin(x)) - lit(1)).cast(IntegerType)
    val p = call_function("shiftleft", lit(1L), b)
    (b.cast(LongType) * Micro) +
      call_function("div",
        (x.cast(DecimalType(38, 0)) - p) * Micro, p).cast(LongType)
  }

  /** Candidate substring occurrences of every distinct word:
    * (_w, _freq, _len, _j, _i, _p) — piece `_p` spans character
    * positions (_j, _i] (0-based exclusive start). Word-bounded:
    * ≤ len·maxPieceLen rows per distinct word.
    */
  private def candidates(words: DataFrame, maxPieceLen: Int): DataFrame =
    words
      .withColumn("_len", length(col("_w")).cast(IntegerType))
      .select(col("_w"), col("_freq"), col("_len"),
        explode(expr(
          s"""flatten(transform(sequence(0, _len - 1), j ->
             |  transform(sequence(1, least($maxPieceLen, _len - j)), l ->
             |    struct(j AS j, j + l AS i,
             |      substring(_w, j + 1, l) AS p))))""".stripMargin)).as("_e"))
      .select(col("_w"), col("_freq"), col("_len"),
        col("_e.j").as("_j"), col("_e.i").as("_i"), col("_e.p").as("_p"))

  /** Viterbi-segment every distinct word under a piece-score table.
    * Input `scored`: (_p, _s) with integer scores; every single
    * character of every word MUST be present (callers maintain the
    * character-coverage rule). Returns (_w, _freq, _pieces) where
    * _pieces is the argmax segmentation, ties to the longest piece.
    *
    * The DP is one Catalyst `aggregate` fold over positions per word
    * (no shuffle, no UDF): dp[i] = max over vocab edges (j→i) of
    * dp[j] + s(piece), the max taken lexicographically over
    * (score, −j) so equal scores prefer the smaller j (longer piece);
    * a second fold walks the backpointers.
    */
  private[graft] def viterbiSegments(words: DataFrame, scored: DataFrame,
      maxPieceLen: Int): DataFrame = {
    val edges = candidates(words, maxPieceLen)
      .join(broadcast(scored.select(col("_p"), col("_s"))), Seq("_p"))
      .groupBy(col("_w"))
      .agg(any_value(col("_freq")).as("_freq"),
        any_value(col("_len")).as("_len"),
        collect_list(struct(col("_j"), col("_i"), col("_s"))).as("_edges"))
    val dp = aggregate(
      sequence(lit(1), col("_len")),
      array(struct(lit(0L).as("sc"), lit(-1).as("bp"))),
      (acc, i) => {
        val best = array_max(transform(
          filter(col("_edges"), e => e.getField("_i") === i),
          e => struct(
            (element_at(acc, e.getField("_j") + 1).getField("sc") +
              e.getField("_s")).as("sc"),
            (-e.getField("_j")).as("negj"))))
        concat(acc, array(struct(best.getField("sc").as("sc"),
          (-best.getField("negj")).as("bp"))))
      })
    val bt = aggregate(
      sequence(lit(1), col("_len")),
      struct(col("_len").as("pos"),
        array().cast(ArrayType(StringType)).as("ps")),
      (acc, _) => {
        val pos = acc.getField("pos")
        val bp = element_at(col("_dp"), pos + 1).getField("bp")
        when(pos <= 0, acc).otherwise(struct(
          bp.as("pos"),
          concat(acc.getField("ps"),
            array(col("_w").substr(bp + lit(1), pos - bp))).as("ps")))
      })
    edges
      .withColumn("_dp", dp)
      .withColumn("_pieces", bt.getField("ps"))
      .select(col("_w"), col("_freq"), col("_pieces"))
  }

  /** Attach integer micro-log2 scores to a (piece, count) vocabulary:
    * s(p) = ilog2m(count) − ilog2m(Σ counts). The total is a scalar
    * over the VOCABULARY frame (≤ vocab-budget rows by construction) —
    * partial sum buffers cross one exchange, one row broadcasts back.
    */
  private def scoreVocab(vocab: DataFrame): DataFrame = {
    val tot = vocab.agg(sum(col("_c")).cast(LongType).as("_tot"))
    vocab.crossJoin(broadcast(tot))
      .withColumn("_s", ilog2Micro(col("_c")) - ilog2Micro(col("_tot")))
      .select(col("_p"), col("_c"), col("_s"))
  }

  /** Learn a unigram-LM vocabulary: seed from substring frequencies,
    * then `iters` EM-prune rounds. Returns the full learning TRACE —
    * (iter, piece, cnt) for iter 0 (the pruned seed) through `iters` —
    * so an oracle replay that diverges at ANY round breaks the hash
    * (the q77 iterate-then-replay contract).
    *
    * `keepMulti` is the multi-character vocabulary budget per round
    * (all seen single characters are always retained on top of it);
    * `minCount` gates seed pieces only.
    */
  def learnUnigramVocab(docs: DataFrame, textCol: String,
      keepMulti: Int, iters: Int, maxPieceLen: Int = 4,
      minCount: Int = 2): DataFrame = {
    val (trace, _, _) = fit(docs, textCol, keepMulti, iters, maxPieceLen,
      minCount)
    trace.zipWithIndex.map { case (v, it) =>
        v.select(lit(it).as("iter"), col("_p"), col("_c"))
      }
      .reduce(_ unionByName _)
      .select(col("iter"), col("_p").as("piece"), col("_c").as("cnt"))
  }

  /** Shared EM loop: (per-iteration vocab frames 0..iters, the final
    * vocab frame, the checkpointed word-frequency frame). Inference
    * reads the FINAL frame directly — filtering the union trace
    * instead would both re-run nothing (frames are checkpointed) and
    * trip Catalyst's union constraint rewrite on shared attribute ids.
    */
  private def fit(docs: DataFrame, textCol: String,
      keepMulti: Int, iters: Int, maxPieceLen: Int,
      minCount: Int): (Seq[DataFrame], DataFrame, DataFrame) = {
    require(iters >= 1 && keepMulti >= 1 && maxPieceLen >= 2,
      s"bad unigram parameters ($iters, $keepMulti, $maxPieceLen)")
    val words = Bpe.wordFreqs(docs, textCol)
      .select(col("_w"), col("_freq")).localCheckpoint(true)
    val seedCounts = candidates(words, maxPieceLen)
      .groupBy(col("_p")).agg(sum(col("_freq")).cast(LongType).as("_c"))
      .localCheckpoint(true)
    // the character-coverage floor: every seen character, forever
    val chars = seedCounts.filter(length(col("_p")) === 1)
      .localCheckpoint(true)
    def pruneMulti(counts: DataFrame, withMin: Boolean): DataFrame = {
      val multi = counts.filter(length(col("_p")) > 1)
      val gated = if (withMin) multi.filter(col("_c") >= minCount) else multi
      // TakeOrderedAndProject: per-partition keepMulti-row heaps
      gated.orderBy(desc("_c"), asc("_p")).limit(keepMulti)
    }
    var vocab = chars.unionByName(pruneMulti(seedCounts, withMin = true))
      .localCheckpoint(true)
    val trace = Seq.newBuilder[DataFrame]
    trace += vocab
    for (_ <- 1 to iters) {
      val seg = viterbiSegments(words, scoreVocab(vocab), maxPieceLen)
      val emCounts = seg
        .select(col("_freq"), explode(col("_pieces")).as("_p"))
        .groupBy(col("_p")).agg(sum(col("_freq")).cast(LongType).as("_c"))
      // chars keep add-one smoothed counts; multi prune to budget
      val charCounts = chars.select(col("_p"))
        .join(emCounts.filter(length(col("_p")) === 1), Seq("_p"), "left")
        .select(col("_p"), (coalesce(col("_c"), lit(0L)) + 1L).as("_c"))
      vocab = charCounts.unionByName(pruneMulti(emCounts, withMin = false))
        .localCheckpoint(true) // cut the per-round lineage (Bpe discipline)
      trace += vocab
    }
    (trace.result(), vocab, words)
  }

  /** Per-document token counts under a freshly-fit unigram vocabulary
    * — the inference side, in the scale-correct shape ([[Bpe.bpeTokenCounts]]
    * contract): the DISTINCT-word vocabulary is Viterbi-segmented
    * once, per-word piece counts join back by word, docs sum. Docs
    * with no words count 0.
    */
  /** CCNet-style per-document language-model score (Wenzek et al.
    * 2020 §3.3 use a small LM's perplexity to split a crawl into
    * head/middle/tail quality buckets): the document's NEGATIVE LOG
    * LIKELIHOOD under the fitted unigram LM, in exact integer
    * micro-log2 units — no float log anywhere, so scores (and any
    * bucketing on them) replay bit-for-bit on any engine.
    *
    *   - `nll_micro` = Σ_pieces (ilog2µ(total) − ilog2µ(count)) over
    *     the document's Viterbi segmentation (the q210/q211 machinery)
    *   - `n_pieces`  = segmentation length
    *   - `nll_per_piece_micro` = nll_micro DIV max(n_pieces, 1) — the
    *     length-normalized perplexity proxy bucketing wants
    *
    * Scale: the fit and the per-WORD scores are distinct-word-bounded
    * (vocabulary frames broadcast); the corpus crosses once as
    * (id, word) pairs into the per-doc sum — the q211 shape with a
    * score instead of a count.
    */
  def unigramNllScores(docs: DataFrame, idCol: String, textCol: String,
      keepMulti: Int, iters: Int, maxPieceLen: Int = 4,
      minCount: Int = 2): DataFrame = {
    val (_, finalVocab, words) = fit(docs, textCol, keepMulti, iters,
      maxPieceLen, minCount)
    val scored = scoreVocab(finalVocab)
    val wordNll = viterbiSegments(words, scored, maxPieceLen)
      .select(col("_w"), explode(col("_pieces")).as("_p"))
      .join(broadcast(scored.select(col("_p"), col("_s"))), Seq("_p"))
      .groupBy(col("_w"))
      .agg((-sum(col("_s"))).cast(LongType).as("_nll"),
        count(lit(1)).cast(LongType).as("_np"))
    val docWords = graft.sources.Tables.widen(docs)
      .select(col(idCol),
        explode(split(trim(col(textCol)), "\\s+")).as("_w"))
      .filter(length(col("_w")) > 0)
    val perDoc = docWords.join(wordNll, Seq("_w"))
      .groupBy(col(idCol))
      .agg(sum(col("_nll")).as("nll_micro"), sum(col("_np")).as("n_pieces"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("nll_micro"), lit(0L)).as("nll_micro"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"))
      .withColumn("nll_per_piece_micro",
        expr("nll_micro DIV greatest(n_pieces, 1)"))
  }

  // ---- per-KEY (grouped) fit: the CCNet per-language shape ----
  // Wenzek et al. 2020 fit ONE LM PER LANGUAGE and bucket within the
  // language; a corpus-wide LM (the ungrouped path above) scores
  // low-resource languages as noise. The grouped twins below thread a
  // key column through every exchange: the corpus still crosses ONCE
  // as (key, word) frequencies; vocab frames are (n_keys × budget)-
  // bounded and broadcast; the per-key prune is a window rank instead
  // of a global TakeOrdered. Languages are a bounded enum, so nothing
  // here changes the distinct-word-bounded scale shape.

  private def wordFreqsKeyed(docs: DataFrame, keyCol: String,
      textCol: String): DataFrame =
    graft.sources.Tables.widen(docs)
      .select(col(keyCol).as("_k"),
        explode(split(trim(col(textCol)), "\\s+")).as("_w"))
      .filter(length(col("_w")) > 0)
      .groupBy(col("_k"), col("_w"))
      .agg(count(lit(1)).as("_freq"))

  /** [[candidates]] with the key column riding along. */
  private def candidatesKeyed(words: DataFrame,
      maxPieceLen: Int): DataFrame =
    words
      .withColumn("_len", length(col("_w")).cast(IntegerType))
      .select(col("_k"), col("_w"), col("_freq"), col("_len"),
        explode(expr(
          s"""flatten(transform(sequence(0, _len - 1), j ->
             |  transform(sequence(1, least($maxPieceLen, _len - j)), l ->
             |    struct(j AS j, j + l AS i,
             |      substring(_w, j + 1, l) AS p))))""".stripMargin)).as("_e"))
      .select(col("_k"), col("_w"), col("_freq"), col("_len"),
        col("_e.j").as("_j"), col("_e.i").as("_i"), col("_e.p").as("_p"))

  /** [[viterbiSegments]] per key: the SAME word segments differently
    * under different keys' vocabularies, so word identity is
    * (_k, _w) throughout. The DP/backtrack folds are unchanged
    * (row-local expressions).
    */
  private[graft] def viterbiSegmentsKeyed(words: DataFrame,
      scored: DataFrame, maxPieceLen: Int): DataFrame = {
    val edges = candidatesKeyed(words, maxPieceLen)
      .join(broadcast(scored.select(col("_k"), col("_p"), col("_s"))),
        Seq("_k", "_p"))
      .groupBy(col("_k"), col("_w"))
      .agg(any_value(col("_freq")).as("_freq"),
        any_value(col("_len")).as("_len"),
        collect_list(struct(col("_j"), col("_i"), col("_s"))).as("_edges"))
    val dp = aggregate(
      sequence(lit(1), col("_len")),
      array(struct(lit(0L).as("sc"), lit(-1).as("bp"))),
      (acc, i) => {
        val best = array_max(transform(
          filter(col("_edges"), e => e.getField("_i") === i),
          e => struct(
            (element_at(acc, e.getField("_j") + 1).getField("sc") +
              e.getField("_s")).as("sc"),
            (-e.getField("_j")).as("negj"))))
        concat(acc, array(struct(best.getField("sc").as("sc"),
          (-best.getField("negj")).as("bp"))))
      })
    val bt = aggregate(
      sequence(lit(1), col("_len")),
      struct(col("_len").as("pos"),
        array().cast(ArrayType(StringType)).as("ps")),
      (acc, _) => {
        val pos = acc.getField("pos")
        val bp = element_at(col("_dp"), pos + 1).getField("bp")
        when(pos <= 0, acc).otherwise(struct(
          bp.as("pos"),
          concat(acc.getField("ps"),
            array(col("_w").substr(bp + lit(1), pos - bp))).as("ps")))
      })
    edges
      .withColumn("_dp", dp)
      .withColumn("_pieces", bt.getField("ps"))
      .select(col("_k"), col("_w"), col("_freq"), col("_pieces"))
  }

  /** [[scoreVocab]] per key: each key's total normalizes its own
    * vocabulary (the per-language partition function). The totals
    * frame is n_keys rows and broadcasts.
    */
  private def scoreVocabKeyed(vocab: DataFrame): DataFrame = {
    val tot = vocab.groupBy(col("_k"))
      .agg(sum(col("_c")).cast(LongType).as("_tot"))
    vocab.join(broadcast(tot), Seq("_k"))
      .withColumn("_s", ilog2Micro(col("_c")) - ilog2Micro(col("_tot")))
      .select(col("_k"), col("_p"), col("_c"), col("_s"))
  }

  /** The [[fit]] EM loop per key: (final vocab, word-frequency frame),
    * both keyed. The per-key multi-piece prune is a window rank
    * (PARTITION BY key ORDER BY count DESC, piece ASC ≤ budget) —
    * vocabulary-bounded rows per key cross the rank exchange.
    */
  private def fitByKey(docs: DataFrame, keyCol: String, textCol: String,
      keepMulti: Int, iters: Int, maxPieceLen: Int,
      minCount: Int): (DataFrame, DataFrame) = {
    require(iters >= 1 && keepMulti >= 1 && maxPieceLen >= 2,
      s"bad unigram parameters ($iters, $keepMulti, $maxPieceLen)")
    val words = wordFreqsKeyed(docs, keyCol, textCol).localCheckpoint(true)
    val seedCounts = candidatesKeyed(words, maxPieceLen)
      .groupBy(col("_k"), col("_p"))
      .agg(sum(col("_freq")).cast(LongType).as("_c"))
      .localCheckpoint(true)
    val chars = seedCounts.filter(length(col("_p")) === 1)
      .localCheckpoint(true)
    def pruneMulti(counts: DataFrame, withMin: Boolean): DataFrame = {
      val multi = counts.filter(length(col("_p")) > 1)
      val gated = if (withMin) multi.filter(col("_c") >= minCount) else multi
      gated.withColumn("_rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("_k")).orderBy(desc("_c"), asc("_p"))))
        .filter(col("_rn") <= keepMulti).drop("_rn")
    }
    var vocab = chars.unionByName(pruneMulti(seedCounts, withMin = true))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val seg = viterbiSegmentsKeyed(words, scoreVocabKeyed(vocab),
        maxPieceLen)
      val emCounts = seg
        .select(col("_k"), col("_freq"), explode(col("_pieces")).as("_p"))
        .groupBy(col("_k"), col("_p"))
        .agg(sum(col("_freq")).cast(LongType).as("_c"))
      val charCounts = chars.select(col("_k"), col("_p"))
        .join(emCounts.filter(length(col("_p")) === 1),
          Seq("_k", "_p"), "left")
        .select(col("_k"), col("_p"),
          (coalesce(col("_c"), lit(0L)) + 1L).as("_c"))
      val next = charCounts.unionByName(pruneMulti(emCounts, withMin = false))
        .localCheckpoint(true)
      graft.plans.Checkpoints.drop(vocab) // superseded EM round
      vocab = next
    }
    // the seed counts were consumed by vocab₀'s materialization and
    // chars by the rounds' — with the final vocab materialized (iters
    // ≥ 1) neither lives in any returned frame's lineage
    graft.plans.Checkpoints.drop(seedCounts)
    graft.plans.Checkpoints.drop(chars)
    (vocab, words)
  }

  /** [[unigramNllScores]] with one LM PER KEY (CCNet: per language) —
    * fit, score and normalize within each key's own corpus slice.
    * Output: (idCol, keyCol, nll_micro, n_pieces,
    * nll_per_piece_micro); docs with no words score (0, 0, 0).
    */
  def unigramNllScoresByKey(docs: DataFrame, idCol: String,
      keyCol: String, textCol: String, keepMulti: Int, iters: Int,
      maxPieceLen: Int = 4, minCount: Int = 2): DataFrame = {
    val (finalVocab, words) = fitByKey(docs, keyCol, textCol, keepMulti,
      iters, maxPieceLen, minCount)
    val scored = scoreVocabKeyed(finalVocab)
    val wordNll = viterbiSegmentsKeyed(words, scored, maxPieceLen)
      .select(col("_k"), col("_w"), explode(col("_pieces")).as("_p"))
      .join(broadcast(scored.select(col("_k"), col("_p"), col("_s"))),
        Seq("_k", "_p"))
      .groupBy(col("_k"), col("_w"))
      .agg((-sum(col("_s"))).cast(LongType).as("_nll"),
        count(lit(1)).cast(LongType).as("_np"))
    val docWords = graft.sources.Tables.widen(docs)
      .select(col(idCol), col(keyCol).as("_k"),
        explode(split(trim(col(textCol)), "\\s+")).as("_w"))
      .filter(length(col("_w")) > 0)
    val perDoc = docWords.join(wordNll, Seq("_k", "_w"))
      .groupBy(col(idCol))
      .agg(sum(col("_nll")).as("nll_micro"), sum(col("_np")).as("n_pieces"))
    docs.select(col(idCol), col(keyCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col(keyCol),
        coalesce(col("nll_micro"), lit(0L)).as("nll_micro"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"))
      .withColumn("nll_per_piece_micro",
        expr("nll_micro DIV greatest(n_pieces, 1)"))
  }

  def unigramTokenCounts(docs: DataFrame, idCol: String, textCol: String,
      keepMulti: Int, iters: Int, maxPieceLen: Int = 4,
      minCount: Int = 2): DataFrame = {
    val (_, finalVocab, words) = fit(docs, textCol, keepMulti, iters,
      maxPieceLen, minCount)
    val wordToks = viterbiSegments(words, scoreVocab(finalVocab), maxPieceLen)
      .select(col("_w"), size(col("_pieces")).cast(LongType).as("_ntok"))
    val docWords = graft.sources.Tables.widen(docs)
      .select(col(idCol),
        explode(split(trim(col(textCol)), "\\s+")).as("_w"))
      .filter(length(col("_w")) > 0)
    val perDoc = docWords.join(wordToks, Seq("_w"))
      .groupBy(col(idCol)).agg(sum(col("_ntok")).as("n_unigram_tokens"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_unigram_tokens"), lit(0L)).as("n_unigram_tokens"))
  }
}
