package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WordPiece-style tokenizer: greedy LONGEST-MATCH-FIRST segmentation
  * (the BERT-family inference rule) — the third tokenizer family next
  * to BPE's merge-order segmentation ([[Bpe]]) and the unigram-LM's
  * Viterbi argmax ([[Unigram]]). The three differ exactly in the
  * segmentation rule, so keeping all three over the same corpus
  * machinery is the point: one engine, the full published tokenizer
  * design space.
  *
  * Simplification vs the published WordPiece FIT (likelihood-gain
  * merges): the vocabulary is frequency-selected from the same
  * substring-candidate table the unigram fit starts from — every
  * single character (the coverage rule: any corpus word segments
  * without an UNK), plus the top-`keepMulti` multi-character pieces by
  * occurrence-weighted frequency, ties to the lexicographically
  * smaller piece. Deterministic, vocabulary-bounded, and exactly
  * replayable — the same simplification q210 documents for the
  * unigram EM, leaving the INFERENCE rule as the operator under test.
  *
  * Scale shape (the [[Unigram]] contract): the corpus crosses the
  * shuffle once into the distinct-word frequency table; candidate
  * explode, vocabulary selection, and the greedy walk are all bounded
  * by distinct-words × maxPieceLen; documents are never re-segmented —
  * per-doc token counts come from joining the word table back. The
  * greedy walk itself is ONE Catalyst `aggregate` fold per word (no
  * shuffle, no UDF): state (pos, cnt); each step jumps to the FARTHEST
  * vocabulary edge starting at pos (single-char edges guarantee
  * progress).
  */
object WordPiece {

  /** (_w, _freq) distinct-word frequencies — corpus crosses once. */
  private def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(explode(split(trim(col(textCol)), "\\s+")).as("_w"))
      .filter(length(col("_w")) > 0)
      .groupBy(col("_w")).agg(count(lit(1)).as("_freq"))

  /** Candidate substring occurrences (the [[Unigram]] explode):
    * (_w, _freq, _len, _j, _i, _p), piece `_p` spans (_j, _i].
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

  /** Frequency-selected vocabulary: (piece, cnt) — every single
    * character plus the top `keepMulti` multi-char pieces with
    * occurrence-weighted count ≥ `minCount`.
    */
  def learnVocab(docs: DataFrame, textCol: String, maxPieceLen: Int,
      keepMulti: Int, minCount: Long): DataFrame = {
    require(maxPieceLen >= 2 && keepMulti >= 0 && minCount >= 1,
      s"bad parameters ($maxPieceLen, $keepMulti, $minCount)")
    val cand = candidates(wordFreqs(docs, textCol), maxPieceLen)
    val counts = cand.groupBy(col("_p"))
      .agg(sum(col("_freq")).as("cnt"))
    val chars = counts.filter(length(col("_p")) === 1)
    val multi = counts
      .filter(length(col("_p")) > 1 && col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("_p").asc)
      .limit(keepMulti)
    chars.unionByName(multi)
      .select(col("_p").as("piece"), col("cnt"))
  }

  /** Greedy longest-match token count per distinct word under `vocab`
    * ((piece, cnt) as from [[learnVocab]]): (_w, _freq, _ntok).
    */
  private[graft] def greedyWordTokens(words: DataFrame,
      vocab: DataFrame, maxPieceLen: Int): DataFrame = {
    val edges = candidates(words, maxPieceLen)
      .join(broadcast(vocab.select(col("piece").as("_p"))), Seq("_p"))
      .groupBy(col("_w"))
      .agg(any_value(col("_freq")).as("_freq"),
        any_value(col("_len")).as("_len"),
        collect_list(struct(col("_j"), col("_i"))).as("_edges"))
    // fold: per step, jump to the farthest vocab edge starting at pos
    val walk: Column = aggregate(
      sequence(lit(1), col("_len")),
      struct(lit(0).as("pos"), lit(0L).as("cnt")),
      (acc, _) => when(acc.getField("pos") >= col("_len"), acc)
        .otherwise(struct(
          array_max(transform(
            filter(col("_edges"),
              e => e.getField("_j") === acc.getField("pos")),
            e => e.getField("_i"))).as("pos"),
          (acc.getField("cnt") + 1L).as("cnt"))))
    edges.select(col("_w"), col("_freq"),
      walk.getField("cnt").as("_ntok"))
  }

  /** Per-document WordPiece token counts: segment the distinct-word
    * vocabulary once, join counts back onto (doc, word) occurrences.
    * Returns (idCol, n_wordpiece_tokens), zero for empty/null docs.
    */
  /** Tokenizer-quality evaluation: fit the vocabulary on the
    * `fitPred` slice of the corpus (e.g. one language), then measure
    * per `groupCol` how the tokenizer generalizes to the WHOLE corpus:
    *
    *   - `n_words`: word occurrences in the group
    *   - `n_unk_words`: occurrences of words the vocabulary CANNOT
    *     segment — a character absent from the fit slice's charset has
    *     no vocab edge, so the word is an UNK (counted as one token,
    *     the BERT convention)
    *   - `n_tokens`: total emitted tokens (greedy pieces + UNKs)
    *   - `fertility`: n_tokens / n_words — the standard cross-lingual
    *     tokenizer-efficiency metric (tokens per word; 1.0 = every
    *     word is one piece, higher = more fragmentation)
    *
    * All counts are exact BIGINTs; fertility is one double division —
    * the whole report is engine-replayable. Scale: identical to
    * [[wordPieceTokenCounts]] (the corpus crosses once into word
    * frequencies; everything else is distinct-word-bounded), plus one
    * broadcast of the bounded vocabulary for the coverage probe.
    */
  def fertilityByGroup(docs: DataFrame, textCol: String,
      groupCol: String, fitPred: Column, maxPieceLen: Int,
      keepMulti: Int, minCount: Long): DataFrame = {
    val vocab = learnVocab(docs.filter(fitPred), textCol, maxPieceLen,
      keepMulti, minCount)
    val words = wordFreqs(docs, textCol)
    // coverage probe: a word segments iff EVERY character position has
    // a single-char vocab edge (single-char pieces guarantee the greedy
    // walk advances; a charset miss means no edge at that position)
    val charMatch = candidates(words, maxPieceLen)
      .filter(col("_i") - col("_j") === 1)
      .join(broadcast(vocab.select(col("piece").as("_p"))), Seq("_p"))
      .groupBy(col("_w"))
      .agg(any_value(col("_len")).as("_clen"), count(lit(1)).as("_cov"))
    val covered = charMatch.filter(col("_cov") === col("_clen")).select("_w")
    val wordStats = greedyWordTokens(words.join(covered, Seq("_w")),
        vocab, maxPieceLen)
      .select(col("_w"), col("_ntok"), lit(false).as("_unk"))
      .unionByName(words.join(covered, Seq("_w"), "left_anti")
        .select(col("_w"), lit(1L).as("_ntok"), lit(true).as("_unk")))
    val docWords = docs
      .select(col(groupCol).as("_grp"),
        explode(split(trim(col(textCol)), "\\s+")).as("_w"))
      .filter(length(col("_w")) > 0)
    docWords.join(wordStats, Seq("_w"))
      .groupBy(col("_grp"))
      .agg(count(lit(1)).cast(LongType).as("n_words"),
        sum(col("_unk").cast(LongType)).cast(LongType).as("n_unk_words"),
        sum(col("_ntok")).cast(LongType).as("n_tokens"))
      .withColumn("fertility",
        col("n_tokens").cast(DoubleType) / col("n_words").cast(DoubleType))
      .select(col("_grp").as(groupCol), col("n_words"),
        col("n_unk_words"), col("n_tokens"), col("fertility"))
  }

  def wordPieceTokenCounts(docs: DataFrame, idCol: String,
      textCol: String, maxPieceLen: Int, keepMulti: Int,
      minCount: Long): DataFrame = {
    val words = wordFreqs(docs, textCol)
    val vocab = learnVocab(docs, textCol, maxPieceLen, keepMulti, minCount)
    val wtok = greedyWordTokens(words, vocab, maxPieceLen)
    // explode_outer + null-out of empty tokens keeps every doc present
    // (empty/null text joins nothing and lands at count 0)
    val docWords = docs
      .select(col(idCol).as("_id"),
        explode_outer(split(trim(col(textCol)), "\\s+")).as("_w0"))
      .select(col("_id"),
        when(length(col("_w0")) > 0, col("_w0")).as("_w"))
    docWords.join(wtok.select(col("_w"), col("_ntok")), Seq("_w"),
        "left_outer")
      .groupBy(col("_id"))
      .agg(coalesce(sum(col("_ntok")), lit(0L)).as("n_wordpiece_tokens"))
      .select(col("_id").as(idCol), col("n_wordpiece_tokens"))
  }
}
