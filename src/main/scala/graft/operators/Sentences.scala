package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Rule-based sentence segmentation — the unit-of-text step bitext
  * mining, sentence-level dedup, and context-window chunking all sit
  * on top of (CCMatrix mines SENTENCE pairs; the engine's chunker
  * q102 counts tokens but real pipelines chunk on sentence
  * boundaries).
  *
  * The splitter is a deterministic three-pass mask-split-unmask in the
  * Java ∩ RE2 regex subset (NO lookahead/lookbehind — RE2 lacks them,
  * and the DuckDB oracle must replay byte-for-byte):
  *
  *   1. MASK dots that do not end sentences, rewriting them to the
  *      control character U+0001 (never in text): known abbreviations
  *      (`Dr.`, `Prof.`, `vs.`, …), two-letter dotted forms
  *      (`e.g.`, `i.e.`, `a.m.`, `p.m.`), and decimal points between
  *      digits.
  *   2. SPLIT on terminator runs: every maximal `[^.!?]+` followed by
  *      its `[.!?]+` run (or end of string) is one sentence.
  *   3. UNMASK U+0001 back to `.` inside each sentence, trim, drop
  *      empties.
  *
  * Scope (documented): single-letter initials (`J. K. Rowling`) and
  * unknown abbreviations still split — the rule list is the
  * high-frequency core, extendable by data, not by algorithm change.
  * Everything is a row-local projection: zero exchanges, zero UDFs.
  */
object Sentences {

  /** The mask character: U+0001 (SOH) — a control char that survives
    * regexp round-trips and never occurs in cleaned text. */
  private val M = "\u0001"

  private[graft] val abbrevOneRe =
    "(?i)\\b(mr|mrs|ms|dr|prof|st|vs|etc|fig|inc|ltd|jr|sr)\\."
  private[graft] val abbrevTwoRe = "(?i)\\b([eipa])\\.([gem])\\."
  private[graft] val decimalRe = "([0-9])\\.([0-9])"
  private[graft] val sentRe = "[^.!?]+(?:[.!?]+|$)"

  /** Array of sentences of `c`, in document order. */
  def segment(c: Column): Column = {
    val ws = trim(regexp_replace(c, "\\s+", " "))
    // two-dot forms first (e.g. / i.e. / a.m. / p.m. — masking the
    // trailing dot alone would leave the INNER dot as a false split)
    val masked = regexp_replace(
      regexp_replace(
        regexp_replace(ws, abbrevTwoRe, "$1" + M + "$2" + M),
        abbrevOneRe, "$1" + M),
      decimalRe, "$1" + M + "$2")
    val sents = regexp_extract_all(masked, lit(sentRe), lit(0))
    filter(transform(sents, s => trim(regexp_replace(s, M, "."))),
      s => length(s) > 0)
  }
}
