package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis expression library (BASELINE.json north star: language
  * ID, quality scoring, token counting, fingerprinting) — all native
  * Catalyst expressions / higher-order functions, no UDFs, so every
  * function runs distributed and codegen-friendly at 100 TB.
  */
object TextFunctions {

  /** Whitespace tokens; empty/blank input → empty array (pandas-free
    * equivalent of the usual `str.split()` semantics).
    */
  def tokens(c: Column): Column = {
    val t = trim(c)
    when(t.isNull || length(t) === 0, array().cast(ArrayType(StringType)))
      .otherwise(split(t, "\\s+"))
  }

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c)).cast(IntegerType)

  /** BPE-ish token count: letter runs, digit runs, and single
    * non-space symbols — the pre-tokenization regex family BPE
    * tokenizers use. An upper-bound proxy for LLM token budgeting.
    */
  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]"), lit(0)))
      .cast(IntegerType)

  /** Count of sentence-punctuation characters. */
  def punctCount(c: Column): Column =
    length(regexp_replace(c, "[^.!?,;:]", "")).cast(IntegerType)

  /** Ratio helpers are plain double divisions over exact int counts —
    * deterministic across engines.
    */
  def punctRatio(c: Column): Column =
    punctCount(c).cast(DoubleType) / greatest(length(c), lit(1)).cast(DoubleType)

  def stopwordCount(c: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(lower(c)), t => t.isInCollection(stopwords))).cast(IntegerType)

  def stopwordRatio(c: Column, stopwords: Seq[String]): Column =
    stopwordCount(c, stopwords).cast(DoubleType) /
      greatest(tokenCount(c), lit(1)).cast(DoubleType)

  /** Mean token length: exact integer sum of lengths / token count. */
  def meanTokenLength(c: Column): Column = {
    val totalLen = aggregate(tokens(c), lit(0L), (acc, t) => acc + length(t))
    totalLen.cast(DoubleType) / greatest(tokenCount(c), lit(1)).cast(DoubleType)
  }

  /** Character n-gram shingles (1-based substr; text shorter than n →
    * empty array). Building block for MinHash / Jaccard dedup.
    */
  def charNGrams(c: Column, n: Int): Column =
    when(c.isNull || length(c) < n, array().cast(ArrayType(StringType)))
      .otherwise(transform(
        sequence(lit(1), length(c) - lit(n - 1)),
        i => c.substr(i, lit(n))))

  /** Word n-grams over whitespace tokens. */
  def wordNGrams(c: Column, n: Int): Column = {
    val toks = tokens(c)
    when(size(toks) < n, array().cast(ArrayType(StringType)))
      .otherwise(transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
  }

  /** English default stopword list for quality scoring. */
  val enStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "it", "that", "this", "for", "on", "with", "as", "at", "by", "be")

  /** Composite quality score in [0,1]: rewards stopword presence and
    * sane token lengths, penalizes punctuation soup and very short docs.
    * Weights are engine policy (the reference has no equivalent — this is
    * the north-star extension); every term is deterministic arithmetic.
    */
  def qualityScore(c0: Column): Column = Bind.once(c0) { c =>
    // one tokenization + one struct of the four exact counts, let-bound
    // ([[Bind]]): composed by copy, the four terms re-tokenized the
    // document ~8× per row (wordLenTerm alone held two copies of the
    // token aggregate). Arithmetic below is the ORIGINAL expressions in
    // the original operation order — bit-identical doubles, only the
    // shared subtrees deduplicated.
    Bind.once(tokens(c)) { toks =>
      Bind.once(struct(
          size(toks).cast(IntegerType).as("n"),
          aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("len"),
          stopwordCount(c, enStopwords).as("sw"),
          punctRatio(c).as("pr"))) { t =>
        val n = t.getField("n")
        val nD = greatest(n, lit(1)).cast(DoubleType)
        val lenTerm = least(n.cast(DoubleType) / lit(100.0), lit(1.0))
        val stopTerm =
          least(t.getField("sw").cast(DoubleType) / nD * lit(3.0), lit(1.0))
        val punctTerm =
          greatest(lit(1.0) - t.getField("pr") * lit(10.0), lit(0.0))
        val wordLen = t.getField("len").cast(DoubleType) / nD
        val wordLenTerm =
          when(wordLen >= 3.0 && wordLen <= 10.0, lit(1.0)).otherwise(lit(0.5))
        lenTerm * lit(0.3) + stopTerm * lit(0.3) +
          punctTerm * lit(0.2) + wordLenTerm * lit(0.2)
      }
    }
  }

  /** Language profiles for the n-gram/stopword language-ID heuristic. */
  private val langPatterns: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|is|in|that|for|with|was)\\b",
    "es" -> "\\b(el|la|los|las|de|que|y|en|un|una|es|por)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht|ein|eine|mit|von|zu)\\b",
    "fr" -> "\\b(le|les|des|et|est|une|du|dans|pour|que|qui)\\b")

  /** Per-language match counts (deterministic regexp counts). */
  def langScores(c: Column): Seq[(String, Column)] =
    langPatterns.map { case (lang, pat) =>
      lang -> size(regexp_extract_all(lower(c), lit(pat), lit(0))).cast(IntegerType)
    }

  /** Heuristic language ID over {en,es,de,fr,zh}: CJK characters win
    * outright; otherwise argmax of stopword-profile hits with a fixed
    * priority tiebreak (en > es > de > fr); no hits → "und" (undetermined).
    */
  def langIdHeuristic(c: Column): Column = {
    // the four stopword-profile counts are let-bound (one regexp count
    // each) — inlined by copy they re-ran per reference in the CaseWhen
    // chain, up to ~12 regexp_extract_all evaluations per row
    val scores = langScores(c).toMap
    Bind.once(struct(scores("en").as("en"), scores("es").as("es"),
      scores("de").as("de"), scores("fr").as("fr"))) { s =>
      val en = s.getField("en"); val es = s.getField("es")
      val de = s.getField("de"); val fr = s.getField("fr")
      when(c.rlike("[\\u4e00-\\u9fff]"), lit("zh"))
        .when(en === 0 && es === 0 && de === 0 && fr === 0, lit("und"))
        .when(en >= es && en >= de && en >= fr, lit("en"))
        .when(es >= de && es >= fr, lit("es"))
        .when(de >= fr, lit("de"))
        .otherwise(lit("fr"))
    }
  }

  /** Whole-document 64-bit fingerprint over normalized content
    * (lowercased, whitespace-collapsed) — exact-dup detection key.
    */
  def docFingerprint(c: Column): Column =
    xxhash64(regexp_replace(lower(trim(c)), "\\s+", " "))

  /** Rolling-hash fingerprint: min of the 64-bit hashes of the char
    * n-gram stream — one winnowing band; stable under small edits away
    * from the minimizing shingle.
    */
  def rollingMinFingerprint(c: Column, n: Int = 8): Column =
    array_min(transform(charNGrams(c, n), g => xxhash64(g)))

  // -------------------------------------------------------------------
  // Training-corpus scrubbing: mask identifier-like spans before
  // training (the standard pretraining-pipeline cleaning stage).
  // Pure regexp_replace chains — codegen'd, shuffle-free, and the
  // patterns stay inside the RE2-compatible subset (no backrefs /
  // lookaround) so any engine reproduces them byte-for-byte.
  // -------------------------------------------------------------------

  /** The scrub patterns, shared by the mask functions, the q51 oracle
    * query (match counts), and its SQL twin — one definition so the
    * counts can never silently diverge from what [[scrubText]] masks.
    */
  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlPattern: String = "https?://[^\\s]+"
  val phonePattern: String = "\\+?[0-9][0-9 ().-]{7,}[0-9]"

  /** Mask email addresses with a sentinel token. */
  def maskEmails(c: Column, token: String = "<EMAIL>"): Column =
    regexp_replace(c, emailPattern, token)

  /** Mask http(s) URLs with a sentinel token. */
  def maskUrls(c: Column, token: String = "<URL>"): Column =
    regexp_replace(c, urlPattern, token)

  /** Mask phone-number-shaped digit runs (≥9 chars of digits with
    * separators, digit-bounded) with a sentinel token.
    */
  def maskPhones(c: Column, token: String = "<PHONE>"): Column =
    regexp_replace(c, phonePattern, token)

  /** Collapse whitespace runs to single spaces and trim — the
    * normalization step before fingerprinting/shingling.
    */
  def normalizeWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** Full scrub pipeline: mask emails → URLs → phones, then normalize
    * whitespace. Ordering note: an email inside a URL query string is
    * replaced by the email pass first, but the URL pass's `[^\s]+`
    * then absorbs the sentinel into one `<URL>` token — so the whole
    * URL masks as a unit either way (spec-asserted).
    */
  def scrubText(c: Column): Column =
    normalizeWhitespace(maskPhones(maskUrls(maskEmails(c))))

  // -------------------------------------------------------------------
  // Cross-engine (md5-derived) fingerprint family.
  //
  // xxhash64 is engine-specific (seed/implementation differ between
  // engines), so the fingerprints above can only get rows-only external
  // checks. md5 is a standard: every engine produces the identical hex
  // digest, so these variants are verifiable bit-for-bit against any
  // ANSI-SQL system with an md5() function. They cost more per row
  // (hex-string materialization vs a 64-bit int) — at 100 TB prefer the
  // xxhash64 family when no cross-engine parity is required.
  // -------------------------------------------------------------------

  /** Deterministic 60-bit hash from the first 15 hex chars of md5 —
    * reproducible in any engine as `('0x'||substr(md5(x),1,15))::BIGINT`.
    * 60 bits (not 64) so the value always fits a signed BIGINT on both
    * sides with no sign/overflow edge cases.
    */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Whole-document md5 fingerprint (hex string) over normalized
    * content — the cross-engine twin of [[docFingerprint]].
    */
  def docFingerprintMd5(c: Column): Column =
    md5(regexp_replace(lower(trim(c)), "\\s+", " "))

  /** Rolling min-md5 fingerprint: lexicographic min over the n-gram
    * md5 hex strings (hex is lowercase ASCII on every engine, so the
    * min is engine-independent). Cross-engine twin of
    * [[rollingMinFingerprint]].
    */
  def rollingMinFingerprintMd5(c: Column, n: Int = 8): Column =
    array_min(transform(charNGrams(c, n), g => md5(g)))

  /** Non-empty whitespace tokens: [[tokens]] minus the empty strings a
    * `\s+` split keeps when the text starts/ends with non-space
    * whitespace (trim strips 0x20 only, so "\tfoo" splits to
    * ["", "foo"]). The simhash family votes over THESE — aligned with
    * the native expressions (SimHash64Expression / SimHashMd5Expression
    * skip zero-byte tokens) and with the DuckDB oracles (which
    * `list_filter` the same way), so all three formulations agree on
    * tab/newline-bounded and whitespace-only text.
    */
  def nonEmptyTokens(c: Column): Column =
    filter(tokens(c), t => length(t) > 0)

  /** 60-bit SimHash over whitespace tokens with md5-derived token
    * hashes — the cross-engine twin of [[simHash64]]. Packs the sign
    * bit of vote i at position i (positions 0..59), so the result is
    * always a non-negative BIGINT both engines agree on.
    * NULL input → NULL (matches the native expression); empty tokens
    * are excluded from the vote (see [[nonEmptyTokens]]).
    */
  def simHashMd5(c: Column): Column =
    when(c.isNull, lit(null).cast(LongType)).otherwise(
      simHashMd5FromHashes(transform(nonEmptyTokens(c), t => md5Hash60(t))))

  /** 60-bit SimHash from a precomputed `array<long>` of md5-derived
    * token hashes. Same alloc-free 60-fold shape as
    * [[simHash64FromHashes]]; heavy callers should materialize the
    * hash array once (`withColumn`) so the md5s are computed once, not
    * once per bit.
    */
  def simHashMd5FromHashes(hashes: Column): Column = {
    val bitSigns = (0 until 60).map { i =>
      val votes = aggregate(hashes, lit(0),
        (acc, h) => acc + when(
          shiftrightunsigned(h, i).bitwiseAND(lit(1L)) === 1L, lit(1))
          .otherwise(lit(-1)))
      when(votes > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bitSigns.reduce((a, b) => a.bitwiseOR(b))
  }

  /** 64-bit SimHash over whitespace tokens: per-bit ±1 votes from each
    * token's xxhash64, folded with higher-order functions (one pass,
    * no shuffle, no UDF). NULL input → NULL and empty tokens excluded,
    * matching the native SimHash64Expression (see [[nonEmptyTokens]]).
    */
  def simHash64(c: Column): Column =
    when(c.isNull, lit(null).cast(LongType)).otherwise(
      simHash64FromHashes(transform(nonEmptyTokens(c), t => xxhash64(t))))

  /** SimHash from a precomputed `array<long>` of token hashes.
    *
    * Implementation note: one alloc-free `aggregate` fold per bit
    * (64 folds over the hash array) beats the textbook per-token
    * `zip_with` vote-vector accumulation ~4×: the latter allocates two
    * 64-element arrays per token, and allocation dominates interpreted
    * higher-order-function evaluation. Callers doing heavy dedup should
    * materialize the token-hash array once (`withColumn`) and call this.
    */
  def simHash64FromHashes(hashes: Column): Column = {
    val bitSigns = (0 until 64).map { i =>
      // vote sum for bit i: +1 if hash bit set, -1 otherwise, no allocs
      val votes = aggregate(hashes, lit(0),
        (acc, h) => acc + when(
          shiftrightunsigned(h, i).bitwiseAND(lit(1L)) === 1L, lit(1))
          .otherwise(lit(-1)))
      when(votes > 0, lit(1L << (63 - i))).otherwise(lit(0L))
    }
    // pack sign bits with bitwise OR of static powers (an arithmetic
    // acc*2 fold overflows at bit 63 under ANSI)
    bitSigns.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Full text canonicalization for dedup/decontamination pipelines:
    * Unicode NFC ([[graft.expressions.NfcNormalizeExpression]] — the
    * no-UDF native expression), NBSP → space, zero-width characters
    * and soft hyphens stripped, whitespace collapsed, trimmed. Every
    * step is a standard any engine reproduces (DuckDB: nfc_normalize +
    * the same regex chain), so canonical fingerprints are
    * cross-engine-comparable.
    */
  def canonicalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        translate(
          graft.expressions.NfcNormalizeExpression.nfcNormalize(c),
          "\u00A0", " "),
        "[\u200B\u200C\u200D\uFEFF\u00AD]", ""),
      "\\s+", " "))
}
