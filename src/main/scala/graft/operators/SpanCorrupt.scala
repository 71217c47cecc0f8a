package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.TextFunctions.{md5Hash60, nonEmptyTokens}

/** T5-style span corruption (Raffel et al. 2020 §3.1.4): turn clean
  * text into (input, target) denoising pairs — the input has token
  * spans replaced by numbered sentinels, the target lists each
  * sentinel with the tokens it hides. This is DATA CONSTRUCTION for a
  * denoising objective, run corpus-wide at training-prep time.
  *
  * The classic sampler draws span starts/lengths randomly, which is
  * irreproducible across engines and runs. This operator derandomizes
  * it BLOCK-WISE: tokens partition into fixed blocks of `blockLen`;
  * each FULL block independently corrupts exactly one span whose
  * length L ∈ [1, maxSpan] and offset derive from the 60-bit md5 of
  * `"<id>:<block>"` — integer arithmetic any engine replays, no
  * sequential scan state (a greedy skip-ahead sampler would need a
  * recursive replay; block independence keeps every token's fate a
  * pure function of (id, position)). The trailing partial block
  * passes through uncorrupted. Sentinel k (`<extra_id_k>`) marks
  * block k, in document order, exactly the T5 numbering.
  *
  * Corruption rate = E[L]/blockLen — the defaults (blockLen 8,
  * maxSpan 3 → E[L] = 2) give the paper's ~25%/15% neighborhood;
  * both knobs are explicit.
  *
  * SENTINEL-VOCABULARY CONTRACT: sentinel ids are the block index
  * with no upper bound — a document longer than 100·blockLen tokens
  * emits `<extra_id_100>` and beyond, which the standard T5 vocabulary
  * (100 sentinels) does not contain. Chunking long documents to at
  * most `sentinelVocabSize · blockLen` tokens before corruption is
  * the CALLER's obligation; the `n_spans` output column is the audit
  * handle (`max(n_spans)` over a corpus must stay ≤ the consumer's
  * sentinel count).
  *
  * Row-local higher-order expressions only: zero exchanges, zero
  * UDFs — 100 TB of denoising pairs is scan → project → write.
  */
object SpanCorrupt {

  /** Corrupted pair for one document:
    * (input_text, target_text, n_tokens, n_spans, n_corrupted).
    */
  def corrupt(docs: DataFrame, idCol: String, textCol: String,
      blockLen: Int = 8, maxSpan: Int = 3): DataFrame = {
    require(blockLen >= 2 && maxSpan >= 1 && maxSpan < blockLen,
      s"bad geometry (blockLen=$blockLen, maxSpan=$maxSpan)")
    val toks = nonEmptyTokens(col(textCol))
    val n = size(toks)
    val nBlocks = (n / blockLen).cast(IntegerType)
    val B = lit(blockLen)
    // per-block corruption geometry from two INDEPENDENT 60-bit hashes
    // (len and offset each get their own hash — deriving both from one
    // would need an exact integer division that doubles can't carry at
    // 60 bits)
    def hLen(k: Column): Column =
      md5Hash60(concat(col(idCol).cast("string"), lit(":"), k.cast("string")))
    def hOff(k: Column): Column =
      md5Hash60(concat(col(idCol).cast("string"), lit(":"),
        k.cast("string"), lit(":o")))
    def spanLen(k: Column): Column =
      (pmod(hLen(k), lit(maxSpan.toLong)) + 1L).cast(IntegerType)
    def spanOff(k: Column): Column =
      pmod(hOff(k), (B - spanLen(k) + 1).cast(LongType)).cast(IntegerType)
    def sentinel(k: Column): Column =
      concat(lit("<extra_id_"), k.cast("string"), lit(">"))
    // block k (0-based) covers token positions [k·B+1, k·B+B] (1-based);
    // sequence() generates DESCENDING runs when start > stop, so an
    // empty document must short-circuit to an empty block list
    val blocks = when(nBlocks > 0, sequence(lit(0), nBlocks - 1))
      .otherwise(array().cast("array<int>"))
    val inputParts = transform(blocks, { k =>
      val base = k * B + 1
      val L = spanLen(k); val s = spanOff(k)
      concat(
        slice(toks, base, s),
        array(sentinel(k)),
        slice(toks, base + s + L, B - s - L))
    })
    val targetParts = transform(blocks, { k =>
      val base = k * B + 1
      val L = spanLen(k); val s = spanOff(k)
      concat(array(sentinel(k)), slice(toks, base + s, L))
    })
    val tail = slice(toks, nBlocks * B + 1, n - nBlocks * B)
    val corrupted = coalesce(
      aggregate(transform(blocks, k => spanLen(k)), lit(0),
        (acc, l) => acc + l), lit(0))
    graft.sources.Tables.widen(docs).select(
      col(idCol),
      when(n > 0,
        array_join(concat(flatten(inputParts), tail), " "))
        .otherwise(lit("")).as("input_text"),
      array_join(flatten(targetParts), " ").as("target_text"),
      n.cast(IntegerType).as("n_tokens"),
      nBlocks.as("n_spans"),
      corrupted.cast(IntegerType).as("n_corrupted"))
  }
}
