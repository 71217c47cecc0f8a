package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** HTML → training text: strip markup and drop boilerplate blocks —
  * step 0 of every web-corpus pipeline (the jusText/trafilatura
  * family: a block dominated by link text is navigation/footer chrome,
  * not content). The reference ETL ingests structured API rows and
  * never faces markup; a 100 TB web crawl is mostly markup.
  *
  * Everything here is a ROW-LOCAL projection built from native
  * `regexp_*`, `split`, and higher-order array functions — no explode,
  * no exchange, no UDF; a 100 TB extraction is scan → project → write
  * at input parallelism. The block-keep rule is integer arithmetic
  * (`2·anchor_len < text_len`), so no float ever enters the decision.
  *
  * Regex dialect note: every pattern is written in the Java ∩ RE2
  * common subset ((?is) flags, lazy quantifiers, character classes —
  * NO backreferences, which RE2 lacks), so the DuckDB oracle replays
  * the byte-identical extraction.
  */
object Markup {

  /** Expression let-binding — see [[graft.functions.Bind]]: one copy
    * of `e` in the tree however many times `f`'s body references it.
    */
  private def bind(e: Column)(f: Column => Column): Column =
    graft.functions.Bind.once(e)(f)

  /** Block boundaries: block-level open/close tags split a document
    * into candidate text blocks; inline tags (<a>, <b>, …) stay inside
    * blocks so link density can be measured per block.
    */
  private[graft] val blockSplitRe =
    "(?i)</?(?:p|div|li|ul|ol|h[1-6]|nav|footer|header|table|tr|td|br|section|article)[^>]*>"

  /** Anchor bodies (group 1), for per-block link-density measurement. */
  private[graft] val anchorRe = "(?is)<a[^>]*>(.*?)</a>"

  /** Numeric character reference pattern: decimal `&#8217;` and hex
    * `&#x2019;` forms, digit runs BOUNDED (8 dec / 6 hex — enough for
    * every valid codepoint; longer runs stay literal text, so the
    * codepoint parse can never overflow).
    */
  private[graft] val numRefRe = "&#(?:[0-9]{1,8}|[xX][0-9a-fA-F]{1,6});"
  private[graft] val numRefGroupRe = "&#([0-9]{1,8}|[xX][0-9a-fA-F]{1,6});"

  /** One character from a codepoint, full Unicode — Spark's `chr` is
    * ASCII-only, so the codepoint is rendered as UTF-16BE code units
    * (surrogate pair arithmetic for the supplementary planes) and
    * decoded back, all native expressions. Invalid codepoints (0,
    * > U+10FFFF, the surrogate range) map to U+FFFD — the HTML5
    * replacement rule, and the DuckDB twin is its native `chr`.
    */
  private def chrUnicode(cp00: Column): Column = bind(cp00) { cp0 =>
    val valid = cp0 >= 1L && cp0 <= 0x10FFFFL &&
      !(cp0 >= 0xD800L && cp0 <= 0xDFFFL)
    bind(when(valid, cp0).otherwise(lit(0xFFFDL))) { cp =>
      val bmp = decode(unhex(lpad(hex(cp), 4, "0")), "UTF-16BE")
      val v = cp - 0x10000L
      val units = concat(
        lpad(hex(shiftright(v, 10) + 0xD800L), 4, "0"),
        lpad(hex(v.bitwiseAND(0x3FFL) + 0xDC00L), 4, "0"))
      when(cp < 0x10000L, bmp).otherwise(decode(unhex(units), "UTF-16BE"))
    }
  }

  /** Codepoint of one extracted reference body (`8217` or `x2019`). */
  private def refCodepoint(r: Column): Column =
    when(lower(substring(r, 1, 1)) === "x",
      conv(substring(r, 2, 6), 16, 10).cast(LongType))
      .otherwise(r.cast(LongType))

  /** Decode decimal/hex numeric character references in one SINGLE
    * pass (`&#38;#39;` yields the literal `&#39;`, never `'` — the
    * HTML single-decode rule): split the text around every reference,
    * decode each extracted codepoint, and re-interleave. Row-local
    * native expressions throughout — no UDF, no exchange.
    */
  def decodeNumericRefs(c0: Column): Column = bind(c0) { c =>
    // fast path: no "&#" substring → no reference can match → the
    // decode is the identity. Most blocks of real markup (nav chrome,
    // anchors measured for link density) carry no numeric refs, and
    // the split/extract/interleave machinery is the expensive part of
    // the strip chain — one instr() guards it, and the CaseWhen branch
    // keeps it lazy. NULL input takes the otherwise branch and stays
    // NULL either way. The input and both arrays are let-bound
    // ([[bind]]): c fed four references and each array two — without
    // the bindings every reference re-instantiated (and re-evaluated)
    // its whole subtree, the strip-chain input included.
    when(instr(c, "&#") > 0,
      bind(split(c, numRefRe, -1)) { parts =>
        bind(regexp_extract_all(c, lit(numRefGroupRe), lit(1))) { refs =>
          val decoded = transform(refs, r => chrUnicode(refCodepoint(r)))
          concat(
            aggregate(
              zip_with(slice(parts, lit(1), size(refs)), decoded,
                (p, d) => concat(p, d)),
              lit(""), (acc, x) => concat(acc, x)),
            element_at(parts, -1))
        }
      }).otherwise(c)
  }

  /** Remove every remaining tag and decode entities — the five named
    * core entities plus decimal/hex NUMERIC character references
    * (`&#39;`, `&#x2019;` — real crawl text is full of them; the r11
    * scope gap) — collapsing whitespace: the per-block text
    * normalizer. Script and style bodies are dropped first (their
    * CONTENT is code, not text; a plain tag-strip would leak it).
    * `&amp;` decodes LAST so `&amp;lt;` becomes `&lt;`, not `<`, and
    * `&amp;#39;` stays `&#39;` (the classic double-decode traps —
    * numeric refs decode BEFORE `&amp;` for the same reason).
    */
  def stripTags(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val named = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(noTags,
        "&nbsp;", " "), "&lt;", "<"), "&gt;", ">"), "&quot;", "\"")
    val decoded = regexp_replace(decodeNumericRefs(named), "&amp;", "&")
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Per-document block table as array columns (one row stays one
    * row): block texts, their lengths, and their anchor-text lengths.
    * Exposed for auditing; [[extractText]] is the consumer.
    */
  /** Boilerplate-filtered extraction: blocks shorter than `minChars`
    * (after tag-strip) or with link density ≥ 1/2 (anchor text is half
    * or more of the block text — navigation, footers, link farms) are
    * dropped; survivors join in document order.
    *
    * Returns a struct column:
    *   - `text`: the cleaned, boilerplate-free document text
    *   - `n_blocks`: non-empty candidate blocks seen
    *   - `n_kept`: blocks that survived both rules
    *
    * Tree shape (r14 opt): the block array, the stripped/measured
    * pairs, and each filter stage are LET-BOUND ([[bind]]) — the old
    * top-level struct let `getField` consumers prune per field, but
    * every field's copy re-instantiated the whole strip chain (three
    * evaluations of every regexp over every block per row, and a
    * triple-size tree for the optimizer). All three fields share one
    * evaluation now; consumers alias the struct once and read fields
    * off the alias.
    */
  def extractText(html: Column, minChars: Int): Column = {
    require(minChars >= 1, s"bad minChars $minChars")
    bind(split(html, blockSplitRe)) { blocks =>
      val texts = transform(blocks, b => stripTags(b))
      val anchorLens = transform(blocks, b =>
        aggregate(regexp_extract_all(b, lit(anchorRe), lit(1)),
          lit(0), (acc, a) => acc + length(stripTags(a))))
      val paired = zip_with(texts, anchorLens,
        (t, al) => struct(t.as("t"), al.as("al")))
      bind(filter(paired, s => length(s.getField("t")) > 0)) { nonEmpty =>
        bind(filter(nonEmpty, s =>
          length(s.getField("t")) >= minChars &&
            s.getField("al") * 2 < length(s.getField("t")))) { kept =>
          struct(
            array_join(transform(kept, s => s.getField("t")), " ")
              .as("text"),
            size(nonEmpty).cast(IntegerType).as("n_blocks"),
            size(kept).cast(IntegerType).as("n_kept"))
        }
      }
    }
  }
}
