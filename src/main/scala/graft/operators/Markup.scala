package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

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

  /** Block boundaries: block-level open/close tags split a document
    * into candidate text blocks; inline tags (<a>, <b>, …) stay inside
    * blocks so link density can be measured per block.
    */
  private[graft] val blockSplitRe =
    "(?i)</?(?:p|div|li|ul|ol|h[1-6]|nav|footer|header|table|tr|td|br|section|article)[^>]*>"

  /** Anchor bodies (group 1), for per-block link-density measurement. */
  private[graft] val anchorRe = "(?is)<a[^>]*>(.*?)</a>"

  /** Remove every remaining tag and decode the five core entities,
    * collapsing whitespace — the per-block text normalizer. Script and
    * style bodies are dropped first (their CONTENT is code, not text;
    * a plain tag-strip would leak it). `&amp;` decodes LAST so
    * `&amp;lt;` becomes `&lt;`, not `<` (the classic double-decode).
    */
  def stripTags(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val decoded = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(noTags,
        "&nbsp;", " "), "&lt;", "<"), "&gt;", ">"), "&quot;", "\""),
      "&amp;", "&")
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Per-document block table as array columns (one row stays one
    * row): block texts, their lengths, and their anchor-text lengths.
    * Exposed for auditing; [[extractText]] is the consumer.
    */
  private def blockStats(html: Column): (Column, Column) = {
    val blocks = split(html, blockSplitRe)
    val texts = transform(blocks, b => stripTags(b))
    val anchorLens = transform(blocks, b =>
      aggregate(regexp_extract_all(b, lit(anchorRe), lit(1)),
        lit(0), (acc, a) => acc + length(stripTags(a))))
    (texts, anchorLens)
  }

  /** Boilerplate-filtered extraction: blocks shorter than `minChars`
    * (after tag-strip) or with link density ≥ 1/2 (anchor text is half
    * or more of the block text — navigation, footers, link farms) are
    * dropped; survivors join in document order.
    *
    * Returns a struct column:
    *   - `text`: the cleaned, boilerplate-free document text
    *   - `n_blocks`: non-empty candidate blocks seen
    *   - `n_kept`: blocks that survived both rules
    */
  def extractText(html: Column, minChars: Int): Column = {
    require(minChars >= 1, s"bad minChars $minChars")
    val (texts, anchorLens) = blockStats(html)
    val paired = zip_with(texts, anchorLens,
      (t, al) => struct(t.as("t"), al.as("al")))
    val nonEmpty = filter(paired, s => length(s.getField("t")) > 0)
    val kept = filter(nonEmpty, s =>
      length(s.getField("t")) >= minChars &&
        s.getField("al") * 2 < length(s.getField("t")))
    struct(
      array_join(transform(kept, s => s.getField("t")), " ").as("text"),
      size(nonEmpty).cast(IntegerType).as("n_blocks"),
      size(kept).cast(IntegerType).as("n_kept"))
  }
}
