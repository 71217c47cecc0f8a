package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Markup

class MarkupSpec extends SparkSpec {

  private def extract(html: String, minChars: Int = 10): Row = {
    val schema = StructType(Seq(StructField("h", StringType)))
    spark.createDataFrame(
        new java.util.ArrayList[Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(List(Row(html))).asJava),
        schema)
      .select(Markup.extractText(col("h"), minChars).as("r"))
      .select("r.text", "r.n_blocks", "r.n_kept")
      .collect()(0)
  }

  test("strips tags, decodes entities, collapses whitespace") {
    val r = extract(
      "<p>Tom &amp; Jerry say &quot;1 &lt; 2&quot;&nbsp;&nbsp;loudly   today</p>")
    assert(r.getString(0) == "Tom & Jerry say \"1 < 2\" loudly today")
  }

  test("&amp;lt; decodes to the literal entity, not to <") {
    val r = extract("<p>write &amp;lt; for a less-than sign</p>")
    assert(r.getString(0) == "write &lt; for a less-than sign")
  }

  test("numeric character references decode: dec, hex, supplementary") {
    val r = extract(
      "<p>It&#8217;s &#65; smiley &#x1F600; and an &#x26; ampersand here</p>")
    assert(r.getString(0) == "It’s A smiley 😀 and an & ampersand here")
  }

  test("invalid numeric refs map to U+FFFD (HTML5 replacement rule)") {
    // NUL, a bare surrogate, and one-past-the-last-codepoint all
    // become the replacement character; surrounding text is preserved
    val r = extract("<p>bad refs here x&#0;y&#xD800;z&#1114112;w end</p>")
    assert(r.getString(0) == "bad refs here x�y�z�w end")
  }

  test("overlong digit runs stay literal text (no overflow parse)") {
    val r = extract("<p>not a ref &#999999999; nor &#x1234567; here ok</p>")
    assert(r.getString(0) == "not a ref &#999999999; nor &#x1234567; here ok")
  }

  test("&amp;#39; single-decodes to the literal &#39;, never to '") {
    val r = extract("<p>write &amp;#39; to show an apostrophe ref</p>")
    assert(r.getString(0) == "write &#39; to show an apostrophe ref")
  }

  test("adjacent refs and whitespace-decoding refs collapse correctly") {
    // &#32;&#32; decodes to two spaces, then whitespace-collapses;
    // &#10; decodes to a newline, also collapsed
    val r = extract("<p>gap a&#32;&#32;b and line c&#10;d joined here</p>")
    assert(r.getString(0) == "gap a b and line c d joined here")
  }

  test("script and style bodies never leak into the text") {
    val r = extract(
      "<p>real content paragraph here</p>" +
        "<script>var boilerplate = 'leak';</script>" +
        "<style>.x { color: red }</style>")
    assert(r.getString(0) == "real content paragraph here")
    assert(!r.getString(0).contains("leak"))
  }

  test("link-dense blocks drop; content blocks with a minority link survive") {
    val html =
      "<nav><a href='/'>Home</a> <a href='/a'>About</a> <a href='/c'>Contact</a></nav>" +
        "<p>This long paragraph talks at length about butterflies and keeps " +
        "only a small <a href='/ref'>reference</a> inline.</p>" +
        "<footer><a href='/tos'>Terms of service</a></footer>"
    val r = extract(html)
    assert(r.getString(0).startsWith("This long paragraph"))
    assert(r.getString(0).contains("reference"))
    assert(!r.getString(0).contains("Home"))
    assert(!r.getString(0).contains("Terms"))
    assert(r.getInt(2) == 1) // one survivor
  }

  test("exactly-half link density drops (2*anchor >= text)") {
    // text "aaaaa bbbbb" (11 chars), anchor "aaaaa" (5): 10 < 11 → kept;
    // anchor "aaaaaa" of 6 in 12: 12 >= 12 → dropped
    val kept = extract("<p><a>aaaaa</a> bbbbb</p>", minChars = 5)
    assert(kept.getInt(2) == 1)
    val dropped = extract("<p><a>aaaaaa</a> bbbbb</p>", minChars = 5)
    assert(dropped.getInt(2) == 0)
  }

  test("short blocks drop by minChars; block and kept counts are exact") {
    val r = extract(
      "<p>tiny</p><p>a sufficiently long paragraph of content</p><div>ok</div>",
      minChars = 10)
    assert(r.getInt(1) == 3)
    assert(r.getInt(2) == 1)
  }

  test("empty and tag-only documents yield empty text, zero blocks") {
    val r = extract("<div><br></div>")
    assert(r.getString(0) == "" && r.getInt(1) == 0 && r.getInt(2) == 0)
  }
}
