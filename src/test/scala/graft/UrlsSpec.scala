package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Urls

class UrlsSpec extends SparkSpec {

  private def canon(url: String): Row = {
    val schema = StructType(Seq(StructField("u", StringType)))
    spark.createDataFrame(
        new java.util.ArrayList[Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(List(Row(url))).asJava),
        schema)
      .select(Urls.canonicalize(col("u")).as("c"))
      .select("c.canonical_url", "c.host", "c.registrable_domain",
        "c.n_params_dropped")
      .collect()(0)
  }

  test("case, default port, fragment, tracking params, param order") {
    val r = canon(
      "HTTP://Example.COM:80/a/B?utm_source=x&z=2&fbclid=q&a=1#top")
    assert(r.getString(0) == "http://example.com/a/B?a=1&z=2")
    assert(r.getString(1) == "example.com")
    assert(r.getString(2) == "example.com")
    assert(r.getInt(3) == 2)
  }

  test("non-default port kept; https default port stripped") {
    assert(canon("https://h.example.org:443/p").getString(0)
      == "https://h.example.org/p")
    assert(canon("https://h.example.org:8443/p").getString(0)
      == "https://h.example.org:8443/p")
    assert(canon("http://h.example.org:443/p").getString(0)
      == "http://h.example.org:443/p") // 443 is not http's default
  }

  test("empty path normalizes to /; query-only URL keeps params") {
    assert(canon("https://example.com").getString(0)
      == "https://example.com/")
    assert(canon("https://example.com?b=2&a=1").getString(0)
      == "https://example.com/?a=1&b=2")
  }

  test("all params tracking: query disappears entirely") {
    val r = canon("https://example.com/x?utm_a=1&utm_b=2&gclid=3")
    assert(r.getString(0) == "https://example.com/x")
    assert(r.getInt(3) == 3)
  }

  test("userinfo dropped with the authority parse") {
    assert(canon("https://user:pw@Example.com/x").getString(1)
      == "example.com")
  }

  test("registrable domain: two-level public suffixes get three labels") {
    assert(canon("https://www.news.co.uk/a").getString(2) == "news.co.uk")
    assert(canon("https://a.b.news.co.uk/a").getString(2) == "news.co.uk")
    assert(canon("https://deep.sub.example.com/a").getString(2)
      == "example.com")
    assert(canon("https://localhost/a").getString(2) == "localhost")
  }

  test("scheme-less input is not a URL: canonical null, no crash") {
    val r = canon("not a url at all")
    assert(r.isNullAt(0))
  }

  test("param keys compare case-insensitively for tracking, byte-order for sort") {
    val r = canon("https://e.com/p?Z=1&UTM_SOURCE=x&A=2")
    assert(r.getString(0) == "https://e.com/p?A=2&Z=1")
    assert(r.getInt(3) == 1)
  }
}
