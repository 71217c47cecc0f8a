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

  // ---- robots.txt ----

  private def robotsFixture(txt: String) = {
    val rs = StructType(Seq(StructField("host", StringType),
      StructField("txt", StringType)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(
          List(Row("h.com", txt))).asJava), rs)
  }

  private def decide(txt: String, urls: (Long, String)*): Map[Long, (Boolean, String)] = {
    val us = StructType(Seq(StructField("id", LongType),
      StructField("url", StringType)))
    val u = spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(
          urls.toList.map { case (i, p) => Row(i, p) }).asJava), us)
    Urls.robotsFilter(u, "id", "url", robotsFixture(txt), "host", "txt")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Boolean]("allowed"),
          Option(r.getAs[String]("rule_path")).getOrElse(""))).toMap
  }

  test("longest-prefix rule wins; allow beats disallow on ties") {
    val txt = "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
    val got = decide(txt,
      1L -> "https://h.com/private/secret",
      2L -> "https://h.com/private/ok/page",
      3L -> "https://h.com/public/x")
    assert(got(1L) == (false, "/private"))
    assert(got(2L) == (true, "/private/ok"))
    assert(got(3L) == (true, ""))
  }

  test("hosts without a robots entry are allowed") {
    val got = decide("User-agent: *\nDisallow: /\n",
      1L -> "https://other.org/anything")
    assert(got(1L) == (true, ""))
  }

  test("comment, sitemap, and empty-Disallow lines are ignored") {
    val txt = "# hello\nSitemap: https://h.com/s.xml\nDisallow:\n" +
      "  disallow : /x\n"
    val got = decide(txt,
      1L -> "https://h.com/x/deep",
      2L -> "https://h.com/y")
    assert(got(1L) == (false, "/x")) // case/space-tolerant directive
    assert(got(2L) == (true, ""))    // empty Disallow never matches
  }

  test("Disallow / blocks the whole host") {
    val got = decide("User-agent: *\nDisallow: /\n",
      1L -> "https://h.com/", 2L -> "https://h.com/a/b?q=1")
    assert(got(1L)._1 == false && got(2L)._1 == false)
  }
}
