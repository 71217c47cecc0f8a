package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{SentenceDedup, Urls}
import graft.pipeline.TrainingPipeline

/** The crawl-to-corpus story END TO END on one small synthetic web:
  * robots.txt gate → URL canonicalization → frontier dedup →
  * HTML-input training pipeline (extraction + scrub + gate + dedup +
  * split) → sentence-span scrub. Every stage is the round-12 operator;
  * this spec proves they COMPOSE — each stage's output is the next
  * stage's input with no glue logic beyond column selection.
  */
class CrawlStorySpec extends SparkSpec {

  private def frame(schema: StructType, rows: Row*): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows.toList).asJava),
      schema)

  test("robots → canonicalize → frontier dedup → pipeline → span scrub") {
    val chrome = "<nav><a href='/a'>All articles index</a> " +
      "<a href='/b'>About this big site</a> " +
      "<a href='/c'>Contact the whole team</a> " +
      "<a href='/d'>Member login portal page</a></nav>"
    def page(body: String): String =
      s"<html><body>$chrome<p>$body</p></body></html>"
    val bodyA = "the quick brown fox jumps over one lazy dog near the barn " +
      "at dawn. a second sentence sits here quietly. and a third one ends it."
    val bodyB = "winter snow storms blow across the frozen plains while " +
      "travelers rest. days go past slowly there. nights last even longer"
    // bodyC borrows a full 3-sentence run from bodyA between unique
    // ends LONG enough to dilute whole-doc Jaccard below the near-dup
    // threshold (the q228 filler discipline: the page must SURVIVE
    // stage 4 and lose the borrowed span to the sentence scrub)
    val bodyC = "completely fresh opener sentence with many original " +
      "words about harbors markets bridges lanterns gardens rivers " +
      "meadows and towers stretching on far beyond the usual measure " +
      "of an opener. " + bodyA +
      " totally fresh closer sentence that also rambles across " +
      "orchards valleys castles harvests festivals wagons bakers " +
      "millers weavers and a final quiet evening bell to end it"
    val urlSchema = StructType(Seq(
      StructField("page_id", LongType), StructField("url", StringType),
      StructField("html", StringType)))
    val fetched = frame(urlSchema,
      // same page twice under tracking-param/case variants → ONE fetch
      Row(1L, "HTTP://Site-A.example.COM:80/art/1?utm_source=x&v=1", page(bodyA)),
      Row(2L, "http://site-a.example.com/art/1?v=1&fbclid=zz", page(bodyA)),
      Row(3L, "https://site-a.example.com/private/x?v=2", page(bodyB)),
      Row(4L, "https://site-b.example.com/art/2", page(bodyB)),
      Row(5L, "https://site-b.example.com/art/3", page(bodyC)))
    val robotsSchema = StructType(Seq(
      StructField("host", StringType), StructField("txt", StringType)))
    val robots = frame(robotsSchema,
      Row("site-a.example.com", "User-agent: *\nDisallow: /private\n"),
      Row("site-b.example.com", "User-agent: *\nDisallow: /tmp\n"))

    // 1. robots gate: the /private fetch drops
    val allowed = Urls.robotsFilter(fetched, "page_id", "url",
        robots, "host", "txt")
      .filter(col("allowed"))
      .select(col("page_id"))
    val crawlable = fetched.join(allowed, Seq("page_id"))
    assert(crawlable.count() == 4)

    // 2. canonicalize + frontier dedup: pages 1 and 2 are ONE url
    val canon = crawlable
      .withColumn("u", Urls.canonicalize(col("url")))
      .withColumn("canonical_url", col("u.canonical_url"))
    val frontier = canon
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("canonical_url")).orderBy(col("page_id"))))
      .filter(col("rk") === 1)
      .select(col("page_id").as("doc_id"), col("html").as("text"))
    assert(frontier.count() == 3) // pages 1(=2), 4, 5
    assert(canon.filter(col("page_id").isin(1L, 2L))
      .select("canonical_url").distinct().count() == 1)

    // 3. HTML-input pipeline: chrome never reaches the shingler; the
    // three surviving pages have unrelated content → all pass
    val corpus = TrainingPipeline.prepare(frontier,
      TrainingPipeline.Config(minJaccard = 0.5, htmlExtract = Some(25)))
    val rows = corpus.collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 4L, 5L))
    assert(rows.forall(r => !r.getAs[String]("text").contains("articles index")))
    assert(rows.forall(r => Set("train", "val", "test")(r.getAs[String]("split"))))

    // 4. sentence-span scrub: page 5's borrowed 3-sentence run drops
    // (page 1, the lower id, keeps it); unique ends survive
    val scrubbed = SentenceDedup.dropDuplicateSpans(
        corpus.select(col("doc_id"), col("text")), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_dropped"), r.getAs[String]("text"))).toMap
    assert(scrubbed(1L)._1 == 0)
    assert(scrubbed(4L)._1 == 0)
    assert(scrubbed(5L)._1 == 3, s"page 5: ${scrubbed(5L)}")
    assert(scrubbed(5L)._2.contains("fresh opener"))
    assert(scrubbed(5L)._2.contains("fresh closer"))
    assert(!scrubbed(5L)._2.contains("lazy dog"))

    // COUNTERFACTUAL: without the robots gate, the disallowed page 3
    // (bodyB, LOWER id) leaks into the pipeline, wins the near-dup
    // component against page 4, and evicts it — proving the robots
    // stage is load-bearing for the dedup outcome, not just a filter
    val leakedFrontier = fetched
      .withColumn("u", Urls.canonicalize(col("url")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("u.canonical_url")).orderBy(col("page_id"))))
      .filter(col("rk") === 1)
      .select(col("page_id").as("doc_id"), col("html").as("text"))
    val leaked = TrainingPipeline.prepare(leakedFrontier,
        TrainingPipeline.Config(minJaccard = 0.5, htmlExtract = Some(25)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(leaked == Set(1L, 3L, 5L),
      s"robots leak must evict page 4 via the lower-id twin: $leaked")
  }

  test("crawl priority: a hub cited by every page outranks leaf pages " +
      "on its host") {
    import spark.implicits._
    import graft.functions.TextFunctions.md5Hash60
    // five pages on one host all cite /hub; each also has one unique
    // leaf child. PageRank over the canonical link graph must put the
    // hub at host_priority 1
    val pages = (0 until 5).map { i =>
      (s"https://h.example.com/s/$i",
        s"""<a href="/hub">h</a><a href='leaf$i'>l</a>""" +
          s"""<a href="/s/$i#top">self</a>""")
    }.toDF("url", "html")
    val links = pages.select(col("url").as("src_url"),
        explode(Urls.extractHrefs(col("html"))).as("_href"))
      .select(col("src_url"),
        Urls.resolveUrl(col("src_url"), col("_href")).as("dst_url"))
    val pairs = links.select(
        Urls.canonicalize(col("src_url")).getField("canonical_url")
          .as("src_c"),
        Urls.canonicalize(col("dst_url")).getField("canonical_url")
          .as("dst_c"))
      .filter(col("src_c") =!= col("dst_c"))
    val ranks = graft.operators.Graph.pageRank(
      pairs.select(md5Hash60(col("src_c")).as("src"),
        md5Hash60(col("dst_c")).as("dst")), "src", "dst", iters = 3)
    val hubRank = ranks.filter(col("id") ===
        md5Hash60(lit("https://h.example.com/hub"))).head.getLong(1)
    val leafRank = ranks.filter(col("id") ===
        md5Hash60(lit("https://h.example.com/s/leaf0"))).head.getLong(1)
    assert(hubRank > leafRank,
      s"hub ($hubRank) must outrank a leaf ($leafRank)")
    // self-links (fragment) were dropped: no self-edge in the graph
    assert(pairs.filter(col("src_c") === col("dst_c")).count() == 0)
  }

  test("mid-crawl frontier-index compaction: bloat gauge, read-" +
      "transparent rewrite, crawl continues") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-fcompact")
      .toString
    def urls(ids: Range, tag: String) =
      ids.map(i => (i.toLong, s"https://h${i % 7}.example.com/$tag/$i"))
        .toDF("id", "url")
    // a rolling crawl: the index accretes appends whose hash sets
    // overlap heavily (every batch re-appends the first batch's URLs
    // — dup HASHES, the documented byte cost)
    Urls.writeFrontierIndex(urls(0 until 50, "a"), "url", tmp)
    (1 to 4).foreach { _ =>
      Urls.appendToFrontierIndex(urls(0 until 50, "a"), "url", tmp)
    }
    val bloated = Urls.frontierIndexStats(spark, tmp).collect()(0)
    assert(bloated.getAs[Long]("n_rows") == 250L)
    assert(bloated.getAs[Long]("n_distinct") == 50L)
    assert(bloated.getAs[Long]("dup_rows") == 200L)
    assert(bloated.getAs[Long]("bloat_ppm") == 800000L)
    assert(bloated.getAs[Long]("n_urls_appended") == 250L)
    assert(bloated.getAs[Long]("n_files") > 1L)

    // probe results must be IDENTICAL before and after the rewrite
    val batch = urls(25 until 75, "a")
    def probe() = Urls.probeFrontier(spark, tmp, batch, "id", "url")
      .collect().map(r => (r.getLong(0), r.getBoolean(5))).toSet
    val before = probe()
    val (nb, na) = Urls.compactFrontierIndex(spark, tmp)
    assert(nb == 250L && na == 50L)
    assert(probe() == before, "compaction changed probe results")
    val clean = Urls.frontierIndexStats(spark, tmp).collect()(0)
    assert(clean.getAs[Long]("n_rows") == 50L)
    assert(clean.getAs[Long]("dup_rows") == 0L)
    assert(clean.getAs[Long]("bloat_ppm") == 0L)

    // and the crawl continues over the compacted index: a fresh batch
    // appends and the next probe sees it
    Urls.appendToFrontierIndex(urls(100 until 110, "b"), "url", tmp)
    val again = Urls.probeFrontier(spark, tmp,
        urls(100 until 110, "b"), "id", "url")
      .filter(col("fetch")).count()
    assert(again == 0L, "post-compaction append not visible to probes")
  }

  test("budget gate: a dropped domain's span donor never scrubs the survivor") {
    val spanS = "every copy of this syndicated notice is identical. " +
      "the notice repeats exactly three sentences verbatim. " +
      "only the first crawled occurrence may keep them."
    def page(body: String): String =
      s"<html><body><nav><a href='/x'>All articles index</a></nav>" +
        s"<p>$body</p></body></html>"
    val schema = StructType(Seq(
      StructField("page_id", LongType), StructField("url", StringType),
      StructField("html", StringType)))
    val bigs = (0 until 6).map { i =>
      Row(i.toLong, s"https://big.example.com/art/$i",
        page(s"bigpage$i opens with alpha$i bravo$i charlie$i delta$i " +
          s"echo$i foxtrot$i golf$i hotel$i india$i juliet$i kilo$i " +
          s"lima$i and closes there"))
    }
    val donor = Row(50L, "https://www.x.example.zz/art/spam",
      page(spanS + " unique donor trailing words then ramble onwards " +
        "about coupons and pills separately."))
    val survivor = Row(90L, "https://www.k.example.aa/art/keep",
      page("keeper page opening sentence speaks in its own distinct " +
        "words about the archive. " + spanS +
        " keeper closing sentence wraps the page with other distinct " +
        "words about the catalog."))
    val fetched = frame(schema, (bigs :+ donor :+ survivor): _*)
    val withDom = fetched.withColumn("registrable_domain",
      Urls.canonicalize(col("url")).getField("registrable_domain"))
    // Hamilton B=3 over counts (example.com 6, example.aa 1,
    // example.zz 1, tot 8): com floor 2 (rem 2), aa/zz floor 0 rem 3
    // each, ONE leftover seat → remainder tie broken by domain name →
    // example.aa wins, the donor's domain gets nothing
    val selected = graft.operators.Sampling.apportionSelect(
        withDom.select(col("page_id"), col("registrable_domain")),
        "page_id", "registrable_domain", budget = 3L)
      .select(col("page_id")).collect().map(_.getLong(0)).toSet
    assert(selected.contains(90L), s"survivor must win the aa seat: $selected")
    assert(!selected.contains(50L), s"donor domain must get no seat: $selected")
    assert(selected.size == 3)
    def spanReport(ids: Set[Long]): Map[Long, (Int, String)] = {
      val pages = fetched.filter(col("page_id").isin(ids.toSeq: _*))
        .select(col("page_id").as("doc_id"), col("html").as("text"))
      val corpus = TrainingPipeline.prepare(pages,
        TrainingPipeline.Config(htmlExtract = Some(25)))
      SentenceDedup.dropDuplicateSpans(
          corpus.select(col("doc_id"), col("text")), "doc_id", "text")
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Int]("n_dropped"), r.getAs[String]("text"))).toMap
    }
    // budget enforced: the survivor keeps its three sentences
    val gated = spanReport(selected)
    assert(gated(90L)._1 == 0)
    assert(gated(90L)._2.contains("syndicated notice"))
    // COUNTERFACTUAL: budget skipped → the donor (id 50 < 90) leaks,
    // keep-first sides with it, and the survivor loses exactly the span
    val leaked = spanReport(fetched.select("page_id")
      .collect().map(_.getLong(0)).toSet)
    assert(leaked(50L)._1 == 0)
    assert(leaked(90L)._1 == 3, s"leaked donor must scrub the survivor: ${leaked(90L)}")
    assert(!leaked(90L)._2.contains("syndicated notice"))
    assert(leaked(90L)._2.contains("keeper page opening"))
  }
}
