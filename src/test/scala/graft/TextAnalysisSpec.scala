package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions
import graft.operators.{Multimodal, TextAnalysis}
import graft.sources.Tables

class TextAnalysisSpec extends SparkSpec {

  private def one(text: String, c: org.apache.spark.sql.Column): Row = {
    val df = spark.createDataFrame(
      java.util.List.of(Row(text)),
      StructType(Seq(StructField("t", StringType))))
    df.select(c).collect()(0)
  }

  test("token counting: whitespace and BPE-ish") {
    assert(one("hello world  foo", TextFunctions.tokenCount(col("t"))).getInt(0) == 3)
    assert(one("", TextFunctions.tokenCount(col("t"))).getInt(0) == 0)
    assert(one("   ", TextFunctions.tokenCount(col("t"))).getInt(0) == 0)
    // "don't stop" → don | ' | t | stop = 4 BPE-ish pieces
    assert(one("don't stop", TextFunctions.bpeishTokenCount(col("t"))).getInt(0) == 4)
    assert(one("abc123", TextFunctions.bpeishTokenCount(col("t"))).getInt(0) == 2)
  }

  test("language ID heuristic on clearly-marked languages") {
    val cases = Map(
      "the cat sat on the mat and it was happy" -> "en",
      "el perro corre por la calle y es muy rápido" -> "es",
      "der Hund und die Katze sind nicht zu Hause" -> "de",
      "le chat est dans la maison et les oiseaux qui chantent" -> "fr",
      "这是一个中文句子" -> "zh",
      "xyzzy plugh qwerty" -> "und")
    cases.foreach { case (text, expected) =>
      val got = one(text, TextFunctions.langIdHeuristic(col("t"))).getString(0)
      assert(got == expected, s"'$text' → $got, expected $expected")
    }
  }

  test("quality score: real prose beats punctuation soup") {
    val prose = "The quick brown fox jumps over the lazy dog and runs " +
      "through the field with great joy in the morning light of day."
    val soup = "!!! ??? ,,, ;;; ::: ... !!!"
    val qProse = one(prose, TextFunctions.qualityScore(col("t"))).getDouble(0)
    val qSoup = one(soup, TextFunctions.qualityScore(col("t"))).getDouble(0)
    assert(qProse > qSoup)
    assert(qProse > 0.5 && qSoup < 0.5)
  }

  test("char n-grams and word n-grams") {
    val grams = one("abcde", TextFunctions.charNGrams(col("t"), 3)).getSeq[String](0)
    assert(grams == Seq("abc", "bcd", "cde"))
    assert(one("ab", TextFunctions.charNGrams(col("t"), 3)).getSeq[String](0).isEmpty)
    val wgrams = one("a b c d", TextFunctions.wordNGrams(col("t"), 2)).getSeq[String](0)
    assert(wgrams == Seq("a b", "b c", "c d"))
  }

  test("fingerprints: normalization-invariant, content-sensitive") {
    val a = one("Hello   World", TextFunctions.docFingerprint(col("t"))).getLong(0)
    val b = one("  hello world ", TextFunctions.docFingerprint(col("t"))).getLong(0)
    val c = one("hello there", TextFunctions.docFingerprint(col("t"))).getLong(0)
    assert(a == b) // case/whitespace-normalized
    assert(a != c)
  }

  test("simhash: identical docs equal, small edits near, different docs far") {
    import graft.functions.VectorFunctions.hammingLong
    val texts = Seq(
      ("a", "the quick brown fox jumps over the lazy dog near the river bank today"),
      ("b", "the quick brown fox jumps over the lazy dog near the river bank today"),
      ("c", "the quick brown fox jumps over the lazy dog near the river bank zzz"),
      ("d", "completely different words about spark catalyst optimizer internals"))
    val df = spark.createDataFrame(texts).toDF("id", "t")
      .withColumn("sh", TextFunctions.simHash64(col("t")))
    val sh = df.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(sh("a") == sh("b"))
    assert(java.lang.Long.bitCount(sh("a") ^ sh("c")) <= 16)
    assert(java.lang.Long.bitCount(sh("a") ^ sh("d")) > 16)
  }

  test("corpus summary aggregates lang and quality") {
    val out = TextAnalysis.corpusSummary(Tables.documents(spark, sfDir)).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("n_docs")).sum == 500)
  }

  test("quality filter keeps a sane fraction of the corpus") {
    val docs = Tables.documents(spark, sfDir)
    val kept = TextAnalysis.qualityFilter(docs).count()
    assert(kept > 0 && kept <= docs.count())
  }

  test("term stats: tf and df on a known tiny corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog"),
      (3L, "")).toDF("doc_id", "text")
    val stats = TextAnalysis.termStats(docs)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(stats((1L, "the")) == (2L, 2L)) // tf 2 in doc 1; appears in 2 docs
    assert(stats((2L, "the")) == (1L, 2L))
    assert(stats((1L, "cat")) == (1L, 1L))
    assert(stats((2L, "dog")) == (1L, 1L))
    assert(!stats.keySet.exists(_._1 == 3L)) // empty doc contributes nothing
    // tf per doc sums to the doc's token count
    assert(stats.collect { case ((d, _), (tf, _)) if d == 1L => tf }.sum == 6L)
  }

  test("repetition stats: exact counts on a hand-computed corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a"), // 5 tokens, 2 distinct; bigrams: "a b"×2, "b a"×2
      (2L, "x y z"),     // no repetition; bigrams "x y", "y z"
      (3L, "solo")       // single token → no bigrams
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getDouble(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toMap
    assert(got(1L) == (5, 2, 0.6, 2L, 4L, 0.5))
    assert(got(2L) == (3, 3, 0.0, 1L, 2L, 0.5))
    assert(got(3L) == (1, 1, 0.0, 0L, 0L, 0.0))
  }

  test("repetition filter drops boilerplate, keeps prose") {
    import spark.implicits._
    val docs = Seq(
      (1L, "buy now " * 40),                                    // pure boilerplate
      (2L, "the quick brown fox jumps over the lazy dog again")
    ).toDF("doc_id", "text")
    val kept = TextAnalysis.repetitionFilter(docs)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L), s"expected only the prose doc, kept $kept")
  }

  test("PII scrub masks identifiers and leaves clean text intact") {
    import spark.implicits._
    import graft.functions.TextFunctions._
    val cases = Seq(
      "mail me at jane.doe+x@sub.example.co.uk today",
      "see https://a.io/p?q=1&u=bob@x.org for details",
      "call +44 (0)20 7946 0958 now",
      "two mails a@b.de and c@d.fr here",
      "no identifiers   in\tthis  text",
      "").toDF("t")
    val out = cases.select(scrubText(col("t")).as("s")).collect().map(_.getString(0))
    assert(out(0) == "mail me at <EMAIL> today")
    // the email inside the URL is consumed by the URL mask (whole token)
    assert(out(1) == "see <URL> for details")
    assert(out(2) == "call <PHONE> now")
    assert(out(3) == "two mails <EMAIL> and <EMAIL> here")
    // clean text only gets whitespace normalization
    assert(out(4) == "no identifiers in this text")
    assert(out(5) == "")
  }
}

class MultimodalSpec extends SparkSpec {

  lazy val media = Multimodal.mediaFromDocuments(
    Tables.documents(spark, sfDir).limit(60)).cache()

  test("decontamination flags exactly the docs containing benchmark n-grams") {
    import graft.operators.TextAnalysis
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    // eval set = verbatim slices of doc_id < 10 → those docs must flag
    val bench = docs.filter(col("doc_id") < 10)
      .select(expr("substring(text, 11, 100)").as("btext"))
    val flagged = TextAnalysis
      .flagContaminated(docs, "doc_id", "text", bench, "btext", n = 30)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 10L).foreach { id =>
      assert(flagged.contains(id), s"planted source doc $id not flagged")
    }
    // a benchmark with no verbatim overlap flags nothing
    val foreign = spark.range(1).select(
      lit("zZqQxXvVwWyYzZqQxXvVwWyYzZqQxXvVwW-never-in-corpus").as("btext"))
    assert(TextAnalysis
      .flagContaminated(docs, "doc_id", "text", foreign, "btext", n = 30)
      .count() == 0)
    // the benchmark n-gram side must broadcast (eval sets are tiny;
    // the corpus side must not shuffle content)
    val plan = TextAnalysis
      .flagContaminated(docs, "doc_id", "text", bench, "btext", n = 30)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"benchmark grams not broadcast:\n$plan")
  }

  test("media table has the canonical schema") {
    assert(media.schema == Multimodal.mediaSchema.copy(
      fields = Multimodal.mediaSchema.fields.map(f =>
        media.schema(f.name).copy(name = f.name))))
    assert(media.count() == 60)
    val mods = media.select("modality").distinct().collect().map(_.getString(0)).toSet
    assert(mods == Set("image", "audio", "video"))
  }

  test("byte stats: hash-identical content dedups before decode") {
    val stats = Multimodal.withByteStats(media)
    assert(stats.columns.contains("n_bytes") && stats.columns.contains("content_hash"))
    assert(stats.filter(col("n_bytes") <= 0).count() == 0)
  }

  test("feature extraction: fixed-dim float features, deterministic") {
    val f1 = Multimodal.extractFeatures(media, dim = 16, batchSize = 7)
      .select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f1.values.forall(_.size == 16))
    // deterministic across runs and batch sizes
    val f2 = Multimodal.extractFeatures(media, dim = 16, batchSize = 64)
      .select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f1 == f2)
  }

  test("frame sampling produces n fixed-width frames") {
    val frames = Multimodal.sampleFrames(media, n = 4, frameBytes = 8)
      .select("frames").collect().map(_.getSeq[Array[Byte]](0))
    assert(frames.forall(_.size == 4))
    assert(frames.forall(_.forall(f => f.length <= 8)))
  }

  test("resize stub truncates payload to budget") {
    val out = Multimodal.resizeStub(media, targetBytes = 10)
      .select(length(col("content_resized"))).collect().map(_.getInt(0))
    assert(out.forall(_ <= 10))
  }

  test("real image resize: dimensions exact, gradient downscale sane, junk → NULL") {
    import org.apache.spark.sql.types.IntegerType
    // two-tone source (left half black, right half white) so the
    // resize has real content to interpolate — the resized image must
    // keep the tone split: dark at x=0, bright at x=w-1
    val base = spark.range(0, 8).toDF("id").select(
      col("id"),
      (lit(32) + col("id") * 4).cast(IntegerType).as("w"),
      lit(24).cast(IntegerType).as("h"),
      lit(0).cast(IntegerType).as("r"), lit(0).cast(IntegerType).as("g"),
      lit(0).cast(IntegerType).as("b"),
      (lit(10) + col("id")).cast(IntegerType).as("target_w"),
      lit(9).cast(IntegerType).as("target_h"))
    val png = Multimodal.synthesizeImages(base, "w", "h", "r", "g", "b")
    val twoTone = png.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](row.length - 1)
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        val g2 = img.createGraphics()
        g2.setColor(java.awt.Color.WHITE)
        g2.fillRect(img.getWidth / 2, 0, img.getWidth - img.getWidth / 2, img.getHeight)
        g2.dispose()
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        org.apache.spark.sql.Row.fromSeq(row.toSeq.init :+ baos.toByteArray)
      }
    }(org.apache.spark.sql.Encoders.row(png.schema))
    val out = Multimodal.resizeImage(twoTone).collect()
    out.foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](r.length - 1)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img.getWidth == 10 + id && img.getHeight == 9,
        s"id=$id got ${img.getWidth}x${img.getHeight}")
      val lum = (rgb: Int) => ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
      assert(lum(img.getRGB(0, 4)) < 100, s"id=$id left edge not dark")
      assert(lum(img.getRGB(img.getWidth - 1, 4)) > 600, s"id=$id right edge not bright")
    }
    // undecodable payload → NULL output, row survives
    val junk = spark.range(0, 2).toDF("id")
      .withColumn("content", lit("not a png".getBytes))
      .withColumn("target_w", lit(4)).withColumn("target_h", lit(4))
    val jr = Multimodal.resizeImage(junk).select("content_resized").collect()
    assert(jr.length == 2 && jr.forall(_.isNullAt(0)))
  }

  test("real image round-trip: synthesize PNG → overlay text → decode") {
    // generated PNGs (real ImageIO encode), reference-style Java2D text
    // overlay, then a real decode of the OVERLAID bytes: dimensions and
    // untouched pixels must survive the whole chain
    val base = spark.range(0, 12).toDF("id").select(
      col("id"),
      (lit(40) + col("id")).cast(org.apache.spark.sql.types.IntegerType).as("w"),
      (lit(30) + col("id")).cast(org.apache.spark.sql.types.IntegerType).as("h"),
      lit(200).cast(org.apache.spark.sql.types.IntegerType).as("r"),
      (col("id") % 256).cast(org.apache.spark.sql.types.IntegerType).as("g"),
      lit(7).cast(org.apache.spark.sql.types.IntegerType).as("b"),
      concat(lit("Z:1 X:"), col("id")).as("overlay_text"))
    val overlaid = Multimodal.overlayImage(
      Multimodal.synthesizeImages(base, "w", "h", "r", "g", "b"))
    val out = Multimodal.decodeImageMeta(overlaid, binCol = "content_overlaid")
      .select("id", "img_width", "img_height", "img_format", "img_pixel00")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3), r.getString(4)))
    assert(out.length == 12)
    out.foreach { case (id, w, h, fmt, px) =>
      assert(w == 40 + id && h == 30 + id, s"image $id decoded as ${w}x$h")
      assert(fmt == "png")
      assert(px == f"c8${id % 256}%02x07", s"image $id corner pixel $px") // fill survives
    }
    // the overlay genuinely changed pixels: overlaid bytes ≠ original
    val changed = overlaid.filter(
      md5(col("content")) =!= md5(col("content_overlaid"))).count()
    assert(changed == 12, "overlay produced byte-identical images")
  }

  test("real WAV round-trip: synthesize tone → decode header + RMS features") {
    import spark.implicits._
    val params = Seq((1L, 8000, 4000, 440), (2L, 16000, 8000, 220))
      .toDF("id", "rate", "n_samples", "freq")
    val wavs = Multimodal.synthesizeWavs(params, "rate", "n_samples", "freq")
    val meta = Multimodal.decodeAudioMeta(wavs)
      .select("id", "audio_sample_rate", "audio_channels", "audio_frames",
        "audio_duration_sec")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getInt(2), r.getLong(3), r.getDouble(4))).toMap
    assert(meta(1L) == (8000.0, 1, 4000L, 0.5))
    assert(meta(2L) == (16000.0, 1, 8000L, 0.5))
    // features are REAL signal statistics: a constant-amplitude sine's
    // per-segment RMS is amplitude/sqrt(2) ≈ 0.3536 in every segment
    val feats = Multimodal.extractFeatures(wavs, dim = 8)
      .select("features").collect().map(_.getSeq[Float](0))
    feats.foreach { f =>
      assert(f.length == 8)
      f.foreach(v => assert(math.abs(v - 0.5 / math.sqrt(2)) < 0.01,
        s"segment RMS $v not ~0.3536 — stub features, not decoded audio?"))
    }
  }

  test("corrupt WAV bodies degrade to NULL audio metadata") {
    import spark.implicits._
    val junk = Seq((1L, Array[Byte]('R', 'I', 'F', 'F', 1, 2, 3, 4, 'W', 'A', 'V', 'E', 9)),
      (2L, "not audio at all".getBytes("UTF-8")))
      .toDF("id", "content")
    val meta = Multimodal.decodeAudioMeta(junk)
      .select("id", "audio_sample_rate").collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(meta(1L) && meta(2L), "corrupt payloads must yield NULL metadata")
  }

  test("undecodable payloads degrade to NULL metadata, not failures") {
    val out = Multimodal.decodeImageMeta(media) // text bytes, not images
      .select("img_width", "img_height", "img_format", "img_pixel00").collect()
    assert(out.forall(r => r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3)))
    // and the overlay path yields NULL output for them
    val ov = Multimodal.overlayImage(
      media.withColumn("overlay_text", lit("x")))
    assert(ov.filter(col("content_overlaid").isNotNull).count() == 0)
  }

  test("corrupt image bodies and NULL overlay text degrade, not crash") {
    import spark.implicits._
    // valid PNG magic, garbage body: JDK readers throw RuntimeExceptions
    // here, which must surface as NULL rows, not task failures
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10) ++
      Array.fill[Byte](48)(7)
    val df = Seq((1L, corrupt)).toDF("id", "content")
    val meta = Multimodal.decodeImageMeta(df).select("img_width").collect()
    assert(meta.head.isNullAt(0))
    // NULL overlay text on a perfectly decodable image → NULL output
    val good = spark.range(1).toDF("id").select(
      col("id"),
      lit(20).cast(org.apache.spark.sql.types.IntegerType).as("w"),
      lit(20).cast(org.apache.spark.sql.types.IntegerType).as("h"),
      lit(1).cast(org.apache.spark.sql.types.IntegerType).as("r"),
      lit(2).cast(org.apache.spark.sql.types.IntegerType).as("g"),
      lit(3).cast(org.apache.spark.sql.types.IntegerType).as("b"),
      lit(null).cast(org.apache.spark.sql.types.StringType).as("overlay_text"))
    val ov = Multimodal.overlayImage(Multimodal.synthesizeImages(good, "w", "h", "r", "g", "b"))
      .select("content_overlaid").collect()
    assert(ov.head.isNullAt(0))
  }

  test("image features are real pixel histograms for decodable images") {
    val base = spark.range(0, 3).toDF("id").select(
      col("id"),
      lit(32).cast(org.apache.spark.sql.types.IntegerType).as("w"),
      lit(32).cast(org.apache.spark.sql.types.IntegerType).as("h"),
      // pure white → all mass in the TOP luminance bin
      lit(255).cast(org.apache.spark.sql.types.IntegerType).as("r"),
      lit(255).cast(org.apache.spark.sql.types.IntegerType).as("g"),
      lit(255).cast(org.apache.spark.sql.types.IntegerType).as("b"))
    val png = Multimodal.synthesizeImages(base, "w", "h", "r", "g", "b")
    val feats = Multimodal.extractFeatures(png, dim = 16)
      .select("features").collect().map(_.getSeq[Float](0))
    feats.foreach { f =>
      assert(f.size == 16)
      assert(math.abs(f.last - 1.0f) < 1e-6, s"white image histogram: $f")
      assert(f.init.forall(_ == 0.0f))
    }
  }

  private def passageDocs(texts: (Int, String)*) = {
    val rows = texts.map { case (id, t) => Row(id.toLong, t) }.toList
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
  }

  private def scrubMap(df: org.apache.spark.sql.DataFrame, n: Int, minDocs: Int) =
    TextAnalysis.commonPassageScrub(df, "doc_id", "text", n, minDocs)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap

  test("common-passage scrub removes exactly the shared banner") {
    val banner = "click here to subscribe"
    val docs = passageDocs(
      (0, s"alpha beta gamma $banner"),
      (1, s"delta epsilon $banner zeta"),
      (2, s"$banner eta theta iota kappa"),
      (3, s"unique words only here today"),
      (4, s"lambda mu $banner"))
    // banner = 4 tokens, n=3 → 2 interior 3-grams shared by 4 docs
    val got = scrubMap(docs, n = 3, minDocs = 4)
    assert(got(0L) == ((7, 4, "alpha beta gamma")))
    assert(got(1L) == ((7, 4, "delta epsilon zeta")))
    assert(got(2L) == ((8, 4, "eta theta iota kappa")))
    assert(got(3L) == ((5, 0, "unique words only here today")))
    assert(got(4L) == ((6, 4, "lambda mu")))
  }

  test("below-threshold passages and short documents survive untouched") {
    val docs = passageDocs(
      (0, "one two three four five"),
      (1, "one two three four five"), // only 2 docs share — below minDocs=3
      (2, "six seven"),               // shorter than n → no shingles
      (3, "eight"))
    val got = scrubMap(docs, n = 3, minDocs = 3)
    assert(got(0L) == ((5, 0, "one two three four five")))
    assert(got(1L) == ((5, 0, "one two three four five")))
    assert(got(2L) == ((2, 0, "six seven")))
    assert(got(3L) == ((1, 0, "eight")))
  }

  test("overlapping common passages cover their union") {
    // "a b c d" and "c d e f" both common; in doc 0 they overlap as
    // "a b c d e f" — coverage must be the merged span, not double-counted
    val docs = passageDocs(
      (0, "x a b c d e f y"),
      (1, "a b c d q q q"),
      (2, "a b c d w w w"),
      (3, "c d e f q q q"),
      (4, "c d e f w w w"))
    val got = scrubMap(docs, n = 4, minDocs = 3)
    assert(got(0L) == ((8, 6, "x y")))
  }

  test("fully-covered document scrubs to the empty string") {
    val docs = passageDocs(
      (0, "same exact text here"), (1, "same exact text here"),
      (2, "same exact text here"), (3, "same exact text here"))
    val got = scrubMap(docs, n = 4, minDocs = 4)
    assert(got(0L) == ((4, 4, "")))
  }

  test("bigram LM scores: hand-computed fixed-point values") {
    import spark.implicits._
    // corpus bigram counts: "a b" -> 3, "b a" -> 1; heads a: 3, b: 1;
    // V = 2 distinct heads
    //   q("a b") = floor(1e9 * (3+1) / (3+2)) = 800000000
    //   q("b a") = floor(1e9 * (1+1) / (1+2)) = 666666666
    val docs = Seq(
      (1L, "A b a B"),          // lowercased -> bigrams ab, ba, ab
      (2L, "a b"),              // one bigram
      (3L, "c"),                // single token: no bigrams
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScores(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 3L, 800000000L + 666666666L + 800000000L, 2266666666L / 3),
      (2L, 1L, 800000000L, 800000000L),
      (3L, 0L, 0L, 0L),
      (4L, 0L, 0L, 0L)))
  }

  test("bigram LM scores: every input row survives, scores ordered sensibly") {
    // a repeated stock phrase must out-score a one-off word salad —
    // the filter's whole purpose
    import spark.implicits._
    val stock = (1L to 8L).map(i => (i, "the quick brown fox jumps"))
    val salad = Seq((100L, "zxq wvu tsr qpo nml"))
    val scores = TextAnalysis.bigramLmScores((stock ++ salad).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(scores.size == 9)
    assert(scores(1L) > scores(100L))
  }

  test("contamination spans: exact diagonal run lengths, best-span tiebreak") {
    import spark.implicits._
    val az = ('a' to 'z').mkString            // 26 chars
    val AZ = ('A' to 'Z').mkString
    val digitsEtc = "0123456789!@#$%^&*()_+-=[]{};:,.<>/?~`|\\\"'"
    val train = Seq(
      (1L, az + digitsEtc),                    // spans vs evals 10/12
      (2L, az)).toDF("doc_id", "text")         // same az prefix, higher id
    val eval = Seq(
      // whole az embedded at offset 3: longest run = 26-4+1 = 23 shingles;
      // train 1 and train 2 both match -> tiebreak to train 1
      (10L, "XYZ" + az + "QQQQ"),
      // two disjoint spans: az (23 shingles) and digits (len 43 -> 40),
      // digits only in train 1 -> best is the 40-shingle digits span
      (11L, az + "||||" + digitsEtc),
      // clean doc: no 4-gram in common
      (12L, AZ)).toDF("eval_id", "text")
    val got = TextAnalysis.contaminationSpans(
        train, "doc_id", eval, "eval_id", "text", shingleSize = 4, minSpan = 5)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == Set(10L, 11L))
    assert(got(10L) == ((1L, 23L, 26L)))
    assert(got(11L) == ((1L, digitsEtc.length - 3L, digitsEtc.length.toLong)))
  }

  test("aHash: decode-backed hash matches direct generator arithmetic") {
    import graft.operators.Multimodal
    // direct recompute from the pattern definition, no image anywhere
    def directHash(seed: Long): String = {
      val base = (seed * 2654435761L) % 1000003L
      val sums = new Array[Long](64)
      for (y <- 0 until 64; x <- 0 until 64)
        sums((y / 8) * 8 + (x / 8)) += (base + 7L * x + 13L * y) % 256L
      val total = sums.sum
      val bits = sums.map(s => if (64L * s > total) 1 else 0)
      (15 to 0 by -1).map { k =>
        "%x".format((0 until 4).map(j => bits(4 * k + j) << j).sum)
      }.mkString
    }
    import spark.implicits._
    val seeds = Seq(0L, 1L, 5L, 5L, 6L, 17L, 699999L)
    val df = seeds.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "seed")
    val hashed = Multimodal.withAHash(
        Multimodal.synthesizePatternImages(df, "seed"))
      .select(col("id"), col("seed"), col("ahash"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    for ((_, (seed, h)) <- hashed)
      assert(h == directHash(seed), s"seed $seed")
    // same seed -> same hash; different seeds differ (phase-distinct)
    assert(hashed(2L)._2 == hashed(3L)._2)
    assert(hashed(2L)._2 != hashed(4L)._2)
    // undecodable and non-8-divisible inputs degrade to NULL
    val junk = Seq((1L, "not a png".getBytes)).toDF("id", "content")
    assert(Multimodal.withAHash(junk).collect().head.isNullAt(2))
    val odd = Multimodal.synthesizeImages(
      Seq((1L, 10, 16, 1, 2, 3)).toDF("id", "w", "h", "r", "g", "b"),
      "w", "h", "r", "g", "b")
    assert(Multimodal.withAHash(odd).collect().head
      .isNullAt(odd.columns.length))
  }

  test("contamination spans: a repeated shingle does not bridge a gap") {
    import spark.implicits._
    // eval = two copies of the same 8-char block separated by noise:
    // runs stay on separate diagonals, each 5 shingles (8-4+1), never 10
    val block = "abcdefgh"
    val train = Seq((1L, block)).toDF("doc_id", "text")
    val eval = Seq((9L, block + "-!-" + block)).toDF("eval_id", "text")
    val got = TextAnalysis.contaminationSpans(
        train, "doc_id", eval, "eval_id", "text", 4, 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == Map(9L -> 5L))
  }

  test("novelty curve: duplicates contribute zero, fresh content is fully novel") {
    import spark.implicits._
    val docs = Seq(
      (0L, "abcdefghij"),     // bucket 0: all novel
      (1L, "abcdefghij"),     // exact dup of doc 0 → zero novel
      (2L, "zzzzyyyyxxxx"),   // fresh → fully novel
      (10L, "abcdefghij"))    // bucket 1: dup again → zero novel
      .toDF("doc_id", "text")
    val got = TextAnalysis.noveltyCurve(docs, "doc_id", "text", 4, 10L)
      .collect().map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_novel"), r.getAs[Long]("novelty_micro"))))
      .toMap
    // doc0: 7 shingles of len 4 ("abcdefghij" → 10-4+1=7), doc1: same
    // 7 but all seen, doc2: "zzzzyyyyxxxx" → 9 distinct shingles
    assert(got(0L) == ((3L, 7L + 7L + 9L, 7L + 9L, (16L * 1000000) / 23)))
    assert(got(1L) == ((1L, 7L, 0L, 0L)))
  }

  test("triangle WAV roundtrip: decoded samples equal the integer formula") {
    import spark.implicits._
    val params = Seq((1L, 8000, 1200, 250), (2L, 8000, 800, 440))
      .toDF("id", "rate", "n", "f")
    val got = Multimodal.decodePcmSamples(
        Multimodal.synthesizeTriangleWavs(params, "rate", "n", "f"))
      .select("id", "samples").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    for ((id, rate, n, f) <- Seq((1L, 8000L, 1200, 250L), (2L, 8000L, 800, 440L))) {
      val want = (0 until n).map(i =>
        Multimodal.triSample(i.toLong, f, rate, 16000L))
      assert(got(id) == want, s"sample mismatch for id=$id")
    }
  }

  test("audio frame features: hand-computed energies and crossings") {
    import spark.implicits._
    // 5 samples, frame size 2: frames [3,-4], [0,5]; sample 2 dropped
    // from frames but counted in the total; strict sign flips:
    // 3→-4 (yes), -4→0 (no), 0→5 (no), 5→2 (no)
    val df = Seq((1L, Seq(3, -4, 0, 5, 2))).toDF("id", "samples")
    val r = Multimodal.audioFrameFeatures(df, "samples", frameSize = 2)
      .select("n_samples", "n_frames", "total_energy", "zcr",
        "max_frame_energy").collect().head
    assert(r.getLong(0) == 5L)
    assert(r.getLong(1) == 2L)
    assert(r.getLong(2) == (9 + 16 + 0 + 25 + 4).toLong)
    assert(r.getLong(3) == 1L)
    assert(r.getLong(4) == 25L) // frames: 9+16=25, 0+25=25 → 25
  }

  test("PCM decode degrades to NULL samples on non-audio payloads") {
    import spark.implicits._
    val df = Seq((1L, Array[Byte](1, 2, 3, 4))).toDF("id", "content")
    val r = Multimodal.decodePcmSamples(df).select("samples").collect().head
    assert(r.isNullAt(0))
  }

  test("novelty: a token is credited to its lowest doc id only") {
    import spark.implicits._
    // same 4-gram in three docs → exactly one novel credit, at doc 5
    val docs = Seq((5L, "wxyz"), (6L, "wxyz"), (7L, "wxyz"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.noveltyCurve(docs, "doc_id", "text", 4, 1L)
      .collect().map(r => r.getAs[Long]("bucket") ->
        r.getAs[Long]("n_novel")).toMap
    assert(got == Map(5L -> 1L, 6L -> 0L, 7L -> 0L))
  }
}
