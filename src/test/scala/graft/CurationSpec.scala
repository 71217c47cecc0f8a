package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.Curation

class CurationSpec extends SparkSpec {

  private def df(schema: StructType, rows: Row*) = {
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows.toList).asJava),
      schema)
  }

  private def ranked(pairs: (Long, Int)*) = df(
    StructType(Seq(StructField("doc_id", LongType),
      StructField("rank", IntegerType))),
    pairs.map { case (id, r) => Row(id, r) }: _*)

  private def docs(texts: (Long, String)*) = df(
    StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType))),
    texts.map { case (id, t) => Row(id, t) }: _*)

  // ---------------- rrfFuse ----------------

  test("rrfFuse: doc in both arms outranks docs in one; scores exact") {
    val a = ranked(1L -> 1, 2L -> 2, 3L -> 3)
    val b = ranked(2L -> 1, 4L -> 2)
    val out = Curation.rrfFuse(Seq(a, b), "doc_id", "rank", c = 60, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2), r.getInt(3)))
    // doc 2: 1/62 + 1/61; doc 1: 1/61; doc 4: 1/62; doc 3: 1/63
    assert(out.map(_._1).toSeq == Seq(2L, 1L, 4L, 3L))
    assert(out(0)._2 == 1.0 / 62 + 1.0 / 61)
    assert(out(0)._3 == 2 && out(1)._3 == 1)
    assert(out.map(_._4).toSeq == Seq(1, 2, 3, 4))
  }

  test("rrfFuse: equal-score ties break by id; k truncates") {
    // doc 5 only in arm a at rank 2, doc 6 only in arm b at rank 2 →
    // identical scores, id order decides
    val a = ranked(5L -> 2, 1L -> 1)
    val b = ranked(6L -> 2, 1L -> 1)
    val out = Curation.rrfFuse(Seq(a, b), "doc_id", "rank", c = 60, k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3)))
    assert(out.toSeq == Seq(1L -> 1, 5L -> 2))
  }

  test("rrfFuse: single arm degrades to rank-reciprocal ordering") {
    val a = ranked(7L -> 1, 8L -> 2)
    val out = Curation.rrfFuse(Seq(a), "doc_id", "rank", c = 10, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq == Seq(7L -> 1.0 / 11, 8L -> 1.0 / 12))
  }

  // ---------------- hashedLinearScore ----------------

  /** JVM replay of the operator's weight formula. */
  private def centsOf(token: String, buckets: Int = 64): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    val h = java.lang.Long.parseLong(hex, 16)
    (h % buckets * 37 + 11) % 201 - 100
  }

  test("hashedLinearScore: logit matches a JVM replay of the formula") {
    val text = "merge the fast table scan"
    val d = docs(1L -> text)
    val r = Curation.hashedLinearScore(d, "doc_id", "text").collect()(0)
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val sum = toks.map(centsOf(_)).sum
    val logit = -0.05 + sum.toDouble / 100.0 / toks.length.toDouble
    assert(r.getInt(1) == toks.length)
    assert(r.getLong(2) == sum)
    assert(r.getDouble(3) == logit)
    assert(r.getInt(4) == (if (logit > 0.0) 1 else 0))
  }

  test("hashedLinearScore: empty text scores the bias, keep = 0") {
    val r = Curation.hashedLinearScore(docs(1L -> "   "), "doc_id", "text")
      .collect()(0)
    assert(r.getInt(1) == 0 && r.getLong(2) == 0L)
    assert(r.getDouble(3) == -0.05 && r.getInt(4) == 0)
  }

  // ---------------- gopherRules ----------------

  test("gopherRules: each rule fails on its crafted violator") {
    val good = (0 until 40)
      .map(i => s"wo${('a' + i / 10).toChar}${('a' + i % 10).toChar}")
      .mkString(" ") + " the and" // long, varied, letters only
    val short = "the and tiny"                              // < 20 tokens
    val longWords = ("supercalifragilistic " * 25) + "the and" // mwl > 10
    val noStop = (1 to 30).map(i => s"tok$i").mkString(" ")  // no stopwords
    val digits = "the and " + ("12345 " * 28)                // digit-heavy
    val repeated = "the and " + ("spam " * 28)               // one token dominates
    val d = docs(1L -> good, 2L -> short, 3L -> longWords,
      4L -> noStop, 5L -> digits, 6L -> repeated)
    val rows = Curation.gopherRules(d, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getInt(4),
        r.getInt(5), r.getInt(6), r.getInt(7)))
    val byId = rows.map(r => r._1 -> r).toMap
    assert(byId(1L) == ((1L, 1, 1, 1, 1, 1, 1)), s"good doc: ${byId(1L)}")
    assert(byId(2L)._2 == 0 && byId(2L)._7 == 0)  // word count
    assert(byId(3L)._3 == 0 && byId(3L)._7 == 0)  // mean word length
    assert(byId(4L)._4 == 0 && byId(4L)._7 == 0)  // stopwords
    assert(byId(5L)._5 == 0 && byId(5L)._7 == 0)  // digit density
    assert(byId(6L)._6 == 0 && byId(6L)._7 == 0)  // repetition
  }

  test("gopherRules: empty text passes repetition vacuously, fails word count") {
    val r = Curation.gopherRules(docs(1L -> ""), "doc_id", "text").collect()(0)
    assert(r.getInt(1) == 0)       // n_tokens
    assert(r.getInt(2) == 0)       // r_wordcount fails
    assert(r.getInt(6) == 1)       // r_repetition vacuous pass
    assert(r.getInt(7) == 0)       // keep
  }

  // ---------------- canonicalPerComponent ----------------

  private def scoredDocs(rows: (Long, Double)*) = df(
    StructType(Seq(StructField("doc_id", LongType),
      StructField("q", DoubleType))),
    rows.map { case (id, q) => Row(id, q) }: _*)

  private def comps(rows: (Long, Long)*) = df(
    StructType(Seq(StructField("id", LongType),
      StructField("component_id", LongType))),
    rows.map { case (id, c) => Row(id, c) }: _*)

  test("canonicalPerComponent: best-quality member wins; singletons survive") {
    import org.apache.spark.sql.functions.col
    // component 1: docs 1,2,3 with quality 0.2, 0.9, 0.5 → doc 2 wins
    // doc 9 is a singleton → kept as its own component
    val d = scoredDocs(1L -> 0.2, 2L -> 0.9, 3L -> 0.5, 9L -> 0.1)
    val c = comps(1L -> 1L, 2L -> 1L, 3L -> 1L)
    val out = Curation.canonicalPerComponent(d, c, "doc_id", col("q"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((2L, 1L, 3L, 0.9), (9L, 9L, 1L, 0.1)))
  }

  test("canonicalPerComponent: quality ties break to the lowest id") {
    import org.apache.spark.sql.functions.col
    val d = scoredDocs(5L -> 0.7, 4L -> 0.7)
    val c = comps(4L -> 4L, 5L -> 4L)
    val out = Curation.canonicalPerComponent(d, c, "doc_id", col("q")).collect()
    assert(out.length == 1 && out(0).getLong(0) == 4L)
  }

  // ---------------- budgetSelect / temperatureSample ----------------

  private def sized(rows: (Long, Long, Double)*) = df(
    StructType(Seq(StructField("doc_id", LongType),
      StructField("sz", LongType), StructField("q", DoubleType))),
    rows.map { case (id, n, q) => Row(id, n, q) }: _*)

  test("budgetSelect: greedy by score, inclusive-cumulative cutoff") {
    import org.apache.spark.sql.functions.col
    // score order: 3 (0.9, sz 40) → 1 (0.5, sz 50) → 2 (0.2, sz 30)
    // budget 95: keep 3 (cum 40) and 1 (cum 90); 2 would hit 120
    val d = sized((1L, 50L, 0.5), (2L, 30L, 0.2), (3L, 40L, 0.9))
    val out = graft.operators.Sampling
      .budgetSelect(d, "doc_id", "sz", col("q"), budget = 95L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 50L, 90L), (3L, 40L, 40L)))
  }

  test("budgetSelect: kept set is bucket-count invariant; zero budget is empty") {
    import org.apache.spark.sql.functions.col
    val d = sized((1 to 40).map(i =>
      (i.toLong, (i * 7 % 13 + 1).toLong, (i * 31 % 97) / 97.0)): _*)
    def keep(b: Int) = graft.operators.Sampling
      .budgetSelect(d, "doc_id", "sz", col("q"), budget = 100L, nBuckets = b)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(keep(1) == keep(7) && keep(7) == keep(256))
    assert(graft.operators.Sampling
      .budgetSelect(d, "doc_id", "sz", col("q"), budget = 0L)
      .collect().isEmpty)
  }

  test("temperatureSample: thresholds match a JVM replay; huge target keeps all") {
    val rows = (1 to 90).map(i =>
      Row(i.toLong, if (i <= 80) "big" else "small"))
    val d = df(StructType(Seq(StructField("doc_id", LongType),
      StructField("source", StringType))), rows: _*)
    val out = graft.operators.Sampling
      .temperatureSample(d, "doc_id", "source", targetTotal = 30L)
    val thr = out.select("source", "_keep_threshold").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // JVM replay: S = dec6(sqrt(80)) + dec6(sqrt(10)) (decimal-exact sum)
    def dec6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val s = (dec6(math.sqrt(80.0)) + dec6(math.sqrt(10.0))).toDouble
    def expect(n: Long) =
      math.min(1000000L, math.floor(1000000.0 * 30L * math.sqrt(n.toDouble)
        / (s * n.toDouble)).toLong)
    thr.foreach { case (src, t) =>
      val n = if (src == "big") 80L else 10L
      assert(t == expect(n), s"$src: $t != ${expect(n)}")
    }
    // huge target → thresholds clamp at 10⁶ → every row kept
    assert(graft.operators.Sampling
      .temperatureSample(d, "doc_id", "source", targetTotal = 1000000L)
      .count() == 90L)
  }

  // ---------------- obfuscationFold / blocklistHits ----------------

  test("obfuscationFold: leet, symbols, zero-width, vowel runs") {
    import org.apache.spark.sql.functions._
    val d = docs(1L -> "placeholder")
    def fold(s: String): String = d
      .select(graft.operators.Curation.obfuscationFold(lit(s)).as("f"))
      .collect()(0).getString(0)
    assert(fold("SP4MW0RD") == "spamword")
    assert(fold("b@dt0ken") == "badtoken")
    assert(fold("ev\u200Bil\uFEFFco") == "evilco")
    assert(fold("spaaamword") == "spamword")   // vowel run squeezed
    assert(fold("c00l") == "col")              // matching fold, not display
    assert(fold("$5") == "ss")                 // $→s, 5→s
    assert(graft.operators.Curation.foldTerm("SP4MW0RD") == "spamword")
    assert(graft.operators.Curation.foldTerm("ev\u200Bilco") == "evilco")
  }

  test("blocklistHits: folded corpus tokens match folded terms, counts exact") {
    val d = docs(
      1L -> "clean text with nothing bad here",
      2L -> "contains SP4MW0RD once",
      3L -> "b@dtoken twice b@dt0ken yes",
      4L -> "zero width ev\u200Bilco hidden and spamword plain")
    val got = graft.operators.Curation
      .blocklistHits(d, "doc_id", "text",
        Seq("spamword", "badtoken", "evilco"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_hits"), r.getAs[Long]("n_terms"))).toMap
    assert(got == Map(2L -> (1L, 1L), 3L -> (2L, 1L), 4L -> (2L, 2L)))
  }

  test("blocklistHits folds the BLOCKLIST side too") {
    val d = docs(1L -> "plain spamword here")
    val got = graft.operators.Curation
      .blocklistHits(d, "doc_id", "text", Seq("SP4MW0RD"))
      .collect()
    assert(got.length == 1 && got(0).getAs[Long]("n_hits") == 1L)
  }

  // ---------------- lineRepetitionRules ----------------

  test("lineRepetitionRules: hand-computed fractions at both granularities") {
    val d = docs(1L -> "a b\na b\nc d")
    val r = graft.operators.Curation
      .lineRepetitionRules(d, "doc_id", "text").collect()(0)
    assert(r.getAs[Int]("n_lines") == 3)
    assert(math.abs(r.getAs[Double]("dup_line_frac") - 1.0 / 3) < 1e-12)
    // "a b" twice: one duplicate occurrence of 3 chars over 9 line chars
    assert(math.abs(r.getAs[Double]("dup_line_char_frac") - 3.0 / 9) < 1e-12)
    assert(r.getAs[Int]("n_paras") == 1)
    assert(r.getAs[Double]("dup_para_frac") == 0.0)
    assert(r.getAs[Int]("keep") == 0) // 1/3 > 0.30 count threshold
  }

  test("lineRepetitionRules: duplicated paragraph moves both granularities") {
    val d = docs(1L -> "line one\nline two\n\nline one\nline two")
    val r = graft.operators.Curation
      .lineRepetitionRules(d, "doc_id", "text").collect()(0)
    assert(r.getAs[Int]("n_paras") == 2)
    assert(r.getAs[Double]("dup_para_frac") == 0.5)
    assert(r.getAs[Double]("dup_line_frac") == 0.5)
    assert(r.getAs[Int]("keep") == 0)
  }

  test("lineRepetitionRules: clean structured text keeps; blanks trim away") {
    val d = docs(1L -> "  alpha beta \n gamma delta \n\n\n epsilon zeta ")
    val r = graft.operators.Curation
      .lineRepetitionRules(d, "doc_id", "text").collect()(0)
    assert(r.getAs[Int]("n_lines") == 3)
    assert(r.getAs[Int]("n_paras") == 2)
    assert(r.getAs[Double]("dup_line_frac") == 0.0)
    assert(r.getAs[Int]("keep") == 1)
  }

  test("lineRepetitionRules: null text folds to the empty-string row") {
    val d = docs(1L -> null, 2L -> "")
    val got = graft.operators.Curation
      .lineRepetitionRules(d, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_lines"), r.getAs[Int]("n_paras"),
          r.getAs[Double]("dup_line_frac"), r.getAs[Int]("keep"))).toMap
    assert(got(1L) == got(2L))
    assert(got(1L) == (0, 0, 0.0, 1))
  }
}
