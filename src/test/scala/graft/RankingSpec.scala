package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.Ranking

class RankingSpec extends SparkSpec {

  private def docs(texts: (Int, String)*) = {
    val rows = texts.map { case (id, t) => Row(id.toLong, t) }.toList
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
  }

  /** Hand-rolled rational-idf BM25 mirroring the operator's contract. */
  private def reference(
      corpus: Seq[(Int, String)], terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): Seq[(Long, Double, Int)] = {
    val toks = corpus.map { case (id, t) =>
      id.toLong -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }
    val n = toks.size.toDouble
    val avgdl = toks.map(_._2.size.toLong).sum.toDouble / toks.size.toDouble
    val dfm = terms.map(t => t -> toks.count(_._2.contains(t)).toDouble).toMap
    toks.flatMap { case (id, ts) =>
      val scores = terms.map { t =>
        val tf = ts.count(_ == t).toDouble
        if (tf == 0) None
        else {
          val idf = (n - dfm(t) + 0.5) / (dfm(t) + 0.5)
          Some(idf * (tf * (k1 + 1.0)) /
            (tf + k1 * ((1.0 - b) + b * ts.size.toDouble / avgdl)))
        }
      }
      if (scores.forall(_.isEmpty)) None
      else Some((id,
        scores.map(_.getOrElse(0.0)).reduceLeft(_ + _),
        scores.count(_.nonEmpty)))
    }.sortBy { case (id, s, _) => (-s, id) }
  }

  test("bm25 scores match the hand-rolled reference bit-for-bit") {
    val corpus = Seq(
      (0, "spark join merge join shuffle"),
      (1, "merge merge merge sort spill"),
      (2, "filter scan project filter"),
      (3, "no matching terms at all here"),
      (4, "join"))
    val got = Ranking.bm25TopK(docs(corpus: _*), "doc_id", "text",
      Seq("join", "merge", "filter"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
    val want = reference(corpus, Seq("join", "merge", "filter"))
    assert(got == want)
    // doc 3 matches nothing → absent
    assert(!got.exists(_._1 == 3L))
  }

  test("top-k truncates after the deterministic (score, id) order") {
    val corpus = (0 until 30).map(i => (i, if (i % 2 == 0) "hit token" else "miss"))
    val got = Ranking.bm25TopK(docs(corpus: _*), "doc_id", "text",
      Seq("hit"), k = 5).collect()
    assert(got.length == 5)
    // identical scores (same tf/dl) → ordered by doc_id
    assert(got.map(_.getLong(0)).toSeq == Seq(0L, 2L, 4L, 6L, 8L))
  }

  test("empty corpus yields an empty typed frame") {
    val out = Ranking.bm25TopK(docs(), "doc_id", "text", Seq("x"), k = 3)
    assert(out.count() == 0)
    assert(out.schema.fieldNames.toSeq == Seq("doc_id", "score", "n_terms_hit"))
  }

  test("tfidf nearest neighbor: twins pair up, stop-phrases don't link") {
    import spark.implicits._
    // docs 1/2 share the rare phrase; every doc shares the common one,
    // but with maxDf below the corpus size the common phrase is
    // vocabulary-excluded and cannot create pairs on its own
    val common = "the common filler phrase everyone repeats " * 2
    val corpus = Seq(
      (1L, common + "unique alpha beta gamma delta"),
      (2L, common + "unique alpha beta gamma delta"),  // twin of 1
      (3L, common + "totally different rare content here"),
      (4L, common + "totally different rare content here"), // twin of 3
      (5L, common + "nothing shared with anyone else zzz"))
      .toDF("doc_id", "text")
    val got = Ranking.tfidfNearestNeighbors(corpus, "doc_id", "text",
        ngram = 3, maxDf = 3, k = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L)._1 == 2L && got(2L)._1 == 1L)
    assert(got(3L)._1 == 4L && got(4L)._1 == 3L)
    // identical rare content => identical kept vectors => cos^2 = 1
    assert(got(1L)._2 == 1000000L, s"twin cos2 ${got(1L)._2}")
    assert(got(3L)._2 == 1000000L)
    // doc 5 shares nothing in the kept vocabulary: absent from output
    assert(!got.contains(5L))
  }

  test("tfidf nearest neighbor: tie on score breaks to the lower id") {
    import spark.implicits._
    val corpus = Seq(
      (10L, "aa bb cc dd"),
      (20L, "aa bb cc dd"),
      (30L, "aa bb cc dd"), // three identical docs: everyone ties at 1.0
      (40L, "xx yy zz ww")) // keeps df < N so idf stays positive
      .toDF("doc_id", "text")
    val got = Ranking.tfidfNearestNeighbors(corpus, "doc_id", "text",
        ngram = 2, maxDf = 5, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 20L, 20L -> 10L, 30L -> 10L))
  }
}
