package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.operators.Bleu

class BleuSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("cand", StringType),
    StructField("ref", StringType)))

  private def pairs(rows: (Long, String, String)*): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(
          rows.toList.map { case (i, c, r) => Row(i, c, r) }).asJava),
      schema)

  private def byN(df: DataFrame): Map[Int, (Long, Long, Long, Long, Long)] =
    df.collect().map(r => r.getAs[Int]("n") ->
      (r.getAs[Long]("matched"), r.getAs[Long]("total"),
        r.getAs[Long]("prec_micro_log2"),
        r.getAs[Long]("cand_tokens"), r.getAs[Long]("ref_tokens"))).toMap

  test("hand-computed clipped counts for orders 1 and 2") {
    val d = pairs((1L, "the cat the cat sat", "the cat sat on the mat"))
    val got = byN(Bleu.corpusNgramPrecision(d, "id", "cand", "ref", 2))
    // unigrams: cand {the:2, cat:2, sat:1}; ref {the:2, cat:1, sat:1,...}
    // matched = 2 + 1 + 1 = 4 of 5
    assert(got(1)._1 == 4L && got(1)._2 == 5L)
    // bigrams: cand {"the cat":2, "cat the":1, "cat sat":1}
    // matched = min(2,1) + 0 + 1 = 2 of 4
    assert(got(2)._1 == 2L && got(2)._2 == 4L)
    assert(got(1)._4 == 5L && got(1)._5 == 6L)
  }

  test("clipping: repeated candidate gram earns no credit for the excess") {
    val d = pairs((1L, "a a a a", "a b"))
    val got = byN(Bleu.corpusNgramPrecision(d, "id", "cand", "ref", 1))
    assert(got(1)._1 == 1L && got(1)._2 == 4L)
  }

  test("identity candidate: matched == total and zero log-precision") {
    val d = pairs(
      (1L, "alpha bravo charlie delta echo", "alpha bravo charlie delta echo"),
      (2L, "one two three four five six", "one two three four five six"))
    val got = byN(Bleu.corpusNgramPrecision(d, "id", "cand", "ref", 4))
    (1 to 4).foreach { n =>
      assert(got(n)._1 == got(n)._2, s"order $n")
      assert(got(n)._1 > 0L, s"order $n")
      assert(got(n)._3 == 0L, s"order $n smoothed log-precision")
    }
  }

  test("documents shorter than n contribute no order-n grams") {
    val d = pairs((1L, "x", "x y"))
    val got = byN(Bleu.corpusNgramPrecision(d, "id", "cand", "ref", 3))
    assert(got(1)._1 == 1L && got(1)._2 == 1L)
    assert(got(2) == (0L, 0L, 0L, 1L, 2L))
    assert(got(3) == (0L, 0L, 0L, 1L, 2L))
  }

  test("counts aggregate across documents; case and spacing normalize") {
    val d = pairs(
      (1L, "The  CAT sat", "the cat sat"),
      (2L, "dogs run", "dogs run fast"))
    val got = byN(Bleu.corpusNgramPrecision(d, "id", "cand", "ref", 2))
    assert(got(1)._1 == 5L && got(1)._2 == 5L)  // all 5 unigrams match
    assert(got(2)._1 == 3L && got(2)._2 == 3L)  // "the cat","cat sat","dogs run"
    assert(got(1)._4 == 5L && got(1)._5 == 6L)
  }

  test("corpusBleuScore: a JVM replay of the integer micro-log2 assembly") {
    val d = pairs(
      (1L, "the cat sat", "the cat sat on the mat"),
      (2L, "dogs run far", "dogs run"))
    val counts = Bleu.corpusNgramPrecision(d, "id", "cand", "ref", 2)
      .collect().map(r => (r.getAs[Long]("prec_micro_log2"),
        r.getAs[Long]("cand_tokens"), r.getAs[Long]("ref_tokens")))
    val got = Bleu.corpusBleuScore(d, "id", "cand", "ref", 2).collect()(0)
    val sp = counts.map(_._1).sum
    val (c, r) = (counts.head._2, counts.head._3)
    val mean = -((-sp) / 2)
    val bp = if (c >= r) 0L else -(((r - c) * 1442695L) / math.max(c, 1L))
    assert(got.getAs[Long]("mean_prec_micro_log2") == mean)
    assert(got.getAs[Long]("bp_micro_log2") == bp)
    assert(got.getAs[Long]("bleu_micro_log2") == mean + bp)
    assert(got.getAs[Long]("cand_tokens") == c)
    assert(got.getAs[Long]("ref_tokens") == r)
    // this fixture is length-balanced (6 vs 8 → BP branch live)
    assert(c < r && bp < 0L)
    // perfect candidate ⇒ BP 0 and score = the smoothing loss only
    val perfect = Bleu.corpusBleuScore(
      pairs((1L, "a b c d", "a b c d")), "id", "cand", "ref", 1).collect()(0)
    assert(perfect.getAs[Long]("bp_micro_log2") == 0L)
    assert(perfect.getAs[Long]("mean_prec_micro_log2") ==
      perfect.getAs[Long]("bleu_micro_log2"))
  }

  test("null texts contribute zero tokens, consistent with the gram side") {
    val d = pairs(
      (1L, "the cat sat", "the cat sat"),
      (2L, null, "ghost reference words"),
      (3L, "ghost candidate", null))
    val got = byN(Bleu.corpusNgramPrecision(d, "id", "cand", "ref", 2))
    // gram counts see only the non-null sides; length totals must agree
    // (a legacy size(null) = -1 would read cand_tokens = 4, ref_tokens = 5)
    assert(got(1)._4 == 5L && got(1)._5 == 6L)
    assert(got(1)._1 == 3L && got(1)._2 == 5L)
  }
}
