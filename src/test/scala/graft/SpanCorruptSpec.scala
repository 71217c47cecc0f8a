package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.SpanCorrupt

class SpanCorruptSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(
          rows.toList.map { case (i, t) => Row(i, t) }).asJava),
      schema)

  private def one(id: Long, text: String): Row =
    SpanCorrupt.corrupt(docs(id -> text), "doc_id", "text").collect()(0)

  /** JVM replay of the operator's hash geometry. */
  private def h60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }
  private def geometry(id: Long, k: Int, maxSpan: Int = 3,
      blockLen: Int = 8): (Int, Int) = {
    val l = (h60(s"$id:$k") % maxSpan).toInt + 1
    val s0 = (h60(s"$id:$k:o") % (blockLen - l + 1)).toInt
    (l, s0)
  }

  test("block geometry matches the JVM md5 replay exactly") {
    val toks = (1 to 16).map(i => s"w$i")
    val r = one(7L, toks.mkString(" "))
    val expIn = (0 until 2).flatMap { k =>
      val (l, s) = geometry(7L, k)
      val block = toks.slice(k * 8, k * 8 + 8)
      block.take(s) ++ Seq(s"<extra_id_$k>") ++ block.drop(s + l)
    }.mkString(" ")
    val expTgt = (0 until 2).flatMap { k =>
      val (l, s) = geometry(7L, k)
      Seq(s"<extra_id_$k>") ++ toks.slice(k * 8 + s, k * 8 + s + l)
    }.mkString(" ")
    assert(r.getAs[String]("input_text") == expIn)
    assert(r.getAs[String]("target_text") == expTgt)
    assert(r.getAs[Int]("n_tokens") == 16 && r.getAs[Int]("n_spans") == 2)
    val expCorrupted = (0 until 2).map(k => geometry(7L, k)._1).sum
    assert(r.getAs[Int]("n_corrupted") == expCorrupted)
  }

  test("trailing partial block passes through uncorrupted") {
    val toks = (1 to 10).map(i => s"t$i")
    val r = one(3L, toks.mkString(" "))
    assert(r.getAs[String]("input_text").endsWith(" t9 t10"))
    assert(r.getAs[Int]("n_spans") == 1)
    // the target never contains tail tokens
    assert(!r.getAs[String]("target_text").contains("t9"))
    assert(!r.getAs[String]("target_text").contains("t10"))
  }

  test("documents shorter than one block are untouched") {
    val r = one(5L, "a b c d e")
    assert(r.getAs[String]("input_text") == "a b c d e")
    assert(r.getAs[String]("target_text") == "")
    assert(r.getAs[Int]("n_spans") == 0 && r.getAs[Int]("n_corrupted") == 0)
  }

  test("sentinels are numbered in document order, once each") {
    val toks = (1 to 32).map(i => s"x$i")
    val r = one(11L, toks.mkString(" "))
    val in = r.getAs[String]("input_text")
    val ids = "<extra_id_([0-9]+)>".r.findAllMatchIn(in).map(_.group(1).toInt).toList
    assert(ids == List(0, 1, 2, 3))
    val tgtIds = "<extra_id_([0-9]+)>".r
      .findAllMatchIn(r.getAs[String]("target_text")).map(_.group(1).toInt).toList
    assert(tgtIds == List(0, 1, 2, 3))
  }

  test("input ∪ target reconstruct the original tokens exactly") {
    val toks = (1 to 24).map(i => s"z$i")
    val r = one(13L, toks.mkString(" "))
    // splice each target span back into its sentinel slot
    val spans = r.getAs[String]("target_text")
      .split("<extra_id_[0-9]+>").map(_.trim).filter(_.nonEmpty)
    var rebuilt = r.getAs[String]("input_text")
    spans.zipWithIndex.foreach { case (sp, k) =>
      rebuilt = rebuilt.replace(s"<extra_id_$k>", sp)
    }
    assert(rebuilt == toks.mkString(" "))
  }

  test("deterministic: identical output across runs") {
    val d = docs(1L -> (1 to 40).map(i => s"q$i").mkString(" "))
    val a = SpanCorrupt.corrupt(d, "doc_id", "text").collect().map(_.toString)
    val b = SpanCorrupt.corrupt(d, "doc_id", "text").collect().map(_.toString)
    assert(a.sameElements(b))
  }
}
