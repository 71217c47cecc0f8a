package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.SentenceDedup

class SentenceDedupSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(
          rows.toList.map { case (i, t) => Row(i, t) }).asJava),
      schema)

  private def run(d: org.apache.spark.sql.DataFrame,
      spanLen: Int = 3): Map[Long, (Int, Int, String)] =
    SentenceDedup.dropDuplicateSpans(d, "doc_id", "text", spanLen)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_sentences"), r.getAs[Int]("n_dropped"),
          r.getAs[String]("text"))).toMap

  test("copier loses exactly the borrowed three-sentence span; donor intact") {
    val d = docs(
      1L -> "Alpha one here. Bravo two there. Charlie three now. Delta four past. Echo five done.",
      2L -> "My own head. Bravo two there. Charlie three now. Delta four past. My own tail.")
    val got = run(d)
    assert(got(1L) == (5, 0,
      "Alpha one here. Bravo two there. Charlie three now. Delta four past. Echo five done."))
    assert(got(2L) == (5, 3, "My own head. My own tail."))
  }

  test("keep-first is global (id, pos) order, not per-doc") {
    // the SAME span appears twice inside doc 1: second occurrence drops
    val d = docs(
      1L -> "X a. Y b. Z c. Pad d. X a. Y b. Z c.")
    val got = run(d)
    assert(got(1L)._1 == 7)
    assert(got(1L)._2 == 3)
    assert(got(1L)._3 == "X a. Y b. Z c. Pad d.")
  }

  test("overlapping duplicated spans union their coverage") {
    // doc 2 borrows FOUR consecutive sentences → two overlapping
    // duplicated 3-spans; all four sentences drop, not six
    val d = docs(
      1L -> "K1 a. K2 b. K3 c. K4 d. K5 e.",
      2L -> "Own head. K1 a. K2 b. K3 c. K4 d. Own tail.")
    val got = run(d)
    assert(got(2L) == (6, 4, "Own head. Own tail."))
    assert(got(1L)._2 == 0)
  }

  test("documents with fewer than spanLen sentences are untouched") {
    val d = docs(
      1L -> "Only one. And two.",
      2L -> "Only one. And two.")  // identical, but no 3-span exists
    val got = run(d)
    assert(got(1L) == (2, 0, "Only one. And two."))
    assert(got(2L) == (2, 0, "Only one. And two."))
  }

  test("a fully-duplicated document scrubs to empty") {
    val d = docs(
      1L -> "S one. S two. S three.",
      2L -> "S one. S two. S three.")
    val got = run(d)
    assert(got(1L) == (3, 0, "S one. S two. S three."))
    assert(got(2L) == (3, 3, ""))
  }

  // ---- incremental: persisted span index ----

  test("incremental scrub: index hits drop, batch-local keep-first holds") {
    val dir = java.nio.file.Files.createTempDirectory("spanix").toString + "/ix"
    val indexed = docs(
      1L -> "Old alpha one. Old bravo two. Old charlie three. Old delta four.")
    SentenceDedup.writeSpanIndex(indexed, "doc_id", "text", dir)
    val batch = docs(
      10L -> "New head here. Old bravo two. Old charlie three. Old delta four. New tail there.",
      11L -> "Fresh K one. Fresh K two. Fresh K three. Unique end.",
      12L -> "Other head. Fresh K one. Fresh K two. Fresh K three. Other tail.")
    val got = SentenceDedup
      .dropDuplicateSpansIncremental(spark, dir, batch, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_sentences"), r.getAs[Int]("n_dropped"),
          r.getAs[String]("text"))).toMap
    // doc 10 borrowed an INDEXED span → middle drops, head/tail stay
    assert(got(10L) == (5, 3, "New head here. New tail there."))
    // doc 11 is the batch-local FIRST occurrence → intact
    assert(got(11L) == (4, 0,
      "Fresh K one. Fresh K two. Fresh K three. Unique end."))
    // doc 12 repeats doc 11's span within the batch → drops
    assert(got(12L) == (5, 3, "Other head. Other tail."))
  }

  test("span index append is read-transparent; param handshake fails fast") {
    val dir = java.nio.file.Files.createTempDirectory("spanix2").toString + "/ix"
    SentenceDedup.writeSpanIndex(
      docs(1L -> "A one. A two. A three."), "doc_id", "text", dir)
    SentenceDedup.appendToSpanIndex(
      docs(2L -> "B one. B two. B three."), "doc_id", "text", dir)
    val batch = docs(
      20L -> "A one. A two. A three.",   // hits the WRITE batch
      21L -> "B one. B two. B three.",   // hits the APPEND batch
      22L -> "C one. C two. C three.")   // fresh
    val got = SentenceDedup
      .dropDuplicateSpansIncremental(spark, dir, batch, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Int]("n_dropped")).toMap
    assert(got == Map(20L -> 3, 21L -> 3, 22L -> 0))
    assert(graft.sinks.Pruning.readIndexMeta(spark, dir)
      .get.params("n_docs") == 2L)
    intercept[IllegalArgumentException] {
      SentenceDedup.appendToSpanIndex(
        docs(3L -> "x. y. z."), "doc_id", "text", dir, spanLen = 4)
    }
  }

  test("sentence-less documents appear in the report as (0, 0, empty)") {
    val got = run(docs(
      1L -> "Alpha one here. Bravo two there. Charlie three now.",
      2L -> "   ",
      3L -> ""))
    assert(got(1L) == (3, 0, "Alpha one here. Bravo two there. Charlie three now."))
    assert(got(2L) == (0, 0, ""))
    assert(got(3L) == (0, 0, ""))
  }
}
