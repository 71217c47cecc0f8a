package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Sentences

class SentencesSpec extends SparkSpec {

  private def seg(text: String): Seq[String] = {
    val schema = StructType(Seq(StructField("t", StringType)))
    spark.createDataFrame(
        new java.util.ArrayList[Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(List(Row(text))).asJava),
        schema)
      .select(Sentences.segment(col("t")).as("s"))
      .collect()(0).getSeq[String](0).toList
  }

  test("plain sentences split on . ! ? with terminators kept") {
    assert(seg("One here. Two there! Three maybe? Four") ==
      Seq("One here.", "Two there!", "Three maybe?", "Four"))
  }

  test("abbreviations do not split: Dr., Prof., vs., etc.") {
    assert(seg("Dr. Smith met Prof. Jones. They argued red vs. blue.") ==
      Seq("Dr. Smith met Prof. Jones.", "They argued red vs. blue."))
  }

  test("two-dot forms keep their inner dot intact: e.g., i.e., p.m.") {
    assert(seg("We agreed e.g. on terms. Meet at 4 p.m. sharp. Done") ==
      Seq("We agreed e.g. on terms.", "Meet at 4 p.m. sharp.", "Done"))
  }

  test("decimal points never split") {
    assert(seg("Pi is 3.14 about. It is not 2.71 at all.") ==
      Seq("Pi is 3.14 about.", "It is not 2.71 at all."))
  }

  test("terminator runs collapse into one boundary; whitespace normalizes") {
    assert(seg("Wait...   what?!  Fine") == Seq("Wait...", "what?!", "Fine"))
  }

  test("empty, null-ish, and punctuation-only inputs yield no sentences") {
    assert(seg("") == Seq())
    assert(seg("   ") == Seq())
    assert(seg("...") == Seq())
  }

  test("abbreviation casing is preserved in the output sentence") {
    assert(seg("See fig. 7 here. Next.") == Seq("See fig. 7 here.", "Next."))
    assert(seg("MR. BIG spoke. Quietly.") == Seq("MR. BIG spoke.", "Quietly."))
  }

  test("single-letter initials still split (documented scope boundary)") {
    assert(seg("J. K. Rowling wrote. Books.") ==
      Seq("J.", "K.", "Rowling wrote.", "Books."))
  }
}
