package graft

import org.apache.spark.sql.Row

import graft.operators.SubstringDedup

/** Planted-span verification of the exact substring dedup (Lee et al.
  * ExactSubstr semantics at k-token granularity): verbatim duplicated
  * runs are planted across and within documents and the operator must
  * scrub every copy EXCEPT the globally-first occurrence, at exactly
  * the planted boundaries.
  */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  // A 6-token verbatim passage planted in three documents (and twice
  // in doc 40), embedded in otherwise-unique filler. k=4 < 6 so the
  // passage is above detection granularity.
  private val passage = "the quick brown fox jumps high"
  private def filler(seed: Int, n: Int): String =
    (0 until n).map(i => s"u${seed}w$i").mkString(" ")

  private lazy val docs = Seq(
    // doc 10: passage at token positions 3..8 (first occurrence)
    (10L, filler(1, 3) + " " + passage + " " + filler(2, 4)),
    // doc 20: same passage at positions 0..5
    (20L, passage + " " + filler(3, 5)),
    // doc 30: unique text only
    (30L, filler(4, 12)),
    // doc 40: passage TWICE (positions 2..7 and 10..15)
    (40L, filler(5, 2) + " " + passage + " " + filler(6, 2) + " " + passage)
  ).toDF("doc_id", "text")

  test("keep-first: only the globally-first copy of a planted span survives") {
    val out = SubstringDedup.exactSubstringDedup(docs, "doc_id", "text", k = 4)
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap

    // doc 10 holds the lexicographically-first occurrence — untouched
    assert(byId(10L).getInt(2) == 0)
    assert(byId(10L).getString(3) ==
      filler(1, 3) + " " + passage + " " + filler(2, 4))

    // doc 20 loses exactly the 6 passage tokens; its filler survives
    assert(byId(20L).getInt(2) == 6)
    assert(byId(20L).getString(3) == filler(3, 5))

    // doc 30 is untouched
    assert(byId(30L).getInt(2) == 0)

    // doc 40 loses BOTH in-doc copies (12 tokens): neither is the
    // globally-first site (doc 10 is), so within-doc repeats go too
    assert(byId(40L).getInt(2) == 12)
    assert(byId(40L).getString(3) == filler(5, 2) + " " + filler(6, 2))
  }

  test("duplicatedSpans reports the planted boundaries exactly") {
    val spans = SubstringDedup.duplicatedSpans(docs, "doc_id", "text", k = 4)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 20: passage at 0..5 → one span of 6 tokens from 0
    // doc 40: copies at 2..7 and 10..15 → two spans of 6 (gap of two
    // unique tokens between them keeps the islands separate)
    assert(spans.toSeq == Seq((20L, 0L, 6L), (40L, 2L, 6L), (40L, 10L, 6L)))
  }

  test("spans merge across adjacent windows of one long duplicate") {
    // one 10-token passage duplicated across two docs: all 7 k=4
    // windows mark in the copy and must merge into ONE 10-token span
    val long = (0 until 10).map(i => s"p$i").mkString(" ")
    val two = Seq((1L, long + " " + filler(7, 3)), (2L, filler(8, 3) + " " + long))
      .toDF("doc_id", "text")
    val spans = SubstringDedup.duplicatedSpans(two, "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(spans.toSeq == Seq((2L, 3L, 10L)))
  }

  test("sub-granularity duplicates are below resolution (documented)") {
    // a 3-token repeat with k=4 must NOT be detected
    val small = Seq((1L, "a b c " + filler(9, 4)), (2L, filler(10, 4) + " a b c"))
      .toDF("doc_id", "text")
    val out = SubstringDedup.exactSubstringDedup(small, "doc_id", "text", k = 4)
      .collect()
    assert(out.forall(_.getInt(2) == 0))
  }
}
