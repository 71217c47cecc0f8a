package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpec {

  test("learnBpeMerges reproduces the hand-computed merge sequence") {
    import spark.implicits._
    // Sennrich-style toy corpus (no end-of-word marker):
    //   low ×5, lower ×2, newest ×6, widest ×3
    // Pair counts, iteration 1: (l,o)=7, (o,w)=7, (w,e)=2+6=8? no:
    //   low: l-o, o-w            ×5
    //   lower: l-o, o-w, w-e, e-r ×2
    //   newest: n-e, e-w, w-e, e-s, s-t ×6
    //   widest: w-i, i-d, d-e, e-s, s-t ×3
    // (e,s)=9, (s,t)=9, (w,e)=2+6=8, (l,o)=7, (o,w)=7 …
    // winner: count 9 tie between (e,s) and (s,t) → (e,s) by string
    // order. Then es-t appears 9× → (es,t)=9 wins iteration 2.
    // Iteration 3: (l,o)=7 and (o,w)=7 tie → (l,o).
    val docs = (
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    ).zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = Bpe.learnBpeMerges(docs, "text", iters = 3)
      .orderBy("iter")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L)))
  }

  test("applyMerge is leftmost-first on overlapping occurrences") {
    import spark.implicits._
    val df = Seq("aaa", "aaaa", "ababa").toDF("w")
      .select(col("w"),
        Bpe.applyMerge(
          transform(sequence(lit(1), length(col("w"))),
            i => substring(col("w"), i, lit(1))), "a", "a").as("m"))
    val out = df.collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(out("aaa") == List("aa", "a"))
    assert(out("aaaa") == List("aa", "aa"))
    assert(out("ababa") == List("a", "b", "a", "b", "a")) // no (a,a) adjacency
  }

  test("bpeTokenCounts: vocabulary-segmented per-doc counts, blank docs count 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, Some("lowest lowest low")), // est+lo merges: 3+3+2 = 8 tokens
      (2L, Some("  ")),                // blank → 0
      (3L, None: Option[String])       // null → 0
    ).toDF("doc_id", "text")
    val counts = Bpe.bpeTokenCounts(docs, "doc_id", "text",
        Seq(("e", "s"), ("es", "t"), ("l", "o")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // "lowest" → lo,w,est (3), "low" → lo,w (2)
    assert(counts == Map(1L -> 8L, 2L -> 0L, 3L -> 0L))
  }

  test("segmentWithMerges replays learned merges; null text stays null") {
    import spark.implicits._
    val docs = Seq((1L, Some("lowest low")), (2L, None: Option[String]))
      .toDF("doc_id", "text")
    val seg = Bpe.segmentWithMerges(docs, "text",
      Seq(("e", "s"), ("es", "t"), ("l", "o")))
    val rows = seg.collect().map(r => r.getLong(0) ->
      Option(r.getSeq[String](2)).map(_.toList)).toMap
    // "lowest low" chars → es, est, lo merges applied within the
    // whole string (segmentWithMerges is marker-free, space included)
    assert(rows(1L) == Some(List("lo", "w", "est", " ", "lo", "w")))
    assert(rows(2L).isEmpty)
  }
}
