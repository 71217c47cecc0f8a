package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.WordPiece

class WordPieceSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val rs = rows.map { case (id, t) => Row(id, t) }.toList
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rs).asJava),
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType))))
  }

  test("learnVocab: all single chars plus frequency-ranked multi pieces") {
    // "ab" appears in every word; freq-weighted counts decide the cut
    val df = docs((1L, "abc abc abd"), (2L, "abc xy"))
    val vocab = WordPiece.learnVocab(df, "text",
      maxPieceLen = 3, keepMulti = 2, minCount = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // chars always present
    assert(Set("a", "b", "c", "d", "x", "y").subsetOf(vocab.keySet))
    // "ab" occurs in abc(3x) + abd(1) = 4; "abc" and "bc" occur 3x.
    // top-2 multi by (cnt desc, piece asc): "ab"(4), then "abc"(3)
    // beats "bc"(3) lexicographically
    assert(vocab("ab") == 4L && vocab("abc") == 3L)
    assert(!vocab.contains("bc") && !vocab.contains("abd"))
  }

  test("greedy longest-match: consumes the longest piece first") {
    val df = docs((1L, "abcd"))
    // vocab with "abc": greedy segments abc|d = 2 tokens (a shortest-
    // match or BPE-merge-order rule would differ)
    val got2 = WordPiece.wordPieceTokenCounts(df, "doc_id", "text",
      maxPieceLen = 3, keepMulti = 8, minCount = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got2(1L) == 2L)
  }

  test("hand-walked greedy over a learned vocabulary") {
    // corpus: "abcde" (freq 2), "abc" (x2), "de" (x2). Multi-piece
    // counts: abc 2+2=4, de 2+2=4, everything else 2. Top-4 multi by
    // (cnt desc, piece asc): abc, de, ab, bc.
    // Greedy "abcde": pos0 longest = abc, pos3 = de → 2 tokens/word.
    val df = docs((1L, "abcde abcde"), (2L, "abc abc de de"))
    val got = WordPiece.wordPieceTokenCounts(df, "doc_id", "text",
      maxPieceLen = 3, keepMulti = 4, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(1L) == 4L) // 2 words x (abc|de)
    assert(got(2L) == 4L) // abc, abc, de, de — one piece each
  }

  test("empty, null, and whitespace-only docs count zero tokens") {
    val df = docs((1L, "ab"), (2L, ""), (3L, null), (4L, "   "))
    val got = WordPiece.wordPieceTokenCounts(df, "doc_id", "text",
      maxPieceLen = 3, keepMulti = 4, minCount = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(2L) == 0L && got(3L) == 0L && got(4L) == 0L)
    assert(got(1L) >= 1L)
  }

  test("layout invariance: repartitioning changes no token count") {
    val df = docs((1L, "spark scan merge"), (2L, "merge spark"),
      (3L, "scan scan scan"))
    def run(d: org.apache.spark.sql.DataFrame) =
      WordPiece.wordPieceTokenCounts(d, "doc_id", "text",
        maxPieceLen = 4, keepMulti = 8, minCount = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(df) == run(df.repartition(7)))
  }
}
