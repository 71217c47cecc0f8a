package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.Coverage

class CoverageSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val rs = rows.map { case (id, t) => Row(id, t) }.toList
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rs).asJava),
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType))))
  }

  test("greedy picks by NEW coverage, not raw shingle count") {
    // shingle size 3:
    //   doc 0 "abcdefgh": 6 shingles (largest raw count → round 1)
    //   doc 1 "abcdef":   4 shingles, ALL subsumed by doc 0
    //   doc 2 "xyzw":     2 shingles, disjoint
    //   doc 3 "abcxyz":   4 shingles, 3 new after doc 0 (abc covered)
    val df = docs((0L, "abcdefgh"), (1L, "abcdef"), (2L, "xyzw"),
      (3L, "abcxyz"))
    val got = Coverage.greedyCoverageSelect(df, "doc_id", "text",
      shingleSize = 3, rounds = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // round 2 must pick doc 3 (3 new) over doc 2 (2 new) even though a
    // set-size ranking would see doc 1 (4 shingles) first
    assert(got == Seq((1, 0L, 6L, 6L), (2, 3L, 3L, 9L), (3, 2L, 1L, 10L)))
  }

  test("ties break on the lowest doc id") {
    val df = docs((7L, "aaab"), (2L, "xxxy"), (9L, "pppq"))
    // all three contribute exactly 2 distinct 3-shingles
    val got = Coverage.greedyCoverageSelect(df, "doc_id", "text",
      shingleSize = 3, rounds = 2)
      .collect().map(r => r.getLong(1)).toSeq
    assert(got == Seq(2L, 7L))
  }

  test("stops early when nothing new remains; short/null docs ignored") {
    val df = docs((0L, "abcdef"), (1L, "abcdef"), (2L, "ab"), (3L, null))
    val got = Coverage.greedyCoverageSelect(df, "doc_id", "text",
      shingleSize = 3, rounds = 5).collect()
    // doc 1 duplicates doc 0 (zero gain), docs 2/3 shingle to nothing:
    // only one selection round can produce a winner
    assert(got.length == 1)
    assert(got.head.getLong(1) == 0L && got.head.getLong(2) == 4L)
  }
}
