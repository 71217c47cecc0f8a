package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.Entropy

class EntropySpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val rs = rows.map { case (id, t) => Row(id, t) }.toList
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rs).asJava),
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType))))
  }

  private def profile(rows: (Long, String)*): Map[Long, (Long, Long, Long)] =
    Entropy.charEntropyProfile(docs(rows: _*), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("power-of-two uniform alphabets are exact") {
    val got = profile((1L, "abcd"), (2L, "abcdefgh"), (3L, "aAbB"))
    // 4 symbols, uniform → exactly 2 bits; 8 → exactly 3 bits
    assert(got(1L) == ((4L, 4L, 2000000L)))
    assert(got(2L) == ((8L, 8L, 3000000L)))
    assert(got(3L) == ((4L, 4L, 2000000L))) // case-sensitive symbols
  }

  test("degenerate docs: constant text has zero entropy") {
    val got = profile((1L, "aaaaaaaa"), (2L, "z"))
    assert(got(1L) == ((8L, 1L, 0L)))
    assert(got(2L) == ((1L, 1L, 0L)))
  }

  test("hand-computed skewed case with the piecewise-linear micro-log2") {
    // "aab": N=3, ilog2m(3)=1,500,000; a: 2·(1.5e6−1e6)=1e6; b: 1.5e6
    // → (1e6+1.5e6) div 3 = 833,333
    val got = profile((1L, "aab"))
    assert(got(1L) == ((3L, 2L, 833333L)))
  }

  test("null and empty text produce no row") {
    val got = profile((1L, null), (2L, ""), (3L, "ok"))
    assert(got.keySet == Set(3L))
  }

  test("repetitive text scores below diverse text of the same length") {
    val rep = "abab" * 50
    val div = ('a' to 'z').mkString * 7 + ('a' to 'r').mkString
    assert(rep.length == div.length)
    val got = profile((1L, rep), (2L, div))
    assert(got(1L)._3 < got(2L)._3)
  }
}
