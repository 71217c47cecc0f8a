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

  test("50+ rounds: cluster-side covered set, break on exhaustion, " +
      "shuffle fallback matches the broadcast path") {
    // 55 contributing docs — each carries a unique 4-gram "#NNN" plus a
    // shared tail — and 5 exact duplicates of docs 0-4 (ids 100-104)
    // that can never contribute once their original is picked.
    val contributing = (0 until 55).map(i =>
      (i.toLong, f"#$i%03d the shared tail every document repeats"))
    val dupes = (0 until 5).map(i =>
      (100L + i, f"#$i%03d the shared tail every document repeats"))
    val df = docs((contributing ++ dupes): _*)

    val got = Coverage.greedyCoverageSelect(df, "doc_id", "text",
      shingleSize = 4, rounds = 60)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq

    // exactly the 55 contributing docs are picked, then the loop breaks
    assert(got.length == 55)
    assert(got.map(_._1) == (1 to 55))
    assert(got.map(_._2).toSet == (0L until 55L).toSet)
    // covered_total is the strictly increasing running sum of gains and
    // ends at the corpus-wide distinct shingle count
    assert(got.map(_._4) == got.map(_._3).scanLeft(0L)(_ + _).tail)
    assert(got.forall(_._3 >= 1L))
    val totalDistinct = df
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextFunctions.charNGrams(
          org.apache.spark.sql.functions.col("text"), 4)).as("g"))
      .distinct().count()
    assert(got.last._4 == totalDistinct)

    // forcing the shuffled anti-join (guard at 0) replays identically
    val shuffled = Coverage.greedyCoverageSelect(df, "doc_id", "text",
      shingleSize = 4, rounds = 60, broadcastMaxHashes = 0L)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(shuffled == got)
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

  test("picked-doc exclusion plan is rounds-independent (anti-join, not isin)") {
    import spark.implicits._
    val shingles = Seq((1L, 10L), (2L, 20L)).toDF("_id", "_h")
    def planSize(nPicked: Int): Int =
      Coverage.excludePicked(shingles, (1L to nPicked.toLong))
        .queryExecution.analyzed.toString.length
    // an isin literal grows the predicate (and its codegen) linearly
    // with rounds; the broadcast anti-join's plan stays flat — the
    // picks ride LocalRelation DATA, not plan text
    val p10 = planSize(10); val p5000 = planSize(5000)
    assert(p5000 <= p10 + 32,
      s"exclusion plan grew with picks: $p10 -> $p5000")
    // and it still excludes: both rows drop once their ids are picked
    assert(Coverage.excludePicked(shingles, Seq(1L, 2L)).count() == 0)
    assert(Coverage.excludePicked(shingles, Seq(1L)).select("_id")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
  }
}
