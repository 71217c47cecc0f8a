package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Phrase

class PhraseSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def docs(rows: (Long, String)*): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(
          rows.toList.map { case (i, t) => Row(i, t) }).asJava),
      docSchema)

  private def report(df: DataFrame): Map[Long, (Long, Long)] =
    df.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_matches"), r.getAs[Long]("first_pos"))).toMap

  test("finds the phrase with counts and first position") {
    val d = docs(
      1L -> "the quick fox and the quick dog",
      2L -> "quick the fox",
      3L -> "nothing here")
    val got = report(Phrase.phraseMatches(d, "doc_id", "text",
      Seq("the", "quick")))
    assert(got == Map(1L -> (2L, 0L)))
  }

  test("overlapping matches count separately") {
    val d = docs(1L -> "a a a a")
    val got = report(Phrase.phraseMatches(d, "doc_id", "text", Seq("a", "a")))
    assert(got == Map(1L -> (3L, 0L)))
  }

  test("repeated phrase terms at different offsets") {
    val d = docs(1L -> "x y x z x y x", 2L -> "x y z")
    val got = report(Phrase.phraseMatches(d, "doc_id", "text",
      Seq("x", "y", "x")))
    assert(got == Map(1L -> (2L, 0L)))
  }

  test("matching is case- and whitespace-normalized") {
    val d = docs(1L -> "  The   QUICK fox")
    val got = report(Phrase.phraseMatches(d, "doc_id", "text",
      Seq("THE", "Quick")))
    assert(got == Map(1L -> (1L, 0L)))
  }

  test("index path is bit-identical to the scan path") {
    val d = docs((1L to 50L).map(i =>
      i -> s"w${i % 3} w${i % 5} w${i % 3} w${i % 5} w${i % 7}"): _*)
    val dir = java.nio.file.Files.createTempDirectory("phraseix").toString
    Phrase.writePositionalIndex(d, "doc_id", "text", dir, nBuckets = 8)
    val phrase = Seq("w1", "w2")
    val scan = report(Phrase.phraseMatches(d, "doc_id", "text", phrase))
    val ix = report(Phrase.phraseMatchesFromIndex(
      spark, dir, "doc_id", phrase, nBuckets = 8))
    assert(scan.nonEmpty && scan == ix)
  }

  test("append is read-transparent and bumps the freshness counter") {
    val batch1 = docs(1L -> "p q r", 2L -> "p q")
    val batch2 = docs(3L -> "x p q y", 4L -> "q p")
    val dir = java.nio.file.Files.createTempDirectory("phraseapp").toString
    Phrase.writePositionalIndex(batch1, "doc_id", "text", dir, nBuckets = 8)
    Phrase.appendToPositionalIndex(batch2, "doc_id", "text", dir, nBuckets = 8)
    val got = report(Phrase.phraseMatchesFromIndex(
      spark, dir, "doc_id", Seq("p", "q"), nBuckets = 8))
    assert(got == Map(1L -> (1L, 0L), 2L -> (1L, 0L), 3L -> (1L, 1L)))
    val meta = graft.sinks.Pruning.readIndexMeta(spark, dir).get
    assert(meta.params("n_docs") == 4L)
  }

  test("append fails fast on a bucket-count mismatch") {
    val d = docs(1L -> "a b")
    val dir = java.nio.file.Files.createTempDirectory("phraseappbad").toString
    Phrase.writePositionalIndex(d, "doc_id", "text", dir, nBuckets = 8)
    val e = intercept[IllegalArgumentException] {
      Phrase.appendToPositionalIndex(d, "doc_id", "text", dir, nBuckets = 4)
    }
    assert(e.getMessage.contains("n_buckets"))
  }

  test("index probe fails fast on a parameter mismatch") {
    val d = docs(1L -> "a b c")
    val dir = java.nio.file.Files.createTempDirectory("phrasebad").toString
    Phrase.writePositionalIndex(d, "doc_id", "text", dir, nBuckets = 8)
    val e = intercept[IllegalArgumentException] {
      Phrase.phraseMatchesFromIndex(spark, dir, "doc_id", Seq("a"), nBuckets = 16)
    }
    assert(e.getMessage.contains("n_buckets"))
  }

  test("batch probe equals per-phrase probes, one postings scan total") {
    val d = docs(
      1L -> "the quick fox and the quick dog",
      2L -> "a a a a",
      3L -> "x y x z x y x",
      4L -> "nothing relevant at all")
    val dir = java.nio.file.Files.createTempDirectory("phrasemany").toString
    Phrase.writePositionalIndex(d, "doc_id", "text", dir, nBuckets = 8)
    val phrases = Seq(
      Seq("the", "quick"),     // 2 overlapping-free matches in doc 1
      Seq("a", "a"),           // overlapping matches in doc 2
      Seq("x", "y", "x"),      // repeated phrase term, doc 3
      Seq("zz", "not", "here")) // no match anywhere
    val batch = Phrase.phraseMatchesMany(spark, dir, "doc_id", phrases,
      nBuckets = 8)
    val got = batch.collect().map(r => (r.getAs[Long]("phrase_id"),
      r.getAs[Long]("doc_id"), r.getAs[Long]("n_matches"),
      r.getAs[Long]("first_pos"))).toSet
    // per-phrase ground truth from the scan path
    val expect = phrases.zipWithIndex.flatMap { case (p, pid) =>
      Phrase.phraseMatches(d, "doc_id", "text", p).collect().map(r =>
        (pid.toLong, r.getAs[Long]("doc_id"), r.getAs[Long]("n_matches"),
          r.getAs[Long]("first_pos")))
    }.toSet
    assert(got == expect)
    assert(!got.exists(_._1 == 3L), "no-match phrase must contribute no rows")
    // the whole batch reads the postings ONCE — one parquet scan node
    // (flatten through the AQE wrapper; collect() above finalized it)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(flatten)
    }
    val scans = flatten(batch.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.length == 1, s"expected one postings scan, got ${scans.length}")
  }

  test("rejects empty and multi-token phrase elements") {
    val d = docs(1L -> "a b")
    intercept[IllegalArgumentException] {
      Phrase.phraseMatches(d, "doc_id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Phrase.phraseMatches(d, "doc_id", "text", Seq("a b"))
    }
  }
}
