package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.{Sampling, Sketches}
import graft.sinks.{Pruning, Writers}

/** Batch-2 round-9 operators: exact apportionment, sliding-window
  * distinct sketches, NDCG@k, and pruned targeted deletes.
  */
class ApportionSpec extends SparkSpec {

  private def table(rows: (Long, String)*) = {
    val rs = rows.map { case (id, s) => Row(id, s) }.toList
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rs).asJava),
      StructType(Seq(
        StructField("id", LongType),
        StructField("src", StringType))))
  }

  test("apportionSelect: hand-computed Hamilton quotas, exact totals") {
    // A:5 B:3 C:2, budget 7 → floors 3/2/1 (rems 5/1/4), leftover 1
    // goes to A (largest remainder) → quotas 4/2/1
    val rows = (1L to 5L).map(i => (i, "A")) ++
      (6L to 8L).map(i => (i, "B")) ++ (9L to 10L).map(i => (i, "C"))
    val got = Sampling.apportionSelect(table(rows: _*), "id", "src",
      budget = 7L, nBuckets = 8)
    val bySrc = got.collect().groupBy(_.getString(1))
    assert(bySrc("A").length == 4 && bySrc("B").length == 2 &&
      bySrc("C").length == 1)
    assert(got.count() == 7L)
    // quota column carries the audit
    assert(bySrc("A").head.getLong(3) == 4L)
  }

  test("apportionSelect: selection is layout-invariant and hash-stable") {
    val rows = (1L to 40L).map(i => (i, if (i % 3 == 0) "x" else "y"))
    def sel(d: org.apache.spark.sql.DataFrame) =
      Sampling.apportionSelect(d, "id", "src", budget = 11L, nBuckets = 4)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val base = sel(table(rows: _*))
    assert(base == sel(table(rows: _*).repartition(7)))
    assert(base.size == 11)
  }

  test("apportionSelect: plan construction launches no jobs (nothing " +
      "source-axis-sized reaches the driver)") {
    // the pre-round-14 formulation collected the (source, count) and
    // (source, bucket, offset) frames at BUILD time — a driver OOM
    // when the source axis is web domains. The distributed form must
    // construct lazily: zero Spark jobs until an action runs.
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val rows = (1L to 30L).map(i => (i, if (i % 4 == 0) "a" else "b"))
      val d = Sampling.apportionSelect(table(rows: _*), "id", "src",
        budget = 9L, nBuckets = 4)
      d.queryExecution.executedPlan // force full planning, still no jobs
      Thread.sleep(300) // listener bus is async; a job would register fast
      assert(jobs.get() == 0,
        s"apportionSelect ran ${jobs.get()} job(s) during plan construction")
      assert(d.count() == 9L) // and the plan still selects the budget
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("apportionSelect: budget >= N selects everything (capped quotas)") {
    val rows = (1L to 6L).map(i => (i, if (i <= 4) "A" else "B"))
    val got = Sampling.apportionSelect(table(rows: _*), "id", "src",
      budget = 100L, nBuckets = 4)
    assert(got.count() == 6L)
  }

  test("slidingDistinct: equals exact sliding distinct at small scale") {
    import org.apache.spark.sql.functions._
    val rows = Seq(
      ("2024-01-01", 1L), ("2024-01-01", 2L),
      ("2024-01-02", 2L), ("2024-01-02", 3L),
      ("2024-01-04", 9L),
      ("2024-01-05", 1L), ("2024-01-05", 9L))
    import spark.implicits._
    val ev = rows.toDF("day", "user")
    val daily = Sketches.distinctSketches(ev, "day", "user")
    val got = Sketches.slidingDistinct(daily, "day", 3)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // window 3 days (sparse HLL: exact at these cardinalities):
    // 01: {1,2}=2; 02: {1,2,3}=3; 04: {2,3,9} from 02..04 = 3... but
    // 02 is 2 days before 04 (in-window), 01 is not: {2,3,9}=3;
    // 05: days 03..05 = {9,1}=2
    assert(got == Map("2024-01-01" -> 2L, "2024-01-02" -> 3L,
      "2024-01-04" -> 3L, "2024-01-05" -> 2L))
  }

  test("ndcgAtK: perfect ranking scores exactly 10^6 ppm") {
    import spark.implicits._
    val rels = Seq((1, 10L, 3L), (1, 11L, 2L), (1, 12L, 1L))
      .toDF("q", "d", "rel")
    val perfect = Seq((1, 10L, 1L), (1, 11L, 2L), (1, 12L, 3L))
      .toDF("q", "d", "rank")
    val got = graft.operators.Ranking
      .ndcgAtK(perfect, rels, "q", "d", "rank", "rel", k = 10)
      .collect().head
    assert(got.getLong(3) == 1000000L)
    // reversed ranking scores strictly less
    val reversed = Seq((1, 12L, 1L), (1, 11L, 2L), (1, 10L, 3L))
      .toDF("q", "d", "rank")
    val worse = graft.operators.Ranking
      .ndcgAtK(reversed, rels, "q", "d", "rank", "rel", k = 10)
      .collect().head
    assert(worse.getLong(3) < 1000000L && worse.getLong(3) > 0L)
    // unjudged docs in the run contribute zero gain
    val padded = Seq((1, 10L, 1L), (1, 99L, 2L), (1, 98L, 3L))
      .toDF("q", "d", "rank")
    val p = graft.operators.Ranking
      .ndcgAtK(padded, rels, "q", "d", "rank", "rel", k = 10)
      .collect().head
    assert(p.getLong(1) == 3000000L) // only rank-1 rel 3 gains
  }

  test("deleteKeysPruned: deletes targets, leaves clean partitions " +
    "byte-identical, audits honestly") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-del").toString + "/t"
    (1L to 400L).map(i => (i, (i % 4).toInt))
      .toDF("k", "p").write.partitionBy("p").parquet(dir)
    Pruning.writeManifest(spark, dir, "p",
      zoneCols = Seq("k"), bloomCols = Seq("k"),
      numBits = 2048, numHashes = 4)
    def leafFiles(v: Int) = new java.io.File(s"$dir/p=$v")
      .listFiles().filter(f => f.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length, f.lastModified)).sortBy(_._1).toSeq
    val before = (0 to 3).map(leafFiles)
    // keys 8 and 16 both live in partition 0 only
    val audit = Writers.deleteKeysPruned(spark, dir, "p", "k", Seq(8L, 16L))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getInt(3)))).toMap
    assert(audit(0L)._2 == 2L && audit(0L)._3 == 1) // 2 deleted, rewritten
    // partitions the manifest proved clean were never scanned
    assert((1 to 3).forall(v => audit(v.toLong)._1 == 0 ||
      audit(v.toLong)._2 == 0L))
    // survivors: the two keys are gone, everything else intact
    val left = spark.read.parquet(dir).select("k")
      .collect().map(_.getLong(0)).toSet
    assert(left == (1L to 400L).toSet -- Set(8L, 16L))
    // untouched partitions are byte-identical (same files, same bytes)
    (1 to 3).filter(v => audit(v.toLong)._3 == 0).foreach { v =>
      assert(leafFiles(v) == before(v))
    }
    // idempotent: a second pass deletes nothing and rewrites nothing
    val again = Writers.deleteKeysPruned(spark, dir, "p", "k", Seq(8L, 16L))
      .collect().map(r => (r.getLong(2), r.getInt(3)))
    assert(again.forall { case (d, rw) => d == 0L && rw == 0 })
  }
}
