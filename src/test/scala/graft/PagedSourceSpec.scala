package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types._

import graft.sources.{PagedSource, Retry}

class PagedSourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("gbifID", LongType),
    StructField("eventDate", StringType),
    StructField("year", IntegerType),
    StructField("scientificName", StringType)))

  /** Fixture fetcher: 4 pages x 5 records, honors a pushed year filter
    * "server-side" like the GBIF API would.
    */
  private def fixtureFetcher(calls: AtomicInteger): PagedSource.PageFetcher =
    (page, filters) => {
      calls.incrementAndGet()
      if (page >= 4) None // endOfRecords
      else {
        val yearFilter = filters.collectFirst { case EqualTo("year", v: Int) => v }
        val rows = (0 until 5).map { i =>
          val id = page * 5 + i
          val year = 2023 + (id % 3)
          Seq(id.toLong, s"$year-06-${(id % 28) + 1}%02d", year, "Danaus plexippus")
        }
        Some(rows
          .filter(r => yearFilter.forall(_ == r(2)))
          .map(r => Seq(r(0), f"${r(2)}-06-${(r(0).asInstanceOf[Long] % 28) + 1}%02d", r(2), r(3))))
      }
    }

  test("paged source reads all pages in parallel partitions") {
    val calls = new AtomicInteger(0)
    PagedSource.register("fixture1", schema, fixtureFetcher(calls))
    val df = spark.read.format("graft.sources.PagedSourceProvider")
      .option("fetcher", "fixture1").option("maxPages", "6")
      .load()
    assert(df.count() == 20) // 4 real pages x 5, pages 4-5 empty
    assert(df.rdd.getNumPartitions == 6) // one partition per page
  }

  test("filter pushdown reaches the fetcher (server-side evaluation)") {
    val calls = new AtomicInteger(0)
    PagedSource.register("fixture2", schema, fixtureFetcher(calls))
    val df = spark.read.format("graft.sources.PagedSourceProvider")
      .option("fetcher", "fixture2").option("maxPages", "4")
      .option("pushdownColumns", "year,scientificName")
      .load()
      .filter(col("year") === 2024)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("year") == 2024))
    // the plan should show the pushed filter
    val explain = df.queryExecution.executedPlan.toString
    assert(explain.contains("PushedFilters") || rows.length < 20)
  }

  test("record limit caps each page (records_limitation)") {
    val calls = new AtomicInteger(0)
    PagedSource.register("fixture3", schema, fixtureFetcher(calls))
    val df = spark.read.format("graft.sources.PagedSourceProvider")
      .option("fetcher", "fixture3").option("maxPages", "4")
      .option("recordLimit", "2")
      .load()
    assert(df.count() == 8) // 4 pages x capped 2
  }

  test("retry: transient failures recover, permanent ones surface") {
    val attempts = new AtomicInteger(0)
    val v = Retry.withRetry(attempts = 5, baseDelayMs = 1) {
      if (attempts.incrementAndGet() < 3) sys.error("transient") else 42
    }
    assert(v == 42 && attempts.get() == 3)
    intercept[RuntimeException] {
      Retry.withRetry(attempts = 2, baseDelayMs = 1)(sys.error("permanent"))
    }
  }
}
