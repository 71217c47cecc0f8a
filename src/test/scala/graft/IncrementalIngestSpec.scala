package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.MonarchPipeline
import graft.streaming.EventStreams

class IncrementalIngestSpec extends SparkSpec {

  test("AvailableNow ingest processes each landed file exactly once") {
    val in = Files.createTempDirectory("graft-in").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val outCounts = scala.collection.mutable.ArrayBuffer.empty[Long]

    // land batch 1
    RawFixture.df(spark).limit(5).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    EventStreams.ingestAvailableNow(spark, in, schema, ckpt,
      (df, _) => outCounts += df.count())
    val afterFirst = outCounts.sum
    assert(afterFirst == 5)

    // land batch 2; rerun — only new files processed
    RawFixture.df(spark).write.mode("append").parquet(in)
    EventStreams.ingestAvailableNow(spark, in, schema, ckpt,
      (df, _) => outCounts += df.count())
    assert(outCounts.sum == afterFirst + RawFixture.rows.size)

    // rerun with nothing new → no additional rows
    EventStreams.ingestAvailableNow(spark, in, schema, ckpt,
      (df, _) => outCounts += df.count())
    assert(outCounts.sum == afterFirst + RawFixture.rows.size)
  }

  test("inventory backfill rebuilds the catalog from the warehouse") {
    val tmp = Files.createTempDirectory("graft-backfill").toString
    MonarchPipeline.dayScan(spark, RawFixture.df(spark), 2024, 3, 8,
      s"$tmp/wh", s"$tmp/rej", s"$tmp/inv")
    MonarchPipeline.dayScan(spark, RawFixture.df(spark), 2024, 3, 7,
      s"$tmp/wh", s"$tmp/rej", s"$tmp/inv")
    // wipe the inventory, rebuild from warehouse alone
    val rebuilt = MonarchPipeline.inventoryBackfill(spark, s"$tmp/wh", s"$tmp/inv2")
    val rows = rebuilt.collect().map(r =>
      (r.getAs[java.sql.Date]("available_date").toString,
        r.getAs[String]("table_name"), r.getAs[Long]("record_count"))).toSet
    assert(rows == Set(
      ("2024-03-07", "march072024", 1L),
      ("2024-03-08", "march082024", 1L)))
  }
}
