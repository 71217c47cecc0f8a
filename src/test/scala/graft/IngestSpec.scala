package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Multimodal
import graft.sources.Ingest

class IngestSpec extends SparkSpec {

  test("S7: nested observations explode to the succinct projection") {
    // family A6 fixture (FIXTURES.md): Frost-style nested record
    val json = Seq(
      """{"sourceId":"SN18700","referenceTime":"2010-04-01T00:00:00Z",
        |"observations":[
        |  {"elementId":"mean(air_temperature P1D)","value":4.2,"unit":"degC","timeOffset":"PT0H"},
        |  {"elementId":"sum(precipitation_amount P1D)","value":1.5,"unit":"mm","timeOffset":"PT6H"}]}"""
        .stripMargin.replaceAll("\n", ""),
      """{"sourceId":"SN90450","referenceTime":"2010-04-02T00:00:00Z",
        |"observations":[
        |  {"elementId":"mean(air_temperature P1D)","value":-1.0,"unit":"degC","timeOffset":"PT0H"}]}"""
        .stripMargin.replaceAll("\n", ""))
    import spark.implicits._
    val nested = spark.read.json(json.toDS)
    val flat = Ingest.explodeObservations(nested)
    assert(flat.columns.toSeq ==
      Seq("sourceId", "referenceTime", "elementId", "value", "unit", "timeOffset"))
    assert(flat.count() == 3)
    val r = flat.filter(col("sourceId") === "SN90450").collect()(0)
    assert(r.getAs[Double]("value") == -1.0 && r.getAs[String]("unit") == "degC")
  }

  test("S8: binary file scan reads media bytes as an opaque column") {
    val dir = Files.createTempDirectory("graft-bin")
    Files.write(dir.resolve("a.bin"), Array[Byte](1, 2, 3, 4))
    Files.write(dir.resolve("b.bin"), Array[Byte](5, 6))
    Files.write(dir.resolve("ignore.txt"), "nope".getBytes)
    val df = Ingest.binaryFiles(spark, dir.toString)
    val rows = df.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("length")).sorted.toSeq == Seq(2L, 4L))
  }

  test("S5/S6: catalog probes") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    assert(Ingest.columnNames(docs) == Seq("doc_id", "text", "lang", "source", "n_chars"))
    docs.createOrReplaceTempView("docs_probe")
    assert(Ingest.tableExists(spark, "docs_probe"))
    assert(!Ingest.tableExists(spark, "no_such_table"))
  }

  test("K4: JSON records serialization") {
    val out = Ingest.toJsonRecords(
      graft.sources.Tables.nation(spark, sfDir).orderBy("n_nationkey"), limit = 2)
    assert(out.length == 2)
    assert(out.head.contains("\"n_nationkey\":0"))
  }

  test("C13: binary overlay stub prepends tag, preserves payload") {
    val media = Multimodal.mediaFromDocuments(
      graft.sources.Tables.documents(spark, sfDir).limit(3))
    val out = Multimodal.overlayStub(media).collect()
    out.foreach { r =>
      val orig = r.getAs[Array[Byte]]("content")
      val tagged = r.getAs[Array[Byte]]("content_overlaid")
      assert(new String(tagged.take(8)) == "OVERLAY:")
      assert(tagged.drop(8).sameElements(orig))
    }
  }

  test("q29: HLL approx distinct lands within error bound of exact") {
    // the query's own bound flags (oracle-checked claim)
    val rows = graft.queries.Relational.q29ApproxDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("orders_est_ok"), r.toString)
      assert(r.getAs[Boolean]("parts_est_ok"), r.toString)
    }
    // and the RAW estimates directly (the value the query no longer
    // exports is still within HLL's documented error)
    import org.apache.spark.sql.functions._
    val raw = graft.sources.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey")).as("approx"),
        countDistinct(col("l_orderkey")).as("exact"))
      .collect()
    raw.foreach { r =>
      val a = r.getAs[Long]("approx").toDouble
      val e = r.getAs[Long]("exact").toDouble
      assert(math.abs(a - e) / e < 0.1, s"approx $a vs exact $e")
    }
  }

  test("schema-evolution read: drifted batches merge; old rows NULL-fill added columns") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    // batch 1: original schema; batch 2: a column added mid-history
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(s"$base/batch1")
    Seq((3L, "c", 30), (4L, "d", 40)).toDF("id", "v", "added")
      .write.parquet(s"$base/batch2")
    val merged = Ingest.readEvolved(spark, s"$base/batch1", s"$base/batch2")
    assert(merged.columns.toSet == Set("id", "v", "added"))
    val rows = merged.collect()
      .map(r => r.getLong(0) -> Option(r.getAs[Any]("added"))).toMap
    assert(rows(1L).isEmpty && rows(2L).isEmpty, "pre-drift rows must NULL-fill")
    assert(rows(3L).contains(30) && rows(4L).contains(40))
    // canonical downstream contract via SchemaEnforce: stable order
    val pinned = graft.operators.SchemaEnforce.conform(
      merged, Seq("id", "v", "added", "never_seen"))
    assert(pinned.columns.toSeq == Seq("id", "v", "added", "never_seen"))
    assert(pinned.filter(col("never_seen").isNotNull).count() == 0)
  }
}
