package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Packing
import graft.sources.Tables

class PackingSpec extends SparkSpec {

  test("pack assignment: hand-computed shards, offsets and chunk ids") {
    import spark.implicits._
    // shard = id % 2; seqLen = 10.
    // shard 0 stream (ids 0,2,4; tokens 6,6,6): offsets 0,6,12 → packs 0,0,1
    // shard 1 stream (ids 1,3;   tokens 12,5):  offsets 0,12  → packs 0,1
    val docs = Seq((0L, 6), (1L, 12), (2L, 6), (3L, 5), (4L, 6))
      .toDF("id", "n_tok")
    val got = Packing.packSequences(docs, "id", col("n_tok"), seqLen = 10, nShards = 2)
      .select(col("id"), col("shard"), col("pack_offset"), col("pack_id"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(0L) == (0, 0L, 0L))
    assert(got(2L) == (0, 6L, 0L))
    assert(got(4L) == (0, 12L, 1L))
    assert(got(1L) == (1, 0L, 0L))
    assert(got(3L) == (1, 12L, 1L))
  }

  test("manifest conserves documents and tokens") {
    val docs = Tables.widen(Tables.documents(spark, sfDir))
    val manifest = Packing.packManifest(
      docs, "doc_id", TextFunctions.tokenCount(col("text")),
      seqLen = 512, nShards = 8).collect()
    assert(manifest.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val totalTokens = docs
      .agg(sum(TextFunctions.tokenCount(col("text")).cast("long")))
      .collect().head.getLong(0)
    assert(manifest.map(_.getAs[Long]("pack_tokens")).sum == totalTokens)
    // every pack is non-empty and packs are contiguous per shard
    assert(manifest.forall(_.getAs[Long]("n_docs") > 0))
    manifest.groupBy(_.getAs[Int]("shard")).foreach { case (_, packs) =>
      val ids = packs.map(_.getAs[Long]("pack_id")).sorted
      assert(ids.head == 0L && ids.zipWithIndex.forall { case (p, i) => p == i.toLong },
        "pack ids within a shard must be 0..n with no gaps")
    }
  }

  test("packing is deterministic and layout-independent") {
    import spark.implicits._
    val docs = (0L until 500L).map(i => (i, (i % 37 + 1).toInt)).toDF("id", "n_tok")
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.packSequences(df, "id", col("n_tok"), seqLen = 64, nShards = 4)
        .select("id", "shard", "pack_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(run(docs) == run(docs.repartition(7)),
      "pack assignment changed under repartitioning")
  }
}
