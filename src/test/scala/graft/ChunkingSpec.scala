package graft

import org.apache.spark.sql.functions._

import graft.operators.{Chunking, Sampling}

class ChunkingSpec extends SparkSpec {

  test("chunkText windows overlap and reassemble to the document") {
    import spark.implicits._
    val text = ('a' to 'z').mkString * 10 // 260 chars
    val df = Seq((1L, text)).toDF("id", "text")
    val chunks = Chunking.chunkText(df, "text", 100, 20)
      .orderBy("chunk_id").collect()
    // step 80: starts 0,80,160 -> ceil((260-20)/80)=3 chunks
    assert(chunks.length == 3)
    val bodies = chunks.map(_.getAs[String]("chunk"))
    assert(bodies(0) == text.substring(0, 100))
    assert(bodies(1) == text.substring(80, 180))
    assert(bodies(2) == text.substring(160, 260))
    // consecutive chunks share exactly `overlap` characters
    assert(bodies(0).takeRight(20) == bodies(1).take(20))
    // reassembly: drop each chunk's leading overlap past the first
    assert(bodies(0) + bodies.drop(1).map(_.drop(20)).mkString == text)
  }

  test("chunkText edge cases: short, empty, null, exact-fit documents") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("tiny")),          // shorter than one window
      (2L, Some("")),              // empty still yields one chunk
      (3L, None: Option[String]),  // null yields none
      (4L, Some("x" * 100)),       // exactly one window
      (5L, Some("x" * 101)))       // one char past -> two chunks
      .toDF("id", "text")
    val got = Chunking.chunkText(df, "text", 100, 20)
      .groupBy("id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 5L -> 2L))
  }

  test("shuffleShard is a permutation: dense per-shard positions, stable") {
    import spark.implicits._
    val df = (0L until 2000L).toDF("id")
    val m = Sampling.shuffleShard(df, "id", 16).cache()
    // every row present exactly once
    assert(m.count() == 2000)
    assert(m.select("id").distinct().count() == 2000)
    // positions within each shard are dense 0..n-1
    val bad = m.groupBy("shard")
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"), min(col("pos")).as("mn"))
      .filter(col("mx") =!= col("n") - 1 || col("mn") =!= 0)
      .count()
    assert(bad == 0, "per-shard positions must be dense from 0")
    // deterministic: a re-run under a different layout agrees row-for-row
    val again = Sampling.shuffleShard(df.repartition(7), "id", 16)
    assert(m.except(again).count() == 0 && again.except(m).count() == 0)
    // salt changes the permutation
    val salted = Sampling.shuffleShard(df, "id", 16, salt = "v2")
    assert(salted.except(m).count() > 0)
    m.unpersist()
  }
}
