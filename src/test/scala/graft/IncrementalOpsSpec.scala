package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Ranking, Sampling, TextAnalysis}

/** Batch-3 round-9 operators: incremental components, postings-index
  * BM25, rendezvous sharding, Zipf slope.
  */
class IncrementalOpsSpec extends SparkSpec {

  test("incrementalComponents == full recompute: merge, attach, untouched") {
    import spark.implicits._
    // base: {1-2-3} and {10-11}; 20 is a base singleton
    val baseEdges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val baseAssign = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("id")
      .join(Dedup.connectedComponents(baseEdges), Seq("id"), "left_outer")
      .select(col("id"),
        coalesce(col("component_id"), col("id")).as("component"))
    // increment: MERGE the two components (3-10), ATTACH new node 30
    // to 20, and a fully-new pair 40-41; 1-2-3/10-11 internals untouched
    val inc = Seq((3L, 10L), (30L, 20L), (40L, 41L)).toDF("id_a", "id_b")
    val got = Dedup.incrementalComponents(
      baseAssign, "id", "component", inc, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // full recompute over base ∪ increment (min-label canonical)
    val full = Dedup.connectedComponents(baseEdges.unionByName(inc))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == full)
    assert(got(11L) == 1L)  // merged across the new 3-10 edge
    assert(got(30L) == 20L) // attached newcomer
    assert(got(41L) == 40L) // brand-new pair
  }

  test("incrementalComponents with an empty increment is the identity") {
    import spark.implicits._
    val baseAssign = Seq((5L, 5L), (6L, 5L)).toDF("id", "component")
    val inc = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val got = Dedup.incrementalComponents(
      baseAssign, "id", "component", inc, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(5L -> 5L, 6L -> 5L))
  }

  test("postings-index BM25 answers bit-identically to the direct scan " +
    "and prunes the probe to the query terms' buckets") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-postings").toString + "/ix"
    Ranking.writePostingsIndex(docs, "doc_id", "text", dir, nBuckets = 32)
    val terms = Seq("merge", "scan")
    val direct = Ranking.bm25TopK(docs, "doc_id", "text", terms, k = 12)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val probe = Ranking.bm25TopKFromIndex(spark, dir, "doc_id", terms,
      k = 12, nBuckets = 32)
    val viaIndex = probe
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(viaIndex.toSeq == direct.toSeq) // scores bit-identical
    // the probe scan is partition-pruned to the terms' buckets
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("tb"),
      s"expected a tb PartitionFilters prune in:\n$plan")
  }

  test("rendezvousAssign: adding a shard never moves a row laterally") {
    import spark.implicits._
    val df = (1L to 500L).toDF("id")
    val five = Seq("s0", "s1", "s2", "s3", "s4")
    val a = Sampling.rendezvousAssign(df, "id", five)
      .withColumnRenamed("shard", "a")
    val b = Sampling.rendezvousAssign(df, "id", five :+ "s5")
      .withColumnRenamed("shard", "b")
    val j = a.join(b, Seq("id")).collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(j.forall { case (x, y) => x == y || y == "s5" })
    val moved = j.count { case (_, y) => y == "s5" }
    // ~1/6 expected; generous band
    assert(moved > 500 / 12 && moved < 500 / 3)
    // deterministic under layout
    val a2 = Sampling.rendezvousAssign(df.repartition(7), "id", five)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.collect().map(r => r.getLong(0) -> r.getString(1)).toMap == a2)
  }

  test("zipfSlope: an exact power-of-two Zipf vocabulary slopes -10^6") {
    import spark.implicits._
    // term 'aa' 4x, 'bb' 2x → ranks 1,2; micro-log2 coords are exact
    // powers of two, so the two-point OLS is exactly −1e6 ppm
    val docs = Seq((1L, "g", "aa aa aa aa bb bb")).toDF("id", "g", "text")
    val got = TextAnalysis.zipfSlope(docs, "g", "text").collect().head
    assert(got.getLong(1) == 2L && got.getLong(2) == -1000000L)
    // a flat (all-equal-frequency) vocabulary slopes exactly 0
    val flat = Seq((1L, "g", "x y z w")).toDF("id", "g", "text")
    val f = TextAnalysis.zipfSlope(flat, "g", "text").collect().head
    assert(f.getLong(2) == 0L)
  }
}
