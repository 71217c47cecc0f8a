package graft

import org.apache.spark.storage.StorageLevel

import graft.plans.Checkpoints

/** Serialized stage materialization ([[graft.plans.Checkpoints]]): the
  * round-11 sf10 probe measured the deserialized localCheckpoint
  * default OOM-ing a 24g heap on a 239M-row edge list (per-row JVM
  * object overhead ~3× the data bytes, × 32 concurrently-unrolling
  * tasks); edge-scale frames checkpoint serialized instead.
  */
class CheckpointsSpec extends SparkSpec {

  test("serialized checkpoint cuts lineage at MEMORY_AND_DISK_SER with identical rows") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("id")
      .selectExpr("id", "id * 2 AS dbl")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val cp = Checkpoints.serialized(df)
    // same rows, eager materialization, serialized spillable storage.
    // localCheckpoint caches at the RDD layer (Dataset.storageLevel
    // only consults the SQL cache manager), so assert on the newly
    // persisted RDD's level
    val newLevels = spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => before(id) }.values
      .map(_.getStorageLevel).toSet
    assert(newLevels == Set(StorageLevel.MEMORY_AND_DISK_SER),
      s"new persistent RDD levels: $newLevels")
    assert(cp.collect().map(_.getLong(1)).sum == df.collect().map(_.getLong(1)).sum)
    // lineage is cut: the checkpointed plan reads the materialized RDD
    // instead of replaying the projection
    val plan = cp.queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD") && !plan.contains("Project"), plan)
  }

  test("neighborhoodSketch registers are bit-identical under the serialized boundary") {
    import spark.implicits._
    // a small graph where 2-hop reach differs per node; estimates at
    // this size are exact counts, so values pin the semantics
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("src", "dst")
    val out = graft.operators.Graph
      .neighborhoodSketch(edges, "src", "dst", hops = 2, lgConfigK = 9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 1 reaches {1,2,3}; node 2 {2,3,4}; node 3 {3,4}; node 4 {4};
    // node 10 {10,11}; node 11 {11}
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 2L, 4L -> 1L,
      10L -> 2L, 11L -> 1L))
  }

  test("drop releases a dead checkpoint's blocks, also through a projection") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val cp = (1L to 100L).toDF("id").localCheckpoint(true)
    assert(spark.sparkContext.getPersistentRDDs.keySet.size > before.size)
    Checkpoints.drop(cp)
    assert(spark.sparkContext.getPersistentRDDs.keySet == before)
    val cp2 = (1L to 100L).toDF("id").localCheckpoint(true)
    Checkpoints.drop(cp2.selectExpr("id * 2 AS d")) // projection over cp
    assert(spark.sparkContext.getPersistentRDDs.keySet == before)
    Checkpoints.drop((1L to 3L).toDF("id")) // non-checkpointed: no-op
    assert(spark.sparkContext.getPersistentRDDs.keySet == before)
  }

  test("iterative operators release superseded iterations' blocks (r14 opt)") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L))
      .toDF("src", "dst")
    val ranks = graft.operators.Graph.pageRank(edges, "src", "dst", iters = 3)
    ranks.collect()
    // only the RETURNED frame's own checkpoint may remain — per-round
    // rank frames and the node frame must have been released
    val leakedPr = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leakedPr.size <= 1, s"pageRank leaked blocks: $leakedPr")
    Checkpoints.drop(ranks)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)

    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val comps = graft.operators.Dedup.connectedComponents(pairs)
    assert(comps.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
    val leakedCc = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leakedCc.size <= 1, s"connectedComponents leaked blocks: $leakedCc")
    Checkpoints.drop(comps)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
  }
}
