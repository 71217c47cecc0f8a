package graft.plans

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Lineage-cut materialization for DATA-scale frames.
  *
  * `Dataset.localCheckpoint(true)` caches the frame at Spark's default
  * level — DESERIALIZED rows: every row is `UnsafeRow.copy`-ed into a
  * long-lived JVM object inside `MemoryStore.putIteratorAsValues`.
  * That is the right trade for node-sized or meta frames (no serde on
  * re-read, bounded count), but for frames whose ROW COUNT scales with
  * the data it is a heap bomb: the round-11 sf10 probe measured q215's
  * 239M-row edge list (two bare longs per row!) OOM-ing a 24 GB heap
  * during unroll — ~50 B of object overhead per 16-byte row, × 32
  * concurrently-unrolling tasks, before the first hop even ran.
  *
  * [[serialized]] keeps the same semantics (eager, lineage cut,
  * spillable) at `MEMORY_AND_DISK_SER`: rows land in a handful of
  * serialized byte chunks per block — UnsafeRow serialization is a
  * byte copy, unroll is incremental with graceful partial-spill, and
  * the long-term footprint is the data bytes, not the object graph.
  * Re-reads pay one cheap deserialization pass per scan, which the
  * sf0.1–sf3 graph-suite bench measured in the noise.
  *
  * Rule of thumb: edge lists, candidate-pair frames, register-blob
  * frames → [[serialized]]; per-node/per-group aggregates and
  * driver-bounded meta frames → plain `localCheckpoint(true)`.
  */
object Checkpoints {

  def serialized[T](ds: Dataset[T]): Dataset[T] =
    ds.localCheckpoint(eager = true, StorageLevel.MEMORY_AND_DISK_SER)

  /** Release the block-manager blocks behind a local checkpoint once
    * the frame is DEAD — every consumer itself materialized. Iterative
    * operators otherwise keep every superseded iteration's blocks
    * alive until the memory manager evicts them: pure pressure, since
    * a dead iteration's blocks are never read again (and a local
    * checkpoint's blocks were never recomputable to begin with, so
    * keeping them buys no fault tolerance either). Walks the plan for
    * checkpoint-backed leaves, so it also accepts a projection over a
    * checkpoint; callers must only hand it frames whose EVERY
    * checkpoint leaf is dead. No-op on non-checkpointed plans.
    */
  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  def drop(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.foreach { rdd =>
      // a violated liveness contract otherwise fails far away as an
      // unrecomputable-checkpoint SparkException; this trail names the
      // drop site's RDD ids so the distant failure is attributable
      // (r14 ADVICE — enable debug logging on graft.plans to see it)
      if (log.isDebugEnabled)
        log.debug(s"dropping checkpoint blocks of RDD ${rdd.id}")
      rdd.unpersist(blocking = false)
    }
}
