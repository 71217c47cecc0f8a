package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental materialized-view maintenance over mergeable partial
  * aggregates.
  *
  * The reference's "incremental" story is a daily cron batch that
  * recomputes and replaces whole day-partitions
  * (`/root/reference/monarch_etl/db_loader.py:50-59`); its inventory
  * table (`monarch_etl/inventory.py:52-96`) is exactly a hand-rolled
  * single-key aggregate view rebuilt per run. This module is the
  * engine-native generalization: an aggregate view over arbitrary group
  * keys whose measures are all MERGEABLE partials — count and
  * decimal-exact sums add, min/max re-extremize — so applying a delta
  * costs |view| + |delta groups| and never re-scans the base table.
  * That is the 100 TB contract: the base corpus is touched once per
  * delta batch (one partial aggregation with map-side combine), and the
  * view itself is group-bounded.
  *
  * Storage rides the versioned-snapshot machinery
  * ([[graft.sinks.Writers.writeSnapshotVersion]]): every refresh is an
  * atomic manifest-commit, readers pin a version, and a crashed merge
  * leaves the previous version intact — the lakehouse MV lifecycle.
  *
  * Derived measures that are NOT mergeable (avg, stddev) are computed
  * at read time from the stored partials (avg = sum/count), the
  * standard partial-aggregate decomposition.
  */
object Materialize {

  /** View definition: group keys plus mergeable measures. `sums` /
    * `mins` / `maxs` map a source column to its stored partial alias;
    * the row count is always maintained under `countAs`.
    */
  final case class MvSpec(
      keys: Seq[String],
      sums: Seq[(String, String)] = Nil,
      mins: Seq[(String, String)] = Nil,
      maxs: Seq[(String, String)] = Nil,
      countAs: String = "n_rows")

  /** Stored sum type: wide enough that repeated merges never widen the
    * schema (Spark's sum over DECIMAL(30,6) stays within DECIMAL(38,6),
    * re-cast to (30,6) on every write so v1 and v27 have identical
    * schemas). Decimal addition is exact and associative — partial
    * sums are order- and partitioning-independent.
    */
  private val SumType = DecimalType(30, 6)

  /** One batch of base rows → its partial-aggregate rows (the MV row
    * format): a single hash aggregate with map-side combine.
    */
  def partials(batch: DataFrame, spec: MvSpec): DataFrame = {
    val aggs =
      count(lit(1)).as(spec.countAs) +:
        (spec.sums.map { case (src, a) =>
          sum(col(src).cast(DecimalType(18, 6))).cast(SumType).as(a) } ++
          spec.mins.map { case (src, a) => min(col(src)).as(a) } ++
          spec.maxs.map { case (src, a) => max(col(src)).as(a) })
    batch.groupBy(spec.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge the current view with a delta's partials: counts and sums
    * add, mins/maxs re-extremize. Exchanges carry only group keys and
    * partials — the base table is absent from this plan entirely.
    */
  def merge(current: DataFrame, deltaPartials: DataFrame,
      spec: MvSpec): DataFrame = {
    val aggs =
      sum(col(spec.countAs)).cast(LongType).as(spec.countAs) +:
        (spec.sums.map { case (_, a) => sum(col(a)).cast(SumType).as(a) } ++
          spec.mins.map { case (_, a) => min(col(a)).as(a) } ++
          spec.maxs.map { case (_, a) => max(col(a)).as(a) })
    current.unionByName(deltaPartials)
      .groupBy(spec.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Retraction-aware partials: every batch row carries `opCol` = +1
    * (insert) or −1 (delete), and the partials become signed — count
    * = Σop, each sum = Σ op·value — so a delete retracts exactly what
    * its insert contributed. This is what lets the view absorb CDC
    * streams (q100/q134 diffs) instead of insert-only deltas.
    *
    * min/max are structurally NOT retractable under bounded state
    * (deleting the current max needs a rescan of the survivors), so a
    * spec carrying them is rejected loudly rather than served wrong —
    * the honest contract every incremental-view engine documents.
    */
  def retractPartials(batch: DataFrame, opCol: String,
      spec: MvSpec): DataFrame = {
    require(spec.mins.isEmpty && spec.maxs.isEmpty,
      "min/max cannot be maintained under retraction with bounded state")
    val aggs =
      sum(col(opCol).cast(LongType)).cast(LongType).as(spec.countAs) +:
        spec.sums.map { case (src, a) =>
          sum(col(src).cast(DecimalType(18, 6)) * col(opCol))
            .cast(SumType).as(a)
        }
    batch.groupBy(spec.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** [[merge]] for retractable views: identical signed addition, plus
    * dropping groups whose row count reached zero — a fully-retracted
    * key leaves the view instead of lingering as a ghost row.
    */
  def mergeRetract(current: DataFrame, deltaPartials: DataFrame,
      spec: MvSpec): DataFrame =
    merge(current, deltaPartials, spec)
      .filter(col(spec.countAs) =!= 0L)

  /** Initialize the view from its first batch; returns the snapshot
    * version (1).
    */
  def init(batch: DataFrame, path: String, spec: MvSpec): Int =
    graft.sinks.Writers.writeSnapshotVersion(partials(batch, spec), path)

  /** Apply one delta batch: aggregate it, merge with the pinned latest
    * view, commit as a new snapshot version. The previous version stays
    * readable (and vacuumable) — time travel over view history for
    * free.
    */
  def applyDelta(spark: SparkSession, path: String, delta: DataFrame,
      spec: MvSpec): Int = {
    val cur = graft.sinks.Writers.readSnapshotVersion(spark, path)
    graft.sinks.Writers.writeSnapshotVersion(
      merge(cur, partials(delta, spec), spec), path)
  }

  /** Read the view (latest or pinned version). */
  def read(spark: SparkSession, path: String,
      version: Option[Int] = None): DataFrame =
    graft.sinks.Writers.readSnapshotVersion(spark, path, version)
}
