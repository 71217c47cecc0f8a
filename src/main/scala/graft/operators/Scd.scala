package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension modeling (warehouse type 2: keep full
  * attribute history as validity intervals instead of overwriting).
  * The reference's inventory upsert (`sinks/Writers.upsertInventory`)
  * is type 1 — last write wins; this is the history-preserving
  * counterpart a training-data warehouse needs for anything it must
  * reproduce as-of a date (source quality tiers, license states,
  * domain classifications).
  */
object Scd {

  /** Build a type-2 dimension from an event log: per key, order events
    * by (tsCol, tieCol), collapse consecutive rows whose `attrCols`
    * are unchanged (null-safe comparison), and emit one row per
    * attribute run with `valid_from` = its first event's timestamp and
    * `valid_to` = the next run's start (NULL = still current).
    *
    * `tieCol` makes the per-key order TOTAL — without it, two events
    * at the same timestamp would make run boundaries
    * partition-order-dependent, the same determinism rule every
    * windowed operator in this library follows.
    *
    * Scale shape: two windows, both keyed by the dimension key — no
    * global sort, no single-partition stage; cost is one keyed
    * exchange plus per-key sorts, and the second window runs over the
    * already-collapsed change rows (a fraction of the log when
    * attributes are sticky). Hot keys (one entity receiving a
    * disproportionate share of the log) are the usual skew story —
    * cap or salt upstream if one key dominates.
    *
    * Incremental use at 100 TB: because output depends only on each
    * key's own ordered events, refreshing a dimension from new events
    * only needs the affected keys' history (semi-join the log on
    * touched keys, rebuild those, pass the rest through) — the rebuild
    * cost is proportional to the delta, not the table.
    */
  def scd2FromEvents(
      events: DataFrame, keyCol: String, tsCol: String,
      attrCols: Seq[String], tieCol: String): DataFrame = {
    require(attrCols.nonEmpty, "scd2FromEvents: attrCols must be non-empty")
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val attrs = struct(attrCols.map(col): _*)
    val runs = graft.sources.Tables.widen(events)
      .select((keyCol +: tsCol +: tieCol +: attrCols).distinct.map(col): _*)
      .withColumn("_prev", lag(attrs, 1).over(byKey))
      .filter(col("_prev").isNull || !(attrs <=> col("_prev")))
    runs
      .withColumn("valid_to", lead(col(tsCol), 1).over(byKey))
      .select((col(keyCol) +: attrCols.map(col)) ++
        Seq(col(tsCol).as("valid_from"), col("valid_to")): _*)
  }

  /** Temporal lookup against a type-2 dimension: attach to each fact
    * row the dimension attributes valid AS OF its timestamp —
    * `valid_from <= ts < valid_to` (open rows match everything from
    * `valid_from` on). Facts before the key's first interval, or with
    * no dimension key at all, keep NULL attributes (left join).
    *
    * Scale shape: an EQUI-join on the dimension key with the interval
    * predicate as a join residual — Catalyst plans the keyed hash/merge
    * join and evaluates the range condition per matched pair, so the
    * cost is per-key fact × interval fanout, never a cross product.
    * Intervals per key are change counts (small by construction for
    * sticky attributes); a hot key is the usual salting story. The
    * SCD2 construction guarantees per-key intervals are disjoint, so
    * each fact matches AT MOST one row — row counts never amplify
    * (ScdSpec asserts this).
    */
  /** Bitemporal as-of: the state of each key at VALID time V as it
    * was KNOWN at transaction time T — the two-axis question neither
    * [[scd2FromEvents]] (valid time only) nor a snapshot store
    * (transaction time only) answers alone: "what did we believe on
    * commit T the state at business date V was", the reproducibility
    * contract of a regulated warehouse and of any training run that
    * must be replayed against the data AS IT WAS.
    *
    * `table` rows carry (key, validFromCol, txCol, attrs…). Visible
    * row per key = among rows with tx ≤ T and valid_from ≤ V, the max
    * valid_from; ties on valid_from resolve to max tx (a later
    * correction of the same business date wins). Keys with nothing
    * valid yet are absent.
    *
    * Scale: one filter (both predicates pushable to the scan /
    * partition pruning when the table is tx- or date-partitioned) and
    * ONE keyed window — no self-join, no global sort.
    */
  def bitemporalAsOf(table: DataFrame, keyCol: String,
      validFromCol: String, txCol: String,
      validTime: Column, txTime: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(validFromCol).desc, col(txCol).desc)
    table
      .filter(col(txCol) <= txTime && col(validFromCol) <= validTime)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  def asOfLookup(
      facts: DataFrame, dim: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val d = dim.select(
      col(keyCol).as("_dk"),
      col("valid_from").as("_vf"), col("valid_to").as("_vt"),
      struct(dim.columns.filterNot(
        Set(keyCol, "valid_from", "valid_to")).map(col): _*).as("_attrs"))
    facts.join(d,
        facts(keyCol) === col("_dk") &&
          facts(tsCol) >= col("_vf") &&
          (col("_vt").isNull || facts(tsCol) < col("_vt")),
        "left")
      .select(facts.columns.map(facts(_)) :+ col("_attrs"): _*)
  }
}
