package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit: a rule suite evaluated against a
  * table in as few passes as the rule types allow, producing one
  * violation-summary row per rule.
  *
  * The reference hand-rolls exactly these checks imperatively —
  * coordinate range validation and unparseable-date rejection in
  * `/root/reference/monarch_etl/cleaning.py:105-289`, row-count
  * reconciliation in `monarch_etl/inventory.py:52-96` — each as its own
  * pandas pass. The engine-native form is a rule ALGEBRA compiled onto
  * scan shapes:
  *
  *  - [[Quality.Check]] (predicate rules): ALL predicate rules share
  *    ONE scan — each contributes a conditional count and a
  *    conditional min-key to a single hash aggregate (2·k agg
  *    expressions, map-side combined), and the 1-row result unpivots
  *    to k summary rows driver-side. Adding a predicate rule never
  *    adds a pass.
  *  - [[Quality.Unique]] (key-uniqueness): one group-by on the key
  *    (count + min per group), violations are rows in groups with
  *    count > 1 — the only rule type that must shuffle, and it
  *    shuffles key + count only.
  *  - [[Quality.ForeignKey]] (referential integrity): a left-anti join
  *    against the dimension's key projection — broadcast when the dim
  *    is small (Catalyst's stats decide), never more than the key
  *    column across the exchange otherwise.
  *
  * Every rule yields `(rule, n_violations, min_violation_key)` with a
  * NULL key when the rule is clean — min, not "first", so the sample
  * is deterministic under any partitioning. A 100 TB audit is
  * therefore: one wide scan + one keyed count + one semi-join per FK,
  * regardless of how many predicate rules the suite carries.
  */
object Quality {

  sealed trait Rule { def name: String }

  /** Violation when `predicate` is TRUE (null-safe: a NULL predicate is
    * not a violation — write `col.isNull` explicitly to audit nulls).
    */
  final case class Check(name: String, predicate: Column) extends Rule

  /** Violation when the key tuple occurs more than once; every row of a
    * duplicated group counts.
    */
  final case class Unique(name: String, cols: Seq[String]) extends Rule

  /** Violation when `keyCol` (non-null) has no match in
    * `dim.(dimKey)`.
    */
  final case class ForeignKey(name: String, keyCol: String,
      dim: DataFrame, dimKey: String) extends Rule

  /** Run the suite; `keyCol` identifies rows in violation samples.
    * Returns (rule, n_violations, min_violation_key) ordered by rule.
    */
  def audit(df: DataFrame, keyCol: String, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate rule names in ${rules.map(_.name)}")
    val spark = df.sparkSession
    val key = col(keyCol)

    val checks = rules.collect { case c: Check => c }
    val checkPart: Option[DataFrame] = if (checks.isEmpty) None else Some {
      // one scan, 2 aggregate expressions per rule
      val aggs = checks.flatMap { c =>
        Seq(
          sum(when(c.predicate, 1L).otherwise(0L)).as(s"n_${c.name}"),
          min(when(c.predicate, key)).as(s"k_${c.name}"))
      }
      val row = df.agg(aggs.head, aggs.tail: _*)
      // unpivot the 1-row result to one row per rule (stack is
      // driver-free: it's a generator over the single aggregated row)
      val stacked = checks.map(c =>
        s"'${c.name}', coalesce(`n_${c.name}`, 0L), `k_${c.name}`")
        .mkString(", ")
      row.selectExpr(
        s"stack(${checks.size}, $stacked) as (rule, n_violations, min_violation_key)")
    }

    val uniqueParts = rules.collect { case u: Unique =>
      val grouped = df.groupBy(u.cols.map(col): _*)
        .agg(count(lit(1)).as("_c"), min(key).as("_k"))
        .where(col("_c") > 1)
      grouped.agg(
        coalesce(sum(col("_c")), lit(0L)).as("n_violations"),
        min(col("_k")).as("min_violation_key"))
        .select(lit(u.name).as("rule"), col("n_violations"),
          col("min_violation_key"))
    }

    val fkParts = rules.collect { case f: ForeignKey =>
      df.where(col(f.keyCol).isNotNull)
        .join(f.dim.select(col(f.dimKey).as(f.keyCol)).distinct(),
          Seq(f.keyCol), "left_anti")
        .agg(count(lit(1)).as("n_violations"),
          min(key).as("min_violation_key"))
        .select(lit(f.name).as("rule"), col("n_violations"),
          col("min_violation_key"))
    }

    (checkPart.toSeq ++ uniqueParts ++ fkParts)
      .reduce(_ unionByName _)
      .orderBy(col("rule"))
  }
}
