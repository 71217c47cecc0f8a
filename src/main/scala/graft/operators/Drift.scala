package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Categorical distribution drift between two corpus snapshots — the
  * monitoring primitive a training pipeline runs before trusting a new
  * ingest: has the language / source / event-type mix moved, and
  * where? The statistic is the classic chi-squared decomposition, kept
  * per-category so the answer is actionable ("python docs tripled")
  * rather than one opaque number.
  *
  * Scale shape: two hash aggregates (one per snapshot, map-side
  * combined, each carrying one row per CATEGORY — never corpus rows)
  * and a category-sized full outer join. Totals ride the same
  * aggregates via a window-free grouping-sets-style rollup: a second
  * tiny aggregate over the category counts, broadcast back. At 100 TB
  * the exchanges carry |categories| rows.
  *
  * Determinism (oracle-replayable bit-for-bit): counts are exact
  * integers; `expected_after` and `chi2_term` are fixed IEEE
  * expression trees over those integers — identical operand order on
  * any engine reproduces identical doubles (the [[graft.queries.Det]]
  * per-row discipline; no order-dependent float SUM is published).
  * Category semantics at the edges: a category absent BEFORE has no
  * defined expectation (division by zero) — flagged `is_new`, term
  * NULL; absent AFTER contributes its full expectation ((0−e)²/e = e).
  */
object Drift {

  /** Per-category drift rows:
    * (category, n_before, n_after, expected_after, chi2_term, is_new),
    * ordered by category. `expected_after` scales the before-count to
    * the after-total: n_before · N_after / N_before.
    */
  def categoricalDrift(
      before: DataFrame, after: DataFrame, catCol: String): DataFrame = {
    def counts(df: DataFrame, out: String) =
      df.groupBy(col(catCol).as("category"))
        .agg(count(lit(1)).as(out))
    val b = counts(before, "n_before")
    val a = counts(after, "n_after")
    val joined = b.join(a, Seq("category"), "full_outer")
      .select(col("category"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"))
    // totals: a second aggregate over category counts (|categories|
    // rows in, 1 row out) — crossJoin of a 1-row frame broadcasts
    val totals = joined.agg(
      sum(col("n_before")).cast(LongType).as("_tb"),
      sum(col("n_after")).cast(LongType).as("_ta"))
    joined.crossJoin(broadcast(totals))
      .withColumn("is_new", col("n_before") === 0L)
      // fixed IEEE tree: (nb * ta) / tb — multiply first, one divide
      .withColumn("expected_after",
        when(col("is_new"), lit(null).cast(DoubleType))
          .otherwise(col("n_before").cast(DoubleType) *
            col("_ta").cast(DoubleType) / col("_tb").cast(DoubleType)))
      .withColumn("chi2_term",
        when(col("is_new"), lit(null).cast(DoubleType))
          .otherwise({
            val d = col("n_after").cast(DoubleType) - col("expected_after")
            d * d / col("expected_after")
          }))
      .select(col("category"), col("n_before"), col("n_after"),
        col("expected_after"), col("chi2_term"), col("is_new"))
      .orderBy(col("category"))
  }
}
