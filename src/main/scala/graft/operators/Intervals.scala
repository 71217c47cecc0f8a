package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval concurrency analytics: how many sessions/calls/jobs are
  * open at once — capacity planning's core question over any log of
  * [start, end] spans.
  *
  * The classic sweep (+1 at start, −1 at end, running max of the
  * prefix sum) needs a TOTAL order over boundaries — spelled naively
  * that is one global window, the single-partition scale killer. Here
  * the sweep runs INSIDE a partition key the caller provides (day,
  * tenant, region …): each key's boundaries sort within their own
  * partition only. Spans that cross a key boundary are the caller's
  * contract to clip/split beforehand (the day-clipping a session log
  * needs is one `least/greatest` projection).
  *
  * Boundary tie semantics are pinned and replayable: at the same
  * instant, STARTS sort before ENDS (delta desc), so a span starting
  * exactly when another ends counts as overlapping — the
  * capacity-conservative reading; equal (instant, delta) pairs break
  * on the span id. All integer arithmetic.
  */
object Intervals {

  /** Per-key concurrency summary over [startCol, endCol] (µs longs,
    * inclusive-start exclusive-end after the tie rule above):
    * `n_spans`, `max_concurrent`, and the instant (µs) the maximum is
    * first reached.
    */
  def maxConcurrency(spans: DataFrame, keyCol: String,
      startCol: String, endCol: String, idCol: String): DataFrame = {
    val starts = spans.select(col(keyCol).as("_k"),
      col(startCol).as("_t"), lit(1L).as("_d"), col(idCol).as("_id"))
    val ends = spans.select(col(keyCol).as("_k"),
      col(endCol).as("_t"), lit(-1L).as("_d"), col(idCol).as("_id"))
    val sweep = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_d").desc, col("_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    starts.unionByName(ends)
      .withColumn("_open", sum(col("_d")).over(sweep))
      .groupBy(col("_k"))
      .agg(
        (count(lit(1)) / 2).cast("long").as("n_spans"),
        max(col("_open")).as("max_concurrent"),
        // first instant the maximum is reached: min (−open, t, id)
        // struct ⇒ max open, then earliest boundary
        min(struct((-col("_open")).as("no"), col("_t").as("t"),
          col("_id").as("i"))).getField("t").as("peak_at_us"))
      .withColumnRenamed("_k", keyCol)
  }
}
