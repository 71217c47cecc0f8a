package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: attach to each left row the latest right row
  * with the same key and `right.ts <= left.ts` — the join a
  * training-data pipeline needs to look up "the feature snapshot in
  * effect when this event happened" without leaking the future.
  *
  * Spark has no built-in as-of join; per the preference order
  * (SURVEY.md §7.3 (a)) this composes existing operators instead of a
  * custom physical node: tag both sides, union on (key, ts, side), and
  * carry the right payload forward with a running `last(_, ignoreNulls)`
  * window. One shuffle on the key, one sort within key — the same cost
  * a dedicated merge-based as-of implementation pays, with AQE and
  * codegen for free.
  *
  * Ties: a right row AT the left timestamp wins (side ordering puts
  * snapshots before events at equal ts) — matching DuckDB's
  * `ASOF JOIN ... ON l.ts >= r.ts` semantics, which the oracle checks.
  */
object AsOfJoin {

  /** @param tolerance  max age (seconds) of the matched snapshot;
    *                   older matches become NULL (like pandas
    *                   merge_asof's tolerance)
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      rightPayload: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {

    val leftCols = left.columns.toSeq
    require(!rightPayload.exists(leftCols.contains),
      "right payload columns must not collide with left columns")

    // The whole right row is carried as ONE struct, so every payload
    // column comes from the SAME (latest) snapshot even when some
    // payload values in that snapshot are legitimately NULL. A
    // per-column last(_, ignoreNulls) would backfill a NULL payload
    // value from an OLDER snapshot, silently mixing rows.
    val snap = struct((col(rightTs).as("_snap_ts") +: rightPayload.map(col)): _*)
    val r0 = right
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
      .withColumn("_snap", snap)
    val snapType = r0.schema("_snap").dataType

    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_snap", lit(null).cast(snapType))
    val r = r0
      .withColumns(leftCols.filterNot(keys.contains)
        .map(c => c -> lit(null)).toMap)
      .select(l.columns.map(col): _*) // align order

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.unionByName(r)
      .withColumn("_snapc", last(col("_snap"), ignoreNulls = true).over(w))

    val withTolerance = tolerance match {
      case Some(sec) =>
        val tooOld = col("_snapc").isNull ||
          unix_micros(col("_ts")) - unix_micros(col("_snapc._snap_ts")) > sec * 1000000L
        carried.withColumn("_snapc",
          when(tooOld, lit(null).cast(snapType)).otherwise(col("_snapc")))
      case None => carried
    }

    val events = withTolerance.filter(col("_side") === 1)
    rightPayload.foldLeft(events)((df, c) =>
        df.withColumn(c, col("_snapc").getField(c)))
      .withColumn("asof_ts", col("_snapc._snap_ts"))
      .drop("_ts", "_side", "_snap", "_snapc")
  }
}
