package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Point-in-interval (range) join: left rows at timestamp `t` matched
  * to right intervals `[start, end]` sharing a key.
  *
  * The naive formulation — an equi-join on the key plus a range
  * predicate — degenerates when keys are hot: Spark evaluates the range
  * filter AFTER materializing every same-key pair. The scalable
  * formulation here buckets time: each interval explodes into the
  * (few) fixed-width buckets it overlaps, each point maps to one
  * bucket, and the join key becomes (key, bucket) — pair count is
  * bounded by co-bucketed rows, not same-key rows. Bucket width should
  * be on the order of the typical interval length.
  *
  * Matches are exact (the range predicate re-filters candidates);
  * duplicates from intervals spanning multiple buckets are removed by
  * construction (a point matches an interval in exactly one bucket:
  * the point's own bucket).
  */
object RangeJoin {

  /** @param points     left side with `pointTs` timestamp column
    * @param intervals  right side with `startTs`/`endTs` timestamp columns
    * @param keys       equi-join key columns present on both sides
    * @param bucketSec  time-bucket width in seconds
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      keys: Seq[String], pointTs: String, startTs: String, endTs: String,
      bucketSec: Long = 600): DataFrame = {

    val pBucket = (unix_micros(col(pointTs)) / lit(bucketSec * 1000000L))
      .cast(LongType)
    val p = points.withColumn("_bucket", pBucket)

    // every bucket the interval [start, end] overlaps
    val iBuckets = sequence(
      (unix_micros(col(startTs)) / lit(bucketSec * 1000000L)).cast(LongType),
      (unix_micros(col(endTs)) / lit(bucketSec * 1000000L)).cast(LongType))
    val i = intervals.withColumn("_bucket", explode(iBuckets))

    p.join(i, keys :+ "_bucket")
      // exact range re-check: candidates are co-bucketed, matches are
      // point ∈ [start, end]; a point's bucket is unique so no dup pairs
      .filter(col(pointTs) >= col(startTs) && col(pointTs) <= col(endTs))
      .drop("_bucket")
  }
}
