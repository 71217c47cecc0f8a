package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset splitting for training-data
  * pipelines.
  *
  * `rand()`-based sampling is unstable: retries, speculation, and
  * repartitioning all reshuffle the RNG stream, so "the same" split
  * differs run to run — poison for train/test hygiene. Everything here
  * derives from a hash of a stable row id: the assignment of a row
  * never changes, on any cluster, at any scale.
  */
object Sampling {

  /** Bucket index in [0, buckets) from a stable id (salted). */
  def hashBucket(id: Column, buckets: Int, salt: String = ""): Column =
    pmod(xxhash64(id, lit(salt)), lit(buckets)).cast("int")

  /** Deterministic fraction sample: keeps rows whose hash bucket falls
    * below `fraction` of the bucket space.
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
      salt: String = ""): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"bad fraction $fraction")
    df.filter(hashBucket(col(idCol), 1000000, salt) < (fraction * 1000000).toInt)
  }

  /** Stable named splits (e.g. train/val/test). Fractions must sum to
    * ≤ 1; remainder rows are dropped (or add a catch-all split).
    * Returns the input with a `split` column; rows assign to the first
    * split whose cumulative range contains their hash point.
    */
  def hashSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], salt: String = ""): DataFrame = {
    val total = splits.map(_._2).sum
    require(total <= 1.0 + 1e-9, s"split fractions sum to $total > 1")
    val bucket = hashBucket(col(idCol), 1000000, salt)
    val cumulative = splits.scanLeft(0.0)(_ + _._2).tail
    val assignment = splits.zip(cumulative).foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), cum)) =>
        when(acc.isNotNull, acc)
          .otherwise(when(bucket < (cum * 1000000).toInt, lit(name)))
    }
    df.withColumn("split", assignment).filter(col("split").isNotNull)
  }

  /** Stratified deterministic sample: per-stratum fractions with the
    * same hash-stability guarantee (`sampleBy` without the RNG).
    */
  def stratifiedHashSample(df: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Double], salt: String = ""): DataFrame = {
    val bucket = hashBucket(col(idCol), 1000000, salt)
    val keep = fractions.foldLeft(lit(false)) { case (acc, (stratum, frac)) =>
      acc || (col(stratumCol) === stratum && bucket < (frac * 1000000).toInt)
    }
    df.filter(keep)
  }
}
