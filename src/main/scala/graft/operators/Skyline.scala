package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** 2-D Pareto skyline (maximize both dimensions): the rows no other
  * row dominates — "best cost/quality trade-offs", the multi-objective
  * shortlist query. A row is dominated when another is ≥ in both
  * dimensions and > in at least one; ties on both dimensions dominate
  * neither way.
  *
  * Naive skylines are all-pairs (n²) or a single global sort; this is
  * neither. Grid-pruned two-phase:
  *
  *  1. Bucket x into B fixed-width cells (width from a 1-row scalar
  *     max — broadcast, not collected into the data path). Every row
  *     in a strictly higher bucket has strictly larger x than
  *     everything below, so the suffix-max of per-bucket y over
  *     higher buckets is a CERTAIN dominator bound: any row with
  *     y ≤ that bound is provably dominated and pruned. The bound
  *     table is B rows, computed from a B-row frame and broadcast.
  *  2. The survivors (rows beating every higher bucket's best y —
  *     in practice a thin Pareto band) go through the exact
  *     dominance anti-join against themselves. Correctness never
  *     depends on the pruning rate: phase 1 only discards rows a
  *     concrete dominator was FOUND for, so phase 2's answer equals
  *     the all-pairs answer by construction.
  *
  * Scale: one keyed aggregate shape per phase-1 step (corpus touched
  * twice, bounded intermediates), and the anti-join's both sides are
  * the pruned band. All arithmetic integer.
  */
object Skyline {

  def skyline2D(df: DataFrame, idCol: String, xCol: String, yCol: String,
      buckets: Int = 64): DataFrame = {
    require(buckets >= 2, s"need at least 2 buckets, got $buckets")
    val pts = df.select(col(idCol).as("_id"),
      col(xCol).cast(LongType).as("_x"), col(yCol).cast(LongType).as("_y"))
    val maxX = pts.agg(max(col("_x")).as("_mx"))
    // fixed-width cell: width ≥ 1, bucket in [0, buckets)
    val bucketed = pts.crossJoin(broadcast(maxX))
      .withColumn("_b", least(lit(buckets - 1),
        expr(s"_x div (greatest(_mx, 1) div $buckets + 1)")).cast("int"))
    val bucketMax = bucketed.groupBy(col("_b"))
      .agg(max(col("_y")).as("_by"))
    // Suffix max over strictly higher buckets. The natural spelling is
    // a global window ordered by _b — but an unpartitioned window
    // plans Exchange SinglePartition, the pattern the plan gate bans
    // outright. Over this B-row frame it would be harmless, yet a
    // B×B broadcast self-join computes the same suffix max with no
    // single-partition exchange at all: left join keeps the top
    // bucket's NULL threshold (nothing above it ⇒ nothing pruned).
    val hi = bucketMax.select(col("_b").as("_hb"), col("_by").as("_hy"))
    val thresholds = bucketMax
      .join(broadcast(hi), col("_hb") > col("_b"), "left")
      .groupBy(col("_b"))
      .agg(max(col("_hy")).as("_thr"))
    val band = bucketed.join(broadcast(thresholds), Seq("_b"))
      .where(col("_thr").isNull || col("_y") > col("_thr"))
      .select(col("_id"), col("_x"), col("_y"))
    val dom = band.select(col("_x").as("_dx"), col("_y").as("_dy"))
    band.join(broadcast(dom),
        col("_dx") >= col("_x") && col("_dy") >= col("_y") &&
          (col("_dx") > col("_x") || col("_dy") > col("_y")),
        "left_anti")
      .select(col("_id").as(idCol), col("_x").as(xCol), col("_y").as(yCol))
      .orderBy(col(idCol))
  }
}
