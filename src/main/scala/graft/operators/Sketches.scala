package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketch maintenance (Apache DataSketches
  * HLL via Spark's native `hll_sketch_agg` family — codegen'd
  * aggregates, no UDFs).
  *
  * The scale problem this solves: "distinct users per segment over the
  * whole corpus" on 100 TB is a full-table shuffle every time someone
  * asks. Sketches make the aggregate INCREMENTALLY MAINTAINABLE: build
  * a per-group sketch table for each arriving batch (one map-side-
  * combined aggregate over the batch only), persist it as plain
  * parquet (the sketch is a binary column), and answer queries by
  * merging the persisted sketches — work proportional to
  * groups × batches, never to the corpus. HLL merging is a per-
  * register max, so it is associative, commutative, and idempotent —
  * merge order and batch boundaries never change the result
  * (SketchesSpec asserts order-invariance and idempotence under
  * overlap). One honest caveat, found empirically and documented by
  * DataSketches: a UNIONED sketch answers with the composite
  * estimator (union invalidates the direct sketch's HIP estimator),
  * so past the sparse regime the merged estimate can differ from a
  * from-scratch single-scan sketch by a fraction of a percent —
  * within the same error bound, exactly equal while sparse
  * (SketchesSpec pins both regimes) — never drifting with repetition.
  * Corollary: PERSIST batch sketches and merge the stored bytes
  * (serialization is promotion-path dependent, so re-sketching a batch
  * can yield different-but-equally-accurate bytes); every caller here
  * follows sketch-at-ingest, merge-the-tables.
  */
object Sketches {

  /** Per-group HLL sketch of a value column: one hash aggregate, the
    * sketch buffers combining map-side. Output (groupCol, sketch) —
    * the sketch is a BinaryType column that round-trips parquet.
    */
  def distinctSketches(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(valueCol)).as("sketch"))

  /** Merge any number of per-group sketch tables (e.g. one per
    * ingested batch) into one: union the (group, sketch) rows — batch
    * tables are group-sized, not corpus-sized — and reduce per group
    * with the HLL register-max union.
    */
  def mergeSketches(tables: Seq[DataFrame], groupCol: String): DataFrame = {
    require(tables.nonEmpty, "mergeSketches: no sketch tables")
    tables.reduce(_ unionByName _)
      .groupBy(col(groupCol))
      .agg(hll_union_agg(col("sketch")).as("sketch"))
  }

  /** Read the distinct-count estimates out of a sketch table. */
  def estimateDistinct(sketches: DataFrame, groupCol: String): DataFrame =
    sketches.select(col(groupCol),
      hll_sketch_estimate(col("sketch")).as("estimate"))
}
