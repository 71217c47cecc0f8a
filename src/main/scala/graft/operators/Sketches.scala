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

  // ---------------------------------------------------------------
  // Count-Min sketch: mergeable approximate FREQUENCY under a fixed
  // memory bound — the point-query companion to the HLL distinct
  // sketches above and the bounded-memory companion to the EXACT
  // Misra-Gries heavy hitters ([[Frequency]]): Misra-Gries answers
  // "which keys are frequent" exactly but its shuffle grows with
  // k·tasks; a CMS table is a CONSTANT depth×width integer grid that
  // answers "how often does key x occur" within ε·N overcounting
  // (never undercounting), merges across batches by cellwise
  // addition (associative, commutative — batch boundaries and merge
  // order never change the table), and costs one map-side-combined
  // aggregate per batch. The sketch is an ordinary (d, w, cnt)
  // DataFrame persisted as parquet — no binary blobs, so an
  // independent engine (the DuckDB oracle) can rebuild it cell by
  // cell from the same recipe and reproduce every estimate exactly.
  //
  // Hash recipe: row d of the grid buckets key x with the
  // cross-engine md5 bucket ([[Sampling.md5Bucket]]) salted by the
  // row index — `('0x'||substr(md5(x||'cms<d>'),1,15))::BIGINT % w`
  // in any engine. Pairwise-independence is approximated the same
  // way production CMS libraries do (independent salted hashes).
  // ---------------------------------------------------------------

  /** Build a Count-Min sketch table of a key column: (d, w, cnt) for
    * 0 ≤ d < depth, 0 ≤ w < width, cnt = number of rows whose salted
    * hash lands in the cell. Only occupied cells are materialized
    * (the full grid is the left-join default-0 in [[cmsEstimate]]).
    * One explode(depth) + hash aggregate: the exchange carries at
    * most depth·width cells per task after map-side combine.
    */
  def cmsSketch(df: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 512): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad CMS shape $depth x $width")
    val rows = (0 until depth).map { d =>
      struct(lit(d).as("d"),
        Sampling.md5Bucket(col(keyCol), width, s"cms$d").as("w"))
    }
    df.select(explode(array(rows: _*)).as("c"))
      .groupBy(col("c.d").as("d"), col("c.w").as("w"))
      .agg(count(lit(1)).cast("long").as("cnt"))
  }

  /** Merge CMS tables (one per ingested batch) by cellwise addition —
    * work ∝ depth·width·batches, never corpus-sized.
    */
  def cmsMerge(tables: Seq[DataFrame]): DataFrame = {
    require(tables.nonEmpty, "cmsMerge: no sketch tables")
    tables.reduce(_ unionByName _)
      .groupBy(col("d"), col("w"))
      .agg(sum(col("cnt")).cast("long").as("cnt"))
  }

  /** Point-frequency estimates for the keys of `probes`: for each
    * probe key, min over the grid's rows of that key's cell — the
    * classic CMS estimate, ≥ the true count always, = it when no
    * salted hash collides. The probe side is query-sized: it explodes
    * ×depth, left-joins the sketch cells (absent cell = 0), and
    * min-groups back to one row per key — the sketch never re-scans
    * the corpus.
    */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame,
      keyCol: String, depth: Int = 4, width: Int = 512): DataFrame = {
    val rows = (0 until depth).map { d =>
      struct(lit(d).as("d"),
        Sampling.md5Bucket(col(keyCol), width, s"cms$d").as("w"))
    }
    probes.select(col(keyCol), explode(array(rows: _*)).as("c"))
      .select(col(keyCol), col("c.d").as("d"), col("c.w").as("w"))
      .join(sketch, Seq("d", "w"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).cast("long").as("est"))
  }
}
