package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Geospatial / trajectory operators — the reference's problem domain is
  * animal-movement records with `decimalLatitude`/`decimalLongitude`
  * (`/root/reference/monarch_etl/cleaning.py:248-289` validates
  * coordinates; `/root/reference/monarch_etl/enrichment.py:24-66`
  * geocodes them), but its pandas pipeline never does spatial JOINs or
  * track analysis — it outsources per-point lookups to a REST geocoder.
  * At 100 TB the spatial work has to happen inside the engine, and the
  * scale-right shapes are the ones here:
  *
  *  - '''Grid-bucketed radius join''' ([[radiusJoin]]): the distributed
  *    spatial join. Cell id is the shuffle key (the spatial analogue of a
  *    hash partitioner), one side replicated to its 3x3 cell
  *    neighborhood, exact integer squared-distance residual predicate.
  *    Work is proportional to points x local density, never n^2; the
  *    only exchanged payload is `(id, x, y)`.
  *  - '''Track statistics / stop detection''' ([[trajectoryStats]],
  *    [[detectStops]]): per-animal keyed windows (partition by track id,
  *    order by time) — a single exchange on the track key, never a
  *    global sort. Stop segments use the gaps-and-islands run id
  *    computed INSIDE the same window partitioning, so the follow-up
  *    group-by reuses the exchange (hash partitioning on `user` already
  *    clusters `(user, run)`).
  *  - '''Nearest-facility assignment''' ([[nearestAssign]]): the K
  *    facilities are driver-bounded (like k-means centroids); the argmin
  *    is a per-row fold over a literal array — a map-only plan with ZERO
  *    exchanges and zero joins, the shape that assigns 100 TB of fixes
  *    to stations without moving a byte of corpus.
  *  - '''Cell density''' ([[cellDensity]]): the heatmap primitive — one
  *    partial-aggregated exchange carrying cell ids and counts only.
  *
  * All geometry is exact integer arithmetic on grid coordinates (no
  * floating-point trig), so every result is bit-identical across
  * engines and partitionings. Real-world lat/lon maps onto this by
  * fixed-point scaling (microdegrees) exactly as the Z-order writer
  * ([[graft.sinks.Writers]]) scales its cluster keys.
  */
object Geo {

  /** Deterministic synthetic grid coordinate in `[0, dim)` derived from
    * an id — the cross-engine recipe (md5-derived 60-bit hash, see
    * [[Sampling.md5Bucket]]) so DuckDB reproduces the exact point set:
    * `('0x'||substr(md5(id::VARCHAR||salt),1,15))::BIGINT % dim`.
    */
  def derivedCoord(id: Column, dim: Int, salt: String): Column =
    pmod(graft.functions.TextFunctions.md5Hash60(
      concat(id.cast(StringType), lit(salt))), lit(dim.toLong)).cast(LongType)

  /** Points-within-radius self-join via grid bucketing.
    *
    * Input: `(id, x, y)` with unique ids and long coordinates. Output:
    * every unordered pair `(a_id < b_id)` with squared euclidean
    * distance `<= radius^2`, plus `d2`.
    *
    * Cell size = radius, so any qualifying pair is at most one cell
    * apart on each axis; the probe side is replicated to its 3x3 cell
    * neighborhood and each qualifying pair is produced exactly once
    * (the build row matches only in its OWN home cell). The join is a
    * plain equi-join on the cell id — shuffle-partitioned by cell, the
    * spatial partitioner. Dense-cell skew at scale is the usual salted/
    * AQE skew-join territory; the replication factor is a constant 9.
    */
  def radiusJoin(points: DataFrame, radius: Long): DataFrame = {
    require(radius > 0, s"radius must be positive, got $radius")
    val r2 = radius * radius
    val build = points.select(
      col("id").as("a_id"), col("x").as("ax"), col("y").as("ay"),
      cell(col("x"), radius).as("cx"), cell(col("y"), radius).as("cy"))
    val offsets = array(
      (for (i <- -1 to 1; j <- -1 to 1)
        yield struct(lit(i.toLong).as("di"), lit(j.toLong).as("dj"))): _*)
    val probe = points
      .select(col("id").as("b_id"), col("x").as("bx"), col("y").as("by"),
        cell(col("x"), radius).as("pcx"), cell(col("y"), radius).as("pcy"))
      .withColumn("o", explode(offsets))
      .select(col("b_id"), col("bx"), col("by"),
        (col("pcx") + col("o.di")).as("cx"), (col("pcy") + col("o.dj")).as("cy"))
    val d2 = (col("ax") - col("bx")) * (col("ax") - col("bx")) +
      (col("ay") - col("by")) * (col("ay") - col("by"))
    build.join(probe, Seq("cx", "cy"))
      .where(col("a_id") < col("b_id") && d2 <= r2)
      .select(col("a_id"), col("b_id"), d2.as("d2"))
  }

  private def cell(c: Column, size: Long): Column =
    floor(c / size).cast(LongType)

  /** Random-walk position derivation for the synthetic tracks: each fix
    * contributes an md5-derived step `dx, dy in [-10, 10]`; the track
    * position is the running sum from a per-track base point. Returns
    * the input plus `dx, dy, x, y, step_l1, rn` (1-based fix index per
    * track ordered by `(ts, id)`), computed in ONE keyed window — a
    * single exchange on the track key.
    */
  def walkPositions(events: DataFrame, trackCol: String, tsCol: String,
      idCol: String, worldDim: Int = 4000): DataFrame = {
    val w = Window.partitionBy(col(trackCol)).orderBy(col(tsCol), col(idCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dx = pmod(graft.functions.TextFunctions.md5Hash60(
      concat(col(idCol).cast(StringType), lit("dx"))), lit(21L)) - 10
    val dy = pmod(graft.functions.TextFunctions.md5Hash60(
      concat(col(idCol).cast(StringType), lit("dy"))), lit(21L)) - 10
    events
      .withColumn("dx", dx.cast(LongType))
      .withColumn("dy", dy.cast(LongType))
      .withColumn("x", derivedCoord(col(trackCol), worldDim, "bx") +
        sum(col("dx")).over(run))
      .withColumn("y", derivedCoord(col(trackCol), worldDim, "by") +
        sum(col("dy")).over(run))
      .withColumn("step_l1", abs(col("dx")) + abs(col("dy")))
      .withColumn("rn", row_number().over(w).cast(LongType))
  }

  /** Per-track movement statistics over [[walkPositions]]: fix count,
    * L1 path length (sum of inter-fix displacements), net L1
    * displacement (first fix to last), bounding-box extent, and max
    * single step. All-integer, order-independent aggregates after the
    * one keyed window — the group-by on the track key reuses the
    * window's partitioning (no second exchange).
    */
  def trajectoryStats(events: DataFrame, trackCol: String, tsCol: String,
      idCol: String): DataFrame = {
    val pos = walkPositions(events, trackCol, tsCol, idCol)
    val afterFirst = col("rn") > 1
    pos.groupBy(col(trackCol))
      .agg(
        count(lit(1)).as("n_fixes"),
        coalesce(sum(when(afterFirst, col("step_l1"))), lit(0L))
          .cast(LongType).as("path_l1"),
        (abs(coalesce(sum(when(afterFirst, col("dx"))), lit(0L))) +
          abs(coalesce(sum(when(afterFirst, col("dy"))), lit(0L))))
          .cast(LongType).as("net_l1"),
        (max(col("x")) - min(col("x"))).as("bbox_w"),
        (max(col("y")) - min(col("y"))).as("bbox_h"),
        coalesce(max(when(afterFirst, col("step_l1"))), lit(0L))
          .cast(LongType).as("max_step_l1"))
      .orderBy(col(trackCol))
  }

  /** Stop detection: maximal runs of >= `minFixes` consecutive fixes
    * whose step displacement is `<= maxStepL1` (the animal lingers).
    * Gaps-and-islands: the run id is a running count of flag CHANGES
    * computed in the same keyed window as the positions (zero extra
    * exchanges — lag + sum share the window sort, and the final
    * group-by on `(track, run)` is already clustered by the track-key
    * partitioning). Emits one row per stop: track, start/end epoch-us,
    * fix count, integer centroid (floor of the mean position).
    */
  def detectStops(events: DataFrame, trackCol: String, tsCol: String,
      idCol: String, maxStepL1: Long, minFixes: Int): DataFrame = {
    val w = Window.partitionBy(col(trackCol)).orderBy(col(tsCol), col(idCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = walkPositions(events, trackCol, tsCol, idCol)
      .withColumn("still", (col("step_l1") <= maxStepL1).cast("int"))
      .withColumn("chg",
        when(lag(col("still"), 1).over(w).isNull ||
          lag(col("still"), 1).over(w) =!= col("still"), 1).otherwise(0))
      .withColumn("grp", sum(col("chg")).over(run))
    flagged.where(col("still") === 1)
      .groupBy(col(trackCol), col("grp"))
      .agg(
        min(unix_micros(col(tsCol))).as("start_us"),
        max(unix_micros(col(tsCol))).as("end_us"),
        count(lit(1)).as("n_fixes"),
        floor(sum(col("x")) / count(lit(1))).cast(LongType).as("cx"),
        floor(sum(col("y")) / count(lit(1))).cast(LongType).as("cy"))
      .where(col("n_fixes") >= minFixes)
      .select(col(trackCol), col("start_us"), col("end_us"),
        col("n_fixes"), col("cx"), col("cy"))
      .orderBy(col(trackCol), col("start_us"))
  }

  /** Per-track checkpoint sketch: the K positions at fix indices
    * `1 + i·(n−1) div (K−1)` for i = 0..K−1 (an index-linspace from
    * first to last fix), as a sorted `array<struct<i,x,y>>`. Tracks
    * with fewer than K fixes are dropped (their linspace would repeat
    * indices). This is the corpus→bounded-sketch reduction that makes
    * pairwise track comparison tractable: each track collapses from
    * O(fixes) rows to one K-checkpoint row BEFORE anything pairwise
    * happens, so the pair stage scales with track count, never fix
    * count.
    */
  def trajectoryCheckpoints(events: DataFrame, trackCol: String,
      tsCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 2, s"need at least 2 checkpoints, got $k")
    val wAll = Window.partitionBy(col(trackCol))
    val pos = walkPositions(events, trackCol, tsCol, idCol)
      .withColumn("_n", count(lit(1)).over(wAll))
      .where(col("_n") >= k)
    val idx = events.sparkSession.range(k).select(col("id").as("_i"))
    pos.join(broadcast(idx),
        col("rn") === lit(1) + expr(s"_i * (_n - 1) div ${k - 1}"))
      .groupBy(col(trackCol))
      .agg(sort_array(collect_list(
        struct(col("_i").as("i"), col("x"), col("y")))).as("cks"))
  }

  /** Trajectory-similarity self-join: pairs of tracks whose paths stay
    * within `maxL1` of each other at every one of K index-aligned
    * checkpoints (a discrete-Fréchet-flavoured co-movement test —
    * "these two animals travelled together"). Exact over the
    * checkpoint sketch: distance is max over checkpoints of the L1
    * displacement, all integer.
    *
    * Shape: [[trajectoryCheckpoints]] first (tracks become one bounded
    * row each), then the [[radiusJoin]] grid pattern on the FIRST
    * checkpoint (max ≤ maxL1 implies the first checkpoints differ by
    * ≤ maxL1 per axis, so blocking there loses nothing): cell-keyed
    * equi-join, 3×3 probe replication, exactly-once via home-cell +
    * `a < b`, and the full K-checkpoint max-L1 as the exact residual
    * predicate (`zip_with` + `array_max`, codegen'd per pair). Pair
    * work is density-bounded in TRACK space — fixes never reach this
    * join.
    */
  def trajectorySimilarity(events: DataFrame, trackCol: String,
      tsCol: String, idCol: String, k: Int, maxL1: Long): DataFrame = {
    require(maxL1 > 0, s"maxL1 must be positive, got $maxL1")
    val ck = trajectoryCheckpoints(events, trackCol, tsCol, idCol, k)
    val fx = element_at(col("cks"), 1).getField("x")
    val fy = element_at(col("cks"), 1).getField("y")
    val build = ck.select(col(trackCol).as("a_track"), col("cks").as("a_cks"),
      cell(fx, maxL1).as("cx"), cell(fy, maxL1).as("cy"))
    val offsets = array(
      (for (i <- -1 to 1; j <- -1 to 1)
        yield struct(lit(i.toLong).as("di"), lit(j.toLong).as("dj"))): _*)
    val probe = ck
      .select(col(trackCol).as("b_track"), col("cks").as("b_cks"),
        cell(fx, maxL1).as("pcx"), cell(fy, maxL1).as("pcy"))
      .withColumn("o", explode(offsets))
      .select(col("b_track"), col("b_cks"),
        (col("pcx") + col("o.di")).as("cx"),
        (col("pcy") + col("o.dj")).as("cy"))
    val dist = array_max(zip_with(col("a_cks"), col("b_cks"),
      (p, q) => abs(p.getField("x") - q.getField("x")) +
        abs(p.getField("y") - q.getField("y"))))
    build.join(probe, Seq("cx", "cy"))
      .where(col("a_track") < col("b_track"))
      .withColumn("max_l1", dist)
      .where(col("max_l1") <= maxL1)
      .select(col("a_track"), col("b_track"), col("max_l1"))
      .orderBy(col("a_track"), col("b_track"))
  }

  /** Track resampling: the irregular fix stream regularized onto an
    * absolute time grid (every `stepUs` microseconds, grid points
    * aligned to multiples of the step) by as-of fill — each slot
    * carries the most recent fix at or before it plus its staleness.
    * Telemetry arrives whenever the tag phones home; models and maps
    * want positions on a uniform clock — this is the bridge, and it
    * reuses the engine's as-of machinery
    * ([[graft.operators.AsOfJoin.asOfJoin]]: one union + keyed window,
    * never a per-slot lookup join). Slots span each track's own
    * [first fix, last fix] interval, so every emitted slot has a fix
    * to inherit (no NULL positions by construction).
    *
    * Scale: the grid is generated per track with `sequence` + explode
    * (span div step rows per track, no driver involvement), and the
    * as-of is the single-exchange union-window shape on the track key.
    */
  def resampleTracks(events: DataFrame, trackCol: String, tsCol: String,
      idCol: String, stepUs: Long): DataFrame = {
    require(stepUs > 0, s"stepUs must be positive, got $stepUs")
    val pos = walkPositions(events, trackCol, tsCol, idCol)
      .select(col(trackCol), unix_micros(col(tsCol)).as("fus"),
        col("x"), col("y"))
    val grid = pos.groupBy(col(trackCol))
      .agg(min(col("fus")).as("_lo"), max(col("fus")).as("_hi"))
      .withColumn("_k0", expr(s"(_lo + ${stepUs - 1}) div $stepUs"))
      .withColumn("_k1", expr(s"_hi div $stepUs"))
      // a span containing no grid point yields no slots (sequence with
      // start > stop would DESCEND, not empty out)
      .where(col("_k0") <= col("_k1"))
      .select(col(trackCol),
        explode(sequence(col("_k0"), col("_k1"))).as("_k"))
      .select(col(trackCol), (col("_k") * stepUs).as("slot_us"))
    AsOfJoin.asOfJoin(grid, pos, Seq(trackCol), "slot_us", "fus",
        rightPayload = Seq("x", "y"))
      .select(col(trackCol), col("slot_us"), col("x"), col("y"),
        (col("slot_us") - col("asof_ts")).as("age_us"))
      .orderBy(col(trackCol), col("slot_us"))
  }

  /** Nearest-facility assignment: each point gets the id of (and squared
    * distance to) its closest station, ties to the lowest station id.
    *
    * The station set must be driver-bounded (it is collected and folded
    * into the plan as a literal array, like k-means centroids in
    * [[Similarity]]); the argmin is then `aggregate()` over that array —
    * a per-row fold with ZERO exchanges, zero joins, and no group-by.
    * The alternative (broadcast join + min-of-struct re-aggregation)
    * shuffles the full point table on its key; this shape never moves
    * the corpus at all.
    *
    * `stations` needs columns `(sid: int-castable, sx, sy: long)`.
    */
  def nearestAssign(points: DataFrame, stations: Array[(Int, Long, Long)])
      : DataFrame = {
    require(stations.nonEmpty && stations.length <= 10000,
      s"station set must be driver-bounded, got ${stations.length}")
    val arr = array(stations.map { case (sid, sx, sy) =>
      struct(lit(sid).as("sid"), lit(sx).as("sx"), lit(sy).as("sy"))
    }: _*)
    val best = aggregate(
      arr,
      struct(lit(Long.MaxValue).as("d2"), lit(Int.MaxValue).as("sid")),
      (acc, st) => {
        val d2 = (col("x") - st.getField("sx")) * (col("x") - st.getField("sx")) +
          (col("y") - st.getField("sy")) * (col("y") - st.getField("sy"))
        when(d2 < acc.getField("d2"),
          struct(d2.as("d2"), st.getField("sid").as("sid"))).otherwise(acc)
      })
    points.withColumn("best", best)
      .select(col("id"), col("best.sid").as("station_id"),
        col("best.d2").as("d2"))
  }

  /** Spatial density: fix counts per grid cell of `cellSize`, densest
    * first (cell id tiebreak). One partial-aggregated exchange carrying
    * `(cell, count)` only; with a `limit` on top Spark plans
    * TakeOrderedAndProject — the heatmap at any scale.
    */
  def cellDensity(points: DataFrame, cellSize: Long): DataFrame =
    points
      .groupBy(cell(col("x"), cellSize).as("cx"),
        cell(col("y"), cellSize).as("cy"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("cx"), col("cy"))

  /** Spatio-temporal co-location: pairs of DIFFERENT tracks with fixes
    * within euclidean distance `radius` AND within `gapUs` microseconds
    * of each other — the "which animals met" join, the canonical
    * movement-ecology question the reference's per-point pandas
    * pipeline cannot ask.
    *
    * The 3-d extension of [[radiusJoin]]: bucket key is
    * `(cellx, celly, timebucket)` with cell size = radius and bucket
    * size = gap, so a qualifying fix pair differs by at most 1 in each
    * bucket coordinate. Build side sits in its home bucket; probe side
    * replicates to the 3x3x3 neighborhood (constant 27x on a
    * `(track, us, x, y)` payload — the corpus row never moves). The
    * equi-join on the composite bucket is the spatio-temporal
    * partitioner; exact integer residual predicates keep only true
    * pairs, and `a < b` track orientation emits each fix pair exactly
    * once. Output is aggregated per track pair: meeting count, closest
    * approach, first/last co-occurrence (epoch-us).
    */
  def coLocation(events: DataFrame, trackCol: String, tsCol: String,
      idCol: String, radius: Long, gapUs: Long): DataFrame = {
    require(radius > 0 && gapUs > 0, "radius and gap must be positive")
    val r2 = radius * radius
    val pos = walkPositions(events, trackCol, tsCol, idCol).select(
      col(trackCol).as("u"), unix_micros(col(tsCol)).as("us"),
      col("x"), col("y"))
    val build = pos.select(
      col("u").as("a_u"), col("us").as("a_us"),
      col("x").as("ax"), col("y").as("ay"),
      cell(col("x"), radius).as("cx"), cell(col("y"), radius).as("cy"),
      floor(col("us") / gapUs).cast(LongType).as("tb"))
    val offsets = array(
      (for (i <- -1 to 1; j <- -1 to 1; k <- -1 to 1)
        yield struct(lit(i.toLong).as("di"), lit(j.toLong).as("dj"),
          lit(k.toLong).as("dk"))): _*)
    val probe = pos
      .select(col("u").as("b_u"), col("us").as("b_us"),
        col("x").as("bx"), col("y").as("by"),
        cell(col("x"), radius).as("pcx"), cell(col("y"), radius).as("pcy"),
        floor(col("us") / gapUs).cast(LongType).as("ptb"))
      .withColumn("o", explode(offsets))
      .select(col("b_u"), col("b_us"), col("bx"), col("by"),
        (col("pcx") + col("o.di")).as("cx"),
        (col("pcy") + col("o.dj")).as("cy"),
        (col("ptb") + col("o.dk")).as("tb"))
    val d2 = (col("ax") - col("bx")) * (col("ax") - col("bx")) +
      (col("ay") - col("by")) * (col("ay") - col("by"))
    // merge hint: left to AQE's estimates this join BROADCASTS the
    // build side at mid scale (measured round 9: sf1 runs 2× slower
    // than 3× the data at sf3, where the estimate crosses the
    // threshold and the plan flips to the cell-partitioned
    // sort-merge). Per-cell partitioning is the correct regime at
    // every scale — the ×27 exploded probe stream stays partitioned
    // by cell instead of re-probing a broadcast relation per task.
    build.join(probe.hint("merge"), Seq("cx", "cy", "tb"))
      .where(col("a_u") < col("b_u") &&
        abs(col("a_us") - col("b_us")) <= gapUs && d2 <= r2)
      .groupBy(col("a_u").as("a_track"), col("b_u").as("b_track"))
      .agg(
        count(lit(1)).as("n_meetings"),
        min(d2).as("min_d2"),
        min(least(col("a_us"), col("b_us"))).as("first_us"),
        max(greatest(col("a_us"), col("b_us"))).as("last_us"))
      .orderBy(col("a_track"), col("b_track"))
  }

  /** First fence (lowest id) containing the point `(x, y)`, or NULL —
    * a per-row fold over the driver-bounded fence array (axis-aligned
    * rectangles `(fid, x0, y0, x1, y1)`, bounds inclusive). Map-only,
    * zero exchanges, like [[nearestAssign]]. Because the fold takes the
    * FIRST hit in ascending-id order, the result equals `min(fid)` over
    * all containing fences — which is how a SQL oracle replays it with
    * a containment join + min.
    */
  def fenceAssign(fences: Array[(Int, Long, Long, Long, Long)]): Column = {
    require(fences.nonEmpty && fences.length <= 10000,
      s"fence set must be driver-bounded, got ${fences.length}")
    val arr = array(fences.sortBy(_._1).map { case (fid, x0, y0, x1, y1) =>
      struct(lit(fid).as("fid"), lit(x0).as("x0"), lit(y0).as("y0"),
        lit(x1).as("x1"), lit(y1).as("y1"))
    }: _*)
    val folded = aggregate(
      arr, lit(-1),
      (acc, f) => when(acc === -1 &&
          col("x") >= f.getField("x0") && col("x") <= f.getField("x1") &&
          col("y") >= f.getField("y0") && col("y") <= f.getField("y1"),
        f.getField("fid")).otherwise(acc))
    nullif(folded, lit(-1))
  }

  /** Geofence episodes: maximal runs of consecutive fixes (per track,
    * time order) inside the same fence, with at least `minFixes` fixes.
    * Containment is the map-only [[fenceAssign]] fold; episode ids are
    * gaps-and-islands run ids from a null-safe fence-change flag inside
    * the SAME keyed window as the walk positions — one exchange on the
    * track key total, and the closing group-by on `(track, run)` reuses
    * it. Emits track, fence, enter/exit epoch-us, fix count.
    */
  def geofenceEpisodes(events: DataFrame, trackCol: String, tsCol: String,
      idCol: String, fences: Array[(Int, Long, Long, Long, Long)],
      minFixes: Int): DataFrame = {
    val w = Window.partitionBy(col(trackCol)).orderBy(col(tsCol), col(idCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val safeF = coalesce(col("f"), lit(-1))
    val safeLag = lag(safeF, 1).over(w)
    val flagged = walkPositions(events, trackCol, tsCol, idCol)
      .withColumn("f", fenceAssign(fences))
      .withColumn("chg",
        when(safeLag.isNull || safeLag =!= safeF, 1).otherwise(0))
      .withColumn("grp", sum(col("chg")).over(run))
    flagged.where(col("f").isNotNull)
      .groupBy(col(trackCol), col("grp"))
      .agg(
        first(col("f")).as("fence_id"),
        min(unix_micros(col(tsCol))).as("enter_us"),
        max(unix_micros(col(tsCol))).as("exit_us"),
        count(lit(1)).as("n_fixes"))
      .where(col("n_fixes") >= minFixes)
      .select(col(trackCol), col("fence_id"), col("enter_us"),
        col("exit_us"), col("n_fixes"))
      .orderBy(col(trackCol), col("enter_us"))
  }

  /** Fence transitions: one row per fix whose fence assignment differs
    * from the previous fix's (per track, time order) — the alert
    * stream behind geofence monitoring. `-1` encodes "outside every
    * fence" on both sides, so entering from the wild is `(-1 → f)`
    * and escaping is `(f → -1)`; the first fix only alerts if it
    * starts inside a fence. Same one-keyed-window shape as
    * [[geofenceEpisodes]]; the streaming twin
    * ([[graft.streaming.EventStreams.geofenceAlerts]]) carries the
    * walk position and last fence as per-track state and must emit
    * exactly this row set.
    */
  def fenceTransitions(events: DataFrame, trackCol: String, tsCol: String,
      idCol: String, fences: Array[(Int, Long, Long, Long, Long)])
      : DataFrame = {
    val w = Window.partitionBy(col(trackCol)).orderBy(col(tsCol), col(idCol))
    walkPositions(events, trackCol, tsCol, idCol)
      .withColumn("f", coalesce(fenceAssign(fences), lit(-1)))
      .withColumn("prev", coalesce(lag(col("f"), 1).over(w), lit(-1)))
      .where(col("f") =!= col("prev"))
      .select(col(trackCol), unix_micros(col(tsCol)).as("us"),
        col("prev").as("from_fence"), col("f").as("to_fence"))
      .orderBy(col(trackCol), col("us"))
  }

  /** Home-range summary per track: number of distinct grid cells
    * visited (range area in cell units), total fixes, peak cell
    * occupancy, and the CORE range — the minimum number of cells
    * (densest first, cell-id tiebreak) whose fixes cover at least half
    * the track's fixes (the 50% kernel of classic home-range analysis,
    * grid-exact instead of kernel-smoothed).
    *
    * Shape: per-(track, cell) counts (one partial-aggregated exchange
    * on the track+cell key), then a track-keyed window for the
    * cumulative occupancy ranking — cell lists are per-track bounded,
    * the corpus itself never re-shuffles.
    */
  def homeRange(events: DataFrame, trackCol: String, tsCol: String,
      idCol: String, cellSize: Long): DataFrame = {
    val perCell = walkPositions(events, trackCol, tsCol, idCol)
      .groupBy(col(trackCol), cell(col("x"), cellSize).as("hx"),
        cell(col("y"), cellSize).as("hy"))
      .agg(count(lit(1)).as("c"))
    val wRank = Window.partitionBy(col(trackCol))
      .orderBy(col("c").desc, col("hx"), col("hy"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(trackCol))
    perCell
      .withColumn("before", sum(col("c")).over(wRank) - col("c"))
      .withColumn("total", sum(col("c")).over(wAll))
      .groupBy(col(trackCol))
      .agg(
        max(col("total")).as("n_fixes"),
        count(lit(1)).as("n_cells"),
        max(col("c")).as("peak"),
        sum(when(col("before") * 2 < col("total"), lit(1)))
          .as("core_cells"))
      .orderBy(col(trackCol))
  }
}
