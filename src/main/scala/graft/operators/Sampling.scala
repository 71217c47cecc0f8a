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

  /** Quantile-bucket assignment WITHOUT a global sort — the curriculum
    * / quality-tier primitive: "top quartile by score" on 100 TB must
    * not be `ntile(4) OVER (ORDER BY score)` (a single-partition
    * global sort). Instead the thresholds come from a mergeable
    * histogram sketch ([[Sketches.histogramQuantiles]] — one parallel
    * aggregate + a ≤bins-row rank walk; only |qs| threshold doubles
    * reach the driver) and assignment is a codegen'd comparison chain
    * on the original scan. Bucket b = number of thresholds ≤ the
    * value, so `qs` of size k yields buckets 0..k. Thresholds are bin
    * lower edges (the q108 estimator): boundary rows within one bin
    * width of a true quantile may sit on either side — the documented
    * histogram contract, chosen at sketch definition.
    */
  def bucketByQuantiles(df: DataFrame, valueCol: String,
      lo: Double, hi: Double, bins: Int, qs: Seq[Double]): DataFrame = {
    val sk = Sketches.histogramSketch(df, valueCol, lo, hi, bins)
    val cuts = Sketches.histogramQuantiles(sk, qs, lo, hi, bins)
      .select(col("est")).collect().map(_.getDouble(0)).toSeq
    // empty/all-NULL input yields no thresholds: everything is tier 0
    // (not an empty-reduce crash)
    val bucket =
      if (cuts.isEmpty) lit(0)
      else cuts.map(t =>
          when(col(valueCol).cast("double") >= lit(t), 1).otherwise(0))
        .reduce(_ + _)
    df.withColumn("bucket", bucket.cast("int"))
  }

  /** [[bucketByQuantiles]] per key (CCNet buckets WITHIN each
    * language): each key gets its own histogram and its own quantile
    * thresholds, so a verbose language's scores never shift a terse
    * language's terciles. Same estimator as the ungrouped path —
    * thresholds are the lower edges of the bins holding rank
    * ceil(q·N_key) in each key's cumulative histogram; bucket =
    * number of that key's thresholds ≤ the value. Keys with no
    * non-null values bucket to 0.
    *
    * Scale: one keyed histogram aggregate (≤ n_keys·bins cells cross),
    * a rank walk windowed PER KEY over those cells, and one broadcast
    * join of the (n_keys)-row threshold-array table back onto the
    * scan — no driver collect, no global sort, no per-key job loop.
    */
  def bucketByQuantilesKeyed(df: DataFrame, keyCol: String,
      valueCol: String, lo: Double, hi: Double, bins: Int,
      qs: Seq[Double]): DataFrame = {
    require(bins >= 1 && hi > lo, s"bad histogram [$lo, $hi) x $bins")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"bad quantiles $qs")
    val width = (hi - lo) / bins
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol).as("_k"),
        Sketches.histogramBin(col(valueCol), lo, hi, bins).as("_bin"))
      .agg(count(lit(1)).cast("long").as("_cnt"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_k")).orderBy(col("_bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wTot = org.apache.spark.sql.expressions.Window.partitionBy(col("_k"))
    val cuts = hist
      .withColumn("_cum", sum(col("_cnt")).over(wCum))
      .withColumn("_total", sum(col("_cnt")).over(wTot))
      .select(col("_k"), col("_bin"), col("_cum"), col("_total"),
        explode(array(qs.map(lit(_)): _*)).as("_q"))
      .filter(col("_cum") >= ceil(col("_q") * col("_total").cast("double")))
      .groupBy(col("_k"), col("_q"))
      .agg(min(col("_bin")).as("_bin"))
      .select(col("_k"),
        (lit(lo) + col("_bin").cast("double") * lit(width)).as("_est"))
      .groupBy(col("_k"))
      .agg(sort_array(collect_list(col("_est"))).as("_cuts"))
      .withColumnRenamed("_k", keyCol)
    df.join(broadcast(cuts), Seq(keyCol), "left")
      // explicit null guard, not coalesce: size(null) is -1 under the
      // legacy config, and a keyless row must bucket to 0
      .withColumn("bucket",
        when(col("_cuts").isNull, lit(0))
          .otherwise(size(filter(col("_cuts"),
            t => col(valueCol).cast("double") >= t))).cast("int"))
      .drop("_cuts")
  }

  /** Cross-engine bucket index: md5-derived 60-bit hash of the id's
    * string form (any engine reproduces it as
    * `('0x'||substr(md5(id::VARCHAR || salt),1,15))::BIGINT % buckets`).
    * Same stability guarantees as [[hashBucket]]; costs a hex-string
    * materialization per row, so prefer [[hashBucket]] at 100 TB unless
    * an external system must reproduce the assignment bit-for-bit.
    */
  def md5Bucket(id: Column, buckets: Int, salt: String = ""): Column =
    pmod(graft.functions.TextFunctions.md5Hash60(
      concat(id.cast("string"), lit(salt))), lit(buckets)).cast("int")

  /** Deterministic fraction sample: keeps rows whose hash bucket falls
    * below `fraction` of the bucket space.
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
      salt: String = ""): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"bad fraction $fraction")
    df.filter(hashBucket(col(idCol), 1000000, salt) < (fraction * 1000000).toInt)
  }

  /** Per-row-probability deterministic sample: keep each row with its
    * OWN probability from `weightCol` (clamped to [0, 1]) — the
    * temperature/quality-weighted sampling a training mix uses
    * (upsample-by-downsampling-everything-else: rows carry their
    * source's or their own quality-derived rate). Same hash-stability
    * contract as [[hashSample]]: membership never changes across runs,
    * layouts, or appends, and because the bucket is the cross-engine
    * [[md5Bucket]] and the threshold is `floor(weight · 10⁶)` (floor
    * SPELLED OUT — Spark's int cast truncates where other engines
    * round), any ANSI engine replays the exact kept set. One
    * projection + filter: nothing shuffles.
    */
  def weightedHashSample(df: DataFrame, idCol: String, weightCol: String,
      salt: String = ""): DataFrame =
    df.filter(
      md5Bucket(col(idCol), 1000000, salt).cast("long") <
        floor(greatest(lit(0.0), least(lit(1.0), col(weightCol))) * 1000000))

  /** Stable named splits (e.g. train/val/test). Fractions must sum to
    * ≤ 1; remainder rows are dropped (or add a catch-all split).
    * Returns the input with a `split` column; rows assign to the first
    * split whose cumulative range contains their hash point.
    */
  def hashSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], salt: String = ""): DataFrame =
    splitByBucket(df, hashBucket(col(idCol), 1000000, salt), splits)

  /** [[hashSplit]] with the cross-engine md5 bucket ([[md5Bucket]]):
    * any ANSI-SQL engine can reproduce the exact same assignment, so
    * the split is externally auditable (e.g. a DuckDB/warehouse job can
    * verify no test-set leakage without running Spark).
    */
  def md5Split(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)], salt: String = ""): DataFrame =
    splitByBucket(df, md5Bucket(col(idCol), 1000000, salt), splits)

  private def splitByBucket(df: DataFrame, bucket: Column,
      splits: Seq[(String, Double)]): DataFrame = {
    val total = splits.map(_._2).sum
    require(total <= 1.0 + 1e-9, s"split fractions sum to $total > 1")
    val cumulative = splits.scanLeft(0.0)(_ + _._2).tail
    val assignment = splits.zip(cumulative).foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), cum)) =>
        when(acc.isNotNull, acc)
          .otherwise(when(bucket < (cum * 1000000).toInt, lit(name)))
    }
    df.withColumn("split", assignment).filter(col("split").isNotNull)
  }

  /** Scalable deterministic sequential ids: assign 0..n−1 in
    * `orderCol` order WITHOUT a global window (a `row_number() OVER
    * (ORDER BY …)` funnels the entire dataset through ONE partition —
    * the classic scale-killer this operator exists to replace; the
    * training-data use is assigning dense corpus ids after dedup).
    *
    * Two passes over a range-partitioned, partition-sorted frame:
    * pass 1 collects one row count per partition (a driver array of
    * `nParts` longs), pass 2 numbers each partition from its
    * cumulative offset. The frame is persisted between passes so both
    * see the SAME range boundaries (range sampling re-executes — and
    * can re-sample — otherwise). Output ids equal the global rank in
    * `orderCol` order and are independent of partitioning, sampling,
    * and cluster size, provided `orderCol` values are unique (ties
    * have no defined rank — document or pre-disambiguate).
    */
  def assignSequentialIds(df: DataFrame, orderCol: String,
      outCol: String = "seq_id", nParts: Int = 0): DataFrame = {
    import org.apache.spark.TaskContext
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val parts =
      if (nParts > 0) nParts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, col(orderCol))
      .sortWithinPartitions(orderCol).persist()
    ranged.count() // materialize: both passes must read ONE layout
    val counts = ranged.mapPartitions { it =>
      Iterator.single((TaskContext.getPartitionId(), it.size.toLong))
    }(Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong))
      .collect().toMap
    val offsets: Map[Int, Long] = {
      val sorted = counts.toSeq.sortBy(_._1)
      sorted.map(_._1).zip(sorted.map(_._2).scanLeft(0L)(_ + _)).toMap
    }
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, LongType, nullable = false))
    val result = ranged.mapPartitions { it =>
      var i = offsets(TaskContext.getPartitionId())
      it.map { r => val out = Row.fromSeq(r.toSeq :+ i); i += 1; out }
    }(Encoders.row(outSchema))
      // cut lineage + materialize BEFORE unpersisting the ranged frame
      // (a later action would otherwise re-execute the exchange and
      // could re-sample different range boundaries than `offsets` saw)
      .localCheckpoint(true)
    ranged.unpersist()
    result
  }

  /** Deterministic global corpus shuffle + shard manifest: assign every
    * row a shard in [0, numShards) and a position within its shard,
    * where the (shard, pos) order is a stable pseudo-random permutation
    * of the corpus — the "shuffle once, write N shard files" step every
    * training run needs, reproducible bit-for-bit by any ANSI engine
    * (shard = cross-engine [[md5Bucket]]; position = rank of the 60-bit
    * md5 value, id-tiebroken, within the shard).
    *
    * Scale: the naive global shuffle (`ORDER BY rand()` or a
    * `row_number()` over the whole corpus) funnels 100 TB through one
    * sort/partition. Here the only exchange is a hash shuffle on the
    * shard id, and each per-shard sort is corpus/numShards-sized;
    * shards are md5-balanced by construction, so no task is hot. The
    * per-shard window is the CORRECT window shape — partitioned, never
    * global (contrast [[assignSequentialIds]], which exists because a
    * GLOBAL rank admits no partitioned window).
    */
  def shuffleShard(df: DataFrame, idCol: String, numShards: Int,
      salt: String = ""): DataFrame = {
    require(numShards > 0, s"bad numShards $numShards")
    import org.apache.spark.sql.expressions.Window
    val h = graft.functions.TextFunctions.md5Hash60(
      concat(col(idCol).cast("string"), lit(salt)))
    df.withColumn("_h", h)
      .withColumn("shard", pmod(col("_h"), lit(numShards)).cast("int"))
      .withColumn("pos",
        (row_number().over(
          Window.partitionBy(col("shard")).orderBy(col("_h"), col(idCol)))
          - 1).cast("long"))
      .drop("_h")
  }

  /** Deterministic per-stratum CAP: keep at most `cap` rows per stratum
    * value, chosen by hash order — the balanced-corpus construction
    * step (e.g. "at most N documents per language/domain" so one
    * dominant stratum cannot swamp a training mix). Hash ordering makes
    * the kept set a stable pseudo-random sample of each stratum, not
    * its first-N ids; the md5 order is reproducible by any engine.
    *
    * Scale — two-phase by construction: routes through the
    * [[graft.plans.TopKPerKey]] physical operator, whose map-side
    * bounded heaps keep at most `cap` rows per (input-partition,
    * stratum) BEFORE the exchange; the reduce side merges ≤
    * cap × partitions survivors per stratum. A pathologically hot
    * stratum (10⁹ rows of one language) therefore never funnels
    * through a single-partition sort — the naive window formulation
    * (`row_number().over(partitionBy(stratum).orderBy(hash))`) would
    * shuffle and fully sort every row of the hot stratum in one task.
    * Result-identical to that window formulation: both keep exactly
    * the `cap` lowest rows per stratum under the total (md5, id)
    * order (id uniqueness makes the order total, so the kept SET is
    * well-defined either way).
    */
  def stratumCap(df: DataFrame, idCol: String, stratumCol: String,
      cap: Int, salt: String = ""): DataFrame =
    graft.plans.TopKPerKey.topKPerKey(
        df.withColumn("_capkey",
          md5(concat(col(idCol).cast("string"), lit(salt)))),
        keys = Seq(col(stratumCol)),
        order = Seq(col("_capkey").asc, col(idCol).asc),
        k = cap)
      .drop("_capkey")

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

  /** Deterministic domain balancing (training-mixture construction):
    * down-sample every over-represented source toward
    * `targetPerSource` documents IN EXPECTATION, via a per-source
    * hash-rate gate — the sampling counterpart of the hard stratum
    * cap ([[capPerStratum]]-style truncation keeps the FIRST k per
    * stratum; this keeps a stable uniform hash slice, so the sampled
    * subset is unbiased w.r.t. document order and stable under corpus
    * append: a document's keep/drop fate never changes when others
    * arrive).
    *
    * All rate arithmetic is INTEGER (threshold = min(10^6,
    * targetPerSource·10^6 div count)) — no float division anywhere,
    * so any engine reproduces the gate bit-for-bit from the same md5
    * bucket. Sources at or under target keep everything (rate 1).
    *
    * Scale: one count aggregate per source (map-side partials, a
    * #sources-row frame), broadcast back; the corpus itself never
    * shuffles — the gate is a broadcast-join + filter projection.
    * Returns the kept rows with the audit columns `_src_total`
    * (pre-balance count) and `_keep_threshold` (per-million rate).
    */
  def balanceSources(df: DataFrame, idCol: String, sourceCol: String,
      targetPerSource: Long, salt: String = ""): DataFrame = {
    require(targetPerSource >= 1, s"targetPerSource must be >= 1")
    val million = 1000000L
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("_src_total"))
      .withColumn("_keep_threshold",
        least(lit(million),
          expr(s"${targetPerSource * million}L div _src_total"))
          .cast(org.apache.spark.sql.types.LongType))
    df.join(broadcast(counts), Seq(sourceCol))
      .filter(md5Bucket(col(idCol), million.toInt, salt) < col("_keep_threshold"))
  }

  /** Epoch-weighted corpus mixing: turn per-source mixture weights and
    * a total token budget into a per-document EPOCH COUNT — the "mix
    * web 40%, code 30%, books 30%, repeat small sources up to N
    * epochs" step every LLM training run performs between curation and
    * packing. Downsampling and upsampling fall out of one rule.
    *
    * Semantics (all integer, replayable bit-for-bit by any engine):
    * source `s` gets `target_s = budget·w_s div Σw` tokens (weights
    * from the md5 recipe or caller-supplied); its documents are
    * ordered by the deterministic hash permutation (shard, h, id) —
    * the same append-stable order [[shuffleShard]] uses; every doc
    * repeats `target_s div T_s` times (T_s = source token total), and
    * the first documents of the permutation whose cumulative size
    * precedes `target_s mod T_s` get one extra epoch. n_epochs = 0
    * drops the doc; ≥ 2 repeats it — the budget is hit within one
    * document's size per source.
    *
    * Scale — the prefix sum is two-phase, never a per-source sort of
    * the corpus in one task: documents get a shard from their hash
    * (64-way by default), the cumulative runs INSIDE each
    * (source, shard) window, and the cross-shard offsets come from a
    * (sources × shards)-row totals frame that is driver-bounded by
    * construction — exactly the [[shuffleShard]] offset pattern. The
    * corpus crosses one exchange (the window's), carrying
    * (id, source, size) only.
    */
  /** Greedy token-budget selection: walk documents in
    * (score desc, id asc) order and keep them while the running size
    * total stays ≤ `budget` — the "best docs until the budget is
    * spent" step of corpus curation.
    *
    * `score` must be in [0, 1] (e.g.
    * [[graft.functions.TextFunctions.qualityScore]]). The result is
    * exactly the prefix of the globally-ordered corpus whose inclusive
    * cumulative size fits the budget; output carries the cumulative
    * (`cum_units`) as auditable evidence.
    *
    * Scale — a global ordered prefix sum with NO global sort: scores
    * quantize into `nBuckets` range buckets (a monotone function of
    * the score, so bucket-major order IS score order); the cumulative
    * runs inside each bucket's window and cross-bucket offsets come
    * from a ≤nBuckets-row totals frame (driver-bounded by
    * construction, broadcast back) — the [[epochMix]] two-phase
    * pattern. The corpus crosses one exchange carrying (id, size,
    * score, bucket) only. `nBuckets` trades shard parallelism against
    * nothing else: the kept set is bucket-count-invariant, so size it
    * to the cluster (default 256).
    */
  def budgetSelect(df: DataFrame, idCol: String, sizeCol: String,
      score: Column, budget: Long, nBuckets: Int = 256): DataFrame = {
    require(budget >= 0 && nBuckets >= 1, s"bad parameters ($budget, $nBuckets)")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val bucket = greatest(lit(0L), least(lit(nBuckets - 1L),
      floor((lit(1.0) - score) * nBuckets)))
    val doc = df.select(col(idCol).as("_id"),
      col(sizeCol).cast("long").as("_sz"), score.as("_score"),
      bucket.as("_qb"))
    val totals = doc.groupBy(col("_qb")).agg(sum(col("_sz")).as("_t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    if (totals.isEmpty) return doc.filter(lit(false))
      .select(col("_id").as(idCol), col("_score").as("score"),
        col("_sz").as("n_units"), col("_sz").as("cum_units"))
    val offs = totals.map(_._1).zip(totals.scanLeft(0L)(_ + _._2).init)
    val planDf = spark.createDataFrame(offs.toSeq).toDF("_qb", "_off")
    val win = Window.partitionBy(col("_qb"))
      .orderBy(col("_score").desc, col("_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    doc.join(broadcast(planDf), Seq("_qb"))
      .withColumn("_cum", col("_off") + sum(col("_sz")).over(win))
      .filter(col("_cum") <= budget)
      .select(col("_id").as(idCol), col("_score").as("score"),
        col("_sz").as("n_units"), col("_cum").as("cum_units"))
  }

  /** Temperature-scaled source sampling (the multinomial mixing rule
    * of multilingual/multi-source LLM training, α = 0.5): source `s`
    * with n_s documents gets sampling weight n_s^α, the corpus target
    * is `targetTotal` documents in expectation, and each document
    * keeps independently via the deterministic md5 per-million gate —
    * small sources are up-weighted relative to their share, large
    * sources down-weighted.
    *
    * threshold_ppm(s) = min(10⁶, floor(10⁶·targetTotal·√n_s /
    * (S·n_s))) with S = Σ_t √n_t. Determinism: IEEE sqrt is exactly
    * rounded, so √n is bit-identical on every engine; S accumulates
    * the per-source √ values through DECIMAL(18,6) (order-independent
    * exact sum, the [[graft.queries.Det]] rule); the threshold is one
    * multiply + one divide + floor on identical operands. α other
    * than 0.5 would need pow(), which carries no cross-engine
    * exactness guarantee — the operator pins α = 0.5 for that reason.
    *
    * Scale: one count-by-source aggregate (source-bounded), the
    * threshold frame broadcasts back, the keep gate is a per-row
    * projection — the corpus itself never shuffles
    * ([[balanceSources]]' contract, with temperature weights).
    */
  def temperatureSample(df: DataFrame, idCol: String, srcCol: String,
      targetTotal: Long, salt: String = "tmpr"): DataFrame = {
    require(targetTotal >= 0, s"bad targetTotal $targetTotal")
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val counts = df.groupBy(col(srcCol)).agg(count(lit(1)).as("_n"))
    val s = counts.agg(
      sum(sqrt(col("_n").cast(DoubleType)).cast(DecimalType(18, 6)))
        .cast(DoubleType).as("_s"))
    val thr = counts.crossJoin(broadcast(s))
      .select(col(srcCol), col("_n").as("_src_total"),
        least(lit(1000000L),
          floor(lit(1000000.0 * targetTotal) * sqrt(col("_n").cast(DoubleType))
            / (col("_s") * col("_n").cast(DoubleType))))
          .as("_keep_threshold"))
    val gate = pmod(graft.functions.TextFunctions.md5Hash60(
      concat(col(idCol).cast("string"), lit(salt))), lit(1000000L))
    df.join(broadcast(thr), Seq(srcCol))
      .filter(gate < col("_keep_threshold"))
  }

  def epochMix(df: DataFrame, idCol: String, srcCol: String,
      sizeCol: String, budget: Long, weightBuckets: Int = 4,
      nShards: Int = 64, salt: String = "mix"): DataFrame = {
    require(budget >= 0 && weightBuckets >= 1 && nShards >= 1,
      s"bad mix parameters ($budget, $weightBuckets, $nShards)")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val h = graft.functions.TextFunctions.md5Hash60(
      concat(col(idCol).cast("string"), lit(salt + "o")))
    val w = md5Bucket(col(srcCol), weightBuckets, salt + "w")
      .cast("long") + 1L
    val doc = df.select(col(idCol).as("_id"), col(srcCol).as("_src"),
      col(sizeCol).cast("long").as("_sz"),
      h.as("_h"), pmod(h, lit(nShards.toLong)).as("_shard"), w.as("_w"))
    // (source, shard) totals: driver-bounded by construction
    val shardTotals = doc.groupBy(col("_src"), col("_shard"))
      .agg(sum(col("_sz")).as("_t"), max(col("_w")).as("_w"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val sumW = shardTotals.groupBy(_._1).map(_._2.head._4).sum
    val perSource = shardTotals.groupBy(_._1).map { case (src, rows) =>
      val t = rows.map(_._3).sum
      val target = budget * rows.head._4 / sumW
      src -> (target / t, target % t)
    }
    val offsets = shardTotals.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      val sorted = rows.sortBy(_._2)
      val offs = sorted.scanLeft(0L)(_ + _._3)
      sorted.zip(offs).map { case ((_, shard, _, _), off) =>
        val (full, rem) = perSource(src)
        (src, shard, off, full, rem)
      }
    }
    val planDf = spark.createDataFrame(offsets)
      .toDF("_src", "_shard", "_off", "_full", "_rem")
    val win = Window.partitionBy(col("_src"), col("_shard"))
      .orderBy(col("_h"), col("_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    doc.join(broadcast(planDf), Seq("_src", "_shard"))
      .withColumn("_before", col("_off") + sum(col("_sz")).over(win) - col("_sz"))
      .select(col("_id"), col("_src"),
        (col("_full") + when(col("_before") < col("_rem"), 1L).otherwise(0L))
          .cast("long").as("n_epochs"))
  }

  /** Deterministic negative sampling for contrastive training: for
    * each anchor row, `k` pseudo-random partners drawn from a corpus
    * with DENSE ids 0..n−1, reproducible run-to-run and engine-to-
    * engine (no RNG — the draw is `md5(anchor_id ‖ '#' ‖ j ‖ salt)`
    * through the 60-bit hex recipe, mod n). A draw that lands on the
    * anchor itself moves one slot over ((h+1) mod n) — deterministic,
    * and at corpus scale a ~1/n event; collisions BETWEEN a row's k
    * draws are kept (sampling with replacement, the standard
    * contrastive setup).
    *
    * `corpus` must carry `corpusIdCol` dense from 0 (the
    * [[assignSequentialIds]] output contract — compose when ids have
    * holes). Returns anchors × k rows: (anchor id, neg_idx j,
    * neg id) joined back to the corpus so callers project any partner
    * column. Scale shape: the k-way expansion is a narrow
    * `posexplode` (k small); the partner lookup is ONE equality join
    * keyed on the drawn id — broadcast when the corpus projection is
    * dim-sized, shuffle-keyed otherwise; nothing quadratic anywhere.
    */
  def negativeSamples(anchors: DataFrame, anchorIdCol: String,
      corpus: DataFrame, corpusIdCol: String, corpusN: Long, k: Int,
      salt: String = "neg"): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1,64], got $k")
    require(corpusN >= 2, s"corpusN must be >= 2, got $corpusN")
    val drawn = anchors
      .select(col(anchorIdCol).as("anchor_id"))
      .select(col("anchor_id"),
        posexplode(sequence(lit(0), lit(k - 1))).as(Seq("neg_idx", "_j")))
      .withColumn("_h", pmod(graft.functions.TextFunctions.md5Hash60(
        concat(col("anchor_id").cast("string"), lit("#"),
          col("_j").cast("string"), lit(salt))), lit(corpusN)))
      .withColumn("neg_id",
        when(col("_h") === col("anchor_id"),
          pmod(col("_h") + 1L, lit(corpusN))).otherwise(col("_h")))
      .select(col("anchor_id"), col("neg_idx").cast("int").as("neg_idx"),
        col("neg_id"))
    drawn.join(corpus.withColumnRenamed(corpusIdCol, "neg_id"), Seq("neg_id"))
  }

  /** Rendezvous (highest-random-weight) shard assignment: each row
    * goes to the shard maximizing md5(id:shard) — the consistent-
    * placement scheme whose defining property is MINIMAL MOVEMENT:
    * adding a shard moves only the rows whose new-shard hash wins
    * (~1/(n+1) of the corpus), and NOTHING moves laterally between
    * surviving shards (a row's old winner still beats every other old
    * shard). Cross-engine replayable: the weight is the
    * [[graft.functions.TextFunctions.md5Hash60]] recipe over
    * `id:shard`; ties (astronomically unlikely, still defined) break
    * to the lexicographically LARGER shard name on both engines.
    *
    * One map-only projection — |shards| hash evaluations per row,
    * zero exchanges; the assignment is layout-, append-, and
    * history-independent.
    */
  def rendezvousAssign(df: DataFrame, idCol: String,
      shards: Seq[String]): DataFrame = {
    require(shards.nonEmpty && shards.distinct == shards,
      "shards must be non-empty and distinct")
    val weighted = shards.map { sh =>
      struct(
        graft.functions.TextFunctions.md5Hash60(
          concat(col(idCol).cast("string"), lit(":" + sh))).as("h"),
        lit(sh).as("shard"))
    }
    val pick =
      if (weighted.size == 1) weighted.head else greatest(weighted: _*)
    df.withColumn("shard", pick.getField("shard"))
  }

  /** EXACT proportional corpus apportionment: select exactly `budget`
    * documents across sources in proportion to source size, by the
    * largest-remainder (Hamilton) method — the exact-count sibling of
    * [[balanceSources]]/[[temperatureSample]], whose per-row rate gates
    * hit the target only in expectation. When the mixing spec says
    * "exactly 2 M documents, proportional to source share", this is the
    * operator.
    *
    * Quotas: q_s = ⌊B·n_s/N⌋ plus one bonus for the B − Σ⌊·⌋ sources
    * with the largest remainder (ties → smaller source name) — all
    * exact integer arithmetic on the |sources|-sized count frame,
    * computed ON THE CLUSTER: the source axis at crawl scale is
    * registrable DOMAINS (tens of millions on a real frontier), so
    * nothing source-sized may ever reach the driver. The total, the
    * leftover-seat count, and the bonus-seat rank are all window
    * functions over the count frame (one row per source — the axis
    * already reduced by its aggregate); no collect anywhere.
    *
    * Selection: within each source, documents rank by the cross-engine
    * composite order (md5 bucket, md5 hex, id) — hash-stable, so the
    * selected set is layout- and append-order-independent for fixed
    * source contents — and the rank runs INSIDE (source, bucket)
    * windows with cross-bucket offsets from a keyed cumulative-sum
    * window over the (source, bucket) count frame (≤ nBuckets rows per
    * source key): the [[budgetSelect]] two-phase pattern, so no source
    * ever pays a single-partition window no matter how large. Buckets
    * whose offset already meets the quota are pruned BEFORE the rank
    * window — past-budget data never sorts.
    *
    * @return selected rows: (idCol, srcCol, sel_rank, quota) with
    *         sel_rank 1-based within the source
    */
  def apportionSelect(df: DataFrame, idCol: String, srcCol: String,
      budget: Long, nBuckets: Int = 64, salt: String = "apq"):
      DataFrame = {
    require(budget >= 0 && nBuckets >= 1,
      s"bad parameters ($budget, $nBuckets)")
    import org.apache.spark.sql.expressions.Window
    if (budget == 0L)
      return df.select(col(idCol), col(srcCol))
        .withColumn("sel_rank", lit(0L)).withColumn("quota", lit(0L))
        .filter(lit(false))

    // All keying and the quota/offset joins below run on ONE string
    // form of the source column — Spark's own CAST — so a non-string
    // source (decimal, date) can't mismatch between a JVM toString and
    // an implicit join cast. The original-typed column is carried
    // through untouched and re-exposed in the output.
    // Quota arithmetic rides ONE pass over the counts frame: the total
    // N, the floor quotas and remainders, the leftover-seat count, and
    // the seat rank are all window functions over that frame — no
    // scalar collect, no self-join (a counts.crossJoin(counts.agg(…))
    // scalar here trips Spark's hidden-attribute self-join ambiguity).
    // The windows are unkeyed by the apportionment's nature (seats
    // rank ACROSS sources) but run over one row per source — never the
    // row axis.
    val wAll = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val seatW = Window.orderBy(col("_rem").desc, col("_src").asc)
    val quotas = df.groupBy(col(srcCol).cast("string").as("_src"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_tot", sum(col("_n")).over(wAll))
      .withColumn("_q0", expr(s"(${budget}L * _n) DIV _tot"))
      .withColumn("_rem", expr(s"(${budget}L * _n) % _tot"))
      .withColumn("_lseats", lit(budget) - sum(col("_q0")).over(wAll))
      .withColumn("_seat", row_number().over(seatW).cast("long"))
      .select(col("_src"),
        least(col("_n"),
          col("_q0") +
            when(col("_seat") <= col("_lseats"), 1L).otherwise(0L))
          .as("quota"))

    // two-phase per-source rank over the (bucket, md5hex, id) order:
    // keyed cumulative offsets, then per-(source, bucket) rank windows
    val keyed = df.select(col(idCol).as("_id"), col(srcCol).as("_srcorig"))
      .withColumn("_src", col("_srcorig").cast("string"))
      .withColumn("_b", md5Bucket(col("_id"), nBuckets, salt))
      .withColumn("_hx", md5(concat(col("_id").cast("string"), lit(salt))))
    val offW = Window.partitionBy(col("_src")).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offQuota = keyed
      .groupBy(col("_src"), col("_b"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_off", coalesce(sum(col("_c")).over(offW), lit(0L)))
      .join(quotas, Seq("_src"))
      // a (source, bucket) group whose offset already meets the quota
      // can never select a row — prune it before the rank window runs
      .filter(col("_off") < col("quota"))
      .select(col("_src"), col("_b"), col("_off"), col("quota"))
    val w = Window.partitionBy(col("_src"), col("_b"))
      .orderBy(col("_hx").asc, col("_id").asc)
    keyed.join(offQuota, Seq("_src", "_b"))
      .withColumn("sel_rank",
        col("_off") + row_number().over(w).cast("long"))
      .filter(col("sel_rank") <= col("quota"))
      .select(col("_id").as(idCol), col("_srcorig").as(srcCol),
        col("sel_rank"), col("quota"))
  }
}
