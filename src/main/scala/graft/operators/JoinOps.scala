package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scale-path join utilities (the knobs a 100 TB job actually turns).
  *
  * Catalyst picks broadcast/shuffled-hash/sort-merge from stats, and
  * AQE rebalances at runtime — these helpers cover the two cases that
  * still need explicit structure: pathological key skew (salting) and
  * repeated co-located joins (bucketing).
  */
object JoinOps {

  /** Salted equi-join for skewed keys: explode the small side into
    * `saltBuckets` copies, salt the big side uniformly, join on
    * (key, salt). Turns one hot-key partition into `saltBuckets`
    * even slices. The returned frame carries the BIG side's key column
    * (the small side's duplicate copy is dropped along with the salt).
    *
    * Use when one side has degenerate hot keys (the near-dup band join
    * on an all-identical corpus, a "null-ish" default key, a celebrity
    * user id) and AQE's skew split isn't enough. Salt is derived from a
    * uniform hash of the big side's whole row id — deterministic, no
    * rand() (which breaks retries/speculation).
    *
    * `forceSortMerge` mirrors [[bucketedJoin]]'s flag: on a test-sized
    * dim Catalyst would broadcast the small side — a plan with no
    * exchange to skew, which exercises nothing — so the hint pins the
    * shuffled sort-merge shape whose cost profile the salting exists
    * for (at 100 TB the replicated dim has outgrown the broadcast
    * threshold anyway).
    *
    * `idCols` (r7, closing the r6 verdict nit): columns that identify a
    * big-side row. When given, the salt hashes only (key, idCols) — a
    * 100 TB fact row no longer pays a full-width hash per row, and the
    * salt is stable under projection changes (adding a column upstream
    * no longer silently reshuffles a cached layout keyed on it). The
    * default (empty) keeps the whole-row hash for callers with no id.
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int = 8, joinType: String = "inner",
      forceSortMerge: Boolean = false, idCols: Seq[String] = Nil): DataFrame = {
    val saltedBig0 = big.withColumn("_salt", saltColumn(big, saltBuckets, key, idCols))
    val saltedBig = if (forceSortMerge) saltedBig0.hint("merge") else saltedBig0
    val saltedSmall = small
      .withColumn("_salt", explode(array((0 until saltBuckets).map(lit): _*)))
    saltedBig.join(saltedSmall,
        saltedBig(key) === saltedSmall(key) &&
          saltedBig("_salt") === saltedSmall("_salt"), joinType)
      .drop(saltedSmall(key))
      .drop("_salt")
  }

  /** The deterministic salt [[saltedJoin]] assigns the big side —
    * exposed so specs (and skew diagnostics) can observe the exact
    * bucket spread the join will see.
    */
  private[graft] def saltColumn(
      big: DataFrame, saltBuckets: Int,
      key: String = "", idCols: Seq[String] = Nil): Column = {
    val hashed =
      if (idCols.nonEmpty) (key +: idCols).distinct.map(col)
      else big.columns.toSeq.map(col)
    pmod(xxhash64(struct(hashed: _*)), lit(saltBuckets)).cast(IntegerType)
  }

  /** Write both sides bucketed by the join key so subsequent joins are
    * shuffle-free (bucket-local sort-merge). The Spark answer to the
    * reference's "re-read the whole table per request" pattern: pay the
    * layout cost once, join forever without an exchange.
    */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Join two pre-bucketed tables on their bucket key. With matching
    * bucket counts, the plan contains NO Exchange on either side.
    *
    * `forceSortMerge` adds a merge hint: when one side is small enough
    * that Catalyst would broadcast it, the hint keeps the bucket-local
    * sort-merge plan instead — the shape whose cost profile carries to
    * 100 TB (a broadcast plan on a test-sized dim proves nothing about
    * the full-size join the bucketing exists for).
    */
  def bucketedJoin(
      spark: org.apache.spark.sql.SparkSession,
      leftTable: String, rightTable: String, key: String,
      joinType: String = "inner", forceSortMerge: Boolean = false): DataFrame = {
    val left = spark.table(leftTable)
    (if (forceSortMerge) left.hint("merge") else left)
      .join(spark.table(rightTable), Seq(key), joinType)
  }

  /** Bit position `i` of a key in an `numBits`-bit Bloom filter —
    * the cross-engine [[Sampling.md5Bucket]] recipe, so any ANSI
    * engine reproduces the filter bit-for-bit:
    * `('0x'||substr(md5(key::VARCHAR || ':' || i), 1, 15))::BIGINT % numBits`.
    */
  private def bloomPos(key: Column, i: Int, numBits: Int): Column =
    pmod(graft.functions.TextFunctions.md5Hash60(
      concat(key.cast(StringType), lit(s":$i"))), lit(numBits.toLong))

  /** Build a Bloom filter over a key column as a packed bit array.
    *
    * Distributed build: explode each key into its `numHashes` bit
    * positions (positions only — the key never fans out), partial-agg
    * the per-word OR masks map-side, and collect at most
    * `numBits / 64` (word, mask) rows to the driver. `numBits` is
    * driver-bounded by construction (≤ 2²⁴ bits = 2 MB packed), the
    * same literal-budget discipline as the IVF centroid regime.
    */
  def bloomFilterBits(
      keys: DataFrame, keyCol: String, numBits: Int, numHashes: Int): Array[Long] = {
    require(numBits >= 64 && numBits <= (1 << 24),
      s"numBits must be in [64, 2^24]: $numBits")
    require(numBits % 64 == 0, s"numBits must be a multiple of 64: $numBits")
    require(numHashes >= 1 && numHashes <= 16, s"numHashes in [1,16]: $numHashes")
    val words = keys
      .filter(col(keyCol).isNotNull)
      .select(explode(array((0 until numHashes).map(i =>
        bloomPos(col(keyCol), i, numBits)): _*)).as("_pos"))
      .select((col("_pos") / 64).cast(LongType).as("_w"),
        call_function("shiftleft", lit(1L),
          pmod(col("_pos"), lit(64L)).cast(IntegerType)).as("_m"))
      .groupBy(col("_w")).agg(bit_or(col("_m")).as("_mask"))
      .collect()
    val bits = new Array[Long](numBits / 64)
    words.foreach(r => bits(r.getLong(0).toInt) = r.getLong(1))
    bits
  }

  /** Membership test against a built filter: true iff every one of the
    * key's `numHashes` bit positions is set. No false negatives ever;
    * false-positive rate ≈ (1 − e^(−kn/m))^k. NULL keys return false
    * (a NULL never equi-joins, so filtering it is sound for inner and
    * semi joins).
    */
  def bloomPasses(
      key: Column, bits: Array[Long], numBits: Int, numHashes: Int): Column = {
    require(bits.length == numBits / 64, "bits length must be numBits/64")
    val arr = typedlit(bits.toSeq)
    val hit = (0 until numHashes).map { i =>
      val pos = bloomPos(key, i, numBits)
      element_at(arr, (pos / 64).cast(IntegerType) + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          pmod(pos, lit(64L)).cast(IntegerType))) =!= 0
    }
    hit.reduce(_ && _) && key.isNotNull
  }

  /** Semi-join reduction: filter the big side through a Bloom filter of
    * the small side's keys BEFORE the join's exchange, then join
    * normally. At 100 TB the exchange is the cost — a 2 MB filter that
    * rejects 95% of fact rows map-side shrinks the shuffle by 20×
    * while the exact join afterwards removes the false positives, so
    * the result is identical to the plain join (JoinOpsSpec asserts
    * equality; q92 pins the filter's exact false-positive pattern
    * cross-engine). This is the manual form of the runtime row-level
    * filtering Spark plans adaptively — exposed as an operator so a
    * pipeline can build the filter ONCE and reuse it across many fact
    * scans (Spark's adaptive version rebuilds per query).
    */
  def bloomPrefilteredJoin(
      big: DataFrame, small: DataFrame, key: String,
      numBits: Int = 1 << 20, numHashes: Int = 5,
      joinType: String = "inner"): DataFrame = {
    val bits = bloomFilterBits(small.select(col(key)), key, numBits, numHashes)
    big.filter(bloomPasses(col(key), bits, numBits, numHashes))
      .join(small, Seq(key), joinType)
  }

  /** Per-partition Bloom manifest: for every value of `partCol`, the
    * packed word/mask rows of a `numBits`-bit Bloom filter over that
    * partition's `keyCol` values — the point-lookup companion to the
    * q175 zone-map manifest (min/max prunes RANGES; a Bloom prunes
    * EQUALITY probes, which min/max can't help with when keys are
    * uniformly spread across partitions). Stored as an ordinary
    * (part, w, mask) DataFrame — parquet-persistable, mergeable by
    * bit_or, and rebuildable cell-by-cell by any engine running the
    * same md5 bit recipe ([[bloomFilterBits]]'s `key ‖ ':' ‖ i`).
    *
    * Scale: keys explode ×numHashes into positions only, per-word OR
    * masks collapse map-side; the manifest is parts·numBits/64 rows —
    * metadata-sized, never corpus-sized.
    */
  def bloomManifest(df: DataFrame, partCol: String, keyCol: String,
      numBits: Int, numHashes: Int): DataFrame = {
    require(numBits >= 64 && numBits % 64 == 0,
      s"numBits must be a positive multiple of 64: $numBits")
    require(numHashes >= 1 && numHashes <= 16, s"numHashes in [1,16]: $numHashes")
    df.filter(col(keyCol).isNotNull)
      .select(col(partCol).as("part"),
        explode(array((0 until numHashes).map(i =>
          bloomPos(col(keyCol), i, numBits)): _*)).as("_pos"))
      .select(col("part"), (col("_pos") / 64).cast(LongType).as("w"),
        call_function("shiftleft", lit(1L),
          pmod(col("_pos"), lit(64L)).cast(IntegerType)).as("_m"))
      .groupBy(col("part"), col("w")).agg(bit_or(col("_m")).as("mask"))
  }

  /** Candidate partitions per probe key against a [[bloomManifest]]:
    * (key, part) for every partition whose Bloom filter MIGHT contain
    * the key (all `numHashes` bits set — no false negatives, so a
    * scan restricted to the candidates is exact after re-filtering).
    * This is manifest-level file skipping: the probe matrix is
    * probes × parts × hashes rows of integers — driver never sees it,
    * the corpus is never touched.
    */
  def bloomCandidates(manifest: DataFrame, probes: DataFrame,
      keyCol: String, numBits: Int, numHashes: Int): DataFrame = {
    val parts = manifest.select(col("part")).distinct()
    val ppos = probes.select(col(keyCol).as("_k")).distinct()
      .select(col("_k"), posexplode(array((0 until numHashes).map(i =>
        bloomPos(col("_k"), i, numBits)): _*)).as(Seq("_i", "_pos")))
      .select(col("_k"), col("_i"),
        (col("_pos") / 64).cast(LongType).as("w"),
        call_function("shiftleft", lit(1L),
          pmod(col("_pos"), lit(64L)).cast(IntegerType)).as("_m"))
      .crossJoin(broadcast(parts))
    ppos.join(manifest, Seq("part", "w"), "left")
      .withColumn("_hit",
        when(col("mask").isNotNull &&
          (col("mask").bitwiseAND(col("_m")) =!= 0L), 1).otherwise(0))
      .groupBy(col("_k"), col("part"))
      .agg(min(col("_hit")).as("_pass"))
      .filter(col("_pass") === 1)
      .select(col("_k").as(keyCol), col("part"))
  }

  /** Skew remediation planner — the measurement that decides WHICH
    * keys [[saltedJoin]] should salt and by how much, instead of
    * salting everything (which taxes the uniform keys) or guessing.
    *
    * A key is skewed when its row count exceeds `skewFactor` × the
    * integer mean rows-per-key; its salt factor is
    * ceil(count / mean) = (count + mean − 1) DIV mean — the number of
    * salt buckets that brings its per-bucket share back to the mean.
    * All arithmetic is integer (counts and DIV), so the plan is
    * bit-reproducible by any engine.
    *
    * Output: (keyCol, n_rows, avg_rows, salt_factor) for the skewed
    * keys only. Scale: one keyed count (map-side partials), one 1-row
    * scalar over the key frame (partial buffers cross), a broadcast
    * back — the fact table is scanned once and never shuffled wide;
    * the plan is |skewed keys| rows, which is small by the definition
    * of skew.
    */
  def saltPlan(df: DataFrame, keyCol: String, skewFactor: Int = 4): DataFrame = {
    require(skewFactor >= 1, s"skewFactor must be >= 1: $skewFactor")
    val counts = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_rows"))
    val stats = counts.agg(
      sum(col("n_rows")).as("_total"), count(lit(1)).as("_nkeys"))
    counts.crossJoin(broadcast(stats))
      .withColumn("avg_rows", expr("_total DIV _nkeys"))
      .filter(col("n_rows") > lit(skewFactor.toLong) * col("avg_rows"))
      .select(col(keyCol), col("n_rows"), col("avg_rows"),
        expr("(n_rows + avg_rows - 1) DIV avg_rows").as("salt_factor"))
  }
}
