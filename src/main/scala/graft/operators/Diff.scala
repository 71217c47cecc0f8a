package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot differencing (CDC between two versions of a keyed table):
  * classify every key as inserted, deleted, updated, or unchanged —
  * the audit primitive behind incremental pipelines ("what did
  * yesterday's load actually change?") and replication checks.
  */
object Diff {

  /** Cross-engine row fingerprint of the non-key columns: md5 over the
    * chr(31)-joined string forms with a chr(30) NULL sentinel, so any ANSI
    * engine reproduces it (`md5(concat_ws(chr(31), coalesce(c::VARCHAR,
    * chr(30)), …))`). Column order is the caller's `valueCols` order —
    * part of the contract.
    */
  private def rowHash(valueCols: Seq[String]) =
    md5(concat_ws("\u001f",
      valueCols.map(c => coalesce(col(c).cast("string"), lit("\u001e"))): _*))

  /** Diff two snapshots of a keyed table. Returns one row per key that
    * CHANGED — (keyCols…, change ∈ insert | delete | update); unchanged
    * keys are dropped (at 100 TB the interesting set is the delta, and
    * emitting the unchanged majority would make the diff corpus-sized).
    *
    * Scale shape: both sides reduce to (key, row-hash) projections
    * map-side — the table's VALUE columns never cross an exchange, only
    * 16-byte hashes plus keys do (same discipline as the exact-dedup
    * anti-join). Each side then aggregates by key (the SAME hash
    * partitioning the join needs, so Catalyst plans exactly two
    * exchanges and the join adds none), which makes the duplicate-key
    * guard free: a per-key count rides the aggregate, and a count > 1
    * raises mid-job via `raise_error` instead of paying a separate
    * guard pass that would recompute both scans (the operator's first
    * formulation did exactly that — a `.count()` action before the
    * caller's own action doubled every byte read). Duplicate keys are
    * a caller bug: `dropDuplicates` on the key would silently hide
    * real data, so the diff fails fast instead — lazily, inside the
    * caller's action, as everything else in a DataFrame pipeline does.
    */
  def snapshotDiff(
      before: DataFrame, after: DataFrame,
      keyCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty,
      "snapshotDiff: keyCols and valueCols must be non-empty")
    // project to (key, 16-byte hash) BEFORE any widen/repartition:
    // widen-first would round-robin the full row width through its
    // exchange, which is exactly the shipping this operator exists to
    // avoid (PlanShapeSpec asserts no value column crosses any shuffle)
    def sideHash(df: DataFrame, hashName: String, cntName: String) =
      graft.sources.Tables.widen(
          df.select(keyCols.map(col) :+ rowHash(valueCols).as(hashName): _*))
        .groupBy(keyCols.map(col): _*)
        .agg(max(col(hashName)).as(hashName), count(lit(1)).as(cntName))
    val b = sideHash(before, "_hb", "_nb")
    val a = sideHash(after, "_ha", "_na")
    b.join(a, keyCols, "full_outer")
      .withColumn("change",
        when(coalesce(col("_nb"), lit(0L)) > 1 ||
             coalesce(col("_na"), lit(0L)) > 1,
          raise_error(lit(
            "snapshotDiff: duplicate key on at least one side — diff undefined")))
          .when(col("_hb").isNull, lit("insert"))
          .when(col("_ha").isNull, lit("delete"))
          .when(col("_hb") =!= col("_ha"), lit("update")))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change"): _*)
  }

  /** Apply a CDC change feed to a base snapshot — the write side of
    * [[snapshotDiff]]: given per-key changes (`op` ∈ I/U/D with a
    * per-key sequence number), produce the resulting snapshot. The
    * LAST change per key wins ('I' and 'U' both mean "row becomes
    * these values" — upsert semantics, so a replayed or re-ordered
    * feed converges; 'D' means gone, and a later 'U' resurrects). A
    * key with no change passes through; a 'D' for an absent key is a
    * no-op.
    *
    * Mechanics: the feed collapses to one row per key with a single
    * max-over-structs aggregate (seq leads the struct, so it must be
    * unique per key — the CDC log position; ties would fall to op/
    * value order, deterministic but meaningless, hence the require),
    * then ONE full-outer join against the base decides
    * keep/replace/drop/insert per key. Exchanges carry the key plus
    * final values exactly once each side; nothing is driver-bounded
    * and there is no per-change iteration — a million-row feed
    * against a 100 TB table is one aggregate and one join.
    */
  def applyChanges(base: DataFrame, changes: DataFrame,
      keyCols: Seq[String], seqCol: String, opCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty,
      "applyChanges: keyCols and valueCols must be non-empty")
    val keys = keyCols.map(col)
    val latest = changes
      .groupBy(keys: _*)
      .agg(
        max(struct((col(seqCol).as("_seq") +: col(opCol).as("_op") +:
          valueCols.map(c => col(c).as(c))): _*)).as("_c"),
        count(lit(1)).as("_nc"),
        countDistinct(col(seqCol)).as("_ns"))
      // guard rides inside the consumed column (a free-standing column
      // would be pruned away and never evaluated)
      .withColumn("_c", coalesce(
        when(col("_nc") =!= col("_ns"),
          raise_error(lit("applyChanges: duplicate sequence number for a key"))),
        col("_c")))
      .drop("_nc", "_ns")
    val b = base.select((keys :+ lit(true).as("_in_base")) ++
      valueCols.map(c => col(c).as(s"_b_$c")): _*)
    b.join(latest, keyCols, "full_outer")
      .where(
        // drop: latest op is D (whether or not the key existed)
        col("_c").isNull || col("_c._op") =!= "D")
      .select(keys ++ valueCols.map { c =>
        when(col("_c").isNotNull, col(s"_c.$c"))
          .otherwise(col(s"_b_$c")).as(c)
      }: _*)
  }
}
