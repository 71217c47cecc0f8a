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
    * anti-join). One co-partitioned full-outer join on the key
    * classifies everything. Duplicate keys are a caller bug the
    * operator guards: each side is required unique per key
    * (`dropDuplicates` on the key would silently hide real data, so a
    * duplicate key fails fast instead).
    */
  def snapshotDiff(
      before: DataFrame, after: DataFrame,
      keyCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty,
      "snapshotDiff: keyCols and valueCols must be non-empty")
    def sideHash(df: DataFrame, hashName: String) = {
      val h = graft.sources.Tables.widen(df)
        .select(keyCols.map(col) :+ rowHash(valueCols).as(hashName): _*)
      h
    }
    val b = sideHash(before, "_hb")
    val a = sideHash(after, "_ha")
    val joined = b.join(a, keyCols, "full_outer")
    val dupGuard = joined.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_n")).filter(col("_n") > 1).limit(1).count()
    require(dupGuard == 0,
      "snapshotDiff: duplicate key on at least one side — diff undefined")
    joined
      .withColumn("change",
        when(col("_hb").isNull, lit("insert"))
          .when(col("_ha").isNull, lit("delete"))
          .when(col("_hb") =!= col("_ha"), lit("update")))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change"): _*)
  }
}
