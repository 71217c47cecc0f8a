package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic pseudonymization — the privacy primitive between
  * "ship raw identifiers into the training corpus" and "destroy the
  * ability to join": each configured column's values are replaced by a
  * salted-hash token. The SAME (salt, value) always yields the SAME
  * token, so
  *
  *  - joins/group-bys on the tokenized column still work, across
  *    tables and across ingestion days (consistency is the point —
  *    this is pseudonymization, not anonymization; rotate the salt to
  *    sever linkage between releases, guard the salt like a key);
  *  - distinct counts, frequencies, and skew profiles are preserved
  *    (token collisions are the only distortion: 64 hex-bit tokens
  *    make them negligible at any realistic cardinality);
  *  - NULL stays NULL (absence is not an identity).
  *
  * Complements [[TextAnalysis.scrubPii]]: the scrub removes pattern-
  * matched PII from free TEXT; this tokenizes STRUCTURED identifier
  * columns wholesale. One codegen'd projection, zero shuffles, no UDF
  * — at 100 TB this is a free rider on whatever scan already runs.
  */
object Privacy {

  /** Token expression for one value: first 16 hex chars (64 bits) of
    * md5(salt ‖ value) — any engine reproduces it as
    * `substr(md5('salt' || v), 1, 16)`.
    */
  def token(c: org.apache.spark.sql.Column, salt: String): org.apache.spark.sql.Column =
    when(c.isNull, lit(null).cast("string"))
      .otherwise(substring(md5(concat(lit(salt), c.cast("string"))), 1, 16))

  /** Replace each named column's values with their tokens; every other
    * column and the column ORDER pass through unchanged.
    */
  def pseudonymize(df: DataFrame, cols: Seq[String], salt: String): DataFrame = {
    require(cols.nonEmpty, "pseudonymize: no columns")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"pseudonymize: absent columns $missing")
    cols.foldLeft(df)((d, c) => d.withColumn(c, token(col(c), salt)))
  }
}
