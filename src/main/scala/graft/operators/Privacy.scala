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

  /** Per-row k-anonymity generalization over a numeric quasi-identifier
    * with a coarsening ladder — the release-gating complement of
    * [[pseudonymize]]: tokens stop direct identification, but a rare
    * COMBINATION of quasi-identifiers (nation × segment × precise
    * balance) still singles a person out. Local generalization assigns
    * each row the FINEST ladder level at which its generalized group
    * `(categorical QIs, floor(value / divisor))` reaches `k` members;
    * rows that stay unique even at the coarsest level are suppressed
    * (`level = -1`, NULL generalized value) — exactly the
    * Samarati/Sweeney k-anonymity model, per-row instead of
    * whole-table so well-populated regions keep their precision.
    *
    * Shape: the corpus explodes by the ladder (|levels| ≤ a handful),
    * ONE hash aggregate counts every (level, QI-group) — group-
    * bounded, map-side combined — one join carries the counts back,
    * and a final row-keyed aggregate takes the min qualifying level
    * (min over structs, so the generalized value rides along with its
    * level). Work is |levels| × corpus through two exchanges; nothing
    * is ever driver-side.
    *
    * Returns (idCol, anon_level: int, anon_value: nullable long).
    */
  def kAnonymize(df: DataFrame, idCol: String, catCols: Seq[String],
      valueCol: String, divisors: Seq[Long], k: Int): DataFrame = {
    require(divisors.nonEmpty && divisors == divisors.sorted &&
      divisors.distinct == divisors, s"ladder must be ascending: $divisors")
    require(k >= 2, s"k must be >= 2, got $k")
    val ladder = array(divisors.zipWithIndex.map { case (d, i) =>
      struct(lit(i).as("l"), lit(d.toDouble).as("d"))
    }: _*)
    val cats = catCols.map(col)
    val m = df.select((col(idCol) +: col(valueCol) +: cats): _*)
      .withColumn("_lv", explode(ladder))
      .select(col(idCol) +: col("_lv.l").as("_l") +:
        floor(col(valueCol) / col("_lv.d")).cast("long").as("_gv") +: cats: _*)
    val counts = m.groupBy((col("_l") +: col("_gv") +: cats): _*)
      .agg(count(lit(1)).as("_cnt"))
    m.join(counts, Seq("_l", "_gv") ++ catCols)
      .groupBy(col(idCol))
      .agg(min(when(col("_cnt") >= k,
        struct(col("_l").as("l"), col("_gv").as("gv")))).as("_best"))
      .select(col(idCol),
        coalesce(col("_best.l"), lit(-1)).cast("int").as("anon_level"),
        col("_best.gv").as("anon_value"))
  }

  /** l-diversity audit — the check k-anonymity alone misses: a
    * quasi-identifier group where every member shares one sensitive
    * value is k-anonymous yet leaks the attribute outright. Per QI
    * group: row count, distinct sensitive values, and the ≥ l verdict.
    *
    * Output: qiCols + (n_rows, n_sensitive, l_diverse). One keyed
    * aggregate (count + count-distinct on the group's sensitive
    * column) — map-side partials, QI-group-sized result, nothing else
    * crosses an exchange.
    */
  def lDiversityAudit(df: DataFrame, qiCols: Seq[org.apache.spark.sql.Column],
      qiNames: Seq[String], sensitiveCol: String, l: Int): DataFrame = {
    require(qiCols.nonEmpty && qiCols.size == qiNames.size && l >= 1,
      s"bad l-diversity parameters (${qiCols.size}, ${qiNames.size}, $l)")
    import org.apache.spark.sql.functions._
    val keyed = qiCols.zip(qiNames).map { case (c, n) => c.as(n) }
    df.groupBy(keyed: _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("l_diverse",
        when(col("n_sensitive") >= l, 1).otherwise(0).cast("int"))
  }
}
