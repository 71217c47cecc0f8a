package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  /** t-closeness audit — the leak l-diversity misses: a group can
    * hold ≥ l distinct sensitive values yet be 95% one value, telling
    * an attacker far more than the global base rate does. Per QI
    * group, the total-variation distance between the group's
    * sensitive-value distribution and the table-wide one; for
    * categorical attributes under uniform ground distance, TVD IS the
    * earth-mover distance the t-closeness definition calls for.
    *
    * All arithmetic is INTEGER (the fixed-point discipline):
    * TVD = ½ Σ_v |c_v/n − C_v/N| is cross-multiplied to
    * tvd_num = Σ_v |c_v·N − C_v·n| and reported as
    * (tvd_num·10⁶) DIV (2·n·N) — exact, order-invariant, and
    * replayable by any ANSI engine. Sensitive values ABSENT from a
    * group still contribute (|0·N − C_v·n| = C_v·n), folded in
    * without a group×domain cross join via the complement identity
    * Σ_{v∉group} C_v·n = n·(N − Σ_{v∈group} C_v).
    *
    * Scale shape: one keyed (QI+value) count, one grouped roll-up to
    * QI groups, one broadcast-sized global value-count frame joined
    * by value — the corpus crosses one exchange; the group×domain
    * blow-up the naive formulation needs never materializes. Counts
    * go through DECIMAL(38,0) before the cross-multiply so c·N stays
    * exact past the 2⁶³ line a trillion-row table would cross.
    *
    * Output: qiNames + (n_rows, tvd_scaled, t_close) where t_close =
    * tvd_scaled ≤ tScaled (distance in millionths).
    */
  def tClosenessAudit(df: DataFrame, qiCols: Seq[org.apache.spark.sql.Column],
      qiNames: Seq[String], sensitiveCol: String, tScaled: Long): DataFrame = {
    require(qiCols.nonEmpty && qiCols.size == qiNames.size && tScaled >= 0,
      s"bad t-closeness parameters (${qiCols.size}, ${qiNames.size}, $tScaled)")
    import org.apache.spark.sql.functions._
    val dec = "DECIMAL(38,0)"
    val keyed = qiCols.zip(qiNames).map { case (c, n) => c.as(n) }
    val cell = df.groupBy((keyed :+ col(sensitiveCol).as("_v")): _*)
      .agg(count(lit(1)).cast(dec).as("_c"))
    val global = cell.groupBy(col("_v"))
      .agg(sum(col("_c")).cast(dec).as("_cv")) // C_v per sensitive value
    // group totals (n_g, Σ_{v∈g} C_v) come from one QI-keyed roll-up of
    // the C_v-joined cells; joining them back is co-partitioned (both
    // sides already keyed on QI)
    val cellg = cell.join(broadcast(global), Seq("_v"))
    val grp = cellg.groupBy(qiNames.map(col): _*)
      .agg(sum(col("_c")).cast(dec).as("_ng"),
        sum(col("_cv")).cast(dec).as("_cvp"))
    val n = global.agg(sum(col("_cv")).cast(dec).as("_nTot"))
    cellg.join(grp, qiNames)
      .crossJoin(broadcast(n))
      .withColumn("_term",
        abs(col("_c") * col("_nTot") - col("_cv") * col("_ng")))
      .groupBy(qiNames.map(col): _*)
      .agg(first(col("_ng")).as("_ng"), first(col("_cvp")).as("_cvp"),
        first(col("_nTot")).as("_nTot"),
        sum(col("_term")).cast(dec).as("_present"))
      .withColumn("_num",
        ((col("_present") + col("_ng") * (col("_nTot") - col("_cvp")))
          * lit(1000000L).cast(dec)).cast(dec))
      .withColumn("_den",
        (lit(2L).cast(dec) * col("_ng") * col("_nTot")).cast(dec))
      .select(qiNames.map(col) ++ Seq(
        col("_ng").cast(LongType).as("n_rows"),
        // IntegralDivide on decimals: exact truncation, no scale-6
        // rounding — bit-for-bit what DuckDB's // computes on HUGEINT
        expr("_num div _den").cast(LongType).as("tvd_scaled")): _*)
      .withColumn("t_close",
        when(col("tvd_scaled") <= tScaled, 1).otherwise(0).cast("int"))
  }
}
