package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table profiling — the ANALYZE/data-quality primitive a pipeline
  * runs before trusting 100 TB of new input: per-column row count,
  * null count, exact distinct count, numeric min/max, string (or
  * formatted temporal) min/max and length bounds.
  *
  * Shape: one COLUMN-PRUNED aggregate per profiled column, unioned.
  * The tempting single-pass alternative (all stats in one wide
  * aggregate) makes Catalyst plan the multi-distinct via Expand —
  * a ×(columns+1) row amplification feeding a deduplication shuffle
  * keyed on every profiled value, which measured ~8 s where this
  * formulation takes ~1 s at sf0.1 and would shuffle the whole table
  * several times over at 100 TB. Per-column scans read ONLY that
  * column's parquet pages (`ReadSchema` is a single field), so total
  * I/O equals the profiled bytes — the same I/O the single-pass plan
  * pays, without the blowup; each branch's exact distinct is a
  * 2-level hash aggregate with map-side partials.
  *
  * Determinism: counts are exact integers; min/max are order-free;
  * numeric bounds surface as raw DOUBLE (no arithmetic); temporal
  * bounds are FORMATTED to strings (raw timestamp columns are a
  * parquet µs/ns + tz annotation minefield cross-engine); string
  * bounds compare in binary collation on both engines.
  */
object Profiling {

  /** Per-column profile rows:
    * (col_name, n, n_null, n_distinct, min_num, max_num, min_str,
    * max_str, min_len, max_len), ordered by column name. Numeric
    * columns fill min_num/max_num; strings fill min_str/max_str and
    * the length bounds; timestamps fill min_str/max_str with a
    * "yyyy-MM-dd HH:mm:ss" UTC rendering.
    */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val schema = df.schema
    val branches = cols.map { name =>
      val c = col(name)
      val isNum = schema(name).dataType match {
        case _: NumericType => true
        case _ => false
      }
      val isTs = schema(name).dataType match {
        case TimestampType | TimestampNTZType | DateType => true
        case _ => false
      }
      df.select(c).agg(
        count(lit(1)).as("n"),
        count(when(c.isNull, 1)).as("n_null"),
        count_distinct(c).as("n_distinct"),
        (if (isNum) min(c.cast(DoubleType)) else lit(null).cast(DoubleType))
          .as("min_num"),
        (if (isNum) max(c.cast(DoubleType)) else lit(null).cast(DoubleType))
          .as("max_num"),
        (if (isTs) date_format(min(c), "yyyy-MM-dd HH:mm:ss")
         else if (isNum) lit(null).cast(StringType)
         else min(c).cast(StringType)).as("min_str"),
        (if (isTs) date_format(max(c), "yyyy-MM-dd HH:mm:ss")
         else if (isNum) lit(null).cast(StringType)
         else max(c).cast(StringType)).as("max_str"),
        (if (!isNum && !isTs) min(length(c.cast(StringType)))
         else lit(null).cast(IntegerType)).cast(IntegerType).as("min_len"),
        (if (!isNum && !isTs) max(length(c.cast(StringType)))
         else lit(null).cast(IntegerType)).cast(IntegerType).as("max_len"))
        .select(lit(name).as("col_name"), col("n"), col("n_null"),
          col("n_distinct"), col("min_num"), col("max_num"),
          col("min_str"), col("max_str"), col("min_len"), col("max_len"))
    }
    branches.reduceLeft(_.unionByName(_)).orderBy(col("col_name"))
  }

  /** Functional-dependency discovery: for each candidate pair
    * (determinant → dependent), does every determinant value map to
    * exactly one dependent value? The metadata-inference step of
    * schema profiling — finding the `nationkey → regionkey` facts a
    * modeler would declare as constraints.
    *
    * Output per pair: (table_name, det_col, dep_col, n_keys,
    * n_violating_keys, holds) where n_violating_keys counts
    * determinant values with > 1 distinct dependent.
    *
    * Scale: each pair is one 2-column pruned scan → keyed
    * count-distinct (map-side partials) → 1-row summary; pairs run as
    * independent jobs. A k-pair audit is k cheap column-pruned
    * passes, never a full-width scan.
    */
  /** Gini-impurity column profile: per column, 1 − Σ(c_v/N)² — the
    * probability two random rows disagree on the column. The
    * distribution-shape companion to [[profileColumns]]'s counts: a
    * 5-value column at 96/1/1/1/1 and one at 20×5 have the same
    * n_distinct but opposite impurity, and a curation pipeline
    * balancing sources or picking stratification keys needs the
    * difference.
    *
    * Exact integer arithmetic end-to-end: impurity = (N² − Σc²)/N² is
    * reported as ((N² − Σc²)·10⁶) DIV N², computed in DECIMAL(38,0)
    * with IntegralDivide so the squares stay exact past 2⁶³ (a c of
    * 10¹⁰ squares to 10²⁰) and any ANSI engine replays it bit-for-bit
    * (HUGEINT in DuckDB). NULL counts as its own value class — a
    * 99%-null column IS low-impurity, and hiding that would be a lie.
    *
    * Scale shape: per column one 1-COLUMN-PRUNED scan → keyed value
    * count (map-side partials) → one scalar roll-up of the
    * value-count frame (Σc, Σc², count — partial buffers only across
    * the final exchange); columns run as independent jobs, the
    * [[functionalDependencies]] economics.
    */
  def giniImpurity(df: DataFrame, tableName: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val dec = "DECIMAL(38,0)"
    val branches = cols.map { c =>
      df.groupBy(col(c))
        .agg(count(lit(1)).cast(dec).as("_c"))
        .agg(sum(col("_c")).cast(dec).as("_n"),
          sum(col("_c") * col("_c")).cast(dec).as("_ssq"),
          count(lit(1)).as("n_distinct"))
        .select(lit(tableName).as("table_name"), lit(c).as("col_name"),
          col("_n").cast("bigint").as("n_rows"),
          col("n_distinct").cast("bigint").as("n_distinct"),
          expr(s"((_n * _n - _ssq) * CAST(1000000 AS $dec)) div (_n * _n)")
            .cast("bigint").as("gini_scaled"))
    }
    branches.reduceLeft(_.unionByName(_)).orderBy(col("col_name"))
  }

  /** Benford first-digit audit: the observed first-significant-digit
    * distribution of a positive numeric column against Benford's law
    * — the classic fabricated-data screen (organic multiplicative
    * quantities follow log₁₀(1+1/d); invented or uniformly-generated
    * figures don't, which is itself informative about a synthetic
    * source). Expected shares are PUBLIC constants in ppm
    * (301030, 176091, …); observed shares are exact integers
    * obs·10⁶ DIV N, so the deviation column is integer end-to-end.
    *
    * First digit extraction is string-of-BIGINT (floor → cast →
    * first char) — never a formatted double, so any engine matches
    * byte-for-byte. The audited domain is [1, 2⁶³): rows below 1
    * have no first significant digit at this resolution, rows at or
    * above 2⁶³ would overflow the exact integer path (a money/count
    * column never gets there; both bounds are part of the declared
    * semantics and replayed by the oracle). Scale: one 1-column
    * pruned scan → 9-row aggregate.
    */
  val benfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val digit = substring(
      floor(col(valueCol)).cast("bigint").cast("string"), 1, 1).cast("int")
    val obs = df
      .filter(col(valueCol) >= 1 && col(valueCol) < 9.223372036854775e18)
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val expected = obs.sparkSession
      .createDataFrame(benfordPpm).toDF("digit", "expected_ppm")
    val n = obs.agg(sum(col("n_obs")).as("_n"))
    broadcast(expected).join(obs, Seq("digit"), "left")
      .crossJoin(broadcast(n))
      .select(col("digit"),
        coalesce(col("n_obs"), lit(0L)).cast("bigint").as("n_obs"),
        expr("(coalesce(n_obs, 0L) * 1000000L) div _n").as("obs_ppm"),
        col("expected_ppm"),
        abs(expr("(coalesce(n_obs, 0L) * 1000000L) div _n") -
          col("expected_ppm")).as("dev_ppm"))
      .orderBy("digit")
  }

  def functionalDependencies(df: DataFrame, tableName: String,
      candidates: Seq[(String, String)]): DataFrame = {
    require(candidates.nonEmpty, "need at least one candidate pair")
    val branches = candidates.map { case (det, dep) =>
      df.groupBy(col(det))
        .agg(countDistinct(col(dep)).as("_nd"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("_nd") > 1, 1L).otherwise(0L)).as("n_violating_keys"))
        .select(lit(tableName).as("table_name"),
          lit(det).as("det_col"), lit(dep).as("dep_col"),
          col("n_keys"), col("n_violating_keys"),
          when(col("n_violating_keys") === 0, 1).otherwise(0)
            .cast("int").as("holds"))
    }
    branches.reduceLeft(_.unionByName(_))
  }
}
