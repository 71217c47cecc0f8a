package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-key time-series statistics over keyed ordered series.
  *
  * The reference's temporal analysis stops at calendar component
  * extraction (`/root/reference/monarch_etl/cleaning.py:105-246` derives
  * year/month/day/week columns); these operators are the engine-native
  * next step: serial-dependence structure of a keyed series, computed
  * distributed with one keyed exchange.
  */
object SeriesStats {

  /** Lagged autocorrelation per key: for each requested lag L,
    * acf_L = Σ_t (v_t − μ)(v_{t−L} − μ) / Σ_t (v_t − μ)², where t−L is
    * L ROWS back in `orderCol` order within the key (missing
    * predecessors drop out of the numerator; the denominator uses all
    * points — the standard plug-in ACF estimator).
    *
    * Output: key, n_points, mean, acf_<L> per lag (NULL when the
    * denominator is zero — a constant series has no autocorrelation).
    *
    * Determinism (the [[graft.queries.Det]] discipline): μ is a
    * decimal-exact sum over identical per-row doubles divided once;
    * deviation products are per-row IEEE arithmetic on identical
    * operands, summed through DECIMAL(28,8) (order-independent), and
    * the final ratio is one double division — bit-reproducible on any
    * engine.
    *
    * Scale: one exchange keyed on `keyCol` shared by the window and
    * both aggregates (Catalyst reuses the partitioning); per-key state
    * is the series itself, never the corpus. The per-key stats join
    * back keyed — series content ((key, order, value) triples) crosses
    * once.
    */
  def laggedAutocorrelation(df: DataFrame, keyCol: String,
      orderCol: String, valueCol: String,
      lags: Seq[Int] = Seq(1)): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), s"bad lags $lags")
    val dec = DecimalType(28, 8)
    val series = df.select(col(keyCol).as("_k"), col(orderCol).as("_t"),
      col(valueCol).cast(DoubleType).as("_v"))
    val stats = series.groupBy(col("_k")).agg(
      count(lit(1)).as("n_points"),
      (sum(col("_v").cast(DecimalType(18, 6))).cast(DoubleType) /
        count(lit(1)).cast(DoubleType)).as("mean"))
    val w = Window.partitionBy(col("_k")).orderBy(col("_t"))
    val withDev = series.join(stats, Seq("_k"))
      .withColumn("_dev", col("_v") - col("mean"))
    val lagged = lags.foldLeft(withDev) { (acc, l) =>
      acc.withColumn(s"_dev_l$l", lag(col("_dev"), l).over(w))
    }
    val aggs: Seq[Column] =
      Seq(max(col("n_points")).cast(LongType).as("n_points"),
        max(col("mean")).as("mean"),
        sum((col("_dev") * col("_dev")).cast(dec)).cast(DoubleType).as("_den")) ++
        lags.map(l =>
          sum((col("_dev") * col(s"_dev_l$l")).cast(dec)).cast(DoubleType)
            .as(s"_num$l"))
    val outCols: Seq[Column] =
      Seq(col("_k").as(keyCol), col("n_points"), col("mean")) ++
        lags.map(l =>
          when(col("_den") =!= 0.0, col(s"_num$l") / col("_den"))
            .as(s"acf_$l"))
    lagged.groupBy(col("_k")).agg(aggs.head, aggs.tail: _*)
      .select(outCols: _*)
  }
}
