package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Leakage-safe categorical feature encoding for training pipelines.
  *
  * Target encoding replaces a categorical column with the mean of a
  * numeric target over that category. Using the plain category mean
  * leaks each row's own label into its feature; the standard fix is the
  * LEAVE-ONE-OUT estimate — for row i in category c,
  * (sum(c) − y_i) / (count(c) − 1) — blended with the global prior so
  * rare categories shrink toward it (the m-estimate / empirical-Bayes
  * smoothing used throughout tabular ML):
  *
  *   enc_i = (sum(c) − y_i + m·prior) / (count(c) − 1 + m)
  *
  * Engine shape (the 100 TB contract):
  *  - the corpus is scanned once for the per-category sufficient
  *    statistics — ONE hash aggregate whose exchange carries
  *    |categories| rows, never corpus rows;
  *  - the global prior derives from the category table (no second
  *    corpus pass), as a 1-row broadcast;
  *  - the encoded value is a map-side projection after a BROADCAST join
  *    of the category table back onto the corpus — the fact side never
  *    shuffles. Adding this feature to a 100 TB training set costs one
  *    aggregate and one broadcast-joined scan.
  *
  * Determinism: the target moves to micro-units (exact DECIMAL(18,6)
  * scaling, BIGINT thereafter); the encode is a single integer division
  * — both engines truncate identically on the non-negative operands the
  * micro-unit domain guarantees (callers must not pass targets below
  * −max·m; the gate query's domain is strictly positive). No float is
  * ever accumulated.
  */
object Encoding {

  /** Leave-one-out m-estimate target encoding.
    *
    * @param df          input rows
    * @param idCol       unique row id (output ordering / audit key)
    * @param catCol      categorical column to encode
    * @param targetCol   numeric target (double); scaled to micro-units
    * @param priorWeight m — pseudo-count weight of the global prior
    * @return (idCol, catCol, loo_micro): encoded value in micro-units
    */
  def looTargetEncode(df: DataFrame, idCol: String, catCol: String,
      targetCol: String, priorWeight: Int): DataFrame = {
    require(priorWeight >= 1, s"priorWeight must be >= 1: $priorWeight")
    val y = (col(targetCol).cast(DecimalType(18, 6)) * 1000000)
      .cast(LongType)
    val base = df.select(col(idCol), col(catCol), y.as("_y"))

    // per-category sufficient statistics: |categories|-sized.
    // Materialized eagerly so the prior below derives from this frame
    // instead of replanning a SECOND corpus scan (Catalyst does not
    // reuse the aggregate across the two consumers on its own).
    val cats = base.groupBy(col(catCol))
      .agg(count(lit(1)).as("_n"), sum(col("_y")).as("_s"))
      .localCheckpoint(true)

    // global prior from the category table — category-sized, 1 row out
    val prior = cats.agg(
      (sum(col("_s")).cast(DecimalType(38, 0)) * priorWeight)
        .as("_mprior_num"),
      sum(col("_n")).as("_tot_n"))
      .select(expr("CAST(_mprior_num div _tot_n AS BIGINT)").as("_mprior"))

    base
      .join(broadcast(cats), Seq(catCol))
      .crossJoin(broadcast(prior))
      .select(col(idCol), col(catCol),
        expr(s"(_s - _y + _mprior) div (_n - 1 + $priorWeight)")
          .cast(LongType).as("loo_micro"))
  }
}
