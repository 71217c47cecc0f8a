package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.DateTimeFunctions._
import graft.schema.Occurrence

/** Cleaning stage (SURVEY.md §2.3 F1/F2, §2.4 C1–C5, §2.2 P1).
  *
  * The reference cleans imperatively and accumulates dropped rows in a
  * module-global mutable list (`/root/reference/monarch_etl/cleaning.py:49`,
  * `:76-98`). Here the same semantics are a pure dataflow split: one lazy
  * plan produces `clean` and `rejected` DataFrames with the invariant
  * `clean.count + rejected.count == input.count`.
  *
  * Scale: both outputs share the scan; no driver-side state, no
  * collect. Rejection tagging is a codegen'd projection, so a 100 TB
  * input pays one pass.
  */
object Cleaning {

  /** Result of the cleaning stage: the survivors and the tagged sidecar. */
  final case class CleanResult(clean: DataFrame, rejected: DataFrame)

  import Occurrence._

  /** Apply all cleaning steps (mirrors `clean_raw_dataframe`,
    * `cleaning.py:76-98`):
    *  1. rescue partial eventDate formats (C1)
    *  2. parse eventDate → eventDateParsed, UTC (C2)
    *  3. reject unparseable dates (F1), preserving `_raw_eventDate`
    *  4. coerce coordinates, reject null/non-numeric (F2)
    *  5. coerce individualCount, default 1 (C5)
    *  6. derive temporal columns (C3)
    *  7. project to canonical columns present in the input (P1)
    */
  def clean(raw: DataFrame): CleanResult = {
    val hasEventDate = raw.columns.contains("eventDate")
    val rescued =
      if (hasEventDate)
        raw.withColumn("eventDate", rescueEventDate(col("eventDate")))
      else raw.withColumn("eventDate", lit(null).cast(StringType))

    val parsed = rescued.withColumn("eventDateParsed", parseEventTs(col("eventDate")))
    val dateOk = col("eventDateParsed").isNotNull

    val rejectedDates = parsed.filter(!dateOk)
      .drop("eventDateParsed")
      .withColumn(rawEventDateCol, col("eventDate"))
      .withColumn(failureReasonCol, lit(reasonUnparseableDate))
      .withColumn(failureDetailCol,
        lit("timestamp parse could not parse eventDate after rescue pass"))

    val coerced = parsed.filter(dateOk)
      .withColumn("decimalLatitude", tryToDouble(col("decimalLatitude")))
      .withColumn("decimalLongitude", tryToDouble(col("decimalLongitude")))
    val coordOk =
      col("decimalLatitude").isNotNull && col("decimalLongitude").isNotNull

    val rejectedCoords = coerced.filter(!coordOk)
      .drop("eventDateParsed")
      .withColumn(failureReasonCol, lit(reasonInvalidCoords))
      .withColumn(failureDetailCol,
        lit("decimalLatitude or decimalLongitude is null / non-numeric"))

    val cleanDf = coerced.filter(coordOk)
      .withColumn("individualCount",
        if (raw.columns.contains("individualCount")) coerceCount(col("individualCount"))
        else lit(1L))
      .transform(deriveTemporal)
      .transform(selectFinalColumns)

    val rejected = rejectedDates.unionByName(rejectedCoords, allowMissingColumns = true)
    CleanResult(cleanDf, rejected)
  }

  /** C3: attach the temporal sub-columns from `eventDateParsed`
    * (`cleaning.py:234-246`).
    */
  def deriveTemporal(df: DataFrame): DataFrame =
    temporalColumns(col("eventDateParsed")).foldLeft(df) {
      case (d, (name, expr)) => d.withColumn(name, expr)
    }

  /** P1: canonical column subset — keep only known columns, in order,
    * `gbifID` cast to string (`cleaning.py:249-266`).
    */
  def selectFinalColumns(df: DataFrame): DataFrame = {
    val present = finalColumns.filter(df.columns.contains)
    val projected = df.select(present.map(col): _*)
    if (present.contains("gbifID"))
      projected.withColumn("gbifID", col("gbifID").cast(StringType))
    else projected
  }

  /** A4: rejection-reason frequency report
    * (`/root/reference/monarch_etl/etl.py:65-66`, `:118-119`).
    */
  def rejectionReport(rejected: DataFrame): DataFrame =
    rejected.groupBy(col(failureReasonCol))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(desc("n_rows"), asc(failureReasonCol))
}
