package graft.schema

import org.apache.spark.sql.types._

/** Canonical occurrence data model (SURVEY.md §1).
  *
  * Mirrors the reference's three coordinated type maps — the pandas dtype
  * map (`/root/reference/monarch_etl/config.py:46-84`), the SQLAlchemy map
  * (`/root/reference/monarch_etl/schema.py:46-85`) and the FINAL_COLUMNS
  * order (`/root/reference/monarch_etl/config.py:89-98`,
  * `/root/reference/monarch_etl/cleaning.py:249-261`) — collapsed into one
  * Spark `StructType`.
  *
  * `gbifID` is a string on purpose: the reference casts it to avoid 64-bit
  * precision loss (`cleaning.py:264-265`).
  */
object Occurrence {

  /** Exact canonical column order (35 columns). */
  val finalColumns: Seq[String] = Seq(
    "gbifID", "datasetKey", "publishingOrgKey", "eventDate", "eventDateParsed",
    "year", "month", "day", "day_of_week", "week_of_year", "date_only",
    "scientificName", "vernacularName", "taxonKey", "kingdom", "phylum",
    "class", "order", "family", "genus", "species", "decimalLatitude",
    "decimalLongitude", "coordinateUncertaintyInMeters", "countryCode",
    "stateProvince", "individualCount", "basisOfRecord", "recordedBy",
    "occurrenceID", "collectionCode", "catalogNumber",
    "county", "cityOrTown", "time_only")

  /** Canonical Spark type per column (SURVEY.md §1.2 type-map table). */
  val columnTypes: Map[String, DataType] = Map(
    "gbifID"                        -> StringType,
    "datasetKey"                    -> StringType,
    "publishingOrgKey"              -> StringType,
    "eventDate"                     -> StringType,
    "eventDateParsed"               -> TimestampType,
    "year"                          -> IntegerType,
    "month"                         -> IntegerType,
    "day"                           -> IntegerType,
    "day_of_week"                   -> IntegerType,
    "week_of_year"                  -> LongType,
    "date_only"                     -> DateType,
    "scientificName"                -> StringType,
    "vernacularName"                -> StringType,
    "taxonKey"                      -> LongType,
    "kingdom"                       -> StringType,
    "phylum"                        -> StringType,
    "class"                         -> StringType,
    "order"                         -> StringType,
    "family"                        -> StringType,
    "genus"                         -> StringType,
    "species"                       -> StringType,
    "decimalLatitude"               -> DoubleType,
    "decimalLongitude"              -> DoubleType,
    "coordinateUncertaintyInMeters" -> DoubleType,
    "countryCode"                   -> StringType,
    "stateProvince"                 -> StringType,
    "individualCount"               -> LongType,
    "basisOfRecord"                 -> StringType,
    "recordedBy"                    -> StringType,
    "occurrenceID"                  -> StringType,
    "collectionCode"                -> StringType,
    "catalogNumber"                 -> StringType,
    "county"                        -> StringType,
    "cityOrTown"                    -> StringType,
    "time_only"                     -> StringType)

  /** The canonical 35-column schema, in order. */
  val schema: StructType =
    StructType(finalColumns.map(c => StructField(c, columnTypes(c), nullable = true)))

  /** Rejection sidecar tags (SURVEY.md §1.1; `cleaning.py:62-69,186-193`).
    * Sidecar rows carry the source columns plus these.
    */
  val failureReasonCol = "_failure_reason"
  val failureDetailCol = "_failure_detail"
  val rawEventDateCol  = "_raw_eventDate"

  val reasonUnparseableDate  = "unparseable_eventDate"
  val reasonInvalidCoords    = "invalid_coordinates"

  /** `data_inventory` catalog schema (`/root/reference/monarch_etl/inventory.py:52-59`). */
  val inventorySchema: StructType = StructType(Seq(
    StructField("available_date", DateType, nullable = false),
    StructField("table_name", StringType, nullable = false),
    StructField("record_count", LongType, nullable = false),
    StructField("processed_at", TimestampType, nullable = false)))
}
