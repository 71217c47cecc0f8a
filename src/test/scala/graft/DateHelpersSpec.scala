package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.DateTimeFunctions

class DateHelpersSpec extends SparkSpec {

  private def onDate(d: String, c: org.apache.spark.sql.Column): Row = {
    val df = spark.createDataFrame(
      java.util.List.of(Row(java.sql.Date.valueOf(d))),
      StructType(Seq(StructField("d", DateType))))
    df.select(c).collect()(0)
  }

  test("C7: first Sunday of the year") {
    // 2025-01-01 is a Wednesday → first Sunday is Jan 5
    assert(onDate("2025-06-15", DateTimeFunctions.firstSundayOfYear(col("d")))
      .getDate(0).toString == "2025-01-05")
    // 2023-01-01 IS a Sunday → Jan 1
    assert(onDate("2023-03-03", DateTimeFunctions.firstSundayOfYear(col("d")))
      .getDate(0).toString == "2023-01-01")
    // 2024-01-01 is a Monday → Jan 7
    assert(onDate("2024-12-31", DateTimeFunctions.firstSundayOfYear(col("d")))
      .getDate(0).toString == "2024-01-07")
  }

  test("C8: date N days ago validates the offset like the reference") {
    val today = java.time.LocalDate.now()
    val got = onDate("2024-01-01", DateTimeFunctions.dateDaysAgo(7)).getDate(0)
    assert(got.toLocalDate == today.minusDays(7))
    intercept[IllegalArgumentException](DateTimeFunctions.dateDaysAgo(-1))
  }

  test("C9: table names match the reference's doctest examples") {
    // table_naming.py:12-18: june012025, june102025, june2025
    assert(onDate("2025-06-01", DateTimeFunctions.tableNameForDay(col("d")))
      .getString(0) == "june012025")
    assert(onDate("2025-06-10", DateTimeFunctions.tableNameForDay(col("d")))
      .getString(0) == "june102025")
    assert(onDate("2025-06-10", DateTimeFunctions.tableNameForMonth(col("d")))
      .getString(0) == "june2025")
  }
}
