package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Native-expression date/time library (SURVEY.md §2.4 C1–C11).
  *
  * Every function is `Column => Column` over built-in Catalyst expressions
  * — no UDFs, so the whole cleaning stage stays inside whole-stage codegen
  * and is unit-testable without I/O. All `try_*` variants map the
  * reference's `errors="coerce"` semantics (invalid → NULL) and stay safe
  * under ANSI mode.
  */
object DateTimeFunctions {

  /** C1: eventDate rescue-normalize
    * (`/root/reference/monarch_etl/cleaning.py:105-169`, `_fix` at
    * `:125-142`):
    *   - null-ish tokens ("none"/"nan"/"nat"/"") pass through unchanged,
    *   - `"A/B"` ranges take the start `A`,
    *   - `"YYYY"` → `"YYYY-01-01"`,
    *   - 7 chars with `-` at index 4 (`"YYYY-MM"`) → append `"-01"`,
    *   - anything else passes through for the parser to judge.
    */
  def rescueEventDate(c: Column): Column = {
    val trimmed = trim(c.cast(StringType))
    val nullish = trimmed.isNull ||
      lower(trimmed).isin("none", "nan", "nat") || trimmed === ""
    // range → start (cleaning.py:131-132), then re-trim
    val noRange = when(trimmed.contains("/"),
      trim(split(trimmed, "/").getItem(0))).otherwise(trimmed)
    val fixed =
      when(noRange.rlike("^[0-9]{4}$"), concat(noRange, lit("-01-01")))
        // exact reference predicate: len==7 and val[4]=='-' (cleaning.py:139-140)
        .when(length(noRange) === 7 && substring(noRange, 5, 1) === "-",
          concat(noRange, lit("-01")))
        .otherwise(noRange)
    when(nullish, trimmed).otherwise(fixed)
  }

  /** C2: robust timestamp parse, mirroring
    * `pd.to_datetime(errors="coerce", format="mixed", utc=True)`
    * (`/root/reference/monarch_etl/cleaning.py:177-182`): a coalesce over
    * the format families GBIF actually emits, normalized to UTC via the
    * session timezone; unparseable → NULL. The trailing lenient cast
    * covers remaining ISO-8601 variants (offsets, 'Z', fractions).
    */
  def parseEventTs(c: Column): Column = {
    val s = trim(c.cast(StringType))
    coalesce(
      try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ss")),
      try_to_timestamp(s, lit("yyyy-MM-dd HH:mm:ss")),
      try_to_timestamp(s, lit("yyyy-MM-dd")),
      s.try_cast(TimestampType))
  }

  /** C4: `pd.to_numeric(errors='coerce')` — invalid/non-numeric → NULL. */
  def tryToDouble(c: Column): Column = c.try_cast(DoubleType)

  /** C5: individualCount coercion
    * (`/root/reference/monarch_etl/cleaning.py:221-231`): numeric-coerce,
    * default 1 on null/NaN/invalid, truncate toward zero to integer
    * (pandas `astype(int)` truncation).
    */
  def coerceCount(c: Column): Column =
    coalesce(nanvl(c.try_cast(DoubleType), lit(1.0)), lit(1.0)).cast(LongType)

  /** C3: Monday=0 day-of-week (pandas `dt.dayofweek`,
    * `cleaning.py:242`). Spark's `dayofweek` is Sun=1..Sat=7.
    */
  def dayOfWeekMon0(ts: Column): Column =
    ((dayofweek(ts) + lit(5)) % lit(7)).cast(IntegerType)

  /** C3: the full temporal derivation set
    * (`/root/reference/monarch_etl/cleaning.py:234-246`), as (name, expr)
    * pairs to `withColumns` onto a frame with `eventDateParsed`.
    */
  def temporalColumns(ts: Column): Seq[(String, Column)] = Seq(
    "year"         -> year(ts).cast(IntegerType),
    "month"        -> month(ts).cast(IntegerType),
    "day"          -> dayofmonth(ts).cast(IntegerType),
    "day_of_week"  -> dayOfWeekMon0(ts),
    // pandas isocalendar().week.astype(int) → ISO week, int64
    "week_of_year" -> weekofyear(ts).cast(LongType),
    "date_only"    -> to_date(ts),
    "time_only"    -> timeOnly(ts))

  /** C3/enrichment: `HH:mm:ss` wall-time text
    * (`/root/reference/monarch_etl/enrichment.py:64-73`,
    * `schema.py:84` stores time-of-day as text).
    */
  def timeOnly(ts: Column): Column = date_format(ts, "HH:mm:ss")

  /** C9: legacy per-day table name `{monthname}{dd}{yyyy}` (e.g.
    * `june012025`) — `/root/reference/monarch_etl/table_naming.py:24-33`.
    * In this engine it is a derived label: storage is `date_only`-
    * partitioned, so the name is metadata, not physical layout.
    */
  def tableNameForDay(d: Column): Column =
    concat(
      lower(date_format(d, "MMMM")),
      lpad(dayofmonth(d).cast(StringType), 2, "0"),
      year(d).cast(StringType))

  /** C9: per-month table name `{monthname}{yyyy}` (e.g. `june2025`) —
    * `/root/reference/monarch_etl/table_naming.py:36-43`.
    */
  def tableNameForMonth(d: Column): Column =
    concat(lower(date_format(d, "MMMM")), year(d).cast(StringType))

  /** C7: first Sunday of the year of `d`
    * (`/root/reference/etl_past_day_script.py:9-37`).
    */
  def firstSundayOfYear(d: Column): Column = {
    val jan1 = trunc(d, "year")
    // days to add: (7 - isoweekday(jan1)) % 7, isoweekday = Mon=1..Sun=7
    val isoWeekday = dayOfWeekMon0(jan1) + lit(1)
    date_add(jan1, ((lit(7) - isoWeekday) % lit(7)).cast(IntegerType))
  }

  /** C8: date N days ago (`/root/reference/etl_past_day_script.py:52-73`);
    * negative offsets are rejected there, mirrored here at plan-build time.
    */
  def dateDaysAgo(n: Int): Column = {
    require(n >= 0, s"days-ago offset must be >= 0, got $n")
    date_sub(current_date(), n)
  }
}
