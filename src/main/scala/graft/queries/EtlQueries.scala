package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.DateTimeFunctions._
import graft.sources.Tables
import Det._

/** Oracle-checked queries for the occurrence-ETL scalar semantics
  * (SURVEY.md §2.4 C1/C2/C3/C9, §2.3 F3, §2.5 A3) — driven over the
  * shared `events` table so the DuckDB oracle can independently
  * recompute them. The DuckDB SQL re-implements the reference semantics
  * from scratch (it is the judge, not a copy of the Spark plan).
  */
object EtlQueries {

  type Q = (SparkSession, String) => DataFrame

  /** C1+C2: date rescue-normalize + robust parse over deterministic
    * date-shaped strings derived from `events.ts`. Covers year-only,
    * year-month, full date, range, and garbage in one pass.
    */
  def q14DateRescue(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.widen(Tables.events(s, dir))
    val m = (col("event_id") % 5).cast(IntegerType)
    val raw = when(m === 0, date_format(col("ts"), "yyyy"))
      .when(m === 1, date_format(col("ts"), "yyyy-MM"))
      .when(m === 2, date_format(col("ts"), "yyyy-MM-dd"))
      .when(m === 3, concat(
        date_format(col("ts"), "yyyy-MM-dd"), lit("/"),
        date_format(date_add(col("ts"), 2), "yyyy-MM-dd")))
      .otherwise(lit("not a date"))
    ev.withColumn("raw_date", raw)
      .withColumn("rescued", rescueEventDate(col("raw_date")))
      .withColumn("parsed",
        date_format(parseEventTs(col("rescued")), "yyyy-MM-dd HH:mm:ss"))
      .select(col("event_id"), col("raw_date"), col("rescued"), col("parsed"))
      .orderBy("event_id")
  }

  val q14Sql: String =
    """WITH raw AS (
      |  SELECT event_id,
      |    CASE CAST(event_id % 5 AS INT)
      |      WHEN 0 THEN strftime(ts, '%Y')
      |      WHEN 1 THEN strftime(ts, '%Y-%m')
      |      WHEN 2 THEN strftime(ts, '%Y-%m-%d')
      |      WHEN 3 THEN strftime(ts, '%Y-%m-%d') || '/' || strftime(ts + INTERVAL 2 DAY, '%Y-%m-%d')
      |      ELSE 'not a date' END AS raw_date
      |  FROM events),
      |fixed AS (
      |  SELECT event_id, raw_date,
      |    CASE
      |      WHEN regexp_matches(trim(split_part(raw_date, '/', 1)), '^[0-9]{4}$')
      |        THEN trim(split_part(raw_date, '/', 1)) || '-01-01'
      |      WHEN length(trim(split_part(raw_date, '/', 1))) = 7
      |           AND substr(trim(split_part(raw_date, '/', 1)), 5, 1) = '-'
      |        THEN trim(split_part(raw_date, '/', 1)) || '-01'
      |      ELSE trim(split_part(raw_date, '/', 1)) END AS rescued
      |  FROM raw)
      |SELECT event_id, raw_date, rescued,
      |  strftime(TRY_CAST(rescued AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS parsed
      |FROM fixed
      |ORDER BY event_id""".stripMargin

  /** C3: full temporal component derivation — year/month/day, Monday=0
    * weekday, ISO week, date_only, time_only — over `events.ts`.
    */
  def q15Temporal(s: SparkSession, dir: String): DataFrame = {
    val ts = col("ts")
    Tables.widen(Tables.events(s, dir)).select(
      col("event_id"),
      year(ts).cast(IntegerType).as("yr"),
      month(ts).cast(IntegerType).as("mon"),
      dayofmonth(ts).cast(IntegerType).as("dom"),
      dayOfWeekMon0(ts).as("dow_mon0"),
      weekofyear(ts).cast(IntegerType).as("iso_week"),
      date_format(ts, "yyyy-MM-dd").as("date_only"),
      timeOnly(ts).as("time_only"))
      .orderBy("event_id")
  }

  val q15Sql: String =
    """SELECT event_id,
      |  CAST(year(ts) AS INT) AS yr,
      |  CAST(month(ts) AS INT) AS mon,
      |  CAST(day(ts) AS INT) AS dom,
      |  CAST(isodow(ts) - 1 AS INT) AS dow_mon0,
      |  CAST(weekofyear(ts) AS INT) AS iso_week,
      |  strftime(ts, '%Y-%m-%d') AS date_only,
      |  strftime(ts, '%H:%M:%S') AS time_only
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** A3+C9+D2 read side: the `data_inventory` catalog derivation — one
    * row per ingested day with the reference's `{monthname}{dd}{yyyy}`
    * table label and record count.
    */
  def q16Inventory(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("record_count"))
      .select(
        date_format(col("d"), "yyyy-MM-dd").as("available_date"),
        tableNameForDay(col("d")).as("table_name"),
        col("record_count"))
      .orderBy("available_date")

  val q16Sql: String =
    """SELECT strftime(d, '%Y-%m-%d') AS available_date,
      |  lower(monthname(d)) || lpad(CAST(day(d) AS VARCHAR), 2, '0')
      |    || CAST(year(d) AS VARCHAR) AS table_name,
      |  n AS record_count
      |FROM (SELECT CAST(ts AS DATE) AS d, count(*) AS n FROM events GROUP BY 1)
      |ORDER BY available_date""".stripMargin

  /** F3/§3.2: the Flask read API's year/month/day equality filters as
    * native expressions (no string parsing), aggregated by event_type.
    * On a date-partitioned warehouse these predicates become partition
    * pruning.
    */
  def q17ReadPath(s: SparkSession, dir: String): DataFrame = {
    val ts = col("ts")
    Tables.events(s, dir)
      .filter(year(ts) === 2024 && month(ts) === 1 && dayofmonth(ts) === 15)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), exactSum(col("value")).as("sum_value"))
      .orderBy("event_type")
  }

  val q17Sql: String =
    s"""SELECT event_type, count(*) AS n_events,
       |  ${exactSumSql("value")} AS sum_value
       |FROM events
       |WHERE year(ts) = 2024 AND month(ts) = 1 AND day(ts) = 15
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  /** Semi-structured JSON column handling (the GBIF raw-record shape,
    * SURVEY §1.2): extract a field from the `props` JSON string, type
    * it, aggregate. At scale this is `from_json` with an explicit
    * schema pushed as far down as possible; here `get_json_object`
    * keeps it scalar.
    */
  def q36JsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(col("k")).as("n_with_k"),
        sum(col("k")).cast(LongType).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  val q36Sql: String =
    """SELECT event_type,
      |  count(CAST(props->>'$.k' AS INT)) AS n_with_k,
      |  CAST(sum(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k,
      |  min(CAST(props->>'$.k' AS INT)) AS min_k,
      |  max(CAST(props->>'$.k' AS INT)) AS max_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** J1 geocode enrichment through the real operator
    * ([[graft.operators.Enrichment.BroadcastGeocode]]): the reference's
    * per-row HTTP reverse-geocode (`monarch_etl/enrichment.py:46-59`)
    * re-expressed as a broadcast left join against a rounded-cell
    * dimension. Coordinates are integer-derived doubles (one IEEE
    * expression tree, identical in both engines) so the rounded cell
    * keys join bit-for-bit; unmatched rows keep NULLs (the reference's
    * leave-None-on-failure contract — exercised at sf0.1 where fact
    * cells fall outside the dimension's key range). Output carries only
    * integers/strings — no float crosses the hash gate.
    */
  def q71GeocodeEnrich(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Enrichment
    val cust = Tables.customer(s, dir)
    val facts = cust.select(
      col("c_custkey"),
      (col("c_custkey") % 1800 / 10.0 - 90.0).as("decimalLatitude"),
      (col("c_custkey") % 3600 / 10.0 - 180.0).as("decimalLongitude"))
    // dimension keyed on the custkey-derived cell — custkey < 1800 makes
    // (lat_cell, lon_cell) unique per row, so the left join never fans out
    val dim = cust.filter(col("c_custkey") < 1800).select(
      round(col("c_custkey") / 10.0 - 90.0, 2).as("lat_cell"),
      round(col("c_custkey") / 10.0 - 180.0, 2).as("lon_cell"),
      concat(lit("cty_"), col("c_custkey") % 97).as("county"),
      concat(lit("city_"), col("c_custkey") % 53).as("cityOrTown"))
    new Enrichment.BroadcastGeocode(dim).attach(facts)
      .select(col("c_custkey"), col("county"),
        col("cityOrTown").as("city_or_town"))
      .orderBy("c_custkey")
  }

  val q71Sql: String =
    """WITH facts AS (
      |  SELECT c_custkey,
      |    round(c_custkey % 1800 / 10.0 - 90.0, 2) AS lat_cell,
      |    round(c_custkey % 3600 / 10.0 - 180.0, 2) AS lon_cell
      |  FROM customer),
      |dim AS (
      |  SELECT round(c_custkey / 10.0 - 90.0, 2) AS lat_cell,
      |    round(c_custkey / 10.0 - 180.0, 2) AS lon_cell,
      |    'cty_' || (c_custkey % 97) AS county,
      |    'city_' || (c_custkey % 53) AS city_or_town
      |  FROM customer WHERE c_custkey < 1800)
      |SELECT f.c_custkey, d.county, d.city_or_town
      |FROM facts f LEFT JOIN dim d USING (lat_cell, lon_cell)
      |ORDER BY c_custkey""".stripMargin

  /** Categorical distribution drift on the oracle gate
    * ([[graft.operators.Drift.categoricalDrift]]): the event-type mix
    * of the full log vs a mutated snapshot — every 3rd event dropped
    * and the 'view' category renamed 'view_v2', so the comparison
    * exercises all three regimes at once: shifted categories
    * (chi-squared term from a fixed IEEE tree over exact counts),
    * a VANISHED category ('view': n_after = 0, term = its full
    * expectation), and a NEW category ('view_v2': no defined
    * expectation, flagged is_new with NULL terms). The oracle replays
    * counts, the multiply-then-divide expectation, and the squared-
    * residual term with the identical operand order — any float
    * re-association or edge-case divergence breaks the hash.
    */
  def q106CategoryDrift(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_id"), col("event_type"))
    val after = ev.filter(pmod(col("event_id"), lit(3)) =!= 0)
      .withColumn("event_type",
        when(col("event_type") === "view", lit("view_v2"))
          .otherwise(col("event_type")))
    graft.operators.Drift.categoricalDrift(ev, after, "event_type")
  }

  val q106Sql: String =
    """WITH b AS (
      |  SELECT event_type AS category, CAST(count(*) AS BIGINT) AS n_before
      |  FROM events GROUP BY 1),
      |a AS (
      |  SELECT CASE WHEN event_type = 'view' THEN 'view_v2'
      |              ELSE event_type END AS category,
      |    CAST(count(*) AS BIGINT) AS n_after
      |  FROM events WHERE event_id % 3 <> 0 GROUP BY 1),
      |j AS (
      |  SELECT coalesce(b.category, a.category) AS category,
      |    coalesce(b.n_before, 0) AS n_before,
      |    coalesce(a.n_after, 0) AS n_after
      |  FROM b FULL OUTER JOIN a ON b.category = a.category),
      |t AS (SELECT CAST(sum(n_before) AS BIGINT) AS tb,
      |             CAST(sum(n_after) AS BIGINT) AS ta FROM j)
      |SELECT category, n_before, n_after,
      |  CASE WHEN n_before = 0 THEN NULL
      |       ELSE CAST(n_before AS DOUBLE) * CAST(ta AS DOUBLE)
      |            / CAST(tb AS DOUBLE) END AS expected_after,
      |  CASE WHEN n_before = 0 THEN NULL
      |       ELSE (CAST(n_after AS DOUBLE) -
      |             CAST(n_before AS DOUBLE) * CAST(ta AS DOUBLE)
      |             / CAST(tb AS DOUBLE))
      |          * (CAST(n_after AS DOUBLE) -
      |             CAST(n_before AS DOUBLE) * CAST(ta AS DOUBLE)
      |             / CAST(tb AS DOUBLE))
      |          / (CAST(n_before AS DOUBLE) * CAST(ta AS DOUBLE)
      |             / CAST(tb AS DOUBLE)) END AS chi2_term,
      |  n_before = 0 AS is_new
      |FROM j CROSS JOIN t
      |ORDER BY category""".stripMargin

  /** Deterministic pseudonymization on the oracle gate
    * ([[graft.operators.Privacy.pseudonymize]]): tokenize the customer
    * key on BOTH sides of the customer-orders relationship with the
    * same salt, join ON THE TOKENS, and aggregate per market segment.
    * The oracle replays the salted-md5 token recipe and the tokenized
    * join in SQL — matching counts prove the pseudonymized columns
    * kept their join semantics (the pseudonymization contract), and
    * the distinct-token counts pin collision-freeness at this scale.
    */
  def q107Pseudonymize(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Privacy
    val cust = Privacy.pseudonymize(
      Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment")),
      Seq("c_custkey"), "s8")
    val ords = Privacy.pseudonymize(
      Tables.orders(s, dir).select(col("o_custkey")),
      Seq("o_custkey"), "s8")
    cust.join(ords, cust("c_custkey") === ords("o_custkey"), "left")
      .groupBy(col("c_mktsegment"))
      .agg(count(col("o_custkey")).as("n_orders"),
        countDistinct(col("c_custkey")).as("n_tokens"))
      .orderBy("c_mktsegment")
  }

  val q107Sql: String =
    """WITH c AS (
      |  SELECT substr(md5('s8' || c_custkey::VARCHAR), 1, 16) AS tok,
      |    c_mktsegment
      |  FROM customer),
      |o AS (
      |  SELECT substr(md5('s8' || o_custkey::VARCHAR), 1, 16) AS tok
      |  FROM orders)
      |SELECT c_mktsegment,
      |  CAST(count(o.tok) AS BIGINT) AS n_orders,
      |  CAST(count(DISTINCT c.tok) AS BIGINT) AS n_tokens
      |FROM c LEFT JOIN o ON c.tok = o.tok
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Declarative data-quality audit ([[graft.operators.Quality]]):
    * referential integrity, range, null, and uniqueness rules over
    * `orders` seeded with four disjoint planted-violation classes
    * (negative-key space, so plants never collide with real keys).
    * Every predicate rule shares ONE scan; uniqueness is one keyed
    * count; the FK check is one anti-join. The oracle recomputes all
    * four summaries independently — counts AND the deterministic
    * min-key violation samples must both match.
    */
  def q126DqAudit(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Quality
    import graft.operators.Quality.{Check, ForeignKey, Unique}
    val o = Tables.orders(s, dir)
    val badFk = o.where(col("o_orderkey") % 500 === 1)
      .withColumn("o_orderkey", -col("o_orderkey") - 1)
      .withColumn("o_custkey", -col("o_custkey") - 1)
    val badPrice = o.where(col("o_orderkey") % 500 === 2)
      .withColumn("o_orderkey", -col("o_orderkey") - 100000)
      .withColumn("o_totalprice", -col("o_totalprice"))
    val badDate = o.where(col("o_orderkey") % 500 === 3)
      .withColumn("o_orderkey", -col("o_orderkey") - 200000)
      .withColumn("o_orderdate", lit(null).cast("timestamp"))
    val dups = o.where(col("o_orderkey") % 500 === 4)
    val corpus = o.unionByName(badFk).unionByName(badPrice)
      .unionByName(badDate).unionByName(dups)
    Quality.audit(corpus, "o_orderkey", Seq(
      ForeignKey("fk_customer", "o_custkey",
        Tables.customer(s, dir), "c_custkey"),
      Check("nonpositive_price", col("o_totalprice") <= 0),
      Check("null_orderdate", col("o_orderdate").isNull),
      Unique("unique_orderkey", Seq("o_orderkey"))))
  }

  val q126Sql: String =
    """WITH corpus AS (
      |  SELECT * FROM orders
      |  UNION ALL
      |  SELECT -o_orderkey-1, -o_custkey-1, o_orderstatus, o_totalprice,
      |    o_orderdate, o_orderpriority FROM orders WHERE o_orderkey % 500 = 1
      |  UNION ALL
      |  SELECT -o_orderkey-100000, o_custkey, o_orderstatus, -o_totalprice,
      |    o_orderdate, o_orderpriority FROM orders WHERE o_orderkey % 500 = 2
      |  UNION ALL
      |  SELECT -o_orderkey-200000, o_custkey, o_orderstatus, o_totalprice,
      |    NULL, o_orderpriority FROM orders WHERE o_orderkey % 500 = 3
      |  UNION ALL
      |  SELECT * FROM orders WHERE o_orderkey % 500 = 4)
      |SELECT 'fk_customer' AS rule,
      |  CAST(count(*) AS BIGINT) AS n_violations,
      |  min(o_orderkey) AS min_violation_key
      |FROM corpus c
      |WHERE o_custkey IS NOT NULL
      |  AND NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = c.o_custkey)
      |UNION ALL
      |SELECT 'nonpositive_price', CAST(count(*) AS BIGINT), min(o_orderkey)
      |FROM corpus WHERE o_totalprice <= 0
      |UNION ALL
      |SELECT 'null_orderdate', CAST(count(*) AS BIGINT), min(o_orderkey)
      |FROM corpus WHERE o_orderdate IS NULL
      |UNION ALL
      |SELECT 'unique_orderkey',
      |  CAST(coalesce(sum(c), 0) AS BIGINT), min(k)
      |FROM (SELECT o_orderkey, count(*) AS c, min(o_orderkey) AS k
      |      FROM corpus GROUP BY o_orderkey HAVING count(*) > 1)
      |ORDER BY rule""".stripMargin

  /** Sketch-based winsorization ([[graft.operators.Sketches.winsorize]]):
    * clamp `events.value` to its [p5, p95] histogram-quantile
    * thresholds — one parallel aggregate for the sketch, two doubles
    * to the driver, one codegen'd least/greatest projection; never a
    * global sort or an approx_percentile buffer. The oracle replays
    * the histogram, the rank walk, the two bin-lower-edge thresholds,
    * and every per-row clamp decision.
    */
  def q128Winsorize(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sketches.winsorize(
        Tables.events(s, dir).select(col("event_id"), col("value")),
        "value", 0.0, 500.0, 250, 0.05, 0.95)
      .select(col("event_id"), col("value"), col("value_w"),
        col("_clamped").as("clamped"))
      .orderBy("event_id")

  val q128Sql: String =
    """WITH v AS (SELECT event_id, value FROM events),
      |s AS (
      |  SELECT least(greatest(CAST(floor((value - 0.0) / ((500.0 - 0.0) / 250))
      |      AS BIGINT), 0), 249) AS bin,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM v WHERE value IS NOT NULL GROUP BY 1),
      |c AS (
      |  SELECT bin,
      |    CAST(sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
      |         AS BIGINT) AS cum,
      |    CAST(sum(cnt) OVER () AS BIGINT) AS total
      |  FROM s),
      |p AS (SELECT unnest([0.05, 0.95]) AS q),
      |cuts AS (
      |  SELECT q, 0.0 + CAST(min(bin) AS DOUBLE) * ((500.0 - 0.0) / 250) AS est
      |  FROM p CROSS JOIN c
      |  WHERE c.cum >= ceil(p.q * CAST(c.total AS DOUBLE))
      |  GROUP BY q),
      |t AS (
      |  SELECT max(CASE WHEN q = 0.05 THEN est END) AS tl,
      |         max(CASE WHEN q = 0.95 THEN est END) AS th
      |  FROM cuts)
      |SELECT v.event_id, v.value,
      |  CASE WHEN v.value IS NULL THEN NULL
      |       ELSE least(greatest(v.value, t.tl), t.th) END AS value_w,
      |  CAST(CASE WHEN v.value IS NULL THEN 0
      |            WHEN v.value < t.tl THEN -1
      |            WHEN v.value > t.th THEN 1 ELSE 0 END AS INT) AS clamped
      |FROM v CROSS JOIN t ORDER BY v.event_id""".stripMargin

  /** Per-row k-anonymity generalization
    * ([[graft.operators.Privacy.kAnonymize]]): each customer gets the
    * finest (nation, segment, balance-bucket) coarsening level at
    * which its group reaches k=5 members, or suppression (-1) if even
    * the coarsest fails — release gating for quasi-identifier
    * combinations. The oracle replays the ladder explosion, group
    * counts, and the min-qualifying-level selection with min_by.
    */
  def q131KAnonymity(s: SparkSession, dir: String): DataFrame =
    graft.operators.Privacy.kAnonymize(
        Tables.customer(s, dir), "c_custkey",
        Seq("c_nationkey", "c_mktsegment"), "c_acctbal",
        divisors = Seq(100L, 1000L, 10000L), k = 5)
      .orderBy("c_custkey")

  val q131Sql: String =
    """WITH m AS (
      |  SELECT c_custkey, c_nationkey, c_mktsegment, u.l,
      |    CAST(floor(c_acctbal / u.d) AS BIGINT) AS gv
      |  FROM customer,
      |    (SELECT unnest([{'l': 0, 'd': 100.0}, {'l': 1, 'd': 1000.0},
      |                    {'l': 2, 'd': 10000.0}]) AS u)),
      |c AS (
      |  SELECT l, gv, c_nationkey, c_mktsegment, count(*) AS cnt
      |  FROM m GROUP BY l, gv, c_nationkey, c_mktsegment),
      |j AS (
      |  SELECT m.c_custkey, m.l, m.gv, c.cnt
      |  FROM m JOIN c USING (l, gv, c_nationkey, c_mktsegment))
      |SELECT c_custkey,
      |  CAST(coalesce(min(l) FILTER (cnt >= 5), -1) AS INT) AS anon_level,
      |  min_by(gv, l) FILTER (cnt >= 5) AS anon_value
      |FROM j GROUP BY c_custkey
      |ORDER BY c_custkey""".stripMargin

  /** Survivorship / golden records
    * ([[graft.operators.Linkage.goldenRecords]]): the consolidation
    * step after fuzzy linkage — each match cluster collapses to one
    * record whose every column holds the most recent NON-NULL value
    * (a newer revision with a missing field must not erase an older
    * field). Clusters here are customers with two planted revisions
    * (one updates the balance but nulls the segment, a newer one
    * updates the name but nulls everything else), so the golden
    * record mixes three revisions. The oracle replays per-column
    * survivorship with max_by over a (rev, id)-monotone key + FILTER.
    */
  def q133GoldenRecords(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val base = c.select(col("c_custkey").as("cluster"), lit(0L).as("rev"),
      col("c_custkey").as("rid"), col("c_name"), col("c_acctbal"),
      col("c_mktsegment"))
    val dup = c.where(col("c_custkey") % 300 === 7)
    val v1 = dup.select(col("c_custkey").as("cluster"), lit(1L).as("rev"),
      (col("c_custkey") + 10000000).as("rid"),
      lit(null).cast("string").as("c_name"),
      (col("c_acctbal") + 100.0).as("c_acctbal"),
      lit(null).cast("string").as("c_mktsegment"))
    val v2 = dup.select(col("c_custkey").as("cluster"), lit(2L).as("rev"),
      (col("c_custkey") + 20000000).as("rid"),
      concat(col("c_name"), lit(" Jr")).as("c_name"),
      lit(null).cast("double").as("c_acctbal"),
      lit(null).cast("string").as("c_mktsegment"))
    graft.operators.Linkage.goldenRecords(
        base.unionByName(v1).unionByName(v2), "cluster", "rev", "rid",
        Seq("c_name", "c_acctbal", "c_mktsegment"))
      .orderBy("cluster")
  }

  val q133Sql: String =
    """WITH m AS (
      |  SELECT c_custkey AS cluster, 0 AS rev, c_custkey AS rid,
      |    c_name, c_acctbal, c_mktsegment
      |  FROM customer
      |  UNION ALL
      |  SELECT c_custkey, 1, c_custkey + 10000000,
      |    NULL, c_acctbal + 100.0, NULL
      |  FROM customer WHERE c_custkey % 300 = 7
      |  UNION ALL
      |  SELECT c_custkey, 2, c_custkey + 20000000,
      |    c_name || ' Jr', NULL, NULL
      |  FROM customer WHERE c_custkey % 300 = 7)
      |SELECT cluster, CAST(count(*) AS BIGINT) AS n_members,
      |  min(rid) AS canonical_id,
      |  max_by(c_name, rev * 100000000 + rid)
      |    FILTER (c_name IS NOT NULL) AS c_name,
      |  max_by(c_acctbal, rev * 100000000 + rid)
      |    FILTER (c_acctbal IS NOT NULL) AS c_acctbal,
      |  max_by(c_mktsegment, rev * 100000000 + rid)
      |    FILTER (c_mktsegment IS NOT NULL) AS c_mktsegment
      |FROM m GROUP BY cluster
      |ORDER BY cluster""".stripMargin

  /** l-diversity audit ([[graft.operators.Privacy.lDiversityAudit]])
    * on the q131 generalization's level-1 groups: quasi-identifiers
    * (c_nationkey, floor(c_acctbal/1000)), sensitive attribute
    * c_mktsegment, l = 3. k-anonymity bounds group SIZE; this audits
    * what k alone misses — a group whose members all share one
    * sensitive value leaks it regardless of size.
    */
  def q180LDiversity(s: SparkSession, dir: String): DataFrame =
    graft.operators.Privacy.lDiversityAudit(
        Tables.customer(s, dir),
        Seq(col("c_nationkey"),
          floor(col("c_acctbal") / 1000.0).cast(org.apache.spark.sql.types.LongType)),
        Seq("c_nationkey", "bal_bucket"), "c_mktsegment", l = 3)
      .orderBy("c_nationkey", "bal_bucket")

  val q180Sql: String =
    """SELECT c_nationkey,
      |  CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_sensitive,
      |  CAST(CASE WHEN count(DISTINCT c_mktsegment) >= 3 THEN 1 ELSE 0 END AS INT) AS l_diverse
      |FROM customer
      |GROUP BY c_nationkey, bal_bucket
      |ORDER BY c_nationkey, bal_bucket""".stripMargin

  /** t-closeness audit ([[graft.operators.Privacy.tClosenessAudit]])
    * on q180's exact release shape (QI = nation × balance bucket,
    * sensitive = market segment), threshold t = 0.15: the
    * total-variation distance between each group's segment
    * distribution and the global one, cross-multiplied to exact
    * integers. The complementary verdict to q180 — a group can pass
    * l-diversity (≥ 3 segments present) and still fail here by being
    * 90% one segment. The oracle replays every cell count, the
    * complement identity for absent values, and the HUGEINT integral
    * division.
    */
  def q186TCloseness(s: SparkSession, dir: String): DataFrame =
    graft.operators.Privacy.tClosenessAudit(
        Tables.customer(s, dir),
        Seq(col("c_nationkey"),
          floor(col("c_acctbal") / 1000.0).cast(org.apache.spark.sql.types.LongType)),
        Seq("c_nationkey", "bal_bucket"), "c_mktsegment", tScaled = 150000L)
      .orderBy("c_nationkey", "bal_bucket")

  val q186Sql: String =
    """WITH cell AS (
      |  SELECT c_nationkey, CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
      |    c_mktsegment AS v, CAST(count(*) AS HUGEINT) AS c
      |  FROM customer GROUP BY 1, 2, 3),
      |gv AS (SELECT v, sum(c) AS cv FROM cell GROUP BY v),
      |tot AS (SELECT sum(cv) AS ntot FROM gv),
      |grp AS (
      |  SELECT c_nationkey, bal_bucket, sum(cell.c) AS ng, sum(gv.cv) AS cvp
      |  FROM cell JOIN gv USING (v)
      |  GROUP BY 1, 2)
      |SELECT cell.c_nationkey, cell.bal_bucket,
      |  CAST(grp.ng AS BIGINT) AS n_rows,
      |  CAST(((sum(abs(cell.c * tot.ntot - gv.cv * grp.ng))
      |        + grp.ng * (tot.ntot - grp.cvp)) * 1000000)
      |    // (2 * grp.ng * tot.ntot) AS BIGINT) AS tvd_scaled,
      |  CAST(CASE WHEN ((sum(abs(cell.c * tot.ntot - gv.cv * grp.ng))
      |        + grp.ng * (tot.ntot - grp.cvp)) * 1000000)
      |    // (2 * grp.ng * tot.ntot) <= 150000 THEN 1 ELSE 0 END AS INT) AS t_close
      |FROM cell JOIN gv USING (v)
      |JOIN grp ON grp.c_nationkey = cell.c_nationkey
      |  AND grp.bal_bucket = cell.bal_bucket
      |CROSS JOIN tot
      |GROUP BY cell.c_nationkey, cell.bal_bucket, grp.ng, grp.cvp, tot.ntot
      |ORDER BY cell.c_nationkey, cell.bal_bucket""".stripMargin

  /** Benford first-digit audit
    * ([[graft.operators.Profiling.benfordAudit]]) of order totals:
    * observed first-significant-digit shares (exact integer ppm) vs
    * the public Benford constants — the fabricated-data screen. The
    * fixture's uniform-ish totals genuinely DEVIATE from Benford,
    * which is what the audit is for; the oracle replays digit
    * extraction (string-of-BIGINT, never a formatted double), counts
    * and every ppm division.
    */
  def q206Benford(s: SparkSession, dir: String): DataFrame =
    graft.operators.Profiling.benfordAudit(
      Tables.orders(s, dir), "o_totalprice")

  val q206Sql: String =
    """WITH obs AS (
      |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
      |      1, 1) AS INT) AS digit,
      |    CAST(count(*) AS BIGINT) AS n_obs
      |  FROM orders
      |  WHERE o_totalprice >= 1 AND o_totalprice < 9.223372036854775e18
      |  GROUP BY 1),
      |n AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs),
      |e AS (
      |  SELECT unnest([1,2,3,4,5,6,7,8,9]) AS digit,
      |    unnest([301030,176091,124939,96910,79181,66947,57992,51153,45757])
      |      AS expected_ppm)
      |SELECT e.digit,
      |  COALESCE(o.n_obs, 0) AS n_obs,
      |  CAST((COALESCE(o.n_obs, 0) * 1000000) // n.n AS BIGINT) AS obs_ppm,
      |  CAST(e.expected_ppm AS BIGINT) AS expected_ppm,
      |  CAST(abs((COALESCE(o.n_obs, 0) * 1000000) // n.n - e.expected_ppm)
      |    AS BIGINT) AS dev_ppm
      |FROM e LEFT JOIN obs o USING (digit) CROSS JOIN n
      |ORDER BY e.digit""".stripMargin

  val queries: Map[String, Q] = Map(
    "q206_benford_audit"  -> q206Benford _,
    "q186_t_closeness"    -> q186TCloseness _,
    "q180_l_diversity"    -> q180LDiversity _,
    "q133_golden_records" -> q133GoldenRecords _,
    "q131_k_anonymity" -> q131KAnonymity _,
    "q128_winsorize"  -> q128Winsorize _,
    "q126_dq_audit"   -> q126DqAudit _,
    "q14_date_rescue" -> q14DateRescue _,
    "q15_temporal"    -> q15Temporal _,
    "q16_inventory"   -> q16Inventory _,
    "q17_read_path"   -> q17ReadPath _,
    "q36_json_extract" -> q36JsonExtract _,
    "q71_geocode_enrich" -> q71GeocodeEnrich _,
    "q106_category_drift" -> q106CategoryDrift _,
    "q107_pseudonymize"   -> q107Pseudonymize _)

  val oracle: Map[String, String] = Map(
    "q206_benford_audit"  -> q206Sql,
    "q186_t_closeness"    -> q186Sql,
    "q180_l_diversity"    -> q180Sql,
    "q133_golden_records" -> q133Sql,
    "q131_k_anonymity" -> q131Sql,
    "q128_winsorize"  -> q128Sql,
    "q126_dq_audit"   -> q126Sql,
    "q14_date_rescue" -> q14Sql,
    "q15_temporal"    -> q15Sql,
    "q16_inventory"   -> q16Sql,
    "q17_read_path"   -> q17Sql,
    "q36_json_extract" -> q36Sql,
    "q71_geocode_enrich" -> q71Sql,
    "q106_category_drift" -> q106Sql,
    "q107_pseudonymize"   -> q107Sql)
}
