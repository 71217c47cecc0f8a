package graft

import graft.functions.GraftSqlFunctions
import graft.sources.Tables

class SqlFunctionsSpec extends SparkSpec {

  test("registered SQL functions work in spark.sql text queries") {
    GraftSqlFunctions.registerAll(spark)
    Tables.registerAll(spark, sfDir)

    val r1 = spark.sql(
      "SELECT rescue_event_date('2024'), rescue_event_date('2024-06'), " +
        "rescue_event_date('2024-06-01/2024-06-03')").collect()(0)
    assert(r1.getString(0) == "2024-01-01")
    assert(r1.getString(1) == "2024-06-01")
    assert(r1.getString(2) == "2024-06-01")

    val r2 = spark.sql(
      "SELECT token_count(text) AS n, lang_id(text) AS lang " +
        "FROM documents WHERE doc_id = 0").collect()(0)
    assert(r2.getInt(0) > 0)
    assert(Set("en", "es", "de", "fr", "zh", "und").contains(r2.getString(1)))

    val r3 = spark.sql(
      "SELECT vec_cosine(embedding, embedding) AS c FROM embeddings WHERE vec_id = 0")
      .collect()(0)
    assert(math.abs(r3.getDouble(0) - 1.0) < 1e-12)

    val r4 = spark.sql(
      "SELECT parse_event_ts('2024-02-10T08:00:00-05:00') AS ts").collect()(0)
    assert(r4.getTimestamp(0).toInstant.toString == "2024-02-10T13:00:00Z")

    // full pipeline shape in pure SQL
    val pipeline = spark.sql(
      """SELECT day_of_week_mon0(parse_event_ts('2024-03-08')) AS dow,
        |  table_name_for_day(DATE'2024-03-08') AS tbl""".stripMargin).collect()(0)
    assert(pipeline.getInt(0) == 4) // Friday
    assert(pipeline.getString(1) == "march082024")
  }

  test("md5 fingerprint family is SQL-reachable and matches built-in md5 semantics") {
    GraftSqlFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT md5_hash60('hello') AS h,
        |  conv(substring(md5('hello'), 1, 15), 16, 10) AS expect_h,
        |  doc_fingerprint_md5('  Hello   World ') AS fp,
        |  md5('hello world') AS expect_fp,
        |  simhash_md5('hello world') AS sh_hof,
        |  simhash_md5_native('hello world') AS sh_nat""".stripMargin).collect()(0)
    assert(r.getLong(0).toString == r.getString(1))
    assert(r.getString(2) == r.getString(3)) // normalize: lower + ws-collapse
    assert(r.getLong(4) == r.getLong(5))     // HOF == codegen native
    assert(r.getLong(4) >= 0L && r.getLong(4) < (1L << 60))
  }

  test("argument arity errors are clear") {
    GraftSqlFunctions.registerAll(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT token_count('a', 'b')").collect()
    }
    assert(e.getMessage.contains("expected 1 argument") ||
      e.getMessage.toLowerCase.contains("argument"))
  }
}
