package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}

/** SQL-surface registration: expose the graft function library to
  * `spark.sql(...)` text queries (SURVEY.md §7.1 — FunctionRegistry as
  * the style choice for reusable native functions).
  *
  * Every function is a composition of built-in Catalyst expressions
  * (the Column functions in [[DateTimeFunctions]]/[[TextFunctions]]/
  * [[VectorFunctions]]), so registration is plan-level sugar — no UDF
  * tax, full optimizer visibility.
  *
  * {{{
  *   GraftSqlFunctions.registerAll(spark)
  *   spark.sql("SELECT rescue_event_date(eventDate) FROM raw")
  * }}}
  */
object GraftSqlFunctions {

  private def fn1(f: Column => Column): Seq[Expression] => Expression = {
    case Seq(e) => ExpressionUtils.expression(f(ExpressionUtils.column(e)))
    case other => throw new IllegalArgumentException(
      s"expected 1 argument, got ${other.length}")
  }

  private def fn2(f: (Column, Column) => Column): Seq[Expression] => Expression = {
    case Seq(a, b) => ExpressionUtils.expression(
      f(ExpressionUtils.column(a), ExpressionUtils.column(b)))
    case other => throw new IllegalArgumentException(
      s"expected 2 arguments, got ${other.length}")
  }

  /** name → builder for every registered SQL function. */
  val all: Map[String, Seq[Expression] => Expression] = Map(
    // date/time (C1-C9)
    "rescue_event_date"  -> fn1(DateTimeFunctions.rescueEventDate),
    "parse_event_ts"     -> fn1(DateTimeFunctions.parseEventTs),
    "day_of_week_mon0"   -> fn1(DateTimeFunctions.dayOfWeekMon0),
    "time_only"          -> fn1(DateTimeFunctions.timeOnly),
    "coerce_count"       -> fn1(DateTimeFunctions.coerceCount),
    "table_name_for_day" -> fn1(DateTimeFunctions.tableNameForDay),
    "table_name_for_month" -> fn1(DateTimeFunctions.tableNameForMonth),
    "first_sunday_of_year" -> fn1(DateTimeFunctions.firstSundayOfYear),
    // text analysis
    "token_count"        -> fn1(TextFunctions.tokenCount),
    "bpeish_token_count" -> fn1(TextFunctions.bpeishTokenCount),
    "punct_ratio"        -> fn1(TextFunctions.punctRatio),
    "mean_token_length"  -> fn1(TextFunctions.meanTokenLength),
    "quality_score"      -> fn1(TextFunctions.qualityScore),
    "lang_id"            -> fn1(TextFunctions.langIdHeuristic),
    "doc_fingerprint"    -> fn1(TextFunctions.docFingerprint),
    "simhash64"          -> fn1(TextFunctions.simHash64),
    "simhash64_native"   -> fn1(graft.expressions.SimHash64Expression.simhash64Native),
    // vectors
    "vec_dot"            -> fn2(VectorFunctions.dot),
    "vec_cosine"         -> fn2(VectorFunctions.cosine),
    "vec_euclidean"      -> fn2(VectorFunctions.euclidean),
    "hamming64"          -> fn2(VectorFunctions.hammingLong),
    // cross-engine (md5-derived) fingerprint family — auditable from
    // any ANSI engine with md5()
    "md5_hash60"          -> fn1(TextFunctions.md5Hash60),
    "doc_fingerprint_md5" -> fn1(TextFunctions.docFingerprintMd5),
    "simhash_md5"         -> fn1(TextFunctions.simHashMd5),
    "simhash_md5_native"  -> fn1(graft.expressions.SimHashMd5Expression.simhashMd5Native))

  /** Register every function as a session temp function. */
  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
