package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each functional area contributes a `queries` map (name → plan builder)
  * and an `oracle` map (name → equivalent DuckDB SQL); this object is the
  * concatenation. Every oracle-checked query follows the determinism rules
  * in [[graft.queries.Det]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.EtlQueries.queries ++
      graft.queries.TrainingData.queries ++
      graft.queries.StorageQueries.queries ++
      graft.queries.StreamingQueries.queries ++
      graft.queries.GeoQueries.queries ++
      graft.queries.CurationQueries.queries ++
      graft.queries.SeriesQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.EtlQueries.oracle ++
      graft.queries.TrainingData.oracle ++
      graft.queries.StorageQueries.oracle ++
      graft.queries.StreamingQueries.oracle ++
      graft.queries.GeoQueries.oracle ++
      graft.queries.CurationQueries.oracle ++
      graft.queries.SeriesQueries.oracle
}
