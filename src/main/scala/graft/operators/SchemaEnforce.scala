package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.schema.Occurrence

/** P2: schema enforcement (`/root/reference/monarch_etl/schema.py:28-37`).
  *
  * A deterministic projection that makes every batch union-compatible:
  * missing canonical columns become typed NULLs, present columns are cast
  * to the canonical type, and the output is exactly `finalColumns` in
  * order. Pure plan surgery — zero runtime cost beyond the casts.
  */
object SchemaEnforce {

  def enforceSchema(df: DataFrame): DataFrame = {
    val present = df.columns.toSet
    df.select(Occurrence.finalColumns.map { c =>
      val t = Occurrence.columnTypes(c)
      if (present.contains(c)) col(c).cast(t).as(c)
      else lit(null).cast(t).as(c)
    }: _*)
  }

  /** Generic form of [[enforceSchema]] for any canonical column list
    * (e.g. downstream of a [[graft.sources.Ingest.readEvolved]]
    * schema-merged read): present columns keep their type, missing
    * ones become string NULLs. Pass `types` to pin the type of
    * columns that may be absent.
    */
  def conform(df: DataFrame, columns: Seq[String],
      types: Map[String, String] = Map.empty): DataFrame = {
    val present = df.columns.toSet
    df.select(columns.map { c =>
      if (present.contains(c))
        types.get(c).map(col(c).cast(_).as(c)).getOrElse(col(c))
      else lit(null).cast(types.getOrElse(c, "string")).as(c)
    }: _*)
  }
}
