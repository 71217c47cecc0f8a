package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  *
  * Each query is forced through the `noop` sink — a plain `count()`
  * would let Catalyst prune every computed column and under-measure
  * projection-heavy queries (text stats, temporal derivation).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus.toInt)
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        name: String): Unit =
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
    val results = SparkEntry.queries.map { case (name, fn) =>
      // warm run: whole-stage codegen compilation, JIT, parquet footers
      // (steady-state throughput is what a long-running cluster job sees)
      run(fn, name)
      // drop caches persisted by operators during the warm run so one
      // query's cached state doesn't tax the next query's GC
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      run(fn, name)
      name -> (System.nanoTime() - t0) / 1e9
    }
    spark.catalog.clearCache()
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
