package graft.tools

import org.apache.spark.sql.SparkSession

/** Targeted scaling-curve bench: the [[graft.Bench]] measurement
  * protocol (noop sink, warm run, best-of-2, cache drop per sample)
  * over a comma-separated subset of `SparkEntry.queries` — for slope
  * probes at extra scale points where running the full 200+-query
  * suite would add hours for no information.
  *
  * Usage: runMain graft.tools.BenchSubset <sfDir> <q1,q2,...>
  * Prints one JSON line {"sf":..., "queries":{name:sec,...}}.
  * Names may be prefixes (the Verify subset convention).
  */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, list) = args.take(2)
    val wanted = list.split(",").map(_.trim).filter(_.nonEmpty)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val selected = graft.SparkEntry.queries.filter { case (n, _) =>
      wanted.exists(w => n == w || n.startsWith(w + "_") || n.startsWith(w))
    }.toSeq.sortBy(_._1)
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        name: String): Boolean =
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench-subset] $name failed: ${e.getMessage}")
        false
      }
    // drop BOTH cache surfaces between samples (the graft.Bench
    // discipline): the SQL cache and the block-manager blocks left by
    // localCheckpoint — surviving checkpoint blocks from earlier
    // queries in a shared JVM inflate later timings (BENCH_NOTES R14.3)
    // blocking=true so each timed sample starts from fully-released
    // state (r14 ADVICE — same rationale as graft.Bench.dropRunState)
    def dropRunState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    val results = selected.map { case (name, fn) =>
      dropRunState()
      run(fn, name) // warm
      val samples = (1 to 2).map { _ =>
        dropRunState()
        val t0 = System.nanoTime()
        val ok = run(fn, name)
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      name -> (if (samples.forall(_ >= 0)) samples.min else -1.0)
    }
    def fmt(v: Double): String =
      if (v < 0) "-1"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"sf":"$sfDir","queries":${
      results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
