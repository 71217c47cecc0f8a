package graft.tools

/** Dev-only phase splitter: for one query, time (a) DataFrame
  * construction, (b) analysis+optimization+physical planning, and
  * (c) execution through the noop sink — to attribute wall time
  * between driver-side plan work and cluster work.
  *
  * Usage: runMain graft.tools.PhaseProbe <sfDir> <n> <query...>
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val names = args.drop(2).toSeq
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to n).foreach { i =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        println(f"[phase] $name run $i: build=${(t1 - t0) / 1e9}%.2f " +
          f"plan=${(t2 - t1) / 1e9}%.2f exec=${(t3 - t2) / 1e9}%.2f")
      }
    }
    spark.stop()
  }
}
