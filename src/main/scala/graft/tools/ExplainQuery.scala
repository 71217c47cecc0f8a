package graft.tools

/** Post-execution plan dump for one query at one scale: runs the query
  * through the noop sink (so AQE finalizes its runtime decisions) and
  * prints the FINAL executed plan — the tool for adjudicating
  * scale-dependent plan-regime flips the static explain can't show.
  *
  * Usage: runMain graft.tools.ExplainQuery <sfDir> <queryName>
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    println(s"=== $name @ $sfDir — final adaptive plan ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
