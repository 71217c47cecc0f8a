package graft

import org.apache.spark.sql.functions._

/** Dev-only micro-profiler for individual queries: runs each named
  * query N times through the noop sink in a properly-forked JVM (the
  * REPL's class-loading breaks whole-stage codegen and inflates
  * numbers). Usage: runMain graft.DevProf <sfDir> <n> <query...>
  */
object DevProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val names = if (args.length > 2) args.drop(2).toSeq else SparkEntry.queries.keys.toSeq
    val spark = GraftSession.local(32)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val run = si.taskMetrics.executorRunTime
        val cpu = si.taskMetrics.executorCpuTime / 1000000
        if (run > 200)
          println(f"[stage] id=${si.stageId} tasks=${si.numTasks} " +
            f"runTimeMs=$run cpuMs=$cpu name=${si.name.take(80)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to n).map { i =>
        spark.catalog.clearCache()
        println(s"[devprof] --- $name run $i")
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[devprof] $name: ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
