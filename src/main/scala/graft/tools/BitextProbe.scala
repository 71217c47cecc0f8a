package graft.tools

import org.apache.spark.sql.functions._

/** Slope probe for bitext mining at scaled IVF geometry: measures
  * [[graft.operators.Bitext.marginMutualPairsIvf]] on a given sfDir
  * with caller-chosen (k, nlist, nprobe) — the nlist ≈ √N regime the
  * q235 brute-force baseline cannot express (its oracle needs the
  * exhaustive-probing geometry). Bench protocol: noop sink, warm run,
  * best-of-2, cache drop.
  *
  * Usage: runMain graft.tools.BitextProbe <sfDir> <k> <nlist> <nprobe>
  */
object BitextProbe {
  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println(
        "usage: BitextProbe <sfDir> <k> <nlist> <nprobe>")
      sys.exit(1)
    }
    val Array(sfDir, k, nlist, nprobe) = args.take(4)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def run(): Unit = {
      val emb = graft.sources.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
      graft.operators.Bitext.marginMutualPairsIvf(
          emb.filter(pmod(col("vec_id"), lit(2)) === 0),
          emb.filter(pmod(col("vec_id"), lit(2)) === 1),
          "vec_id", "embedding", k.toInt, nlist.toInt, nprobe.toInt)
        .write.format("noop").mode("overwrite").save()
    }
    run() // warm
    val best = (1 to 2).map { _ =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      run()
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"""{"sf":"$sfDir","k":$k,"nlist":$nlist,"nprobe":$nprobe,"sec":$best%.3f}""")
  }
}
