package graft.tools

import org.apache.spark.sql.functions._

/** Slope probe for semi-hard negative mining at scaled IVF geometry:
  * measures [[graft.operators.Selection.hardNegativesIvf]] on a given
  * sfDir with caller-chosen (k, nlist, nprobe) — the nlist ≈ √N regime
  * the q238 brute-force baseline cannot express (its oracle needs the
  * exhaustive-probing geometry). Anchors are 2% of the corpus
  * (vec_id % 50 == 0) so the query side scales with the data; each
  * anchor's labeled positive is its id-successor. Bench protocol:
  * noop sink, warm run, best-of-2, cache drop (the BitextProbe twin).
  *
  * Usage: runMain graft.tools.HardNegProbe <sfDir> <k> <nlist> <nprobe>
  */
object HardNegProbe {
  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println(
        "usage: HardNegProbe <sfDir> <k> <nlist> <nprobe>")
      sys.exit(1)
    }
    val Array(sfDir, k, nlist, nprobe) = args.take(4)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def run(): Unit = {
      val emb = graft.sources.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
      val anchors = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
      val pos = anchors.select(col("vec_id").as("query_id"),
        (col("vec_id") + 1).as("neighbor_id"))
      graft.operators.Selection.hardNegativesIvf(
          emb, anchors, pos, "vec_id", "embedding", k.toInt,
          semiHard = true, nlist = nlist.toInt, nprobe = nprobe.toInt)
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
