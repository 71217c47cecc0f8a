package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Ranking, Sampling, TextAnalysis}

/** Batch-3 round-9 operators: incremental components, postings-index
  * BM25, rendezvous sharding, Zipf slope.
  */
class IncrementalOpsSpec extends SparkSpec {

  test("incrementalComponents == full recompute: merge, attach, untouched") {
    import spark.implicits._
    // base: {1-2-3} and {10-11}; 20 is a base singleton
    val baseEdges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val baseAssign = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("id")
      .join(Dedup.connectedComponents(baseEdges), Seq("id"), "left_outer")
      .select(col("id"),
        coalesce(col("component_id"), col("id")).as("component"))
    // increment: MERGE the two components (3-10), ATTACH new node 30
    // to 20, and a fully-new pair 40-41; 1-2-3/10-11 internals untouched
    val inc = Seq((3L, 10L), (30L, 20L), (40L, 41L)).toDF("id_a", "id_b")
    val got = Dedup.incrementalComponents(
      baseAssign, "id", "component", inc, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // full recompute over base ∪ increment (min-label canonical)
    val full = Dedup.connectedComponents(baseEdges.unionByName(inc))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == full)
    assert(got(11L) == 1L)  // merged across the new 3-10 edge
    assert(got(30L) == 20L) // attached newcomer
    assert(got(41L) == 40L) // brand-new pair
  }

  test("incrementalComponents with an empty increment is the identity") {
    import spark.implicits._
    val baseAssign = Seq((5L, 5L), (6L, 5L)).toDF("id", "component")
    val inc = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val got = Dedup.incrementalComponents(
      baseAssign, "id", "component", inc, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(5L -> 5L, 6L -> 5L))
  }

  test("postings-index BM25 answers bit-identically to the direct scan " +
    "and prunes the probe to the query terms' buckets") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-postings").toString + "/ix"
    Ranking.writePostingsIndex(docs, "doc_id", "text", dir, nBuckets = 32)
    val terms = Seq("merge", "scan")
    val direct = Ranking.bm25TopK(docs, "doc_id", "text", terms, k = 12)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val probe = Ranking.bm25TopKFromIndex(spark, dir, "doc_id", terms,
      k = 12, nBuckets = 32)
    val viaIndex = probe
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(viaIndex.toSeq == direct.toSeq) // scores bit-identical
    // the probe scan is partition-pruned to the terms' buckets
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("tb"),
      s"expected a tb PartitionFilters prune in:\n$plan")
  }

  test("index manifests: one _graft_manifest convention across " +
    "postings/minhash/ivf, fail-fast parameter handshake, append bumps") {
    import spark.implicits._
    import graft.sinks.Pruning
    val base = java.nio.file.Files
      .createTempDirectory("graft-ixmeta").toString

    // postings: constants live in the manifest; wrong-bucket probe throws
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val pix = s"$base/postings"
    Ranking.writePostingsIndex(docs, "doc_id", "text", pix, nBuckets = 32)
    val pm = Pruning.readIndexMeta(spark, pix).get
    assert(pm.kind == "postings" && pm.partCol == "tb")
    assert(pm.params("n_buckets") == 32L && pm.params("n_docs") > 0L &&
      pm.params("sum_dl") > 0L)
    intercept[IllegalArgumentException] {
      Ranking.bm25TopKFromIndex(spark, pix, "doc_id", Seq("merge"),
        k = 5, nBuckets = 16)
    }

    // minhash: handshake on (shingle, hashes, bands); append bumps n_docs
    val corpus = Seq((1L, "the quick brown fox jumps over the lazy dog " +
        "and then runs far away to the old barn"),
      (2L, "completely different content about winter snow storms " +
        "blowing across the frozen plains at night")).toDF("doc_id", "text")
    val mix = s"$base/minhash"
    Dedup.writeMinHashIndex(corpus, mix, "doc_id", "text")
    val mm = Pruning.readIndexMeta(spark, mix).get
    assert(mm.kind == "minhash" && mm.params("n_docs") == 2L &&
      mm.params("bands") == 24L)
    intercept[IllegalArgumentException] {
      Dedup.incrementalNearDupPairs(corpus, mix, "doc_id", "text",
        bands = 12)
    }
    Dedup.appendToMinHashIndex(
      Seq((3L, "a third unrelated document about summer harvests in " +
        "the valley beyond the river bend")).toDF("doc_id", "text"),
      mix, "doc_id", "text")
    assert(Pruning.readIndexMeta(spark, mix).get.params("n_docs") == 3L)

    // ivf: nlist recorded, append bumps n_vectors, wrong-kind probe throws
    val emb = (1 to 40).map(i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 7 + d) % 13).toFloat)))
      .toDF("vec_id", "embedding")
    val vix = s"$base/ivf"
    graft.operators.Similarity.writeIvfIndex(
      emb, vix, "vec_id", "embedding", nlist = 4)
    val vm = Pruning.readIndexMeta(spark, vix).get
    assert(vm.kind == "ivf" && vm.params("nlist") == 4L &&
      vm.params("n_vectors") == 40L)
    graft.operators.Similarity.appendToIvfIndex(spark, vix,
      Seq((99L, Array.tabulate(8)(_.toFloat))).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    assert(Pruning.readIndexMeta(spark, vix).get.params("n_vectors") == 41L)
    intercept[IllegalArgumentException] {
      graft.operators.Similarity.ivfTopKFromIndex(spark, mix,
        emb.limit(1), "vec_id", "embedding", k = 3)
    }
  }

  test("rendezvousAssign: adding a shard never moves a row laterally") {
    import spark.implicits._
    val df = (1L to 500L).toDF("id")
    val five = Seq("s0", "s1", "s2", "s3", "s4")
    val a = Sampling.rendezvousAssign(df, "id", five)
      .withColumnRenamed("shard", "a")
    val b = Sampling.rendezvousAssign(df, "id", five :+ "s5")
      .withColumnRenamed("shard", "b")
    val j = a.join(b, Seq("id")).collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(j.forall { case (x, y) => x == y || y == "s5" })
    val moved = j.count { case (_, y) => y == "s5" }
    // ~1/6 expected; generous band
    assert(moved > 500 / 12 && moved < 500 / 3)
    // deterministic under layout
    val a2 = Sampling.rendezvousAssign(df.repartition(7), "id", five)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.collect().map(r => r.getLong(0) -> r.getString(1)).toMap == a2)
  }

  test("zipfSlope: an exact power-of-two Zipf vocabulary slopes -10^6") {
    import spark.implicits._
    // term 'aa' 4x, 'bb' 2x → ranks 1,2; micro-log2 coords are exact
    // powers of two, so the two-point OLS is exactly −1e6 ppm
    val docs = Seq((1L, "g", "aa aa aa aa bb bb")).toDF("id", "g", "text")
    val got = TextAnalysis.zipfSlope(docs, "g", "text").collect().head
    assert(got.getLong(1) == 2L && got.getLong(2) == -1000000L)
    // a flat (all-equal-frequency) vocabulary slopes exactly 0
    val flat = Seq((1L, "g", "x y z w")).toDF("id", "g", "text")
    val f = TextAnalysis.zipfSlope(flat, "g", "text").collect().head
    assert(f.getLong(2) == 0L)
  }
}
