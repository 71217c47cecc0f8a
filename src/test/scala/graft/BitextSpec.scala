package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Bitext

class BitextSpec extends SparkSpec {

  private val vecSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  private def vecs(rows: (Long, Seq[Float])*): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(
          rows.toList.map { case (i, v) => Row(i, v) }).asJava),
      vecSchema)

  test("clean translation pairs are mutual; the decoy is not") {
    // src 0 ↔ tgt 10 and src 2 ↔ tgt 12 are near-identical pairs on
    // orthogonal axes; tgt 14 is a decoy close to BOTH src vectors'
    // directions but nearer to 0's axis — 0 still prefers 10 (higher
    // cosine to its true twin), so 14 must win no mutual pair
    val src = vecs(
      0L -> Seq(1f, 0f, 0f, 0f),
      2L -> Seq(0f, 1f, 0f, 0f))
    val tgt = vecs(
      10L -> Seq(0.99f, 0.01f, 0f, 0f),
      12L -> Seq(0.02f, 0.98f, 0f, 0f),
      14L -> Seq(0.8f, 0.6f, 0f, 0f))
    val got = Bitext
      .marginMutualPairs(src, tgt, "vec_id", "embedding", k = 2)
      .orderBy("src_id").collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("tgt_id")))
    assert(got.toSeq == Seq((0L, 10L), (2L, 12L)))
  }

  test("margin matches the hand formula on a 1-NN case") {
    // k=1: avgK(x) = cos(x, nn(x)), so margin(x, y) for the mutual
    // pair is 2·cos / (cos + cos) = 1.0 exactly
    val src = vecs(0L -> Seq(1f, 0f))
    val tgt = vecs(10L -> Seq(1f, 0f), 12L -> Seq(0f, 1f))
    val rows = Bitext
      .marginMutualPairs(src, tgt, "vec_id", "embedding", k = 1)
      .collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("tgt_id") == 10L)
    assert(rows.head.getAs[Double]("margin") == 1.0)
  }

  test("a hub vector cannot take two partners (mutual argmax is 1:1)") {
    // both src vectors' nearest tgt is the hub 10; only the closer one
    // may pair with it, the other pairs with nothing (its best is
    // taken) — mutual selection, not greedy nearest
    val src = vecs(
      0L -> Seq(1f, 0f, 0f),
      2L -> Seq(0.9f, 0.1f, 0f))
    val tgt = vecs(10L -> Seq(1f, 0.001f, 0f))
    val got = Bitext
      .marginMutualPairs(src, tgt, "vec_id", "embedding", k = 1)
      .collect().map(r =>
        (r.getAs[Long]("src_id"), r.getAs[Long]("tgt_id")))
    assert(got.length == 1)
    assert(got.head._2 == 10L)
    // and the winner is the higher-cosine partner: src 0
    assert(got.head._1 == 0L)
  }

  test("results are invariant under input partitioning") {
    val all = (0L until 40L).map(i =>
      i -> Seq.tabulate(8)(d => math.sin(i * 31 + d * 7).toFloat))
    val src = vecs(all.filter(_._1 % 2 == 0): _*)
    val tgt = vecs(all.filter(_._1 % 2 == 1): _*)
    val a = Bitext.marginMutualPairs(src, tgt, "vec_id", "embedding", 4)
      .orderBy("src_id").collect().toSeq
    val b = Bitext.marginMutualPairs(
        src.repartition(7), tgt.repartition(5), "vec_id", "embedding", 4)
      .orderBy("src_id").collect().toSeq
    assert(a == b)
  }

  test("IVF arms with exhaustive probing are bit-identical to the exact arms") {
    val all = (0L until 80L).map(i =>
      i -> Seq.tabulate(8)(d => math.sin(i * 17 + d * 5).toFloat))
    val src = vecs(all.filter(_._1 % 2 == 0): _*)
    val tgt = vecs(all.filter(_._1 % 2 == 1): _*)
    val exact = Bitext.marginMutualPairs(src, tgt, "vec_id", "embedding", 4)
      .orderBy("src_id").collect().toSeq
    val ivf = Bitext.marginMutualPairsIvf(src, tgt, "vec_id", "embedding",
        4, nlist = 8, nprobe = 8)
      .orderBy("src_id").collect().toSeq
    assert(exact.nonEmpty && exact == ivf)
  }

  test("IVF arms with partial probing keep the planted tight pairs") {
    // two well-separated clusters; each src vector's twin sits in the
    // same cluster, so nprobe=2 of nlist=4 must still find every pair
    def cluster(base: Long, axis: Int, n: Int) = (0 until n).map { j =>
      (base + 2 * j) -> Seq.tabulate(8)(d =>
        (if (d == axis) 1f else 0f) + 0.01f * ((base + 2 * j + d) % 5))
    }
    val srcV = cluster(0L, 0, 10) ++ cluster(100L, 4, 10)
    val tgtV = (cluster(1L, 0, 10) ++ cluster(101L, 4, 10))
    val src = vecs(srcV: _*)
    val tgt = vecs(tgtV: _*)
    val exact = Bitext.marginMutualPairs(src, tgt, "vec_id", "embedding", 3)
      .collect().map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("tgt_id"))).toSet
    val ivf = Bitext.marginMutualPairsIvf(src, tgt, "vec_id", "embedding",
        3, nlist = 4, nprobe = 2)
      .collect().map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("tgt_id"))).toSet
    assert(exact.nonEmpty)
    // every exact pair is within-cluster by construction; the probed
    // cells cover the clusters, so recall is total on this fixture
    assert(ivf == exact)
  }

  test("pairs come only from the top-k candidate pool") {
    val all = (0L until 60L).map(i =>
      i -> Seq.tabulate(8)(d => math.cos(i * 13 + d * 3).toFloat))
    val src = vecs(all.filter(_._1 % 2 == 0): _*)
    val tgt = vecs(all.filter(_._1 % 2 == 1): _*)
    val fwd = graft.operators.Similarity
      .cosineTopKExact(tgt, src, "vec_id", "embedding", 4)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bwd = graft.operators.Similarity
      .cosineTopKExact(src, tgt, "vec_id", "embedding", 4)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Bitext.marginMutualPairs(src, tgt, "vec_id", "embedding", 4)
      .collect().map(r =>
        (r.getAs[Long]("src_id"), r.getAs[Long]("tgt_id")))
    assert(got.nonEmpty)
    got.foreach { case (s, t) =>
      assert(fwd.contains((s, t)) || bwd.contains((t, s)))
    }
    // 1:1 on both sides
    assert(got.map(_._1).distinct.length == got.length)
    assert(got.map(_._2).distinct.length == got.length)
  }
}
