package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Sampling, Selection, WordPiece}

class SelectionSpec extends SparkSpec {

  private def frame(schema: StructType, rows: Row*): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows.toList).asJava),
      schema)

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private val pairSchema = StructType(Seq(
    StructField("id_a", LongType),
    StructField("id_b", LongType)))

  private def docs(ids: Long*): DataFrame =
    frame(docSchema, ids.map(i => Row(i, s"doc $i")): _*)

  private def pairs(ps: (Long, Long)*): DataFrame =
    frame(pairSchema, ps.map { case (a, b) => Row(a, b) }: _*)

  // (vecSchema is defined with the prototypePrune fixtures below)
  private def vecFrame(rows: (Long, Seq[Float])*): DataFrame =
    frame(vecSchema, rows.map { case (i, v) => Row(i, v) }: _*)

  private val pairIdSchema = StructType(Seq(
    StructField("query_id", LongType),
    StructField("neighbor_id", LongType)))

  // ---- hardNegatives ----

  test("hardNegatives excludes self and positives, ranks by cosine") {
    val corpus = vecFrame(
      0L -> Seq(1f, 0f),        // anchor
      1L -> Seq(0.99f, 0.1f),   // labeled positive — must be excluded
      2L -> Seq(0.95f, 0.2f),   // hardest negative
      3L -> Seq(0.5f, 0.5f),
      4L -> Seq(0f, 1f))
    val anchors = corpus.filter(col("vec_id") === 0L)
    val pos = frame(pairIdSchema, Row(0L, 1L))
    val got = Selection.hardNegatives(corpus, anchors, pos,
        "vec_id", "embedding", k = 2, semiHard = false)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank")))
    assert(got.toSeq == Seq((2L, 1), (3L, 2)))
  }

  test("semiHard keeps only negatives below the least-similar positive") {
    val corpus = vecFrame(
      0L -> Seq(1f, 0f),
      1L -> Seq(0.9f, 0.3f),    // positive, cos ≈ 0.949
      2L -> Seq(0.99f, 0.05f),  // HARDER than the positive → banned
      3L -> Seq(0.6f, 0.4f),    // semi-hard, kept
      4L -> Seq(0f, 1f))        // easy, kept
    val anchors = corpus.filter(col("vec_id") === 0L)
    val pos = frame(pairIdSchema, Row(0L, 1L))
    val kept = Selection.hardNegatives(corpus, anchors, pos,
        "vec_id", "embedding", k = 5, semiHard = true)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(kept == Set(3L, 4L))
  }

  test("anchors without positives keep all candidates under semiHard") {
    val corpus = vecFrame(
      0L -> Seq(1f, 0f), 2L -> Seq(0.9f, 0.1f), 4L -> Seq(0f, 1f))
    val anchors = corpus.filter(col("vec_id") === 0L)
    val pos = frame(pairIdSchema) // empty
    val got = Selection.hardNegatives(corpus, anchors, pos,
        "vec_id", "embedding", k = 5, semiHard = true)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(got == Set(2L, 4L))
  }

  test("exclusion happens before ranking: k eligible negatives returned") {
    // 1 anchor, 1 positive that would be rank 1, k=3 — the output must
    // still have 3 rows (the positive must not eat a slot)
    val corpus = vecFrame(
      0L -> Seq(1f, 0f, 0f),
      1L -> Seq(1f, 0.001f, 0f),
      2L -> Seq(0.9f, 0.1f, 0f),
      3L -> Seq(0.8f, 0.2f, 0f),
      4L -> Seq(0.7f, 0.3f, 0f))
    val anchors = corpus.filter(col("vec_id") === 0L)
    val pos = frame(pairIdSchema, Row(0L, 1L))
    val got = Selection.hardNegatives(corpus, anchors, pos,
      "vec_id", "embedding", k = 3, semiHard = false).collect()
    assert(got.length == 3)
    assert(!got.map(_.getAs[Long]("neighbor_id")).contains(1L))
  }

  test("zero-norm corpus vectors are never emitted as negatives") {
    // anchor has only 2 real candidates but k = 4: without the
    // null-cosine filter the zero-norm vectors would fill the missing
    // slots via nulls-last ranking (the r11 ADVICE finding)
    val corpus = vecFrame(
      0L -> Seq(1f, 0f),
      2L -> Seq(0.9f, 0.1f),
      3L -> Seq(0.5f, 0.5f),
      4L -> Seq(0f, 0f),        // zero norm — cosine undefined
      5L -> Seq(0f, 0f))
    val anchors = corpus.filter(col("vec_id") === 0L)
    val got = Selection.hardNegatives(corpus, anchors, frame(pairIdSchema),
      "vec_id", "embedding", k = 4, semiHard = false).collect()
    assert(got.length == 2)
    assert(got.map(_.getAs[Long]("neighbor_id")).toSet == Set(2L, 3L))
    assert(got.forall(!_.isNullAt(2)))
  }

  test("hardNegativesIvf at exhaustive probing == brute-force arm") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val anchors = emb.filter(col("vec_id") < 12)
    val pos = anchors.select(col("vec_id").as("query_id"),
      (col("vec_id") + 12).as("neighbor_id"))
    def rows(df: DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine"), r.getAs[Int]("rank"))).toSet
    val brute = rows(Selection.hardNegatives(
      emb, anchors, pos, "vec_id", "embedding", k = 4, semiHard = true))
    val ivf = rows(Selection.hardNegativesIvf(
      emb, anchors, pos, "vec_id", "embedding", k = 4, semiHard = true,
      nlist = 8, nprobe = 8))
    assert(ivf == brute) // bit-identical: doubles compared exactly
  }

  test("hardNegativesIvf partial probing trades recall for probe volume") {
    // two well-separated cells; centroids are the two lowest ids
    // (centroidSample), so nprobe = 1 from anchor 0 probes cell 0 only
    val corpus = vecFrame(
      0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f),
      2L -> Seq(0.9f, 0.1f), 3L -> Seq(0.8f, 0.2f),
      4L -> Seq(0.1f, 0.9f), 5L -> Seq(0.2f, 0.8f))
    val anchors = corpus.filter(col("vec_id") === 0L)
    def ids(nprobe: Int) = Selection.hardNegativesIvf(
        corpus, anchors, frame(pairIdSchema), "vec_id", "embedding",
        k = 5, semiHard = false, nlist = 2, nprobe = nprobe)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(ids(1) == Set(2L, 3L))                  // own cell only
    assert(ids(2) == Set(1L, 2L, 3L, 4L, 5L))      // exhaustive = all
  }

  // ---- leakageSafeSplit ----

  test("leakageSafeSplit keeps every near-dup component in one split") {
    val d = docs(1L to 40L: _*)
    // one 3-chain component, one pair, rest singletons
    val p = pairs((1L, 2L), (2L, 3L), (5L, 6L))
    val assigned = Selection
      .leakageSafeSplit(d, "doc_id", p,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "group_id", "split").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(assigned.size == 40, "no document may be dropped")
    // component representative = min id; all members share its split
    assert(assigned(1L)._1 == 1L && assigned(2L)._1 == 1L && assigned(3L)._1 == 1L)
    assert(Set(assigned(1L)._2, assigned(2L)._2, assigned(3L)._2).size == 1)
    assert(assigned(5L)._1 == 5L && assigned(6L)._1 == 5L)
    assert(assigned(5L)._2 == assigned(6L)._2)
    assert(assigned(10L)._1 == 10L, "singleton represents itself")
    val leaked = Selection.crossSplitLeaks(
      Selection.leakageSafeSplit(d, "doc_id", p,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)),
      "doc_id", p).head().getLong(0)
    assert(leaked == 0L)
  }

  test("per-document md5Split DOES leak on the same near-dup graph") {
    // the contrast that justifies the operator: a 60-doc chain split
    // per-document must straddle at least one 80/10/10 boundary
    // (deterministic: md5 of the ids is fixed)
    val d = docs(1L to 60L: _*)
    val chain = pairs((1L until 60L).map(i => (i, i + 1)): _*)
    val naive = Sampling.md5Split(d, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val leaked = Selection.crossSplitLeaks(naive, "doc_id", chain)
      .head().getLong(0)
    assert(leaked > 0L,
      "fixture regression: per-doc split no longer leaks — pick other ids")
  }

  // ---- prototypePrune ----

  private val vecSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  test("prototypePrune drops the floor(n/4) most prototypical per cluster") {
    // iters = 0: centroids are the two lowest-id vectors themselves.
    // Cluster 1 (seed v1=(1,0)): v1 cos=1.0, v7 cos≈.9986, v3 cos≈.9939,
    // v4 cos≈.9701 → 4 members, drop floor(4/4)=1 → v1 (rank 1).
    // Cluster 2 (seed v2=(0,1)): v2, v5 → 2 members, drop floor(2/4)=0.
    val v = frame(vecSchema,
      Row(1L, Seq(1.0f, 0.0f)), Row(2L, Seq(0.0f, 1.0f)),
      Row(3L, Seq(0.9f, 0.1f)), Row(4L, Seq(0.8f, 0.2f)),
      Row(5L, Seq(0.1f, 0.9f)), Row(7L, Seq(0.95f, 0.05f)))
    val dropped = Selection.prototypePrune(v, "vec_id", "embedding",
      nlist = 2, iters = 0, dropNum = 1, dropDen = 4)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    assert(dropped == Set((1L, 1)))
  }

  test("prototypePrune rank order follows cosine desc within a cluster") {
    // one cluster (nlist=1, seed v1=(1,0)), 8 members, drop 2/8
    val members = Seq(
      1L -> Seq(1.0f, 0.0f), 2L -> Seq(0.99f, 0.01f),
      3L -> Seq(0.9f, 0.1f), 4L -> Seq(0.8f, 0.2f),
      5L -> Seq(0.7f, 0.3f), 6L -> Seq(0.6f, 0.4f),
      7L -> Seq(0.5f, 0.5f), 8L -> Seq(0.4f, 0.6f))
    val v = frame(vecSchema, members.map { case (i, e) => Row(i, e) }: _*)
    val dropped = Selection.prototypePrune(v, "vec_id", "embedding",
      nlist = 1, iters = 0, dropNum = 1, dropDen = 4)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    assert(dropped == Set((1L, 1), (2L, 2)),
      "the two nearest-the-centroid members drop, in cosine order")
  }

  // ---- fertilityByGroup ----

  private val langSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  test("fertilityByGroup: en-fit vocab, zh charset miss becomes UNK") {
    // en fit slice: words ab(2), cd(1) → multis with cnt>=2: only "ab"
    // vocab = {a,b,c,d, ab}
    val d = frame(langSchema,
      Row(1L, "ab ab cd", "en"),
      Row(2L, "ab xy", "zh"))
    val got = WordPiece.fertilityByGroup(d, "text", "lang",
      col("lang") === "en", maxPieceLen = 4, keepMulti = 16, minCount = 2)
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // en: ab→1 tok, ab→1, cd→2 ⇒ 4 tokens / 3 words
    // zh: ab→1 tok, xy→UNK (x,y not in fit charset) ⇒ 2 tokens / 2 words
    assert(got.toSeq == Seq(
      ("en", 3L, 0L, 4L, 4.0 / 3.0),
      ("zh", 2L, 1L, 2L, 1.0)))
  }

  // ---- dsirTopK ----

  test("dsirTopK ranks target-like documents first, ties to lower id") {
    val d = frame(langSchema,
      Row(1L, "alpha alpha", "t"),
      Row(2L, "alpha beta", "t"),
      Row(3L, "beta beta", "r"),
      Row(4L, "alpha beta", "r"),
      Row(5L, "beta beta beta", "r"))
    val got = Selection.dsirTopK(d, "doc_id", "text",
      target = col("lang") === "t", nBuckets = 64, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // doc 1 (pure alpha — the target-distinctive token) must rank first
    assert(got.head._1 == 1L)
    // docs 2 and 4 have identical text → identical weight; tie breaks
    // to the lower id, and both outrank the pure-beta docs
    val order = got.map(_._1).toSeq
    assert(order.indexOf(2L) < order.indexOf(4L) == false ||
      got(order.indexOf(2L))._2 == got(order.indexOf(4L))._2)
    assert(order.indexOf(2L) == 1 && order.indexOf(4L) == 2)
    assert(got(1)._2 == got(2)._2, "identical text ⇒ identical weight")
    // weights are per-doc sums of per-token bucket weights: doc 5 has
    // 3 beta tokens vs doc 3's 2, so it scores LOWER (more raw-typical)
    val byId = got.toMap
    assert(byId(5L) < byId(3L))
  }
}
