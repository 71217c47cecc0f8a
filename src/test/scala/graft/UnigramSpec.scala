package graft

import org.apache.spark.sql.functions._

import graft.operators.Unigram

/** Unigram-LM tokenizer: integer micro-log2 exactness, Viterbi
  * segmentation parity on planted vocabularies (including the
  * equal-score tie), EM-prune invariants, and inference counts.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("ilog2Micro is the exact integer piecewise-linear log2") {
    val out = spark.range(1).select(
      Seq(1L, 2L, 3L, 4L, 5L, 6L, 1024L, 1536L).map(v =>
        Unigram.ilog2Micro(lit(v)).as(s"v$v")): _*).collect()(0)
    assert(out.getLong(0) == 0L)        // log2(1) = 0
    assert(out.getLong(1) == 1000000L)  // log2(2) = 1
    assert(out.getLong(2) == 1500000L)  // 1 + (3-2)/2
    assert(out.getLong(3) == 2000000L)
    assert(out.getLong(4) == 2250000L)  // 2 + (5-4)/4
    assert(out.getLong(5) == 2500000L)
    assert(out.getLong(6) == 10000000L)
    assert(out.getLong(7) == 10500000L) // 10 + 512/1024
  }

  private def segment(words: Seq[(String, Long)],
      scores: Seq[(String, Long)]): Map[String, Seq[String]] = {
    val w = words.toDF("_w", "_freq")
    val s = scores.toDF("_p", "_s")
    Unigram.viterbiSegments(w, s, maxPieceLen = 4)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
  }

  test("Viterbi picks the max-score segmentation") {
    val seg = segment(
      Seq(("abc", 1L), ("cab", 1L)),
      // [ab,c] = -1-2 = -3 beats [abc] = -4 and [a,b,c] = -7
      Seq(("a", -2L), ("b", -3L), ("c", -2L), ("ab", -1L), ("abc", -4L)))
    assert(seg("abc") == Seq("c", "ab")) // backtrack order: last piece first
    assert(seg("cab") == Seq("ab", "c"))
  }

  test("equal-score tie breaks to the longest piece") {
    val seg = segment(
      Seq(("abc", 1L)),
      // [abc] = -3 TIES [ab,c] = -1-2 = -3 → smaller start j wins
      Seq(("a", -2L), ("b", -3L), ("c", -2L), ("ab", -1L), ("abc", -3L)))
    assert(seg("abc") == Seq("abc"))
  }

  test("single-character fallback segments out-of-vocab spans") {
    val seg = segment(
      Seq(("xyx", 1L)),
      Seq(("x", -1L), ("y", -5L)))
    assert(seg("xyx") == Seq("x", "y", "x"))
  }

  private lazy val corpus = Seq(
    "the cat sat", "the cat", "the hat", "sat sat the").toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())

  test("EM-prune trace: character coverage, budget, determinism") {
    val t1 = Unigram.learnUnigramVocab(corpus, "text",
      keepMulti = 5, iters = 2, maxPieceLen = 3, minCount = 2)
      .orderBy("iter", "piece").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val chars = "thecas".toSet
    for (it <- 0 to 2) {
      val vocab = t1.filter(_._1 == it)
      val (single, multi) = vocab.partition(_._2.length == 1)
      assert(single.map(_._2.head).toSet == chars,
        s"iter $it must carry every seen character")
      assert(multi.size <= 5, s"iter $it multi budget blown: ${multi.toSeq}")
      assert(vocab.forall(_._3 >= 1L))
    }
    // the highest-frequency whole word survives pruning into the
    // final vocabulary ("sat" does NOT: its seed slot went to "sa" on
    // the count tie, and a pruned piece can never re-enter — prune is
    // monotone from the seed superset, the SentencePiece contract)
    val finalMulti = t1.filter(v => v._1 == 2 && v._2.length > 1).map(_._2)
    assert(finalMulti.contains("the"))
    assert(!finalMulti.contains("sat"))
    val t2 = Unigram.learnUnigramVocab(corpus, "text",
      keepMulti = 5, iters = 2, maxPieceLen = 3, minCount = 2)
      .orderBy("iter", "piece").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(t1.toSeq == t2.toSeq, "trace must be run-to-run deterministic")
  }

  test("inference counts: bounded by chars, zero for blank docs") {
    val docs = corpus.unionByName(
      Seq(("", 100L)).toDF("text", "doc_id").select(col("text"), col("doc_id")))
    val out = Unigram.unigramTokenCounts(docs, "doc_id", "text",
        keepMulti = 5, iters = 2, maxPieceLen = 3, minCount = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(100L) == 0L)
    // "the cat sat": 3 words, 11 chars → token count within (3, 11)
    assert(out(0L) >= 3L && out(0L) <= 11L)
    // with "the"/"sat" in-vocab the count is strictly below char count
    assert(out(0L) < 11L)
  }

  test("NLL scores: consistent with token counts, rare text scores worse") {
    val docs = corpus.unionByName(
      Seq(("", 100L), ("zq zq", 101L)).toDF("text", "doc_id")
        .select(col("text"), col("doc_id")))
    val nll = Unigram.unigramNllScores(docs, "doc_id", "text",
        keepMulti = 5, iters = 2, maxPieceLen = 3, minCount = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val counts = Unigram.unigramTokenCounts(docs, "doc_id", "text",
        keepMulti = 5, iters = 2, maxPieceLen = 3, minCount = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // piece counts agree with the tokenizer's counts doc by doc
    nll.foreach { case (id, (n, np, _)) =>
      assert(np == counts(id), s"doc $id piece count")
      assert(n >= 0L, s"doc $id NLL must be non-negative")
    }
    // blank doc: zero everything
    assert(nll(100L) == (0L, 0L, 0L))
    // rare characters cost more per piece than the corpus' common words
    val common = nll(0L)._3   // "the cat sat"
    val rare = nll(101L)._3   // "zq zq" — single-char fallbacks, count 1
    assert(rare > common, s"rare $rare !> common $common")
    // deterministic across runs
    val again = Unigram.unigramNllScores(docs, "doc_id", "text",
        keepMulti = 5, iters = 2, maxPieceLen = 3, minCount = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(again == nll)
  }

  test("per-key NLL: each key's LM equals an independent fit on its slice") {
    // two disjoint corpora under one frame: the grouped fit must score
    // each exactly as the ungrouped fit does on that slice ALONE —
    // neither language's words, totals, or vocab budget may leak into
    // the other's scores
    val en = Seq("the cat sat", "the cat", "the hat", "sat sat the")
      .zipWithIndex.map { case (t, i) => (i.toLong, "en", t) }
    val zz = Seq("zq zq", "zq ww", "ww ww zq")
      .zipWithIndex.map { case (t, i) => (100L + i, "zz", t) }
    val docs = (en ++ zz).toDF("doc_id", "lang", "text")
    val grouped = Unigram.unigramNllScoresByKey(docs, "doc_id", "lang",
        "text", keepMulti = 5, iters = 2, maxPieceLen = 3, minCount = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("lang"), r.getAs[Long]("nll_micro"),
          r.getAs[Long]("n_pieces"), r.getAs[Long]("nll_per_piece_micro")))
      .toMap
    for ((key, slice) <- Seq("en" -> en, "zz" -> zz)) {
      val solo = Unigram.unigramNllScores(
          slice.toDF("doc_id", "lang", "text"), "doc_id", "text",
          keepMulti = 5, iters = 2, maxPieceLen = 3, minCount = 2)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (key, r.getAs[Long]("nll_micro"), r.getAs[Long]("n_pieces"),
            r.getAs[Long]("nll_per_piece_micro"))).toMap
      solo.foreach { case (id, v) =>
        assert(grouped(id) == v, s"doc $id: grouped ${grouped(id)} != solo $v")
      }
    }
    assert(grouped.size == en.size + zz.size)
  }
}
