package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling
import graft.sources.Tables

class SamplingSpec extends SparkSpec {

  lazy val docs = Tables.documents(spark, sfDir)

  test("hash split: disjoint, complete over declared fractions, stable") {
    val split = Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == docs.count()) // fractions cover 1.0
    // roughly proportional (hash uniformity over 500 docs)
    assert(counts("train") > counts("val") && counts("train") > counts("test"))

    // stability: identical assignment on a re-read, regardless of layout
    val again = Sampling.hashSplit(docs.repartition(13), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = split.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(first == again)
  }

  test("hash sample: deterministic subset, fraction approximately honored") {
    val s1 = Sampling.hashSample(docs, "doc_id", 0.2).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(docs, "doc_id", 0.2).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2)
    assert(s1.size > 50 && s1.size < 150) // ~100 of 500
    // a larger fraction is a superset of a smaller one (nested samples)
    val s3 = Sampling.hashSample(docs, "doc_id", 0.5).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(s1.subsetOf(s3))
  }

  test("different salts decorrelate samples") {
    val a = Sampling.hashSample(docs, "doc_id", 0.5, salt = "a")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs, "doc_id", 0.5, salt = "b")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a != b)
    val overlap = a.intersect(b).size.toDouble / math.max(a.size, 1)
    assert(overlap > 0.25 && overlap < 0.75) // ~50% expected
  }

  test("stratum cap: per-stratum bound, deterministic, layout-independent") {
    val capped = Sampling.stratumCap(docs, "doc_id", "lang", cap = 20)
    val perLang = capped.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fullPerLang = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every stratum present, capped at min(cap, stratum size)
    assert(perLang.keySet == fullPerLang.keySet)
    perLang.foreach { case (lang, n) =>
      assert(n == math.min(20L, fullPerLang(lang)), s"$lang kept $n")
    }
    // deterministic + invariant under physical layout
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.stratumCap(df, "doc_id", "lang", cap = 20)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(docs) == ids(docs.repartition(13)))
    // a different salt picks a different (but equally-sized) subset
    val salted = Sampling.stratumCap(docs, "doc_id", "lang", cap = 20, salt = "v2")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(salted.size == ids(docs).size && salted != ids(docs))
  }

  test("stratum cap: a 10^6-row hot stratum caps without a full-stratum single-partition sort") {
    import org.apache.spark.sql.functions._
    // one pathologically hot stratum (10^6 rows) + one tiny one: the
    // window formulation would shuffle and sort all 10^6 hot rows in a
    // single task; the TopKPerKey route keeps <= cap per (partition,
    // stratum) map-side, so the post-exchange merge sees at most
    // cap * nPartitions rows per stratum
    val hot = spark.range(0, 1000000).toDF("doc_id")
      .withColumn("lang", lit("en"))
      .unionAll(spark.range(2000000, 2000040).toDF("doc_id")
        .withColumn("lang", lit("xx")))
      .repartition(16)
    val capped = Sampling.stratumCap(hot, "doc_id", "lang", cap = 50)
    val got = capped.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.count(_._2 == "en") == 50)
    assert(got.count(_._2 == "xx") == 40) // under-cap stratum kept whole
    // exact agreement with the window formulation's kept set (the
    // semantics contract: cap lowest per stratum by (md5(id), id))
    val expectEn = spark.range(0, 1000000).toDF("doc_id")
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .orderBy("h", "doc_id").limit(50)
      .collect().map(_.getLong(0)).toSet
    assert(got.filter(_._2 == "en").map(_._1).toSet == expectEn)
    // the physical plan is the two-phase TopKPerKey pair, not a Window
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"expected TopKPerKeyExec in plan:\n$plan")
    assert(!plan.contains("Window"), s"unexpected Window in plan:\n$plan")
  }

  test("sequential ids: dense 0..n-1 in key order, layout-independent, no global window") {
    val filtered = docs.filter(col("lang") =!= "en").select("doc_id", "lang")
    val n = filtered.count()
    def ids(df: org.apache.spark.sql.DataFrame, parts: Int) =
      Sampling.assignSequentialIds(df, "doc_id", nParts = parts)
        .select("doc_id", "seq_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = ids(filtered, 4)
    // dense, complete, rank-ordered
    assert(got.values.toSeq.sorted == (0L until n).toSeq)
    val byRank = got.toSeq.sortBy(_._2).map(_._1)
    assert(byRank == byRank.sorted, "seq ids not in doc_id order")
    // identical under different input layout and partition count
    assert(ids(filtered.repartition(11), 7) == got)
    // the plan never funnels rows through one partition: the whole
    // point vs row_number() over a global ORDER BY
    val plan = Sampling.assignSequentialIds(filtered, "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"global funnel in plan:\n$plan")
  }

  test("source balancing: integer rates, append-stable membership, small sources intact") {
    import graft.operators.Sampling
    val df = spark.range(0, 1000).toDF("doc_id")
      .withColumn("source",
        when(col("doc_id") < 900, lit("big")).otherwise(lit("small")))
    val kept = Sampling.balanceSources(df, "doc_id", "source", targetPerSource = 100)
    val bySource = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // small source (100 docs ≤ target) keeps everything — rate 1
    assert(bySource("small") == 100L)
    // big source keeps ~100 in expectation (hash-rate gate, not exact)
    assert(bySource("big") > 60L && bySource("big") < 140L, s"got $bySource")
    // thresholds are the documented integer formula
    val thr = kept.select("source", "_keep_threshold").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(thr("big") == 100L * 1000000L / 900L)
    assert(thr("small") == 1000000L)
    // append stability: doubling the big source LOWERS its rate but
    // never flips a kept doc's bucket — the new kept set for the same
    // threshold would be a subset; with the lower threshold, every
    // kept doc was already kept before
    val bigger = spark.range(0, 1900).toDF("doc_id")
      .withColumn("source",
        when(col("doc_id") < 1800, lit("big")).otherwise(lit("small")))
    val keptBefore = kept.filter(col("source") === "big" && col("doc_id") < 900)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val keptAfter = Sampling.balanceSources(bigger, "doc_id", "source", 100)
      .filter(col("source") === "big" && col("doc_id") < 900)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptAfter.subsetOf(keptBefore),
      "a doc dropped at the old rate reappeared at a stricter rate")
  }

  test("stratified sample keeps per-stratum fractions") {
    val out = Sampling.stratifiedHashSample(docs, "doc_id", "lang",
      Map("en" -> 1.0, "de" -> 0.0, "fr" -> 0.5))
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("en") == base("en"))
    assert(!counts.contains("de"))
    assert(counts("fr") > 0 && counts("fr") < base("fr"))
    assert(!counts.contains("es") && !counts.contains("zh")) // unlisted → dropped
  }

  test("quantile buckets: monotone in value, quarters balanced, no global sort") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, i.toDouble)).toDF("id", "score")
    val out = Sampling.bucketByQuantiles(df, "score", 0.0, 1000.0, 100,
      Seq(0.25, 0.5, 0.75))
    val rows = out.collect().map(r => r.getDouble(1) -> r.getInt(2)).sortBy(_._1)
    // monotone: bucket never decreases as the value grows
    rows.sliding(2).foreach { case Array((_, b1), (_, b2)) =>
      assert(b1 <= b2, s"bucket decreased: $b1 -> $b2")
    }
    // thresholds are bin lower edges, so quarters balance within one
    // bin width (10 values here)
    val sizes = rows.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.keySet == Set(0, 1, 2, 3))
    sizes.values.foreach(n => assert(math.abs(n - 250) <= 10, s"sizes $sizes"))
    // the assignment plan must not contain a global sort of the corpus
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"), s"global sort in:\n$plan")
  }

  test("keyed quantile buckets: per-key cuts match the per-slice ungrouped run") {
    import spark.implicits._
    // key a: values 1..1000; key b: values 2000..2099 — shared cuts
    // would throw every b row into the top bucket
    val df = ((1 to 1000).map(i => ("a", i.toDouble)) ++
      (0 until 100).map(i => ("b", 2000.0 + i))).toDF("k", "score")
    val keyed = Sampling.bucketByQuantilesKeyed(df, "k", "score",
        0.0, 2200.0, 220, Seq(0.25, 0.5, 0.75))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getInt(2))
      .toMap
    for (k <- Seq("a", "b")) {
      val solo = Sampling.bucketByQuantiles(
          df.filter(col("k") === k), "score", 0.0, 2200.0, 220,
          Seq(0.25, 0.5, 0.75))
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getInt(2))
        .toMap
      solo.foreach { case (key, b) =>
        assert(keyed(key) == b, s"$key: keyed ${keyed(key)} != solo $b")
      }
      // all four buckets occupied within each key
      assert(keyed.collect { case ((`k`, _), b) => b }.toSet == Set(0, 1, 2, 3))
    }
    // a key with no rows after the null filter buckets to 0
    val withNull = Sampling.bucketByQuantilesKeyed(
      df.unionByName(Seq(("c", Option.empty[Double])).toDF("k", "score")),
      "k", "score", 0.0, 2200.0, 220, Seq(0.5))
    assert(withNull.filter(col("k") === "c").select("bucket")
      .collect()(0).getInt(0) == 0)
  }

  test("epochMix: budget met within one doc per source, direct recompute") {
    import spark.implicits._
    val docs = (0 until 400).map { i =>
      (i.toLong, s"src${i % 6}", 50L + i % 37)
    }.toDF("doc_id", "source", "n_chars")
    val budget = 3L * docs.agg(org.apache.spark.sql.functions.sum("n_chars"))
      .head.getLong(0)
    val got = Sampling.epochMix(docs, "doc_id", "source", "n_chars", budget)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    // direct single-threaded recompute of the contract
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.substring(0, 15), 16)
    }
    val rows = (0 until 400).map(i => (i.toLong, s"src${i % 6}", 50L + i % 37))
    val w = rows.map(_._2).distinct.map(s => s -> (h60(s + "mixw") % 4 + 1)).toMap
    val sumW = w.values.sum
    val bySrc = rows.groupBy(_._2)
    val expected = bySrc.flatMap { case (src, docsOfSrc) =>
      val t = docsOfSrc.map(_._3).sum
      val target = budget * w(src) / sumW
      val (full, rem) = (target / t, target % t)
      val ordered = docsOfSrc.sortBy { case (id, _, _) =>
        val h = h60(s"${id}mixo"); (h % 64, h, id)
      }
      val befores = ordered.map(_._3).scanLeft(0L)(_ + _)
      ordered.zip(befores).map { case ((id, s, _), before) =>
        (id, s, full + (if (before < rem) 1L else 0L))
      }
    }.toSet
    assert(got.toSet == expected)
    // budget conservation: delivered tokens within one max-doc of target
    val bySource = got.groupBy(_._2)
    for ((src, assigns) <- bySource) {
      val t = bySrc(src).map(_._3).sum
      val target = budget * w(src) / sumW
      val delivered = assigns.map { case (id, _, e) =>
        e * rows.find(_._1 == id).get._3 }.sum
      val maxDoc = bySrc(src).map(_._3).max
      assert(delivered >= target - maxDoc && delivered < target + maxDoc,
        s"$src delivered $delivered target $target")
    }
  }

  test("epochMix: zero budget drops everything; epochs scale with budget") {
    import spark.implicits._
    val docs = (0 until 60).map(i => (i.toLong, s"s${i % 3}", 10L))
      .toDF("doc_id", "source", "n_chars")
    val zero = Sampling.epochMix(docs, "doc_id", "source", "n_chars", 0L)
      .collect()
    assert(zero.forall(_.getLong(2) == 0L))
    val one = Sampling.epochMix(docs, "doc_id", "source", "n_chars", 600L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val two = Sampling.epochMix(docs, "doc_id", "source", "n_chars", 1200L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // a bigger budget never lowers any document's epoch count, and
    // total delivered tokens track the budget (uniform 10-char docs,
    // weights sum over the 3 sources: every budget token lands)
    assert(one.keySet == two.keySet)
    one.foreach { case (id, e) => assert(two(id) >= e) }
    assert(two.values.sum > one.values.sum)
  }

  test("negativeSamples: deterministic, self-excluding, k per anchor, in range") {
    import spark.implicits._
    val corpus = (0L until 20L).map(i => (i, s"src${i % 3}"))
      .toDF("doc_id", "source")
    val anchors = corpus.filter(col("doc_id") < 5)
    def run() = Sampling.negativeSamples(anchors, "doc_id",
        corpus.withColumnRenamed("source", "neg_source"), "doc_id",
        corpusN = 20L, k = 3)
      .collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getLong(0), r.getString(3)))
    val got = run()
    assert(got.length == 15) // 5 anchors × 3 draws
    assert(got.map { case (a, j, _, _) => (a, j) }.toSet ==
      (for (a <- 0L until 5L; j <- 0 until 3) yield (a, j)).toSet)
    got.foreach { case (a, _, n, src) =>
      assert(n >= 0L && n < 20L && n != a, s"anchor $a drew $n")
      assert(src == s"src${n % 3}") // the corpus join carried the right row
    }
    // bit-identical across runs (no RNG anywhere)
    assert(run().sortBy(t => (t._1, t._2)).toSeq ==
      got.sortBy(t => (t._1, t._2)).toSeq)
    // the draw replays from first principles: md5-mod with slide-by-one
    val md = java.security.MessageDigest.getInstance("MD5")
    got.foreach { case (a, j, n, _) =>
      val hex = md.digest(s"$a#${j}neg".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16) % 20L
      assert(n == (if (h == a) (h + 1) % 20L else h))
    }
  }
}
