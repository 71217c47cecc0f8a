package graft

import org.apache.spark.sql.functions._

import graft.operators.Linkage

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(
      left: Seq[(Long, String, String)], right: Seq[(Long, String, String)],
      maxDist: Int, maxBlock: Int = 10000) =
    Linkage.blockedFuzzyPairs(
        left.toDF("id", "blk", "name"), right.toDF("id", "blk", "name"),
        "id", "blk", "name", maxDist, maxBlock)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("links within-block pairs up to maxDist inclusive, never across blocks") {
    val l = Seq((1L, "b1", "amber"), (2L, "b1", "ombre"), (3L, "b2", "amber"))
    val r = Seq((10L, "b1", "ambur"), (11L, "b2", "umbra"))
    // amber~ambur dist 1; ombre~ambur dist 3; amber(b2)~umbra dist 3;
    // amber(b1) vs umbra(b2): dist 2 but DIFFERENT block -> excluded
    assert(pairs(l, r, 1) == Set((1L, 10L, 1)))
    assert(pairs(l, r, 3) == Set((1L, 10L, 1), (2L, 10L, 3), (3L, 11L, 3)))
  }

  test("distance boundary is inclusive and zero-distance matches link") {
    val l = Seq((1L, "b", "same"))
    val r = Seq((2L, "b", "same"), (3L, "b", "sane"))
    assert(pairs(l, r, 0) == Set((1L, 2L, 0)))
    assert(pairs(l, r, 1) == Set((1L, 2L, 0), (1L, 3L, 1)))
  }

  test("oversized blocks are dropped on either side and reported") {
    val big = (0 until 50).map(i => (100L + i, "flood", s"name$i"))
    val l = Seq((1L, "ok", "alpha")) ++ big
    val r = Seq((2L, "ok", "alphb")) ++ big.map { case (i, b, n) => (1000 + i, b, n) }
    // flood block exceeds the cap on both sides: only the ok-block pair links
    assert(pairs(l, r, 2, maxBlock = 10) == Set((1L, 2L, 1)))
    val over = Linkage.oversizedBlocks(
        l.toDF("id", "blk", "name"), "blk", maxBlockSize = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(over == Set(("flood", 50L)))
  }

  test("q103 plan: block equi-join with distance filter, no cartesian product") {
    val df = graft.queries.TrainingData.queries("q103_fuzzy_linkage")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    // the planted near variants must link (every 7th customer)
    assert(df.filter(col("id_b") >= 100000 && col("id_b") < 200000).count() > 0)
  }

  test("goldenRecords: per-column latest non-null, not per-row winner") {
    import spark.implicits._
    val rows = Seq(
      // cluster 1: three revisions, each nulling something
      (1L, 0L, 10L, Some("alice"), Some(5.0), Some("A")),
      (1L, 1L, 11L, None: Option[String], Some(7.5), None: Option[String]),
      (1L, 2L, 12L, Some("alice b"), None: Option[Double], None: Option[String]),
      // cluster 2: single member
      (2L, 0L, 20L, Some("bob"), None: Option[Double], Some("B")),
      // cluster 3: a column that is NULL in every revision stays NULL
      (3L, 0L, 30L, None: Option[String], Some(1.0), None: Option[String]),
      (3L, 1L, 31L, None: Option[String], Some(2.0), None: Option[String]))
      .toDF("cluster", "rev", "rid", "name", "bal", "seg")
    val got = Linkage.goldenRecords(rows, "cluster", "rev", "rid",
        Seq("name", "bal", "seg"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)), Option(r.get(5)))).toMap
    assert(got(1L) == ((3L, 10L, Some("alice b"), Some(7.5), Some("A"))))
    assert(got(2L) == ((1L, 20L, Some("bob"), None, Some("B"))))
    assert(got(3L) == ((2L, 30L, None, Some(2.0), None)))
  }

  test("goldenRecords: rev ties break by id deterministically") {
    import spark.implicits._
    val rows = Seq(
      (1L, 5L, 100L, Some("x")),
      (1L, 5L, 200L, Some("y"))) // same rev: higher id wins
      .toDF("cluster", "rev", "rid", "name")
    val got = Linkage.goldenRecords(rows, "cluster", "rev", "rid", Seq("name"))
      .collect().head
    assert(got.getString(3) == "y")
  }

  test("sortedNeighborhoodPairs: prefix-adjacent dups found, window and threshold bind") {
    import spark.implicits._
    // sort order by text: the two "alpha …" docs land adjacent and
    // share 3 of their 5-token union (60%); the "zeta" doc is a
    // near-copy of doc 1 by TOKENS but sorts 3 ranks away — reachable
    // only when the window stretches to it (the documented
    // window/recall trade).
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma omega"),
      (3L, "middle words entirely different"),
      (4L, "zeta beta gamma delta"))
      .toDF("doc_id", "text")
    def pairs(pct: Int, w: Int) = Linkage.sortedNeighborhoodPairs(
        docs, "doc_id",
        concat(col("text"), lit("#"), col("doc_id").cast("string")),
        split(col("text"), " "), window = w, minPct = pct)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(60, 1) == Set((1L, 2L)))
    // tighter threshold (3/5 = 60 < 61) drops the pair
    assert(pairs(61, 1) == Set.empty)
    // window 3 reaches from doc 1 (rank 0) to doc 4 (rank 3), another
    // 3-of-5 match — the wider window buys exactly that recall
    assert(pairs(60, 3) == Set((1L, 2L), (1L, 4L)))
  }

  test("sortedNeighborhoodPairs: partitioning-invariant, ids unique per pair side") {
    import spark.implicits._
    val docs = (0L until 40L).map { i =>
      (i, if (i % 2 == 0) s"common shared text block $i" else s"unique ${i}x ${i}y ${i}z")
    }.toDF("doc_id", "text")
    def run(parts: Int) = Linkage.sortedNeighborhoodPairs(
        docs.repartition(parts), "doc_id",
        concat(col("text"), lit("#"), col("doc_id").cast("string")),
        split(col("text"), " "), window = 2, minPct = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(1) == run(7))
  }
}
