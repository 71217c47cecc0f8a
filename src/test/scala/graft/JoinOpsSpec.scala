package graft

import org.apache.spark.sql.functions._

import graft.operators.JoinOps
import graft.sources.Tables

class JoinOpsSpec extends SparkSpec {

  test("salted join returns identical results to a plain join") {
    val li = Tables.lineitem(spark, sfDir)
    val sup = Tables.supplier(spark, sfDir)
    val plain = li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .groupBy(col("s_name")).agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // saltedJoin joins on big(key) === small(key): same column name on
    // both sides, so rename first
    val salted2 = JoinOps.saltedJoin(
      li.withColumnRenamed("l_suppkey", "suppkey"),
      sup.withColumnRenamed("s_suppkey", "suppkey"), "suppkey")
      .groupBy(col("s_name")).agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted2 == plain)
  }

  test("salted join spreads a degenerate hot key across buckets") {
    import spark.implicits._
    // pathological skew: every big-side row has THE SAME key
    val big = (1 to 10000).map(i => (1L, i)).toDF("k", "v")
    val small = Seq((1L, "hot")).toDF("k", "name")
    val out = JoinOps.saltedJoin(big, small, "k", saltBuckets = 8)
    assert(out.count() == 10000)
    // the salt column spread rows over multiple buckets pre-join
    val saltSpread = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(8)))
      .select("_salt").distinct().count()
    assert(saltSpread > 4, s"salt spread only $saltSpread buckets")
  }

  test("salted join spreads the q73 hot key across all saltBuckets shuffle slices") {
    // the q73 construction: ~40% of lineitem re-keyed onto supplier 1
    val fact = Tables.lineitem(spark, sfDir).select(
      when(pmod(col("l_orderkey"), lit(10)) < 4, lit(1L))
        .otherwise(col("l_suppkey")).as("skewkey"),
      col("l_extendedprice"))
    val hot = fact.filter(col("skewkey") === 1L)
    val (total, hotN) = (fact.count(), hot.count())
    assert(hotN >= total * 3 / 10,
      s"hot key carries only $hotN of $total rows — the planted skew broke")
    // mechanism: the hot key's rows carry every salt value, so the join
    // shuffles them as saltBuckets distinct (key, salt) slices instead
    // of one degenerate partition
    val salted = hot.withColumn("_salt", JoinOps.saltColumn(fact, 8))
    assert(salted.select("_salt").distinct().count() == 8)
    // and those slices land in distinct shuffle tasks (deterministic
    // for the fixed hash): partition exactly how the join partitions
    val parts = salted.repartition(32, col("skewkey"), col("_salt"))
      .select(spark_partition_id()).distinct().count()
    assert(parts >= 4, s"hot key's 8 salt slices landed in only $parts tasks")
    // forceSortMerge pins the shuffled join shape (a broadcast of the
    // test-sized dim would leave no exchange to skew): the executed
    // plan must be a sort-merge join keyed on BOTH skewkey and _salt
    val dim = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").as("skewkey"), col("s_name"))
    val joined = JoinOps.saltedJoin(fact, dim, "skewkey", saltBuckets = 8,
      forceSortMerge = true)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"salted join not sort-merge:\n$plan")
    assert(plan.contains("_salt"), s"salt missing from join keys:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"), s"dim still broadcast:\n$plan")
  }

  test("id-based salt: same spread, stable under projection changes") {
    // the r7 contract: salting from (key, idCols) spreads the hot key
    // exactly like the whole-row hash does, costs a 3-column hash
    // instead of a full-width one, and does NOT shift when a caller
    // adds a column to the fact frame (the whole-row salt would)
    val fact = Tables.lineitem(spark, sfDir).select(
      when(pmod(col("l_orderkey"), lit(10)) < 4, lit(1L))
        .otherwise(col("l_suppkey")).as("skewkey"),
      col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val ids = Seq("l_orderkey", "l_linenumber")
    val hot = fact.filter(col("skewkey") === 1L)
    val salted = hot.withColumn("_salt",
      JoinOps.saltColumn(fact, 8, "skewkey", ids))
    // full spread: the hot key's rows carry every salt value
    assert(salted.select("_salt").distinct().count() == 8)
    // projection stability: widening the frame leaves every row's salt
    // identical (the whole-row hash would reshuffle here)
    val widened = hot.withColumn("extra", col("l_extendedprice") * 2)
    val stable = widened.withColumn("_salt",
        JoinOps.saltColumn(widened, 8, "skewkey", ids))
      .select(col("l_orderkey"), col("l_linenumber"), col("_salt"))
      .join(salted.select(col("l_orderkey"), col("l_linenumber"),
          col("_salt").as("_salt0")),
        Seq("l_orderkey", "l_linenumber"))
    assert(stable.filter(col("_salt") =!= col("_salt0")).count() == 0)
    // and results still match the plain join
    val dim = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").as("skewkey"), col("s_name"))
    val viaSalt = JoinOps.saltedJoin(fact, dim, "skewkey", saltBuckets = 8,
        forceSortMerge = true, idCols = ids)
      .groupBy("skewkey").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = fact.join(dim, Seq("skewkey"))
      .groupBy("skewkey").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSalt == plain)
  }

  test("bucketed tables join with no Exchange in the plan") {
    JoinOps.writeBucketed(
      Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_b", "o_orderkey", 4)
    JoinOps.writeBucketed(
      Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", "o_orderkey", 4)
    val joined = JoinOps.bucketedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() ==
      Tables.lineitem(spark, sfDir).join(
        Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey")).count())
  }

  test("bloom prefilter: no false negatives, real reduction, identical join") {
    val dim = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val fact = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey").as("c_custkey"))
    val bits = JoinOps.bloomFilterBits(dim, "c_custkey", 1024, 3)
    val flagged = fact.withColumn("_pass",
      JoinOps.bloomPasses(col("c_custkey"), bits, 1024, 3)).cache()
    try {
      // every actually-matching fact row passes the filter
      assert(flagged.filter(!col("_pass"))
        .join(dim, Seq("c_custkey"), "left_semi").count() == 0)
      // the undersized filter still rejects a meaningful share
      val total = flagged.count()
      val passed = flagged.filter(col("_pass")).count()
      assert(passed < total, s"filter rejected nothing ($passed of $total)")
      // and the prefiltered join result is the plain join, exactly
      val plain = fact.join(dim, Seq("c_custkey")).collect().toSet
      val pre = JoinOps.bloomPrefilteredJoin(fact, dim, "c_custkey",
        numBits = 1024, numHashes = 3).collect().toSet
      assert(pre == plain)
    } finally flagged.unpersist()
  }

  test("bloom filter drops NULL keys and survives an empty dim") {
    import spark.implicits._
    val dim = Seq(1L, 2L).toDF("k")
    val bits = JoinOps.bloomFilterBits(dim, "k", 64, 2)
    val fact = Seq(Some(1L), Some(99L), None).toDF("k")
    val passes = fact.withColumn("p", JoinOps.bloomPasses(col("k"), bits, 64, 2))
      .collect().map(r => Option(r.get(0)) -> r.getBoolean(1)).toMap
    assert(passes(Some(1L)), "member must pass")
    assert(!passes(None), "NULL key must be filtered")
    val emptyBits = JoinOps.bloomFilterBits(dim.filter(col("k") < 0), "k", 64, 2)
    assert(emptyBits.forall(_ == 0L), "empty dim -> empty filter")
  }

  test("bloomManifest/bloomCandidates: no false negatives, absent keys prune everywhere") {
    import spark.implicits._
    // 3 partitions with disjoint key ranges; wide filter → candidate
    // sets are exact (collisions astronomically unlikely)
    val t = (0L until 300L).map(k => (k, (k / 100L).toInt)).toDF("k", "p")
    val manifest = JoinOps.bloomManifest(t, "p", "k",
      numBits = 8192, numHashes = 4)
    // manifest is metadata-sized: ≤ parts × bits/64 rows
    assert(manifest.count() <= 3L * 8192 / 64)
    val probes = Seq(5L, 150L, 299L, 1000L, 2000L).toDF("k")
    val cand = JoinOps.bloomCandidates(manifest, probes, "k", 8192, 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toSet
    // every present key's true partition is a candidate (no false
    // negatives — the structural guarantee); absent keys prune all 3
    assert(cand == Set(5L -> 0, 150L -> 1, 299L -> 2))
    // a too-small filter degrades to MORE candidates, never fewer:
    // the present keys' true partitions must still all be candidates
    val tiny = JoinOps.bloomCandidates(
      JoinOps.bloomManifest(t, "p", "k", 64, 4), probes, "k", 64, 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toSet
    assert(Set(5L -> 0, 150L -> 1, 299L -> 2).subsetOf(tiny))
  }
}
