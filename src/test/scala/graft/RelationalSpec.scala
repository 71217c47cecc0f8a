package graft

import graft.queries.Relational

class RelationalSpec extends SparkSpec {

  test("oracle keys are a subset of queries and all queries run at sf0.001") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // every query without an oracle is a deliberate rows-only entry
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == Set("q21_minhash_neardup", "q22_simhash_neardup",
      "q25_fingerprints", "q29_approx_distinct", "q39_hash_split"),
      s"unexpected oracle-less queries: $noOracle")
    Relational.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val n = df.count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("q01 pricing summary: groups are (returnflag, linestatus) and counts add up") {
    val df = Relational.q01PricingSummary(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val filtered = graft.sources.Tables.lineitem(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("l_shipdate") <=
        org.apache.spark.sql.functions.lit("1998-09-02 00:00:00").cast("timestamp"))
      .count()
    assert(total == filtered)
  }

  test("q09 duplicate injection yields exactly the injected groups") {
    val df = Relational.q09DuplicateGroups(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("duplicate_count") >= 2))
  }

  test("q13 anti join returns customers without 'P' orders") {
    val n = Relational.q13AntiJoin(spark, sfDir).count()
    assert(n > 0)
  }

  test("q08 window rank never exceeds 3 per customer") {
    val df = Relational.q08WindowRank(spark, sfDir)
    val byCust = df.groupBy("o_custkey").count().collect()
    assert(byCust.forall(_.getAs[Long]("count") <= 3))
  }
}
