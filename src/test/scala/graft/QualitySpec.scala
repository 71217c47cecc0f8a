package graft

import org.apache.spark.sql.functions._

import graft.operators.Quality
import graft.operators.Quality.{Check, ForeignKey, Unique}

class QualitySpec extends SparkSpec {

  import spark.implicits._

  private lazy val dim = Seq(10L, 20L, 30L).toDF("d_key")

  private lazy val facts = Seq(
    // (key, fk, price, tag)
    (1L, 10L, 5.0, "a"),
    (2L, 20L, -1.0, "b"),     // nonpositive price
    (3L, 99L, 2.0, "c"),      // broken FK
    (4L, 20L, 0.0, "d"),      // nonpositive price (zero boundary)
    (5L, 30L, 3.0, "e"),
    (5L, 30L, 4.0, "f"),      // duplicate key 5 (both rows count)
    (6L, 77L, 1.0, "g"),      // broken FK
    (7L, 10L, 8.0, null)      // null tag
  ).toDF("key", "fk", "price", "tag")

  private def run(rules: Seq[Quality.Rule]) =
    Quality.audit(facts, "key", rules).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap

  test("all rule types report exact counts and deterministic min samples") {
    val got = run(Seq(
      Check("nonpositive_price", col("price") <= 0),
      Check("null_tag", col("tag").isNull),
      Check("never_fires", col("price") > 1e9),
      Unique("unique_key", Seq("key")),
      ForeignKey("fk_dim", "fk", dim, "d_key")))
    assert(got("nonpositive_price") == ((2L, Some(2L))))
    assert(got("null_tag") == ((1L, Some(7L))))
    assert(got("never_fires") == ((0L, None)))
    assert(got("unique_key") == ((2L, Some(5L))))
    assert(got("fk_dim") == ((2L, Some(3L))))
  }

  test("null FK values are not referential violations") {
    val withNull = facts.unionByName(
      Seq((9L, Option.empty[Long], 1.0, "h")).toDF("key", "fk", "price", "tag"))
    val got = Quality.audit(withNull, "key",
      Seq(ForeignKey("fk_dim", "fk", dim, "d_key"))).collect()
    assert(got.head.getLong(1) == 2L) // still just keys 3 and 6
  }

  test("predicate rules share one scan: a single aggregate, no joins") {
    val df = Quality.audit(facts, "key", Seq(
      Check("r1", col("price") <= 0),
      Check("r2", col("tag").isNull),
      Check("r3", col("price") > 100)))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    // exactly one aggregate pair (partial+final) over the fact scan
    assert("HashAggregate".r.findAllIn(plan).size <= 2, plan)
  }

  test("duplicate rule names are rejected") {
    intercept[IllegalArgumentException] {
      Quality.audit(facts, "key",
        Seq(Check("x", lit(true)), Check("x", lit(false))))
    }
  }
}
