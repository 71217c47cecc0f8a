package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.Encoding

class EncodingSpec extends SparkSpec {

  private def events(rows: (Long, String, Double)*) = {
    val rs = rows.map { case (id, c, v) => Row(id, c, v) }.toList
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rs).asJava),
      StructType(Seq(
        StructField("id", LongType),
        StructField("cat", StringType),
        StructField("v", DoubleType))))
  }

  test("hand-computed leave-one-out means with m-estimate smoothing") {
    // A: 1.0/2.0/3.0, B: 10.0; global mean 4.0, m=2 → mprior = 8e6
    val df = events((1L, "A", 1.0), (2L, "A", 2.0), (3L, "A", 3.0),
      (4L, "B", 10.0))
    val got = Encoding.looTargetEncode(df, "id", "cat", "v", priorWeight = 2)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    // A (sum 6e6, n 3): (6e6 - y + 8e6) div 4
    assert(got == Seq(
      (1L, 3250000L), (2L, 3000000L), (3L, 2750000L),
      // singleton category: (m·prior) div m = exactly the global prior
      (4L, 4000000L)))
  }

  test("no self-leak: changing one row's target moves every OTHER " +
    "encoding in its category, not its own, beyond the prior shift") {
    val base = events((1L, "A", 1.0), (2L, "A", 2.0), (3L, "A", 3.0),
      (10L, "B", 5.0), (11L, "B", 5.0))
    val bumped = events((1L, "A", 100.0), (2L, "A", 2.0), (3L, "A", 3.0),
      (10L, "B", 5.0), (11L, "B", 5.0))
    def enc(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Encoding.looTargetEncode(df, "id", "cat", "v", priorWeight = 1)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val (e0, e1) = (enc(base), enc(bumped))
    // priors: 16e6 div 5 = 3.2e6 → 115e6 div 5 = 23e6 (Δ 19.8e6).
    // Row 1's numerator (catSum − OWN y) is unchanged (105−100 = 6−1):
    // its encoding moves by exactly Δprior div 3 — zero self-leak
    assert(e1(1L) - e0(1L) == 19800000L / 3)
    // row 2 absorbs the full +99 through the category sum on top
    assert(e1(2L) - e0(2L) == (105000000L - 2000000L + 23000000L) / 3 -
      (6000000L - 2000000L + 3200000L) / 3)
    assert(e1(2L) - e0(2L) > e1(1L) - e0(1L))
  }

  test("smoothing pulls rare categories toward the prior") {
    // many identical A rows at 0, one B row at 100: B's LOO encoding is
    // exactly the prior; a bigger m would matter only with n_B > 1
    val df = events((1L, "A", 0.0), (2L, "A", 0.0), (3L, "A", 0.0),
      (4L, "A", 0.0), (5L, "B", 100.0))
    val got = Encoding.looTargetEncode(df, "id", "cat", "v", priorWeight = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // prior = 100e6 div 5 = 20e6
    assert(got(5L) == 20000000L)
    // A rows: (0 - 0 + 3·20e6) div (4 - 1 + 3) = 10e6
    assert(got(1L) == 10000000L)
  }
}
