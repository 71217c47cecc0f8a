package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Raking

class RakingSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  private def frame(schema: StructType, rows: Row*): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows.toList).asJava),
      schema)

  private def targets(col0: String, ts: (String, Double)*): DataFrame =
    frame(StructType(Seq(StructField(col0, StringType),
      StructField("target", DoubleType))),
      ts.map { case (k, v) => Row(k, v) }: _*)

  /** 2×2 table n = [[1,1],[1,3]] as individual docs. */
  private def docs2x2: DataFrame = {
    val rows = Seq(
      ("a", "x", 1), ("a", "y", 1), ("b", "x", 1), ("b", "y", 3))
      .flatMap { case (r, c, n) => Seq.fill(n)((r, c)) }
      .zipWithIndex.map { case ((r, c), i) => Row(i.toLong, r, c) }
    frame(docSchema, rows: _*)
  }

  test("one iteration matches the hand-computed rake") {
    // N=6, uniform targets. Row step: rowsums (2, 4) → w = (1.5, 0.75).
    // Col step: colsums (2.25, 3.75) → factors (4/3, 0.8):
    //   w = [[2.0, 1.2], [1.0, 0.6]]
    val got = Raking.rakeWeights(docs2x2, "lang", "source",
        targets("lang", "a" -> 0.5, "b" -> 0.5),
        targets("source", "x" -> 0.5, "y" -> 0.5), iters = 1)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("weight"))
      .toMap
    assert(math.abs(got(("a", "x")) - 2.0) < 1e-12)
    assert(math.abs(got(("a", "y")) - 1.2) < 1e-12)
    assert(math.abs(got(("b", "x")) - 1.0) < 1e-12)
    assert(math.abs(got(("b", "y")) - 0.6) < 1e-12)
  }

  test("after any iteration the column marginals hit their targets") {
    // the IPF invariant: the step that ran LAST satisfies its
    // marginals exactly (the other dimension converges over rounds)
    for (iters <- Seq(1, 3)) {
      val out = Raking.rakeWeights(docs2x2, "lang", "source",
          targets("lang", "a" -> 0.25, "b" -> 0.75),
          targets("source", "x" -> 0.4, "y" -> 0.6), iters)
        .collect()
      val byCol = out.groupBy(_.getString(1)).view
        .mapValues(_.map(_.getAs[Double]("expected")).sum)
      assert(math.abs(byCol("x") - 0.4 * 6) < 1e-9)
      assert(math.abs(byCol("y") - 0.6 * 6) < 1e-9)
    }
  }

  test("row marginals converge toward their targets over rounds") {
    def rowGap(iters: Int): Double = {
      val out = Raking.rakeWeights(docs2x2, "lang", "source",
          targets("lang", "a" -> 0.25, "b" -> 0.75),
          targets("source", "x" -> 0.4, "y" -> 0.6), iters)
        .collect()
      out.groupBy(_.getString(0)).map { case (r, rows) =>
        val t = if (r == "a") 0.25 else 0.75
        math.abs(rows.map(_.getAs[Double]("expected")).sum - t * 6)
      }.max
    }
    assert(rowGap(4) < rowGap(1))
    assert(rowGap(4) < 1e-4)
    assert(rowGap(8) < 1e-8)
  }

  test("cells without a target are dropped; weights deterministic under partitioning") {
    val extra = frame(docSchema,
      (0L to 5L).map(i => Row(i, if (i < 3) "a" else "q", "x")): _*)
    val out = Raking.rakeWeights(extra, "lang", "source",
      targets("lang", "a" -> 1.0), targets("source", "x" -> 1.0), 2)
    assert(out.select("lang").collect().map(_.getString(0)).toSet == Set("a"))
    val a = Raking.rakeWeights(docs2x2, "lang", "source",
        targets("lang", "a" -> 0.3, "b" -> 0.7),
        targets("source", "x" -> 0.5, "y" -> 0.5), 3)
      .orderBy("lang", "source").collect().toSeq
    val b = Raking.rakeWeights(docs2x2.repartition(7), "lang", "source",
        targets("lang", "a" -> 0.3, "b" -> 0.7),
        targets("source", "x" -> 0.5, "y" -> 0.5), 3)
      .orderBy("lang", "source").collect().toSeq
    assert(a == b)
  }
}
