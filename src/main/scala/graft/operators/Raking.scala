package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Mixture CALIBRATION by iterative proportional fitting (IPF /
  * "raking", Deming & Stephan 1940): given a corpus crossed by two
  * categorical dimensions (e.g. language × source) and a TARGET
  * marginal distribution on each dimension, compute per-cell sampling
  * weights whose weighted table matches both target marginals — the
  * standard way to hit "40% English AND uniform sources" when the two
  * constraints interact (independent per-dimension scaling satisfies
  * neither; raking alternates row and column scaling until both
  * hold). Survey statisticians have run this for 80 years; a training
  * mix with marginal token budgets is the same problem.
  *
  * Determinism contract: the weight updates are plain double
  * arithmetic, but every SUM that feeds a division is a SORTED FOLD
  * over the cell list (ordered by the other dimension's value) —
  * never an unordered float aggregate — so `iters` rounds produce
  * bit-identical weights on any engine, and the DuckDB oracle replays
  * the full iteration unrolled.
  *
  * Scale: the corpus crosses ONE keyed exchange into the contingency
  * table (map-side-combined count); everything after runs on the
  * bounded |rows|×|cols| cell frame (broadcast-joined targets, keyed
  * per-dimension folds). At 100 TB the cell frame is still a few
  * hundred rows — the iteration cost is independent of corpus size.
  */
object Raking {

  /** Per-cell raked weights after `iters` (row-step, col-step)
    * rounds, starting from weight 1.
    *
    * `rowTargets` (rowCol, target) / `colTargets` (colCol, target)
    * give the desired marginal FRACTIONS (each summing to 1). Cells
    * whose row or col value has no target row are dropped (inner
    * join) — supply a target for every observed value.
    *
    * Output: (rowCol, colCol, n_docs, weight, expected) where
    * `expected = n_docs · weight` is the cell's weighted mass; after
    * a col-step, expected sums per column hit `target · N` exactly
    * (the IPF invariant — the spec asserts it).
    */
  def rakeWeights(df: DataFrame, rowCol: String, colCol: String,
      rowTargets: DataFrame, colTargets: DataFrame,
      iters: Int): DataFrame = {
    require(iters >= 1, s"bad iters $iters")
    // sorted fold: deterministic double sum of v in key order
    def foldSum(key: Column, v: Column): Column =
      aggregate(
        transform(
          array_sort(collect_list(struct(key.as("k"), v.as("v")))),
          s => s.getField("v")),
        lit(0.0), (a, x) => a + x)
    val rt = rowTargets.select(col(rowCol).as("_r"), col("target").as("_tr"))
    val ct = colTargets.select(col(colCol).as("_c"), col("target").as("_tc"))
    // materialize the cell frame: the corpus crosses its ONE exchange
    // exactly once (N and the iteration both read the checkpoint, not
    // the corpus lineage), and each rake round below re-checkpoints so
    // plan depth stays CONSTANT in `iters` — without this the nested
    // join-under-join lineage sends the optimizer super-linear around
    // 6-8 rounds (measured: an 8-round plan stopped compiling at all)
    val counts = df
      .groupBy(col(rowCol).as("_r"), col(colCol).as("_c"))
      .agg(count(lit(1)).cast(LongType).as("n_docs"))
      .join(broadcast(rt), Seq("_r"))
      .join(broadcast(ct), Seq("_c"))
      .localCheckpoint(true)
    // N over the TARGETED cells (bounded frame — the scalar agg's
    // input is |rows|×|cols| rows, the q106 shape)
    val total = counts.agg(sum(col("n_docs")).cast(DoubleType).as("_N"))
    var cur = counts
      .crossJoin(broadcast(total))
      .withColumn("weight", lit(1.0))
    def step(dim: String, other: String, target: String): Unit = {
      val sums = cur.groupBy(col(dim)).agg(
        foldSum(col(other),
          col("n_docs").cast(DoubleType) * col("weight")).as("_dsum"))
      cur = cur.join(broadcast(sums), Seq(dim))
        .withColumn("weight",
          col("weight") * (col(target) * col("_N")) / col("_dsum"))
        .drop("_dsum")
    }
    var prevRound: DataFrame = null // round 0's `cur` is a projection
    // over the counts checkpoint — tracked separately below
    (1 to iters).foreach { _ =>
      step("_r", "_c", "_tr")
      step("_c", "_r", "_tc")
      val next = cur.localCheckpoint(true)
      if (prevRound != null) graft.plans.Checkpoints.drop(prevRound)
      prevRound = next
      cur = next
    }
    // iters >= 1, so `cur` is its own checkpoint here and the counts
    // frame (consumed by round 1's materialization) is dead
    graft.plans.Checkpoints.drop(counts)
    cur.select(col("_r").as(rowCol), col("_c").as(colCol),
      col("n_docs"), col("weight"),
      (col("n_docs").cast(DoubleType) * col("weight")).as("expected"))
  }
}
