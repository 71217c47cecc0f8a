package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining: which item pairs appear in the
  * same basket more often than independence predicts (lift > 1)?
  *
  * The degenerate formulation is items × items per basket — quadratic
  * in basket size and, joined naively, a self-join whose output at
  * 100 TB dwarfs the input. This one is safe by construction:
  *
  *  - the pair explode is an equi-self-join on the BASKET key, so the
  *    per-basket expansion is bounded by the basket width (TPC-H
  *    lineitem: ≤ 7 lines; retail baskets: dozens) — output is
  *    O(rows × avg_basket), not O(rows²);
  *  - `itemA < itemB` inside the join condition halves the work and
  *    emits each unordered pair exactly once — there is no
  *    post-dedup pass;
  *  - pair counts and item counts are ordinary map-side-partial hash
  *    aggregates; the lift join is keyed on itemA/itemB (AQE
  *    broadcasts the item-count side when it fits);
  *  - the final top-k is `orderBy(...).limit(k)` ⇒
  *    TakeOrderedAndProject — per-partition heaps, never a global
  *    sort.
  *
  * Lift is reported in exact integer milli-units:
  * `lift_milli = ⌊pairs·baskets·1000 / (cntA·cntB)⌋` — one integer
  * division on counts, bit-identical on any engine (magnitudes stay
  * under 2⁶³ through ~sf10; beyond that the same formula runs in
  * DECIMAL(38,0)).
  */
object Association {

  /** Top-k co-occurring item pairs with support and lift.
    *
    * `df` must carry one row per (basket, item) — callers distinct
    * beforehand if an item can repeat inside a basket.
    * `nBaskets` is the total basket count (callers usually compute it
    * with a scalar count-distinct — kept as a parameter so the one
    * scalar aggregate is visible at the call site).
    */
  def basketLift(df: DataFrame, basketCol: String, itemCol: String,
      minPairs: Long, topK: Int): DataFrame = {
    val b = df.select(col(basketCol).as("_b"), col(itemCol).as("_i"))
    val nBaskets = b.select(countDistinct(col("_b")).as("n_baskets"))
    val itemCnt = b.groupBy(col("_i")).agg(count(lit(1)).as("_cnt"))
    val pairs = b.as("l")
      .join(b.as("r"),
        col("l._b") === col("r._b") && col("l._i") < col("r._i"))
      .groupBy(col("l._i").as("item_a"), col("r._i").as("item_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .where(col("n_pairs") >= minPairs)
    pairs
      .join(itemCnt.withColumnRenamed("_i", "item_a")
        .withColumnRenamed("_cnt", "cnt_a"), Seq("item_a"))
      .join(itemCnt.withColumnRenamed("_i", "item_b")
        .withColumnRenamed("_cnt", "cnt_b"), Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_pairs"),
        col("cnt_a"), col("cnt_b"),
        expr("n_pairs * n_baskets * 1000 div (cnt_a * cnt_b)")
          .as("lift_milli"))
      .orderBy(col("n_pairs").desc, col("item_a"), col("item_b"))
      .limit(topK)
  }
}
