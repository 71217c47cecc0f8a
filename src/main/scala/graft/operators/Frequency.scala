package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions._

/** Exact distributed heavy hitters (frequent-term mining) — the
  * "what are the most common tokens / URLs / hosts in 100 TB of text"
  * question every corpus audit starts with.
  *
  * The naive `groupBy(term).count()` shuffles one record per DISTINCT
  * term per map task — for web text (URLs, typos, hex blobs) that is
  * the full vocabulary, billions of keys. This operator instead runs
  * the classic two-phase summary + verification:
  *
  *  1. Per-partition '''Misra-Gries''' sketch with `k` counters
  *     (`mapPartitions` — genuine bounded-memory imperative state, the
  *     documented exception to the no-RDD rule): at most `k` (term,
  *     count) rows leave each partition regardless of vocabulary size,
  *     plus one sentinel row carrying the partition's decrement-step
  *     count and token total.
  *  2. The merged sketch UNDERCOUNTS any term by at most D = the total
  *     number of decrement steps (each step subtracts 1 from every
  *     counter). So every term with true frequency ≥ ceil(τ·N)
  *     survives the candidate filter `mgCount ≥ ceil(τ·N) − D` —
  *     no false negatives, provably.
  *  3. A second corpus pass counts ONLY the candidates exactly
  *     (broadcast `isin` filter → hash aggregate over ≤ k·P keys) and
  *     applies the exact threshold — no false positives.
  *
  * The result is bit-identical to the naive exact query (that is the
  * oracle), but the shuffle is bounded by k·partitions rows in phase 1
  * and |candidates| keys in phase 2, never by vocabulary size.
  *
  * The merged-summary collect is bounded by k × partitions rows
  * (k=64 × 32 tasks ≈ 2k at test config) — that bound is the entire
  * point of Misra-Gries, so the driver materialization is safe by
  * construction at any corpus size.
  */
object Frequency {

  /** One Misra-Gries summary row. `term = null` marks the per-partition
    * sentinel carrying `decrements` (undercount bound) and `tokens`
    * (partition token total, so N needs no second pass).
    */
  final case class MgRow(term: String, cnt: Long, decrements: Long, tokens: Long)

  /** Terms whose exact corpus frequency is ≥ ceil(tau * totalTokens),
    * with their exact counts: (term, n_occurrences), ordered by count
    * desc then term. Tokenization is trim → lower → whitespace split,
    * blanks dropped (matches [[graft.functions.TextFunctions.tokens]]).
    */
  def exactHeavyHitters(
      df: DataFrame, textCol: String = "text",
      tau: Double = 0.033, k: Int = 64): DataFrame = {
    require(tau > 0.0 && tau < 1.0, s"tau must be in (0,1), got $tau")
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = df.sparkSession
    import spark.implicits._

    val toks: Dataset[String] = graft.sources.Tables.widen(df)
      .select(explode(nonEmptyTokens(lower(col(textCol)))).as("term"))
      .as[String]

    val partials = toks.mapPartitions { it =>
      val counts = mutable.HashMap.empty[String, Long]
      var decs = 0L
      var n = 0L
      it.foreach { t =>
        n += 1
        counts.get(t) match {
          case Some(c) => counts.update(t, c + 1)
          case None if counts.size < k => counts.update(t, 1L)
          case None =>
            // table full, new term: decrement every counter, drop zeros,
            // discard the incoming token — one Misra-Gries step.
            decs += 1
            val dead = mutable.ArrayBuffer.empty[String]
            counts.keysIterator.foreach { key =>
              val c = counts(key) - 1
              if (c == 0L) dead += key else counts.update(key, c)
            }
            dead.foreach(counts.remove)
        }
      }
      counts.iterator.map { case (t, c) => MgRow(t, c, 0L, 0L) } ++
        Iterator.single(MgRow(null, 0L, decs, n))
    }

    // Bounded collect: ≤ k rows per partition + 1 sentinel each.
    val merged = partials.groupBy(col("term"))
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("decrements")).as("decs"),
        sum(col("tokens")).as("toks"))
      .collect()
    val totalN = merged.iterator.map(_.getLong(3)).sum
    val totalD = merged.iterator.map(_.getLong(2)).sum
    val exactThreshold = math.ceil(tau * totalN).toLong
    val pruneAt = exactThreshold - totalD

    // When pruneAt ≤ 0 the sketch proves nothing (undersized k for this
    // tau — D ≥ τN): a qualifying term may be ABSENT from the sketch
    // entirely, so the only sound candidate set is "all terms" and the
    // verification pass degenerates to the naive exact count. With the
    // intended sizing (k ≥ 2/τ ⇒ D ≤ N/(k+1) ≤ τN/2) this never fires.
    val counted =
      if (pruneAt <= 0) {
        toks.toDF("term")
      } else {
        val candidates = merged.iterator
          .filter(r => !r.isNullAt(0) && r.getLong(1) >= pruneAt)
          .map(_.getString(0)).toSeq
        if (candidates.isEmpty) {
          return spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(Seq(StructField("term", StringType),
              StructField("n_occurrences", LongType))))
        }
        toks.toDF("term").filter(col("term").isin(candidates: _*))
      }
    counted
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") >= exactThreshold)
      .orderBy(col("n_occurrences").desc, col("term"))
  }
}
