package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions
import graft.plans.Checkpoints

/** Coverage-driven corpus curation: greedy maximum-coverage subset
  * selection (the classic (1−1/e) greedy for submodular coverage,
  * facility-location style). Each round picks the document contributing
  * the most NEW shingles to the selected set — the technique behind
  * "select k documents that together cover the most distinct n-grams"
  * curation passes over pre-training corpora.
  *
  * Engine shape (the 100 TB contract):
  *  - the corpus is shingled ONCE into a distinct (id, hash) frame —
  *    60-bit md5 tokens, so text never crosses an exchange — and
  *    materialized (localCheckpoint) so no round re-reads or
  *    re-shingles the corpus;
  *  - the covered-shingle set lives CLUSTER-SIDE as an accumulated
  *    checkpointed frame (size = exactly the running covered_total,
  *    kept distinct per round) — the driver holds only the per-round
  *    picks, so a many-rounds curation run never re-ships a growing
  *    vector driver→cluster. Gain = one LEFT ANTI join (broadcast
  *    while covered_total is under `broadcastMaxHashes`, shuffle
  *    after) + one partial-aggregated count per doc; the only 1-row
  *    driver materialization is the argmax winner. k selection rounds
  *    over 100 TB cost k anti-join-scan aggregates, never a
  *    quadratically growing broadcast.
  *  - the loop BREAKS on the first round with no winner: once nothing
  *    contributes a new shingle, no later round can either (coverage
  *    is monotone), so remaining rounds would be pure waste.
  *
  * Determinism: gains are exact distinct-shingle counts (integer), the
  * winner tie-breaks on lowest id, and coverage totals are running sums
  * of gains — every number replays exactly in ANSI SQL.
  */
object Coverage {

  /** Greedily select `rounds` documents maximizing new-shingle coverage.
    *
    * @param docs        corpus
    * @param idCol       unique document id
    * @param textCol     text column; shingled as character n-grams
    * @param shingleSize character n-gram width (docs shorter contribute
    *                    nothing, matching the substr window recipe)
    * @param rounds      number of documents to select
    * @param broadcastMaxHashes while the covered set holds at most this
    *                    many distinct shingles (its size is KNOWN
    *                    exactly — it is the running covered_total), the
    *                    anti-join broadcasts it; past the guard it
    *                    falls back to a shuffled anti-join. 2M 8-byte
    *                    hashes ≈ 16 MB on the wire — comfortably under
    *                    executor broadcast budgets
    * @return one row per selection round:
    *         (round, doc_id, gain, covered_total) — gain = distinct new
    *         shingles contributed; covered_total = running coverage
    */
  def greedyCoverageSelect(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, rounds: Int,
      broadcastMaxHashes: Long = 2000000L): DataFrame = {
    require(shingleSize >= 2 && rounds >= 1,
      s"bad parameters ($shingleSize, $rounds)")
    val spark = docs.sparkSession

    // (id, h): distinct 60-bit shingle tokens per doc; computed once.
    // The distinct's exchange carries (id, hash) only — content-free.
    // widen: the shingle explode multiplies each doc into ~length(text)
    // rows — on a one-file bench-scale input it would run on ONE scan
    // partition; no-op at real scale (guide §2.5 input skew)
    val shingles = graft.sources.Tables.widen(docs)
      .select(col(idCol).as("_id"),
        explode(TextFunctions.charNGrams(col(textCol), shingleSize))
          .as("_g"))
      .select(col("_id"), TextFunctions.md5Hash60(col("_g")).as("_h"))
      .distinct()
      .localCheckpoint()

    val picked = scala.collection.mutable.ArrayBuffer.empty[Row]
    // Covered shingles stay on the cluster: an accumulated checkpointed
    // (_h) frame, deduplicated each round so its cardinality is exactly
    // coveredTotal. The driver holds only the picks.
    var covered: Option[DataFrame] = None
    var pickedIds = Vector.empty[Long]
    var coveredTotal = 0L
    var exhausted = false

    for (r <- 1 to rounds if !exhausted) {
      val remaining = excludePicked(shingles, pickedIds)
      val fresh = covered match {
        case None => remaining
        case Some(c) =>
          val rhs = if (coveredTotal <= broadcastMaxHashes) broadcast(c) else c
          remaining.join(rhs, Seq("_h"), "left_anti")
      }
      val winner = fresh
        .groupBy(col("_id"))
        .agg(count(lit(1)).as("_gain"))
        .orderBy(col("_gain").desc, col("_id").asc)
        .limit(1).collect()
      winner.headOption match {
        case None =>
          // no doc contributes anything new — and coverage gain is
          // monotone non-increasing, so none ever will: stop the loop
          // instead of re-running identical empty rounds
          exhausted = true
        case Some(w) =>
          val id = w.getLong(0); val gain = w.getLong(1)
          coveredTotal += gain
          picked += Row(r, id, gain, coveredTotal)
          pickedIds :+= id
          // fold the winner's shingles into the cluster-side covered
          // set; distinct keeps its size == coveredTotal, and the eager
          // checkpoint cuts lineage so round r never replays rounds <r
          val winnerShingles =
            shingles.filter(col("_id") === id).select(col("_h"))
          val grown = (covered match {
            case None => winnerShingles
            case Some(c) => c.unionByName(winnerShingles).distinct()
          }).localCheckpoint(true)
          covered.foreach(Checkpoints.drop) // superseded covered set
          covered = Some(grown)
      }
    }
    // all rounds done: the covered set and the shingle frame are dead
    // (the result below is driver-side picks only)
    covered.foreach(Checkpoints.drop)
    Checkpoints.drop(shingles)

    spark.createDataFrame(
      spark.sparkContext.parallelize(picked.toSeq, 1),
      pickedSchema)
      .orderBy("round")
  }

  /** Drop already-picked docs from the shingle frame via a broadcast
    * LEFT ANTI join against the (driver-built, `rounds`-bounded) picks
    * frame — NOT an `isin` literal, whose predicate (and its codegen)
    * grows with every round: a thousands-of-rounds curation run would
    * bloat each round's plan compilation linearly, while the anti-join
    * plan is rounds-independent (the picks ride one tiny broadcast
    * LocalRelation; CoverageSpec asserts the plan-size invariance).
    */
  private[graft] def excludePicked(
      shingles: DataFrame, pickedIds: Seq[Long]): DataFrame =
    if (pickedIds.isEmpty) shingles
    else {
      val s = shingles.sparkSession
      import s.implicits._
      shingles.join(broadcast(pickedIds.toDF("_id")), Seq("_id"), "left_anti")
    }

  private val pickedSchema =
    StructType(Seq(
      StructField("round", IntegerType, nullable = false),
      StructField("doc_id", LongType, nullable = false),
      StructField("gain", LongType, nullable = false),
      StructField("covered_total", LongType, nullable = false)))
}
