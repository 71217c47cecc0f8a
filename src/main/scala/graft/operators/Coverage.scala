package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions

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
  *  - per round, the covered-shingle set is bounded by
  *    rounds × (shingles per doc) — a driver-bounded, BROADCAST frame.
  *    Gain = one broadcast LEFT ANTI join + one partial-aggregated
  *    count per doc; the only 1-row driver materialization is the
  *    argmax winner. k selection rounds over 100 TB cost k
  *    broadcast-scan aggregates, never a growing shuffle.
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
    * @return one row per selection round:
    *         (round, doc_id, gain, covered_total) — gain = distinct new
    *         shingles contributed; covered_total = running coverage
    */
  def greedyCoverageSelect(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, rounds: Int): DataFrame = {
    require(shingleSize >= 2 && rounds >= 1,
      s"bad parameters ($shingleSize, $rounds)")
    val spark = docs.sparkSession

    // (id, h): distinct 60-bit shingle tokens per doc; computed once.
    // The distinct's exchange carries (id, hash) only — content-free.
    val shingles = docs
      .select(col(idCol).as("_id"),
        explode(TextFunctions.charNGrams(col(textCol), shingleSize))
          .as("_g"))
      .select(col("_id"), TextFunctions.md5Hash60(col("_g")).as("_h"))
      .distinct()
      .localCheckpoint()

    val picked = scala.collection.mutable.ArrayBuffer.empty[Row]
    var coveredHashes = Vector.empty[Long]
    var pickedIds = Vector.empty[Long]
    var coveredTotal = 0L

    for (r <- 1 to rounds) {
      val coveredDf = spark.createDataFrame(
        spark.sparkContext.parallelize(coveredHashes.map(Row(_)), 1),
        StructType(Seq(StructField("_h", LongType, nullable = false))))
      val gains = shingles
        .filter(if (pickedIds.isEmpty) lit(true)
                else !col("_id").isin(pickedIds: _*))
        .join(broadcast(coveredDf), Seq("_h"), "left_anti")
        .groupBy(col("_id"))
        .agg(count(lit(1)).as("_gain"))
      val winner = gains
        .orderBy(col("_gain").desc, col("_id").asc)
        .limit(1).collect()
      winner.headOption match {
        case None => // no doc contributes anything new: stop early
        case Some(w) =>
          val id = w.getLong(0); val gain = w.getLong(1)
          coveredTotal += gain
          picked += Row(r, id, gain, coveredTotal)
          pickedIds :+= id
          // the winner's shingles: bounded by one doc's length
          coveredHashes ++= shingles.filter(col("_id") === id)
            .select(col("_h")).collect().map(_.getLong(0))
      }
    }

    spark.createDataFrame(
      spark.sparkContext.parallelize(picked.toSeq, 1),
      StructType(Seq(
        StructField("round", IntegerType, nullable = false),
        StructField("doc_id", LongType, nullable = false),
        StructField("gain", LongType, nullable = false),
        StructField("covered_total", LongType, nullable = false))))
      .orderBy("round")
  }
}
