package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage — the entity-resolution primitive of
  * large-scale data cleaning (dedup of customer/supplier/author names,
  * catalog reconciliation, source-to-source identity joins).
  *
  * The reference's pipeline dedups on exact row equality only
  * (`/root/reference/monarch_etl/db_loader.py:31-40` drops exact
  * duplicates); production corpora also need NEAR-identical record
  * linkage, where the match predicate is an edit-distance bound.
  *
  * Naive fuzzy matching is the textbook scale killer: levenshtein over
  * the cross product is O(|L|·|R|) distance computations — 10¹⁰ pairs
  * before breakfast at 100 TB. The standard fix is BLOCKING: a cheap
  * deterministic key (a prefix, a phonetic code, a sorted-token
  * signature) partitions both sides, candidates form only within a
  * block, and the verifier runs on candidates alone. The join
  * exchanges carry (block, id, text) — never a cross product — and
  * Spark plans it as an ordinary shuffled equi-join on the block key
  * with the distance predicate as a post-join filter (codegen'd
  * `levenshtein`, no UDF).
  *
  * Skew discipline (the same contract as the MinHash capped buckets,
  * [[Dedup]]): a degenerate blocking key ("", "UNKNOWN") re-creates
  * the cross product inside one block. Blocks whose side exceeds
  * `maxBlockSize` are dropped deterministically — linkage recall
  * degrades observably (the dropped blocks are returned to the
  * caller), the job never quadratically explodes. The cap join
  * broadcasts only (block, n) for oversized blocks — driver-bounded
  * by construction.
  */
object Linkage {

  /** Verified fuzzy matches between `left` and `right`:
    * (id_a, id_b, dist) for every cross-side pair that shares a
    * blocking key and has levenshtein(text_a, text_b) ≤ `maxDist`,
    * excluding pairs from blocks larger than `maxBlockSize` on either
    * side. Self-linkage (left eq right) is the caller's composition:
    * pass the same frame twice and filter `id_a < id_b`.
    */
  def blockedFuzzyPairs(
      left: DataFrame, right: DataFrame,
      idCol: String, blockCol: String, textCol: String,
      maxDist: Int, maxBlockSize: Int = 10000): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(maxBlockSize >= 1, s"maxBlockSize must be >= 1, got $maxBlockSize")
    val l = left.select(col(idCol).as("id_a"), col(blockCol).as("_blk"),
      col(textCol).as("_ta"))
    val r = right.select(col(idCol).as("id_b"), col(blockCol).as("_blk"),
      col(textCol).as("_tb"))
    // oversized-block keys: tiny by construction (count per block ≫
    // maxBlockSize only for degenerate keys), broadcast the exclusion
    val bigL = l.groupBy(col("_blk")).count()
      .filter(col("count") > maxBlockSize).select(col("_blk"))
    val bigR = r.groupBy(col("_blk")).count()
      .filter(col("count") > maxBlockSize).select(col("_blk"))
    val big = bigL.unionByName(bigR).distinct()
    l.join(broadcast(big), Seq("_blk"), "left_anti")
      .join(r.join(broadcast(big), Seq("_blk"), "left_anti"), Seq("_blk"))
      .withColumn("dist", levenshtein(col("_ta"), col("_tb")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Sorted-neighborhood duplicate blocking — the classic third
    * blocking family next to key blocking ([[blockedFuzzyPairs]]) and
    * LSH banding ([[Dedup]]): impose a total order on a sort key,
    * compare each record only against its `window` successors, verify
    * candidates with exact token Jaccard. Catches the near-dups whose
    * shared PREFIX puts them adjacent in sort order — a different
    * recall profile from hash blocking, which is why ER pipelines run
    * both.
    *
    * Scale shape: the global order comes from
    * [[Sampling.assignSequentialIds]] (range partition + per-partition
    * offsets — never a global window); each window offset d∈[1,w] is
    * one EQUALITY join keyed on the dense rank, so candidate volume is
    * exactly w·N by construction — no block-size skew risk at all.
    * Only (id, rank, token-hash array) cross the join exchanges:
    * callers pass `tokens` as 60-bit md5 hashes
    * ([[graft.functions.TextFunctions.md5Hash60]]) so no document
    * content ships. The Jaccard verify is integer cross-multiplied
    * (inter·100 ≥ pct·union) — exact, no float threshold.
    *
    * Returns (id_a, id_b, n_common, n_union) for qualifying pairs,
    * id_a the sort-order predecessor.
    */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String,
      sortKey: org.apache.spark.sql.Column, tokens: org.apache.spark.sql.Column,
      window: Int, minPct: Int): DataFrame = {
    require(window >= 1 && window <= 16, s"window must be in [1,16], got $window")
    require(minPct >= 1 && minPct <= 100, s"minPct must be in [1,100], got $minPct")
    val base = df.select(col(idCol).as("_id"), sortKey.as("_sk"),
      array_distinct(tokens).as("_tk"))
    val ranked = Sampling.assignSequentialIds(base, "_sk", "_rn")
      .select(col("_id"), col("_rn"), col("_tk"))
    val a = ranked.select(col("_id").as("id_a"), col("_rn"),
      col("_tk").as("_ta"))
    val pairs = (1 to window).map { d =>
      val b = ranked.select(col("_id").as("id_b"),
        (col("_rn") - d).as("_rn"), col("_tk").as("_tb"))
      a.join(b, Seq("_rn"))
    }.reduceLeft(_.unionByName(_))
    pairs
      .withColumn("_i", size(array_intersect(col("_ta"), col("_tb"))))
      .withColumn("_u", size(col("_ta")) + size(col("_tb")) - col("_i"))
      .filter(col("_i") * 100 >= lit(minPct) * col("_u"))
      .select(col("id_a"), col("id_b"),
        col("_i").cast("long").as("n_common"),
        col("_u").cast("long").as("n_union"))
  }

  /** The blocking keys [[blockedFuzzyPairs]] dropped for exceeding
    * `maxBlockSize` — linkage recall is degraded exactly here, and a
    * production run logs/averts them (better key, per-block sub-
    * blocking) instead of silently under-matching.
    */
  def oversizedBlocks(
      df: DataFrame, blockCol: String, maxBlockSize: Int = 10000): DataFrame =
    df.groupBy(col(blockCol)).count()
      .filter(col("count") > maxBlockSize)
      .select(col(blockCol), col("count").as("n"))

  /** Survivorship: collapse each match cluster to ONE golden record —
    * the consolidation step after [[blockedFuzzyPairs]] has said which
    * rows are the same real-world entity. Per payload column the
    * surviving value is the most recent NON-NULL one (revision order,
    * id tiebreak): a newer record with a missing phone number must not
    * erase the older record's phone — per-COLUMN survivorship, the MDM
    * "best of breed" rule, not per-row winner-takes-all.
    *
    * Mechanics: one hash aggregate per cluster;
    * `max(when(nonNull, struct(rev, id, value)))` per column picks the
    * latest non-null deterministically under any partitioning (rev+id
    * is a total order; all-NULL columns survive as NULL). The cluster
    * id and member count ride along for lineage. One exchange on the
    * cluster key, map-side combined — at 100 TB this is a plain
    * aggregate, no window, no sort.
    */
  def goldenRecords(df: DataFrame, clusterCol: String, revCol: String,
      idCol: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "goldenRecords: no payload columns")
    val aggs =
      count(lit(1)).as("n_members") +:
        min(col(idCol)).as("canonical_id") +:
        cols.map { c =>
          max(when(col(c).isNotNull,
            struct(col(revCol).as("r"), col(idCol).as("i"), col(c).as("v"))))
            .getField("v").as(c)
        }
    df.groupBy(col(clusterCol))
      .agg(aggs.head, aggs.tail: _*)
  }
}
