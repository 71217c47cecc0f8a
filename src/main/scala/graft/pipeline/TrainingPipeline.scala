package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.{Dedup, Sampling, TextAnalysis}

/** End-to-end training-corpus preparation: the composition every
  * operator in this library exists for, in the order a production
  * pretraining pipeline runs it (each stage is the library operator —
  * nothing here is new logic, which is the point: the pieces compose).
  *
  *   1. scrub   — mask identifier-like spans, normalize whitespace
  *                ([[graft.functions.TextFunctions.scrubText]])
  *   2. gate    — drop low-quality docs (token count + quality score)
  *   3. exact   — drop byte-duplicate content, keep lowest id
  *   4. near    — MinHash+LSH near-dup pairs → connected components →
  *                keep each cluster's canonical (lowest-id) doc
  *   5. split   — deterministic hash-based train/val/test assignment
  *
  * Scale shape: stages 1-2 are pure projections/filters (no shuffle);
  * stage 3 shuffles (hash, id) pairs only — duplicate ids resolve by
  * min-id aggregation and the corpus anti-joins them away on id, so
  * the text payload never crosses an exchange (the id-join default
  * since r6; see [[graft.operators.Dedup.dedupByFingerprint]]);
  * stage 4 shuffles band keys + ids and verifies candidates only;
  * stage 5 is a projection.
  */
object TrainingPipeline {

  final case class Config(
      idCol: String = "doc_id",
      textCol: String = "text",
      minTokens: Int = 10,
      minScore: Double = 0.3,
      minJaccard: Double = 0.6,
      shingleSize: Int = 7,
      numHashes: Int = 96,
      bands: Int = 24,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      // md5-based split assignment instead of xxhash64: any ANSI engine
      // reproduces it bit-for-bit (external audits, the q59 oracle);
      // costs a per-row hex materialization, so default off at scale
      auditableSplit: Boolean = false)

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** [[prepare]]'s result plus the near-dup stage's capped-bucket count.
    * `cappedBucketCount > 0` means some LSH buckets were star-linked:
    * the near-dup drop may then remove docs whose measured similarity
    * to the bucket representative is below `minJaccard` (the lossier
    * capped semantics — see [[graft.operators.Dedup.cappedBandPairs]]).
    */
  final case class Prepared(corpus: DataFrame, cappedBucketCount: Long)

  /** Run the full preparation; returns the cleaned corpus with a
    * `split` column. Deterministic end to end: no rand(), no
    * timestamps — re-running on the same input yields byte-identical
    * output (the property that makes a 100 TB pipeline re-entrant).
    */
  def prepare(docs: DataFrame, cfg: Config = Config()): DataFrame =
    prepareMetered(docs, cfg).corpus

  /** [[prepare]] with the near-dup capped-bucket count surfaced at the
    * PIPELINE level (not only in Dedup's own logs): a capped run can
    * drop docs that never verified against their representative, and
    * that data-loss mode must be visible to the pipeline caller.
    */
  def prepareMetered(docs: DataFrame, cfg: Config = Config()): Prepared = {
    // 1. scrub (projection only)
    val scrubbed = docs.withColumn(cfg.textCol, scrubText(col(cfg.textCol)))
    // 2. quality gate — MATERIALIZED (localCheckpoint cuts lineage and
    // pins the stage output): the id-join dedup below references its
    // input twice by construction, and the near-dup stage traverses the
    // deduped corpus again — without a stage boundary here the
    // regex-heavy scrub projection re-executes once per traversal
    // (measured 8× on the q59 bench when stage 3 became a join). This
    // is the materialization any production pipeline places between
    // its expensive-transform and multi-pass stages.
    val gated = TextAnalysis.qualityFilter(
      scrubbed, cfg.textCol, cfg.minTokens, cfg.minScore)
      .localCheckpoint(true)
    // 3. exact dedup on content fingerprint — also materialized: it is
    // read by both the near-dup pair builder and the final drop
    val exact = Dedup.dedupByFingerprint(gated, cfg.textCol, cfg.idCol)
      .localCheckpoint(true)
    // 4. near-dup clusters → keep canonical doc per cluster
    val cp = Dedup.verifiedNearDupPairsMetered(
      exact, cfg.idCol, cfg.textCol, cfg.minJaccard,
      cfg.shingleSize, cfg.numHashes, cfg.bands)
    if (cp.cappedBucketCount > 0)
      log.warn(s"TrainingPipeline.prepare: ${cp.cappedBucketCount} over-cap LSH bucket(s) " +
        "were star-linked — near-dup drops in those buckets are unverified " +
        "(possible below-threshold drops); see Dedup.cappedBandPairs")
    val nearDeduped = Dedup.dropNearDuplicates(exact, cfg.idCol, cp.pairs)
    // 5. deterministic split
    val split =
      if (cfg.auditableSplit) Sampling.md5Split(nearDeduped, cfg.idCol, cfg.splits)
      else Sampling.hashSplit(nearDeduped, cfg.idCol, cfg.splits)
    Prepared(split, cp.cappedBucketCount)
  }
}
