package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Dedup

/** Continuous corpus ingestion with near-dup filtering — the streaming
  * integration of the persisted MinHash index
  * ([[graft.operators.Dedup.writeMinHashIndex]] family): each arriving
  * micro-batch is deduped AGAINST EVERYTHING INGESTED SO FAR, and its
  * survivors join both the corpus and the index so the next batch
  * dedups against them too. This is the production shape of a training
  * corpus that grows daily: no batch ever recomputes a historical
  * signature, state lives in the index (not in streaming state-store
  * memory), and the index is compactable online
  * ([[graft.operators.Dedup.compactMinHashIndex]]).
  *
  * Semantics: a new doc is dropped iff some already-ingested doc is
  * near-identical (exact-verified Jaccard ≥ `minJaccard`). Docs within
  * one batch do NOT filter each other (same contract as the q60
  * incremental path) — run a batch-level dedup upstream if intra-batch
  * duplication matters.
  *
  * Delivery: `foreachBatch` replays a batch (same `batchId`, same
  * rows) after a crash, so the sink must be idempotent per batch id
  * to be exactly-once. The keyed path ([[ingestBatch]] with
  * `batchId = Some(id)`, which [[ingestStream]] always uses) commits
  * each batch atomically: survivors and index signatures are written
  * to staging directories, moved into the live directories under
  * deterministic `batch<id>-` file names, and sealed by a
  * `_committed-batch-<id>` marker (hidden from Spark's file index).
  * A replayed batch whose marker exists is a no-op; a replay after a
  * mid-commit crash first deletes the partial `batch<id>-*` files —
  * so the recompute sees exactly the pre-batch index state — then
  * redoes the batch. The marker create is the single commit point.
  * The unkeyed path (`batchId = None`, direct batch calls) keeps the
  * plain append semantics: at-least-once on caller-managed retry.
  */
object CorpusIngest {

  import org.apache.hadoop.fs.{FileSystem, Path}

  import BatchCommit.{cleanBatchFiles, hasData, moveIn}

  /** Ingest ONE batch: dedup against the index (bootstrap: a missing
    * index means nothing ingested yet — everything survives), append
    * survivors to the corpus parquet and their signatures to the
    * index. Runs identically as a `foreachBatch` handler or called
    * directly on static frames (the batch twin the oracle checks).
    * Returns the number of surviving rows.
    */
  def ingestBatch(
      batch: DataFrame, indexPath: String, corpusPath: String,
      idCol: String, textCol: String, minJaccard: Double = 0.6,
      shingleSize: Int = 7, numHashes: Int = 96, bands: Int = 24,
      maxBucketSize: Int = 10000, batchId: Option[Long] = None): Long = {
    val spark = batch.sparkSession
    val idx = new Path(indexPath)
    val fs = idx.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def dedupAndMaterialize(): DataFrame = {
      val survivors =
        if (!hasData(fs, idx)) batch
        else {
          val matched = Dedup.incrementalNearDupPairs(batch, indexPath,
              idCol, textCol, minJaccard,
              shingleSize, numHashes, bands, maxBucketSize)
            .select(col("new_id").as(idCol)).distinct()
          batch.join(matched, Seq(idCol), "left_anti")
        }
      // one materialization serves both writes (corpus + index) — the
      // anti-join would otherwise recompute per sink
      survivors.localCheckpoint(true)
    }

    batchId match {
      case None =>
        // unkeyed: plain appends, at-least-once under caller retry
        val surv = dedupAndMaterialize()
        surv.write.mode("append").parquet(corpusPath)
        if (hasData(fs, idx))
          Dedup.appendToMinHashIndex(surv, indexPath, idCol, textCol,
            shingleSize, numHashes, bands)
        else
          Dedup.writeMinHashIndex(surv, indexPath, idCol, textCol,
            shingleSize, numHashes, bands)
        val n = surv.count()
        // both sinks consumed the materialization — a long-running
        // stream must not accumulate one survivors frame per batch
        graft.plans.Checkpoints.drop(surv)
        n

      case Some(id) =>
        val corpus = new Path(corpusPath)
        val marker = new Path(corpusPath, s"_committed-batch-$id")
        if (fs.exists(marker)) {
          // replay of a committed batch: exactly-once no-op
          BatchCommit.readMarker(fs, marker)
        } else {
          // crashed-attempt residue must go BEFORE the recompute, so
          // the anti-join sees exactly the pre-batch index state
          cleanBatchFiles(fs, corpus, id)
          cleanBatchFiles(fs, idx, id)
          val surv = dedupAndMaterialize()
          val n = surv.count()
          val stagingCorpus = new Path(s"$corpusPath.staging-batch-$id")
          val stagingIndex = new Path(s"$indexPath.staging-batch-$id")
          Seq(stagingCorpus, stagingIndex).foreach(p => fs.delete(p, true): Unit)
          surv.write.mode("overwrite").parquet(stagingCorpus.toString)
          // writeMinHashIndex(overwrite-to-staging) serves bootstrap
          // and append alike: the move makes it an append
          Dedup.writeMinHashIndex(surv, stagingIndex.toString, idCol,
            textCol, shingleSize, numHashes, bands)
          moveIn(fs, stagingCorpus, corpus, id)
          moveIn(fs, stagingIndex, idx, id)
          // single atomic commit point (see BatchCommit.writeMarker)
          BatchCommit.writeMarker(fs, corpusPath, id, n)
          // committed: the batch's materialized survivors are dead
          graft.plans.Checkpoints.drop(surv)
          n
        }
    }
  }

  /** The streaming form: every micro-batch through the KEYED
    * [[ingestBatch]] path — Structured Streaming replays a failed
    * batch under the same `batchId` with the same rows, and the keyed
    * commit makes the replay a no-op, so the corpus is exactly-once
    * end to end. With `Trigger.AvailableNow` this drains a backlog
    * exactly like the sequential batch calls the spec compares
    * against; left running, it ingests continuously.
    */
  def ingestStream(
      stream: DataFrame, indexPath: String, corpusPath: String,
      idCol: String, textCol: String, checkpointDir: String,
      minJaccard: Double = 0.6): StreamingQuery =
    stream.writeStream
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        ingestBatch(b.toDF(), indexPath, corpusPath, idCol, textCol,
          minJaccard, batchId = Some(id)): Unit
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
