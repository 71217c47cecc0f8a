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
  * Delivery: `foreachBatch` is at-least-once on retry; the parquet
  * append is not keyed by batch id, so a mid-write crash can duplicate
  * a batch's survivors in the corpus (never lose them). Production
  * hardening would stage per-batch output directories keyed by
  * `batchId` and commit by rename — the same swap machinery
  * `graft.sinks.Writers` uses.
  */
object CorpusIngest {

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
      maxBucketSize: Int = 10000): Long = {
    val spark = batch.sparkSession
    val idx = new org.apache.hadoop.fs.Path(indexPath)
    val fs = idx.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val indexExists = fs.exists(idx)
    val survivors =
      if (!indexExists) batch
      else {
        val matched = Dedup.incrementalNearDupPairs(batch, indexPath,
            idCol, textCol, minJaccard,
            shingleSize, numHashes, bands, maxBucketSize)
          .select(col("new_id").as(idCol)).distinct()
        batch.join(matched, Seq(idCol), "left_anti")
      }
    // one materialization serves both writes (corpus + index) — the
    // anti-join would otherwise recompute per sink
    val surv = survivors.localCheckpoint(true)
    surv.write.mode("append").parquet(corpusPath)
    if (indexExists)
      Dedup.appendToMinHashIndex(surv, indexPath, idCol, textCol,
        shingleSize, numHashes, bands)
    else
      Dedup.writeMinHashIndex(surv, indexPath, idCol, textCol,
        shingleSize, numHashes, bands)
    surv.count()
  }

  /** The streaming form: every micro-batch through [[ingestBatch]].
    * With `Trigger.AvailableNow` this drains a backlog exactly like
    * the sequential batch calls the spec compares against; left
    * running, it ingests continuously.
    */
  def ingestStream(
      stream: DataFrame, indexPath: String, corpusPath: String,
      idCol: String, textCol: String, checkpointDir: String,
      minJaccard: Double = 0.6): StreamingQuery =
    stream.writeStream
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        ingestBatch(b.toDF(), indexPath, corpusPath, idCol, textCol,
          minJaccard): Unit
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
