package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.dedup.Dedup

/** Incremental near-duplicate-free corpus ingestion: the streaming dual
  * of the MinHash+LSH batch dedup.
  *
  * Each micro-batch is admitted through two gates:
  *   1. WITHIN the batch: the standard min-id keep policy — a doc
  *      survives iff it is its own cluster representative over the
  *      verified LSH pairs (`Dedup.clusterReps` semantics).
  *   2. AGAINST the corpus: survivors whose LSH band buckets collide
  *      with an ALREADY-ADMITTED doc, and whose exact n-gram Jaccard
  *      against that doc clears the threshold, are rejected.
  * Admitted docs append to the corpus, and their band hashes + gram
  * sets append to a persistent index — the only state the cross-batch
  * gate ever reads.
  *
  * Scale design: the index is (doc_id, band_idx, band_hash) plus
  * (doc_id, grams); the candidate check is one equi-join on
  * (band_idx, band_hash) — never all-pairs, never a corpus scan — and
  * verification joins grams for candidate ids only. At 100 TB the index
  * partitions by band_hash prefix and batches join against it with the
  * same plan. Single-writer by design (one stream owns the corpus),
  * like every merge sink in this engine.
  *
  * Exactly-once under foreachBatch's at-least-once retries: every
  * output (corpus rows, band index, gram sets) writes to a
  * batch-scoped partition `batch=<id>` with overwrite semantics, so a
  * re-run of a crashed batch replaces its own partial output instead
  * of appending duplicates — and the cross-batch gate excludes the
  * current batch id from its index reads, so a prior partial attempt
  * can never reject its own re-run.
  */
object IncrementalDedup {

  final case class BatchStats(batchId: Long, incoming: Long, admitted: Long)

  private def bandsOf(mh: DataFrame): DataFrame = Dedup.bands(mh)

  private def hasParquet(dir: String): Boolean =
    Files.exists(Paths.get(dir)) && Compaction.dataFiles(dir).nonEmpty

  /** Admit one batch of (doc_id, text) into corpusDir/indexDir; returns
    * per-batch stats. Deterministic for a given batch split and
    * idempotent per batchId (see the exactly-once note above). */
  def admitBatch(
      spark: SparkSession,
      batch: DataFrame,
      batchId: Long,
      corpusDir: String,
      indexDir: String,
      threshold: Double): BatchStats = {
    val n = batch.count()
    if (n == 0) return BatchStats(batchId, 0, 0)

    val grams = Dedup.withGramsJvm(batch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mh = Dedup.withMinhash(grams)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Gate 1 — within-batch min-id keep policy.
    val batchPairs = Dedup.minhashPairs(mh, threshold)
    val reps = Dedup.clusterReps(batch.select("doc_id"), batchPairs)
    val survivors = mh.join(
      reps.filter(col("rep_id") === col("doc_id")).select("doc_id"), "doc_id")

    // Gate 2 — banded candidate check against the admitted corpus
    // (excluding any partial prior attempt of THIS batch).
    // Both halves of the index must exist: a crash can leave bands
    // without grams (or vice versa) for a batch that will be retried —
    // an unverifiable candidate set means no admitted doc to collide
    // with, so the empty-index path is the correct (and safe) answer.
    val admitted =
      if (!hasParquet(s"$indexDir/bands") || !hasParquet(s"$indexDir/grams")) survivors
      else {
        val idxBands = spark.read.parquet(s"$indexDir/bands")
          .filter(col("batch") =!= batchId)
          .select("doc_id", "band_idx", "band_hash")
        val idxGrams = spark.read.parquet(s"$indexDir/grams")
          .filter(col("batch") =!= batchId)
          .select("doc_id", "grams")
        val cands = bandsOf(survivors).alias("n")
          .join(idxBands.alias("o"),
            col("n.band_idx") === col("o.band_idx") &&
              col("n.band_hash") === col("o.band_hash"))
          .select(col("n.doc_id").as("new_id"), col("o.doc_id").as("old_id"))
          .distinct()
        val rejected = cands
          .join(survivors.select(col("doc_id").as("new_id"), col("grams").as("ng")), "new_id")
          .join(idxGrams.select(col("doc_id").as("old_id"), col("grams").as("og")), "old_id")
          .withColumn("inter", size(array_intersect(col("ng"), col("og"))))
          .filter(
            col("inter").cast("double") /
              (size(col("ng")) + size(col("og")) - col("inter")) >= threshold)
          .select("new_id").distinct()
        survivors.join(rejected, col("doc_id") === col("new_id"), "left_anti")
      }

    val adm = admitted
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nAdmitted = adm.count()

    // Persist the new state into batch-scoped partitions, overwrite
    // semantics: a retried batch replaces its own output (idempotent).
    batch.join(adm.select("doc_id"), "doc_id")
      .write.mode("overwrite").parquet(s"$corpusDir/batch=$batchId")
    bandsOf(adm).write.mode("overwrite").parquet(s"$indexDir/bands/batch=$batchId")
    adm.select("doc_id", "grams")
      .write.mode("overwrite").parquet(s"$indexDir/grams/batch=$batchId")

    Seq(grams, mh, adm).foreach(_.unpersist())
    BatchStats(batchId, n, nAdmitted)
  }

  /** Streaming wrapper: foreachBatch over a (doc_id, text) stream. */
  def startIngest(
      docs: DataFrame,
      corpusDir: String,
      indexDir: String,
      checkpointDir: String,
      threshold: Double): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitBatch(batch.sparkSession, batch, batchId, corpusDir, indexDir, threshold)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
