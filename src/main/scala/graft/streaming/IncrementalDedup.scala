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

  /** Streaming wrapper: foreachBatch over a (doc_id, text) stream.
    * `compactEvery` > 0 folds the index partitions every that-many
    * batches (the maintenance hook — without it the index grows one
    * `batch=<id>` partition per micro-batch forever). */
  def startIngest(
      docs: DataFrame,
      corpusDir: String,
      indexDir: String,
      checkpointDir: String,
      threshold: Double,
      compactEvery: Int = 0): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitBatch(batch.sparkSession, batch, batchId, corpusDir, indexDir, threshold)
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
          compactIndex(batch.sparkSession, indexDir)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Fold the per-batch index partitions into a consolidated base —
    * the maintenance dual of Compaction for this index's layout.
    *
    * Why not plain `Compaction.compactPartitions`: bin-packing WITHIN
    * each `batch=<id>` leaf still leaves one partition directory (and
    * one file listing entry, one read task floor) per micro-batch
    * forever. The fold instead rewrites all COMMITTED batches into a
    * single negative-id base partition (`batch=-k`), which the gate's
    * `batch =!= batchId` filter always includes (real ids are >= 0).
    *
    * Safety under foreachBatch's at-least-once contract:
    *  - the HIGHEST real batch id is never folded — it may be a crashed
    *    partial attempt that will be retried, and folding it would let
    *    the retry's cross-batch gate see its own prior output (ids
    *    strictly below the max are checkpoint-committed and can never
    *    re-run);
    *  - the new base is staged to a dot-dir (invisible to partition
    *    discovery) and moved in BEFORE the folded sources are deleted —
    *    a crash mid-fold leaves duplicate index rows, which the
    *    existential candidate gate is insensitive to, and the next fold
    *    absorbs them.
    *
    * Admission decisions are bit-identical before and after: the index
    * CONTENT is unchanged, only its partition layout collapses. */
  def compactIndex(
      spark: SparkSession,
      indexDir: String,
      targetBytes: Long = Compaction.DefaultTargetBytes): Map[String, (Int, Int)] =
    Seq("bands", "grams").flatMap { sub =>
      val d = s"$indexDir/$sub"
      if (!Files.exists(Paths.get(d))) None
      else Some(sub -> foldPartitions(spark, d, targetBytes))
    }.toMap

  /** Fold one index half; returns (partitions before, after). */
  private def foldPartitions(
      spark: SparkSession, d: String, targetBytes: Long): (Int, Int) = {
    def batchIds(): Seq[Long] =
      VersionNames.childNames(Paths.get(d))
        .filter(_.startsWith("batch="))
        .flatMap(n => scala.util.Try(n.stripPrefix("batch=").toLong).toOption)
    val ids = batchIds()
    val (bases, real) = ids.partition(_ < 0)
    if (real.isEmpty) return (ids.size, ids.size)
    val foldable = bases ++ real.filter(_ != real.max)
    if (foldable.size <= 1) return (ids.size, ids.size)

    val src = foldable.map(i => s"$d/batch=$i")
    val bytes = src.flatMap(Compaction.dataFiles).map(Files.size(_)).sum
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val staging = s"$d/.folding"
    spark.read.parquet(src: _*).coalesce(nFiles)
      .write.mode("overwrite").parquet(staging)
    val newBase = bases.minOption.getOrElse(0L) - 1
    Files.move(Paths.get(staging), Paths.get(s"$d/batch=$newBase"))
    foldable.foreach(i => VersionNames.deleteTree(Paths.get(s"$d/batch=$i")))
    (ids.size, batchIds().size)
  }
}
