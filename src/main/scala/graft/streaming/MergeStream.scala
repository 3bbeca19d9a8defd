package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming apply-changes into ANY snapshot table: each micro-batch of
  * keyed upserts/deletes goes through the generic
  * [[ParquetTable.mergeInto]] (file-granular copy-on-write), publishing
  * exactly one new table version per non-empty batch — the generic dual
  * of the SCD1 pipeline's specialized merge stream.
  *
  * Source contract: the target's columns plus an optional
  * `_deleted BOOLEAN`; each BATCH must be key-unique (dedup upstream —
  * e.g. a window rank by sequence number, as the CDC path does).
  * Bootstrap: the first batch creates the table from its non-deleted
  * rows. State: none (no watermark, no state store) — the table IS the
  * state, which is what makes restarts idempotent per the sink's
  * checkpointed batch ids.
  */
object MergeStream {

  def start(
      spark: SparkSession,
      source: DataFrame,
      targetDir: String,
      keys: Seq[String],
      checkpointDir: String): StreamingQuery =
    source.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(spark, batch, targetDir, keys)
      }
      .start()

  /** One micro-batch: bootstrap on a missing table, else merge. */
  def applyBatch(
      spark: SparkSession, batch: DataFrame, targetDir: String, keys: Seq[String]): Unit = {
    if (batch.isEmpty) return
    if (!ParquetTable.exists(targetDir)) {
      val live =
        if (batch.columns.contains("_deleted"))
          batch.filter(not(col("_deleted"))).drop("_deleted")
        else batch
      ParquetTable.swap(spark, live, targetDir)
    } else {
      ParquetTable.mergeInto(spark, targetDir, batch, keys)
      ()
    }
  }

  /** SNAPSHOT-REPLICATION mode (the Debezium snapshot / nightly-full-
    * dump case): each micro-batch is a complete source snapshot and the
    * table must equal it after the trigger — upserts for every batch
    * row AND deletes for every table key the batch no longer carries,
    * in ONE commit (the streaming spelling of MERGE's NOT MATCHED BY
    * SOURCE THEN DELETE). The delete set comes from one left-anti probe
    * of the live table against the batch's keys; file-granular
    * copy-on-write bounds the rewrite to files holding changed or
    * vanished keys. Replays are content-idempotent: re-mirroring the
    * same snapshot deletes nothing and restates the same rows. An
    * EMPTY trigger is a no-op (no snapshot arrived), never an
    * empty-table mirror. */
  def mirrorBatch(
      spark: SparkSession, batch: DataFrame, targetDir: String, keys: Seq[String]): Unit = {
    if (batch.isEmpty) return
    if (!ParquetTable.exists(targetDir)) {
      ParquetTable.swap(spark, batch, targetDir)
    } else {
      val gone = ParquetTable.read(spark, targetDir)
        .join(batch.select(keys.map(col): _*), keys, "left_anti")
        .withColumn("_deleted", lit(true))
      val prepared = batch.withColumn("_deleted", lit(false)).unionByName(gone)
      ParquetTable.mergeInto(spark, targetDir, prepared, keys)
      ()
    }
  }

  def startMirror(
      spark: SparkSession,
      source: DataFrame,
      targetDir: String,
      keys: Seq[String],
      checkpointDir: String): StreamingQuery =
    source.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mirrorBatch(spark, batch, targetDir, keys)
      }
      .start()
}
