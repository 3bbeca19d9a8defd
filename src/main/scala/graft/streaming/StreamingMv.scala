package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.tables.MaterializedView

/** CONTINUOUS incremental view maintenance: a Structured Streaming query
  * over the base table's change-data-feed tree drives
  * [[graft.tables.MaterializedView.refresh]] — the rollup follows the
  * base table commit-by-commit without ever rescanning it.
  *
  * Exactly-once composition: the micro-batch CONTENT is only the
  * wake-up signal. `refresh` itself reads the change files beyond its
  * own stamped `refreshedVersion` and advances the stamp atomically
  * with the new MV snapshot — so a replayed batch after a checkpoint
  * rollback, an empty trigger, or two overlapping maintainers are all
  * no-ops (the MV's version stamp, not the stream's checkpoint, is the
  * cursor; the same two-level idempotence as foreachBatch + the txn
  * action). At 100 TB the maintenance cost per trigger is the delta
  * aggregate of the NEW change files plus a full-outer join against
  * the (rollup-sized) view — never a base scan.
  */
object StreamingMv {

  /** Start the maintainer. `Trigger.AvailableNow` by default: drain the
    * feed to the current end and stop — call again on the next cadence
    * (the checkpoint makes re-runs cheap); pass a processing-time
    * trigger for an always-on maintainer. Pass `resume = true` on those
    * re-runs once vacuum may have truncated the feed: it asserts the
    * existing checkpoint already consumed past the truncation point —
    * without it the re-run fails loudly at start (the documented
    * truncation guard), and scheduled maintenance would halt exactly
    * when retention kicks in. A FRESH checkpoint must keep the default
    * (it genuinely cannot reconstruct the vacuumed history). */
  def start(
      spark: SparkSession, baseDir: String, mvDir: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      resume: Boolean = false): StreamingQuery =
    ChangeFeedTable.changeFeedStream(spark, baseDir, resume)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (_: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        MaterializedView.refresh(spark, mvDir)
        ()
      }
      .start()
}
