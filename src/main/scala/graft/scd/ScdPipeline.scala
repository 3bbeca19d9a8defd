package graft.scd

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

import graft.CdcPipeline

/** SCD2 → SCD1 end-to-end over the deterministic CDC workload: replays the
  * `order_stream` output as two micro-batches — base transactions bootstrap
  * the table (reference: ScdType1MergeApp.scala:74-81, overwrite-on-missing),
  * then the update/detail-update transactions go through the clause-ordered
  * merge (reference: :83-132). Memoized per (session, sfDir) like the
  * order_stream itself.
  */
object ScdPipeline {

  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def ordersCurrent(spark: SparkSession, sfDir: String): DataFrame =
    cache.getOrElseUpdate((spark, sfDir), {
      val stream = CdcPipeline.orderStreamCached(spark, sfDir)
      // Micro-batch 1: base inserts (multi-order transactions).
      // Micro-batch 2: order updates (txu-) + detail-only updates (txs-),
      // collapsed per order by the flattener, then merged. Both flatten
      // projections are cached for the build and released right after the
      // merge materializes.
      BatchFlattener.flattenCached(
        stream.filter(col("xid").startsWith("tx-"))) { bootstrap =>
        BatchFlattener.flattenCached(
          stream.filter(col("xid").startsWith("txu-") || col("xid").startsWith("txs-"))) { updates =>
          val df = MergeExecutor.merge(bootstrap, updates)
            .persist(StorageLevel.MEMORY_AND_DISK)
          df.count()
          df
        }
      }
    })
}
