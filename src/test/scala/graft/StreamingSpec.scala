package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.cdcgen.CdcEventGen
import graft.streaming.{BucketedTable, CdcStreaming, ParquetTable}

/** End-to-end streaming test: JSON event files → file-stream ingest
  * (flatMapGroupsWithState in streaming mode, AvailableNow trigger) →
  * order_stream parquet appends → file-stream SCD1 merge → atomic
  * snapshot — asserting both hops agree with the batch path on the same
  * events.
  */
class StreamingSpec extends SparkSuite {

  private def tmp(prefix: String): Path = {
    val p = graft.tables.TmpDirs.create(prefix)
    p.toFile.deleteOnExit()
    p
  }

  test("streaming ingest + scd1 merge match the batch path") {
    val root = tmp("graft-stream")
    def dir(name: String): String = { val d = root.resolve(name); Files.createDirectories(d); d.toString }

    // Write the deterministic CDC workload (sf0.001) as JSON-line files.
    val streams = CdcEventGen.fromTpch(spark, sf0001)
    Seq(
      "orders" -> streams.orders, "details" -> streams.details,
      "lineitems" -> streams.lineItems, "metadata" -> streams.metadata
    ).foreach { case (name, df) =>
      df.coalesce(2).write.mode("overwrite").text(dir(s"in/$name"))
    }

    // Hop 1: streaming ingest.
    val q1 = CdcStreaming.startIngest(
      spark,
      dir("in/orders"), dir("in/details"), dir("in/lineitems"), dir("in/metadata"),
      dir("order_stream"), dir("ckpt/ingest"))
    q1.awaitTermination(300000)

    val streamed = spark.read.parquet(dir("order_stream"))
    val batch = CdcPipeline.orderStreamCached(spark, sf0001)
    assert(streamed.count() == batch.count(), "streamed row count != batch row count")

    // Spot-check content equality on a flat projection (sets, not order).
    def flat(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("xid", "orderId", "size(orders)", "size(orderDetails)", "size(lineItems)")
        .collect().map(_.toSeq.mkString("|")).sorted
    assert(flat(streamed).sameElements(flat(batch)))

    // Hop 2: streaming SCD1 merge from the appended dir.
    val q2 = CdcStreaming.startScd1Merge(
      spark, dir("order_stream"), dir("orders_current"), dir("ckpt/merge"))
    q2.awaitTermination(300000)

    assert(ParquetTable.exists(dir("orders_current")))
    val merged = ParquetTable.read(spark, dir("orders_current"))
    // One row per orderId, and every emitted order with a version appears.
    assert(merged.groupBy("orderId").count().filter(col("count") > 1).count() == 0)
    val expected = graft.scd.ScdPipeline.ordersCurrent(spark, sf0001)
    assert(merged.count() == expected.count(),
      s"merged=${merged.count()} expected=${expected.count()}")
    // Version-by-order equality with the batch two-phase pipeline.
    def versions(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("orderId", "version", "orderDetails.version AS dv")
        .collect().map(_.toSeq.mkString("|")).sorted
    assert(versions(merged).sameElements(versions(expected)))

    // Hop 2, bucketed variant: per-bucket incremental merge + per-batch
    // vacuum must land on the same table with one live version/bucket.
    val N = 16
    val q3 = CdcStreaming.startScd1MergeBucketed(
      spark, dir("order_stream"), dir("orders_current_bkt"), dir("ckpt/merge_bkt"), N)
    q3.awaitTermination(300000)
    val bucketed = BucketedTable.read(spark, dir("orders_current_bkt"))
    assert(versions(bucketed).sameElements(versions(expected)))
    (0 until N).foreach { b =>
      val p = root.resolve(s"orders_current_bkt/bucket=$b")
      if (Files.exists(p))
        assert(Files.list(p).count() == 1, s"bucket $b should hold exactly one live version")
    }

    // Maintenance: compact the streaming append dir (it carries a
    // _spark_metadata sink log — compaction must honor it, carry only
    // committed data, and leave a plain parquet dir with same content).
    assert(Files.exists(root.resolve("order_stream/_spark_metadata")))
    val stats = graft.streaming.Compaction.compact(spark, dir("order_stream"))
    assert(stats.compacted && stats.filesAfter < stats.filesBefore)
    assert(!Files.exists(root.resolve("order_stream/_spark_metadata")))
    val afterCompact = spark.read.parquet(dir("order_stream"))
    assert(flat(afterCompact).sameElements(flat(batch)),
      "compaction must preserve the committed stream content exactly")
  }
}
