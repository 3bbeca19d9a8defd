package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.cdcgen.CdcEventGen
import graft.streaming.{CdcStreaming, ParquetTable}

/** Incremental streaming merge with ties: the base workload lands first
  * and is merged; a conflicting-redelivery wave (txr-) then arrives as
  * NEW files, flows through a checkpoint-resumed ingest and a SECOND
  * merge micro-batch against the existing snapshot. Target must win the
  * version ties (content unchanged) while the tx context refreshes —
  * the streaming dual of the scd1_tie_semantics oracle.
  */
class RedeliveryStreamingSpec extends SparkSuite {

  private def tmp(prefix: String): Path = {
    val p = graft.tables.TmpDirs.create(prefix)
    p.toFile.deleteOnExit()
    p
  }

  test("second micro-batch redelivery: target wins ties, context refreshes") {
    val root = tmp("graft-redeliver")
    def dir(name: String): String = {
      val d = root.resolve(name); Files.createDirectories(d); d.toString
    }
    def writeWave(streams: CdcEventGen.CdcStreams, suffix: String): Unit =
      Seq(
        "orders" -> streams.orders, "details" -> streams.details,
        "lineitems" -> streams.lineItems, "metadata" -> streams.metadata
      ).foreach { case (name, df) =>
        df.coalesce(1).write.mode("append").text(dir(s"in/$name"))
        val _ = suffix
      }

    // Wave 1: base workload → ingest → merge.
    writeWave(CdcEventGen.fromTpch(spark, sf0001), "base")
    def runIngest() = {
      val q = CdcStreaming.startIngest(
        spark,
        dir("in/orders"), dir("in/details"), dir("in/lineitems"), dir("in/metadata"),
        dir("order_stream"), dir("ckpt/ingest"))
      q.awaitTermination(300000)
    }
    def runMerge() = {
      val q = CdcStreaming.startScd1Merge(
        spark, dir("order_stream"), dir("orders_current"), dir("ckpt/merge"))
      q.awaitTermination(300000)
    }
    runIngest(); runMerge()
    val beforeRedelivery = ParquetTable.read(spark, dir("orders_current"))
      .filter(expr("orderId % 17 = 0"))
      .selectExpr("orderId", "version", "orderStatus", "orderDetails.version AS dv",
        "orderDetails.deliveryStatus AS ds", "xid")
      .collect().map(r => r.getDouble(0) -> r).toMap

    // Wave 2: conflicting redelivery (same versions, changed content) as
    // NEW files; both streams resume from their checkpoints.
    writeWave(CdcEventGen.redeliveryFromTpch(spark, sf0001), "redeliver")
    runIngest(); runMerge()

    val after = ParquetTable.read(spark, dir("orders_current"))
      .filter(expr("orderId % 17 = 0"))
      .selectExpr("orderId", "version", "orderStatus", "orderDetails.version AS dv",
        "orderDetails.deliveryStatus AS ds", "xid")
      .collect().map(r => r.getDouble(0) -> r).toMap

    assert(after.nonEmpty)
    // Previously-present orders: every content field identical (ties lost
    // by the source), but the tx context now carries the txr- xid.
    beforeRedelivery.foreach { case (id, b) =>
      val a = after(id)
      assert(a.getDouble(1) == b.getDouble(1), s"order $id version must not change")
      assert(a.getString(2) == b.getString(2), s"order $id status must survive the tie")
      assert(a.getString(2) != null && !a.getString(2).startsWith("REDELIVERED-"),
        s"order $id redelivered content must lose the tie")
      assert(a.getString(5) == s"txr-${id.toLong}", s"order $id context must refresh")
    }
    // Orders the base workload withheld: inserted with redelivered content.
    val inserted = after.keySet -- beforeRedelivery.keySet
    assert(inserted.nonEmpty, "withheld orders should be inserted by the redelivery")
    inserted.foreach { id =>
      assert(after(id).getString(2).startsWith("REDELIVERED-"),
        s"order $id should carry the redelivered status")
    }
  }
}
