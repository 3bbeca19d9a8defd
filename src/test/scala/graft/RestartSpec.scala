package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.cdcgen.CdcEventGen
import graft.streaming.CdcStreaming

/** Exactly-once across restarts: stop the ingest stream after a partial
  * run, restart from the same checkpoint, and assert no duplicates and no
  * loss versus the batch path (SURVEY.md §7.5 risk 2).
  */
class RestartSpec extends SparkSuite {

  test("ingest restart from checkpoint produces no duplicates and no loss") {
    val root = graft.tables.TmpDirs.create("graft-restart")
    def dir(name: String): String = { val d = root.resolve(name); Files.createDirectories(d); d.toString }

    val streams = CdcEventGen.fromTpch(spark, sf0001)
    Seq(
      "orders" -> streams.orders, "details" -> streams.details,
      "lineitems" -> streams.lineItems, "metadata" -> streams.metadata
    ).foreach { case (name, df) =>
      // several files per stream so the first run can stop mid-input
      df.repartition(4).write.mode("overwrite").text(dir(s"in/$name"))
    }

    // Run 1: process at most a few files per source, one micro-batch only.
    val out1 = CdcPipeline.orderStream(
      spark.readStream.schema(CdcStreaming.valueSchema)
        .option("maxFilesPerTrigger", 2).text(dir("in/orders")).select(col("value")),
      spark.readStream.schema(CdcStreaming.valueSchema)
        .option("maxFilesPerTrigger", 2).text(dir("in/details")).select(col("value")),
      spark.readStream.schema(CdcStreaming.valueSchema)
        .option("maxFilesPerTrigger", 2).text(dir("in/lineitems")).select(col("value")),
      spark.readStream.schema(CdcStreaming.valueSchema)
        .option("maxFilesPerTrigger", 2).text(dir("in/metadata")).select(col("value")))
    val q1 = out1.writeStream.format("parquet")
      .option("path", dir("order_stream")).option("checkpointLocation", dir("ckpt"))
      .outputMode("append").trigger(Trigger.Once()).start()
    q1.awaitTermination(300000)
    val partial = spark.read.parquet(dir("order_stream")).count()

    // Run 2 (the "restart"): same checkpoint, drain everything.
    val q2 = CdcStreaming.startIngest(
      spark, dir("in/orders"), dir("in/details"), dir("in/lineitems"), dir("in/metadata"),
      dir("order_stream"), dir("ckpt"))
    q2.awaitTermination(300000)

    val streamed = spark.read.parquet(dir("order_stream"))
    val batch = CdcPipeline.orderStreamCached(spark, sf0001)
    assert(streamed.count() == batch.count(),
      s"restart must converge: streamed=${streamed.count()} batch=${batch.count()} (partial first run=$partial)")
    // no duplicate (xid, orderId) rows
    assert(streamed.groupBy("xid", "orderId").count().filter(col("count") > 1).count() == 0)
  }
}
