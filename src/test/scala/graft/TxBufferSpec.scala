package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.CdcPipeline

/** Cross-batch completion semantics of the transaction buffer
  * (reference: TransactionalCdcProcessingApp.scala:138-223): state must
  * hold across micro-batches, emit only when the metadata-announced counts
  * are met, and handle both metadata-first and metadata-last orderings.
  */
class TxBufferSpec extends SparkSuite {

  private def cdc(xid: String, csn: String, table: String, opType: String,
      after: String, before: String = "null"): String =
    s"""{"table":"$table","op_type":"$opType","op_ts":"t","current_ts":"t","pos":"p",
       |"csn":"$csn","xid":"$xid","before":$before,"after":$after}""".stripMargin.replace("\n", "")

  private def orderAfter(id: Int, v: Int): String =
    s"""{"ORDER_ID":"$id","ORDER_REF":"ORD-$id","VERSION":"$v","ORDER_STATUS":"PENDING",
       |"TOTAL_AMOUNT":"10.5","CURRENCY":"USD"}""".stripMargin.replace("\n", "")

  private def meta(xid: String, csn: String, counts: (String, Int)*): String = {
    val dc = counts.map { case (t, n) => s"""{"data_collection":"$t","event_count":$n}""" }
      .mkString("[", ",", "]")
    s"""{"xid":"$xid","csn":"$csn","tx_ts":"t","event_count":${counts.map(_._2).sum},"data_collections":$dc}"""
  }

  test("buffer emits only on completion, across micro-batches, both orderings") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val orders = MemoryStream[String]
    val details = MemoryStream[String]
    val lineItems = MemoryStream[String]
    val metadata = MemoryStream[String]

    val out = CdcPipeline.orderStream(
      orders.toDF().select(col("value")),
      details.toDF().select(col("value")),
      lineItems.toDF().select(col("value")),
      metadata.toDF().select(col("value")))

    val q = out.writeStream.format("memory").queryName("txbuf_out").outputMode("append").start()
    def result() = spark.table("txbuf_out")

    try {
      // tx A: metadata FIRST, then events (events-after-metadata).
      metadata.addData(meta("A", "1", "ORDERS" -> 2))
      q.processAllAvailable()
      assert(result().count() == 0, "no emission before events arrive")

      orders.addData(cdc("A", "1", "APPUSER.ORDERS", "I", orderAfter(1, 1)))
      q.processAllAvailable()
      assert(result().count() == 0, "1 of 2 announced events must not emit")

      orders.addData(cdc("A", "1", "APPUSER.ORDERS", "I", orderAfter(2, 1)))
      q.processAllAvailable()
      assert(result().count() == 2, "two orders in one tx emit two rows")

      // tx B: events FIRST, metadata LAST (metadata-after-events).
      orders.addData(cdc("B", "2", "APPUSER.ORDERS", "I", orderAfter(3, 1)))
      q.processAllAvailable()
      assert(result().count() == 2, "tx B incomplete without metadata")

      metadata.addData(meta("B", "2", "ORDERS" -> 1))
      q.processAllAvailable()
      assert(result().count() == 3, "metadata arriving last completes tx B")

      // tx C: delete-only transaction — completes but assembles no rows.
      orders.addData(cdc("C", "3", "APPUSER.ORDERS", "D", "null", orderAfter(4, 1)))
      metadata.addData(meta("C", "3", "ORDERS" -> 1))
      q.processAllAvailable()
      assert(result().count() == 3, "delete-only tx emits nothing")

      // Emitted rows carry the join results.
      val a = result().filter(col("xid") === "A").orderBy("orderId")
        .selectExpr("orderId", "size(orders)").collect().map(_.toSeq)
      assert(a.toSeq == Seq(Seq(1.0, 1), Seq(2.0, 1)))
    } finally q.stop()
  }

  test("progress hook reports buffered/expected counts for incomplete transactions") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[graft.buffering.TxProgress]()
    val prevHook = graft.buffering.TxBuffer.onProgress
    graft.buffering.TxBuffer.onProgress = p => { seen.add(p); () }

    val orders = MemoryStream[String]
    val details = MemoryStream[String]
    val lineItems = MemoryStream[String]
    val metadata = MemoryStream[String]
    val out = CdcPipeline.orderStream(
      orders.toDF().select(col("value")),
      details.toDF().select(col("value")),
      lineItems.toDF().select(col("value")),
      metadata.toDF().select(col("value")))
    val q = out.writeStream.format("memory").queryName("txbuf_prog").outputMode("append").start()

    try {
      // Metadata announces 2 ORDERS; only 1 arrives → incomplete, so the
      // trigger must report 1/2 buffered for the transaction.
      metadata.addData(meta("P", "7", "ORDERS" -> 2))
      orders.addData(cdc("P", "7", "APPUSER.ORDERS", "I", orderAfter(20, 1)))
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val p = seen.asScala.filter(x => x.xid == "P" && x.csn == "7").lastOption
      assert(p.isDefined, s"no progress reported for incomplete tx P, saw: ${seen.asScala.toSeq}")
      assert(p.get.orders == 1 && p.get.expectedOrders == 2, s"wrong counts: ${p.get}")
      assert(p.get.render.contains("orders=1/2"), p.get.render)

      // Completing the transaction stops the progress reports.
      seen.clear()
      orders.addData(cdc("P", "7", "APPUSER.ORDERS", "I", orderAfter(21, 1)))
      q.processAllAvailable()
      assert(!seen.asScala.exists(_.xid == "P"), "completed tx must not report progress")
    } finally {
      q.stop()
      graft.buffering.TxBuffer.onProgress = prevHook
    }
  }

  test("state TTL drops transactions that stay incomplete past the deadline") {
    import java.nio.file.{Files, Paths}
    val root = graft.tables.TmpDirs.create("graft-ttl")
    def dir(n: String) = { val d = root.resolve(n); Files.createDirectories(d); d.toString }
    Seq("in/orders", "in/details", "in/lineitems", "in/metadata", "out", "ckpt").foreach(dir)

    var fileNo = 0
    def addFile(stream: String, lines: String*): Unit = {
      fileNo += 1
      Files.writeString(Paths.get(dir(s"in/$stream"), f"f$fileNo%03d.json"), lines.mkString("\n"))
    }

    // A continuous query (timeouts fire in no-data micro-batches; an
    // AvailableNow trigger never terminates while a timeout is armed, and
    // processAllAvailable can't observe timeout-only progress — so this
    // test paces with wall-clock padding well above the 1s TTL).
    val out = graft.buffering.TxBuffer(
      graft.CdcPipeline.unified(
        spark.readStream.schema(graft.streaming.CdcStreaming.valueSchema).text(dir("in/orders")),
        spark.readStream.schema(graft.streaming.CdcStreaming.valueSchema).text(dir("in/details")),
        spark.readStream.schema(graft.streaming.CdcStreaming.valueSchema).text(dir("in/lineitems")),
        spark.readStream.schema(graft.streaming.CdcStreaming.valueSchema).text(dir("in/metadata"))),
      stateTtl = Some(java.time.Duration.ofSeconds(1)))
    val q = out.writeStream.format("parquet")
      .option("path", dir("out")).option("checkpointLocation", dir("ckpt"))
      .outputMode("append")
      .start()

    try {
      // Phase 1: tx X announces 2 ORDERS events, only 1 arrives → incomplete.
      addFile("metadata", meta("X", "9", "ORDERS" -> 2))
      addFile("orders", cdc("X", "9", "APPUSER.ORDERS", "I", orderAfter(10, 1)))
      Thread.sleep(8000) // processed + TTL (1s) expired + timeout batch fired
      // Phase 2: X's missing event arrives post-drop — the rebuilt state
      // has no metadata, so X must never complete. Y completes normally.
      addFile("metadata", meta("Y", "10", "ORDERS" -> 1))
      addFile("orders",
        cdc("X", "9", "APPUSER.ORDERS", "I", orderAfter(11, 1)),
        cdc("Y", "10", "APPUSER.ORDERS", "I", orderAfter(12, 1)))
      Thread.sleep(8000)
    } finally q.stop()

    val rows = spark.read.parquet(dir("out")).selectExpr("xid").collect().map(_.getString(0)).toSeq
    assert(rows == Seq("Y"), s"expected only Y to complete, got $rows")
  }

  test("TTL-dropped transactions land in the quarantine dir with full payloads") {
    import java.nio.file.{Files, Paths}
    val root = graft.tables.TmpDirs.create("graft-dlq")
    def dir(n: String) = { val d = root.resolve(n); Files.createDirectories(d); d.toString }
    Seq("in/orders", "in/details", "in/lineitems", "in/metadata", "out", "quarantine", "ckpt")
      .foreach(dir)

    var fileNo = 0
    def addFile(stream: String, lines: String*): Unit = {
      fileNo += 1
      Files.writeString(Paths.get(dir(s"in/$stream"), f"f$fileNo%03d.json"), lines.mkString("\n"))
    }

    // Continuous query: timeout batches only fire between triggers (same
    // pacing rationale as the TTL test above).
    val q = graft.streaming.CdcStreaming.startIngestQuarantined(
      spark,
      dir("in/orders"), dir("in/details"), dir("in/lineitems"), dir("in/metadata"),
      dir("out"), dir("quarantine"), dir("ckpt"),
      stateTtl = java.time.Duration.ofSeconds(1))
    try {
      // tx X announces 2 ORDERS events, only 1 arrives → TTL-dropped.
      addFile("metadata", meta("X", "9", "ORDERS" -> 2))
      addFile("orders", cdc("X", "9", "APPUSER.ORDERS", "I", orderAfter(10, 1)))
      Thread.sleep(8000)
      // tx Y completes normally and must reach the main sink.
      addFile("metadata", meta("Y", "10", "ORDERS" -> 1))
      addFile("orders", cdc("Y", "10", "APPUSER.ORDERS", "I", orderAfter(12, 1)))
      Thread.sleep(8000)
    } finally q.stop()

    val dead = spark.read.parquet(dir("quarantine")).collect()
    assert(dead.length == 1, s"exactly X's one buffered event is quarantined, got ${dead.length}")
    val d = dead(0)
    assert(d.getAs[String]("xid") == "X")
    assert(d.getAs[String]("table") == "APPUSER.ORDERS")
    assert(d.getAs[String]("after").contains("\"ORDER_ID\":\"10\""), "payload preserved for replay")
    assert(d.getAs[String]("reason").contains("orders 1/2"), "reason records the completion gap")

    val out = spark.read.parquet(dir("out")).selectExpr("xid").collect().map(_.getString(0)).toSeq
    assert(out == Seq("Y"), s"main sink carries only the completed tx, got $out")

    // Replay: rebuild the envelope from the quarantine, union with the
    // redelivered missing event + metadata — the transaction that was
    // TTL-dropped completes in one batch pass with BOTH its orders.
    val s = spark
    import s.implicits._
    def valueDf(lines: String*) = lines.toDF("value")
    val redelivered = graft.CdcPipeline.unified(
      valueDf(cdc("X", "9", "APPUSER.ORDERS", "I", orderAfter(11, 1))),
      valueDf(), valueDf(),
      valueDf(meta("X", "9", "ORDERS" -> 2)))
    val replayed = graft.streaming.CdcStreaming.quarantineAsUnified(spark, dir("quarantine"))
    val completed = graft.buffering.TxBuffer(replayed.unionByName(redelivered), () => "t")
      .toDF().selectExpr("xid", "orderId").collect()
      .map(r => (r.getString(0), r.getDouble(1))).sorted.toSeq
    assert(completed == Seq(("X", 10.0), ("X", 11.0)),
      s"replay + redelivery completes the quarantined tx, got $completed")
  }
}
