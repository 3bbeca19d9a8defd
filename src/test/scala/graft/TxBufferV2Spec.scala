package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.buffering.TxBufferV2

/** TxBufferV2 (the transformWithState spelling) must match TxBuffer's
  * contract on the same scenarios: buffer across micro-batches, emit
  * only at metadata-announced completion in either arrival order, and
  * drop wedged transactions at the timer-based TTL. */
class TxBufferV2Spec extends SparkSuite {

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

  test("state-v2 buffer: completion across batches, both orderings") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val orders = MemoryStream[String]
    val details = MemoryStream[String]
    val lineItems = MemoryStream[String]
    val metadata = MemoryStream[String]

    val out = TxBufferV2(CdcPipeline.unified(
      orders.toDF().select(col("value")),
      details.toDF().select(col("value")),
      lineItems.toDF().select(col("value")),
      metadata.toDF().select(col("value"))), () => "t")

    val q = out.writeStream.format("memory").queryName("txbufv2_out")
      .outputMode("append").start()
    def result() = spark.table("txbufv2_out")

    try {
      // metadata-first ordering, completion across three batches.
      metadata.addData(meta("A", "1", "ORDERS" -> 2))
      q.processAllAvailable()
      assert(result().count() == 0, "no emission before events arrive")

      orders.addData(cdc("A", "1", "APPUSER.ORDERS", "I", orderAfter(1, 1)))
      q.processAllAvailable()
      assert(result().count() == 0, "1 of 2 announced events must not emit")

      orders.addData(cdc("A", "1", "APPUSER.ORDERS", "I", orderAfter(2, 1)))
      q.processAllAvailable()
      assert(result().count() == 2, "two orders in one tx emit two rows")

      // metadata-last ordering.
      orders.addData(cdc("B", "2", "APPUSER.ORDERS", "I", orderAfter(3, 1)))
      q.processAllAvailable()
      assert(result().count() == 2, "tx B incomplete without metadata")

      metadata.addData(meta("B", "2", "ORDERS" -> 1))
      q.processAllAvailable()
      assert(result().count() == 3, "metadata arriving last completes tx B")

      val a = result().filter(col("xid") === "A")
        .selectExpr("orderId").as[String].collect().sorted
      assert(a.toSeq == Seq("1.0", "2.0"), "coerced order ids, as v1 emits them")
    } finally q.stop()
  }

  test("state-v2 buffer: timer TTL drops wedged transactions") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val orders = MemoryStream[String]
    val metadata = MemoryStream[String]
    val empty1 = MemoryStream[String]
    val empty2 = MemoryStream[String]

    val out = TxBufferV2(CdcPipeline.unified(
      orders.toDF().select(col("value")),
      empty1.toDF().select(col("value")),
      empty2.toDF().select(col("value")),
      metadata.toDF().select(col("value"))),
      () => "t", stateTtl = Some(java.time.Duration.ofSeconds(1)))

    // In ProcessingTime mode the engine keeps running timer-evaluation
    // batches, so processAllAvailable never latches "all available" —
    // this test paces on wall-clock like v1's TTL spec instead, with a
    // real trigger interval so the timer loop isn't hot.
    val q = out.writeStream.format("memory").queryName("txbufv2_ttl")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
      .outputMode("append").start()
    def result() = spark.table("txbufv2_ttl")

    try {
      // tx X announces 2 orders, receives 1 → wedged; the timer at
      // last-event + 1s must clear it.
      metadata.addData(meta("X", "9", "ORDERS" -> 2))
      orders.addData(cdc("X", "9", "APPUSER.ORDERS", "I", orderAfter(7, 1)))
      Thread.sleep(6000) // ingested + TTL (1s) expired + timer batch fired
      assert(result().count() == 0)

      // The late second order arrives AFTER the drop: the fresh state it
      // opens has no metadata, so it can never complete — if the TTL had
      // NOT dropped X, this arrival would complete the pair and emit.
      orders.addData(cdc("X", "9", "APPUSER.ORDERS", "I", orderAfter(8, 1)))
      Thread.sleep(6000)
      assert(result().filter(col("xid") === "X").count() == 0,
        "TTL-dropped transaction must not resurrect to completion")
    } finally q.stop()
  }
}
