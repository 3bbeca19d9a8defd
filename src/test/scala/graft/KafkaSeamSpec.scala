package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.envelope.Envelope

/** The Kafka seam: a real Kafka source yields `value: BINARY`, while the
  * file/memory stand-ins yield `value: STRING`. Envelope.parseCdc casts
  * the value column to string before from_json, so a binary-valued frame
  * must flow through the whole parse → buffer → assemble path unchanged —
  * this spec pins that contract (no connector jar in this environment;
  * SURVEY §7.1 documents the seam).
  */
class KafkaSeamSpec extends SparkSuite {

  test("BINARY value column parses and assembles like STRING (streaming)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val orderJson =
      """{"table":"APPUSER.ORDERS","op_type":"I","op_ts":"t","current_ts":"t","pos":"1","csn":"9","xid":"K","before":null,"after":{"ORDER_ID":"42","VERSION":"1","ORDER_STATUS":"O"}}"""
    val metaJson =
      """{"xid":"K","csn":"9","tx_ts":"t","event_count":1,"data_collections":[{"data_collection":"ORDERS","event_count":1}]}"""

    // Kafka-shaped: value is Array[Byte] (BINARY), not STRING.
    val orders = MemoryStream[Array[Byte]]
    val metadata = MemoryStream[Array[Byte]]
    orders.addData(orderJson.getBytes("UTF-8"))
    metadata.addData(metaJson.getBytes("UTF-8"))
    val empty = MemoryStream[Array[Byte]]

    def asValue(m: MemoryStream[Array[Byte]]) = m.toDF().select(col("value"))
    assert(asValue(orders).schema("value").dataType.typeName == "binary")

    val out = CdcPipeline.orderStream(
      asValue(orders), asValue(empty), asValue(empty), asValue(metadata), () => "ts")
    val q = out.writeStream.format("memory").queryName("kafka_seam_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(300000)

    val rows = spark.table("kafka_seam_out")
      .selectExpr("xid", "orderId", "size(orders) AS n").collect()
    assert(rows.length == 1)
    assert(rows.head.getString(0) == "K" && rows.head.getDouble(1) == 42.0 &&
      rows.head.getInt(2) == 1,
      "binary Kafka values must assemble identically to string values")
  }
}
