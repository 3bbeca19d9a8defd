package graft

import org.apache.spark.sql.functions._

/** r12 directive 6: the sanctioned non-goal (no Kafka connector jar in
  * this sandbox) carries a READY-TO-RUN proof. This spec self-skips
  * (scalatest cancel) when `spark-sql-kafka` is absent from the
  * classpath; the moment the jar appears it wires a real
  * `readStream.format("kafka")` source — `value: BINARY`, exactly the
  * seam KafkaSeamSpec pins with MemoryStream — into the full CDC
  * assemble pipeline, and with GRAFT_KAFKA_BOOTSTRAP set it executes
  * against the live broker end-to-end. */
class KafkaIntegrationSpec extends SparkSuite {

  private def kafkaOnClasspath: Boolean =
    try {
      Class.forName(
        "org.apache.spark.sql.kafka010.KafkaSourceProvider",
        false, getClass.getClassLoader)
      true
    } catch { case _: ClassNotFoundException => false }

  test("kafka source wires into the CDC pipeline unchanged (plan-level; needs the jar)") {
    assume(kafkaOnClasspath,
      "spark-sql-kafka not on the classpath — sanctioned non-goal; " +
        "spec activates automatically when the connector jar appears")
    val bootstrap = sys.env.getOrElse("GRAFT_KAFKA_BOOTSTRAP", "localhost:9092")
    def topicStream(topic: String) =
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
        .select(col("value"))
    // The reference's 4 topics (README.md:14-18, kc.props template
    // dev.<table>.json): 3 data topics + 1 transaction-metadata topic.
    val orders = topicStream("dev.appuser.orders.json")
    assert(orders.schema("value").dataType.typeName == "binary",
      "a real kafka source must present the BINARY value seam")
    // The pipeline accepts the kafka frames with ZERO changes — the
    // whole point of the seam. Building the streaming plan needs no
    // broker; only start() would.
    val out = CdcPipeline.orderStream(
      orders,
      topicStream("dev.appuser.order_details.json"),
      topicStream("dev.appuser.order_line_items.json"),
      topicStream("dev.appuser.tx_metadata.json"),
      () => "ts")
    assert(out.isStreaming, "kafka-fed pipeline builds as a streaming plan")
  }

  test("end-to-end against a live broker (needs the jar AND GRAFT_KAFKA_BOOTSTRAP)") {
    assume(kafkaOnClasspath, "spark-sql-kafka not on the classpath")
    assume(sys.env.contains("GRAFT_KAFKA_BOOTSTRAP"),
      "set GRAFT_KAFKA_BOOTSTRAP=host:port (and pre-publish the reference " +
        "topics) to run the live-broker leg")
    val bootstrap = sys.env("GRAFT_KAFKA_BOOTSTRAP")
    val frames = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", sys.env.getOrElse("GRAFT_KAFKA_TOPIC", "dev.appuser.orders.json"))
      .option("startingOffsets", "earliest")
      .load()
      .select(col("value"))
    val parsed = graft.envelope.Envelope.parseCdc(frames, "ORDERS")
    val q = parsed.writeStream.format("memory").queryName("kafka_live_smoke")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      // A vacuous `>= 0` can never fail, and a timed-out query left
      // running leaks into the rest of the suite (r13 review finding):
      // require actual termination within the window and actual parsed
      // envelope rows from the pre-published topic.
      assert(q.awaitTermination(120000),
        "live-broker smoke did not drain within 120s")
      val rows = spark.table("kafka_live_smoke")
      assert(rows.columns.contains("table"),
        "parsed envelope must carry the 12-col shape")
      assert(rows.count() > 0L,
        "pre-published topic produced no parsed envelope rows")
    } finally {
      if (q.isActive) q.stop()
    }
  }
}
