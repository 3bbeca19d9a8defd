package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming exactly-once event dedup: `dropDuplicatesWithinWatermark`
  * keyed on event_id — re-deliveries inside the watermark are dropped,
  * state is bounded by the watermark horizon (the streaming member of the
  * dedup operator family).
  */
class StreamingDedupSpec extends SparkSuite {

  test("duplicate event deliveries are dropped within the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val deduped = in.toDF().toDF("event_id", "ts", "value")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    def count() = spark.table("dedup_out").count()

    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    try {
      in.addData((1L, ts(0), 1.0), (2L, ts(1), 2.0), (1L, ts(2), 1.0))
      q.processAllAvailable()
      assert(count() == 2, "duplicate id in one batch deduped")

      in.addData((1L, ts(3), 1.0), (3L, ts(4), 3.0))
      q.processAllAvailable()
      assert(count() == 3, "re-delivery across batches deduped within watermark")
    } finally q.stop()
  }
}
