package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The bounded-heap top-k aggregates under STRUCTURED STREAMING: a
  * TypedImperativeAggregate's buffer lives in the state store and must
  * survive incremental updates across micro-batches — i.e. the heap is
  * the streaming leaderboard too, not just the batch window
  * replacement. Pinned against the batch computation over the same
  * accumulated input (the streaming/batch parity every aggregate in
  * this engine promises). */
class StreamingTopKSpec extends SparkSuite {

  test("streaming topk_by leaderboard == batch heap over the same rows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val src = MemoryStream[(String, Double, Long)]
    val agg = src.toDF().toDF("g", "score", "id")
      .groupBy("g")
      .agg(expr("topk_by(score, id, 3)").as("top"))
    val q = agg.writeStream
      .format("memory").queryName("topk_stream").outputMode("complete")
      .start()

    def snapshot(): Map[String, Seq[(Double, Long)]] =
      s.sql("SELECT g, top FROM topk_stream").collect().map { r =>
        r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getDouble(0), x.getLong(1))).toSeq
      }.toMap

    val batch1 = (1 to 50).map(i => (s"g${i % 2}", (i % 7).toDouble, i.toLong))
    src.addData(batch1: _*)
    q.processAllAvailable()
    assert(snapshot().values.forall(_.size == 3))

    // Batch 2 pushes NEW maxima into existing groups — the state-store
    // heap must admit them and evict the old entries.
    val batch2 = Seq(("g0", 100.0, 777L), ("g1", 99.0, 778L), ("g1", 98.0, 779L))
    src.addData(batch2: _*)
    q.processAllAvailable()
    val streamed = snapshot()
    q.stop()

    val batch = (batch1 ++ batch2).toDF("g", "score", "id")
      .groupBy("g").agg(expr("topk_by(score, id, 3)").as("top"))
      .collect().map { r =>
        r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getDouble(0), x.getLong(1))).toSeq
      }.toMap

    assert(streamed == batch, s"streamed $streamed vs batch $batch")
    assert(streamed("g0").head == ((100.0, 777L)))
    assert(streamed("g1").take(2) == Seq((99.0, 778L), (98.0, 779L)))
  }

  test("streaming topk_by_str parity with the batch heap") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val src = MemoryStream[(String, Double, String)]
    val q = src.toDF().toDF("g", "w", "term")
      .groupBy("g").agg(expr("topk_by_str(w, term, 2)").as("top"))
      .writeStream.format("memory").queryName("topkstr_stream")
      .outputMode("complete").start()

    src.addData(("s", 1.0, "beta"), ("s", 1.0, "alpha"), ("s", 2.0, "zed"))
    q.processAllAvailable()
    src.addData(("s", 1.0, "aardvark"), ("s", 3.0, "late"))
    q.processAllAvailable()
    val got = s.sql("SELECT top FROM topkstr_stream").collect().head
      .getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getDouble(0), x.getString(1))).toSeq
    q.stop()
    // (3.0 late) then (2.0 zed); the tied 1.0 terms never make the cut.
    assert(got == Seq((3.0, "late"), (2.0, "zed")), got.toString)
  }
}
