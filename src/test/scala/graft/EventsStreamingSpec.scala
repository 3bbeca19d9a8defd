package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.EventsStreaming

/** Watermarked event-time windowing: the streaming hourly aggregate over
  * the events table (replayed as a file stream) must finalize every
  * window that the batch dual (`evt_hourly` shape) produces, with equal
  * aggregates, once the stream is drained with AvailableNow.
  */
class EventsStreamingSpec extends SparkSuite {

  test("partitioned streaming append lands a prunable event_date tree, exactly-once") {
    val src = graft.queries.EventsQueries.events(spark, sf0001)
      .select("event_id", "ts", "event_type", "value")

    val dir = graft.tables.TmpDirs.create("graft-part-stream").toString
    src.coalesce(3).write.mode("overwrite").parquet(s"$dir/in")

    val stream = spark.readStream.schema(src.schema).parquet(s"$dir/in")
    val q = EventsStreaming.startPartitionedAppend(stream, s"$dir/out", s"$dir/cp")
    q.processAllAvailable(); q.stop()

    // Hive-style daily partitions on disk, content complete.
    import scala.jdk.CollectionConverters._
    val partDirs = Files.list(java.nio.file.Paths.get(s"$dir/out")).iterator().asScala
      .filter(_.getFileName.toString.startsWith("event_date=")).toSeq
    assert(partDirs.size == 30, s"expected 30 daily partitions, got ${partDirs.size}")
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == src.count())

    // A single-day read prunes at planning time, same as the batch layout.
    val oneDay = back.filter(col("event_date") === lit(java.sql.Date.valueOf("2024-01-05")))
    assert(oneDay.count() ==
      src.filter(to_date(col("ts")) === "2024-01-05").count())

    // Restarting over the same input appends nothing new (sink log is
    // exactly-once across restarts).
    val q2 = EventsStreaming.startPartitionedAppend(
      spark.readStream.schema(src.schema).parquet(s"$dir/in"), s"$dir/out", s"$dir/cp")
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(s"$dir/out").count() == src.count(),
      "restart must not duplicate rows")
  }

  test("watermarked hourly windows match the batch aggregate") {
    val src = graft.queries.EventsQueries.events(spark, sf0001)
      .select("ts", "event_type", "value")

    // Replay as a file stream (3 files → a few micro-batches).
    val dir = graft.tables.TmpDirs.create("graft-events").toString
    src.coalesce(3).write.mode("overwrite").parquet(s"$dir/in")

    val stream = spark.readStream.schema(src.schema).parquet(s"$dir/in")
    val q = EventsStreaming.hourlyAgg(stream)
      .writeStream.format("memory").queryName("evt_stream_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(300000)

    val streamed = spark.table("evt_stream_out")
    val batch = src
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(col("w.start").as("hour_ts"), col("event_type"), col("n"), col("total_value"))

    // Append mode emits only windows closed by the final watermark; with
    // AvailableNow + a 2h delay everything except the trailing windows
    // finalizes. Assert the finalized set matches the batch result
    // exactly and covers all but the watermark tail.
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.mkString("|")).toSet
    val sKeys = key(streamed)
    val bKeys = key(batch)
    assert(sKeys.subsetOf(bKeys), "streamed windows must agree with batch values")
    val maxTs = src.agg(max("ts")).collect()(0).getTimestamp(0).getTime
    val tail = batch.filter(
      unix_millis(col("hour_ts")) + 3600 * 1000 > maxTs - 2 * 3600 * 1000)
    assert(sKeys.size >= bKeys.size - tail.count(),
      s"only the watermark tail may be missing: streamed=${sKeys.size} batch=${bKeys.size} tail=${tail.count()}")
    assert(sKeys.nonEmpty)
  }

  test("stream-stream interval join matches the batch join") {
    val src = graft.queries.EventsQueries.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")

    val dir = graft.tables.TmpDirs.create("graft-ssj").toString
    src.coalesce(2).write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(src.schema).parquet(s"$dir/in")

    val interval = 24 * 3600L
    val q = EventsStreaming.errorClickJoin(stream, interval)
      .writeStream.format("memory").queryName("ssj_out").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(300000)

    val streamed = spark.table("ssj_out")
      .selectExpr("user_id", "error_id", "click_id").collect()
      .map(_.toSeq.mkString("|")).toSet
    val batchPairs = EventsStreaming.errorClickJoin(src, interval)
      .selectExpr("user_id", "error_id", "click_id").collect()
      .map(_.toSeq.mkString("|")).toSet
    assert(batchPairs.nonEmpty, "the 24h interval must produce pairs at sf0.001")
    // Inner stream-stream join results within the watermark horizon are
    // emitted; late-horizon pairs may be withheld, never invented.
    assert(streamed.subsetOf(batchPairs))
    assert(streamed.nonEmpty, "join emitted nothing")
  }

  test("left-outer stream-stream join emits watermark-finalized unmatched errors") {
    val src = graft.queries.EventsQueries.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")

    val dir = graft.tables.TmpDirs.create("graft-ssjo").toString
    src.coalesce(2).write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(src.schema).parquet(s"$dir/in")

    // Short interval + short watermark so most null verdicts finalize
    // inside the replayed event-time range.
    val interval = 600L
    val q = EventsStreaming.errorClickJoinOuter(stream, interval, "30 minutes")
      .writeStream.format("memory").queryName("ssjo_out").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(300000)

    val streamed = spark.table("ssjo_out")
      .selectExpr("error_id", "click_id").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString)).toSet
    val batch = EventsStreaming.errorClickJoin(src, interval)
      .selectExpr("error_id", "click_id").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString)).toSet

    // Matched pairs agree with the batch inner join; unmatched errors
    // surface with a null click — and only for errors the batch join
    // really never matched (no invented nulls).
    val (matched, unmatched) = streamed.partition(_._2.isDefined)
    assert(matched.subsetOf(batch), "matched pairs must agree with batch")
    assert(unmatched.nonEmpty, "watermark must finalize some unmatched errors")
    val batchMatchedIds = batch.map(_._1)
    unmatched.foreach { case (errId, _) =>
      assert(!batchMatchedIds.contains(errId),
        s"error $errId emitted null but has a real match")
    }
  }

  test("streaming session_window matches the batch sessionization") {
    val src = graft.queries.EventsQueries.events(spark, sf0001)
      .select("ts", "user_id", "value")

    val dir = graft.tables.TmpDirs.create("graft-sess").toString
    src.coalesce(3).write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(src.schema).parquet(s"$dir/in")

    val q = EventsStreaming.sessionAgg(stream)
      .writeStream.format("memory").queryName("sess_out").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(300000)

    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.mkString("|")).toSet
    val streamed = key(spark.table("sess_out"))
    val batch = key(EventsStreaming.sessionAgg(src))

    // Append emits sessions finalized by the last watermark; the trailing
    // (< delay) sessions may be withheld, never invented or split wrong.
    assert(streamed.subsetOf(batch), "streamed sessions must agree with batch")
    assert(streamed.size >= batch.size / 2 && streamed.nonEmpty,
      s"most sessions should finalize: streamed=${streamed.size} batch=${batch.size}")
  }

  test("stream-static enrichment joins the broadcast dim statelessly") {
    val src = graft.queries.EventsQueries.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val dir = graft.tables.TmpDirs.create("graft-enrich").toString
    src.coalesce(2).write.mode("overwrite").parquet(s"$dir/in")

    // Static dim covering only even users — odd users must survive the
    // left join with a null segment.
    val dim = src.select("user_id").distinct()
      .filter(col("user_id") % 2 === 0)
      .withColumn("segment", concat(lit("seg"), col("user_id") % 3))

    val stream = spark.readStream.schema(src.schema).parquet(s"$dir/in")
    val out = EventsStreaming.enrichWithDim(stream, dim)
    val q = out.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    q.processAllAvailable()

    val streamed = spark.table("enriched")
      .select("event_id", "user_id", "segment")
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val batch = EventsStreaming.enrichWithDim(src, dim)
      .select("event_id", "user_id", "segment")
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    assert(streamed == batch, "stream enrichment must equal the batch join")
    assert(spark.table("enriched").filter(col("segment").isNull).count() > 0,
      "unmatched (odd) users must be kept by the left join")

    // Stateless: no state-store operators ever appear in the progress.
    val stateOps = q.recentProgress.flatMap(_.stateOperators)
    q.stop()
    assert(stateOps.isEmpty, s"enrichment must be stateless: ${stateOps.mkString(",")}")
  }

  test("late-data accounting: beyond-watermark rows are dropped AND counted in progress") {
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-late").toString
    val ckpt = s"$dir/ckpt"
    def ev(hourOff: Int, min: Int): (java.sql.Timestamp, String, Double) =
      (java.sql.Timestamp.valueOf(f"2025-01-01 $hourOff%02d:$min%02d:00"), "click", 1.0)

    // Wave 1: ten hours of events; drain with AvailableNow. The
    // checkpoint then carries watermark = max(ts) − 2h = 08:00.
    Seq.tabulate(11)(h => ev(h, 15)).toDF("ts", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(s"$dir/in")
    val schema = s.read.parquet(s"$dir/in").schema
    // File sink, not memory: the memory sink cannot recover from a
    // checkpoint, and the persisted watermark IS the thing under test.
    def run() = {
      val q = EventsStreaming.hourlyAgg(
          s.readStream.schema(schema).parquet(s"$dir/in"))
        .writeStream.format("parquet").option("path", s"$dir/out")
        .option("checkpointLocation", ckpt).outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(300000); q
    }
    run()
    def staleWindow() = s.read.parquet(s"$dir/out")
      .filter(col("hour_ts") === "2025-01-01 00:00:00")
    assert(staleWindow().head().getLong(2) == 1L)

    // Wave 2: one row at 00:30 (far below the persisted 08:00 watermark
    // — must be DROPPED and counted) and one at 09:45 (late but inside
    // the delay — must be accepted into its still-open window).
    Seq(ev(0, 30), ev(9, 45)).toDF("ts", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(s"$dir/in")
    val q2 = run()

    val dropped = q2.recentProgress.flatMap(_.stateOperators)
      .map(_.numRowsDroppedByWatermark).sum
    assert(dropped == 1L,
      s"exactly the below-watermark row is dropped and accounted: $dropped")
    // The stale 00:00 window was finalized in wave 1 with n=1 — the
    // dropped row must not resurface as a corrected emission.
    assert(staleWindow().collect().map(_.getLong(2)).toSeq == Seq(1L),
      "no re-emission for the finalized window")
  }

  test("streaming CUSUM monitor equals the batch closed form after draining") {
    val s = spark
    import s.implicits._
    val ev = graft.queries.EventsQueries.events(spark, sf0001)
      .where(col("event_type") === "purchase")
      .select(unix_millis(col("ts")).as("ms"), col("event_id"),
        floor(col("value") * 1000).cast("long").as("xq"))
      .orderBy("ms", "event_id")
    val st = ev.agg(sum("xq").as("sx"), count(lit(1)).as("n")).head()
    val kq = st.getLong(0) / st.getLong(1)

    // Expected: the oracle-gated batch query (closed form, two scans).
    val batch = graft.SparkEntry.queries("evt_cusum_changepoint")(spark, sf0001).head()

    // Feed three TIME-ORDERED chunks, one file per micro-batch — the
    // monitor's in-order delivery contract.
    val dir = graft.tables.TmpDirs.create("graft-cusum-stream").toString
    val rows = ev.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.grouped((rows.length + 2) / 3).foreach { chunk =>
      chunk.toSeq.toDF("ms", "event_id", "xq")
        .coalesce(1).write.mode("append").parquet(s"$dir/in")
    }
    val stream = spark.readStream
      .option("maxFilesPerTrigger", "1")
      .schema("ms LONG, event_id LONG, xq LONG").parquet(s"$dir/in")
      .select(lit("purchase").as("key"), col("ms"),
        col("event_id").as("eventId"), col("xq"))
      .as[EventsStreaming.CusumEvent]
    val q = EventsStreaming.cusumMonitor(stream, kq)
      .writeStream.format("memory").queryName("cusum_out")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/cp")
      .start()
    q.processAllAvailable(); q.stop()

    val emitted = spark.sql("SELECT * FROM cusum_out").collect()
      .maxBy(_.getAs[Long]("n"))
    assert(emitted.getAs[Long]("n") == batch.getAs[Long]("n"))
    assert(emitted.getAs[Long]("maxUp") == batch.getAs[Long]("max_cusum_up"))
    assert(emitted.getAs[Long]("upMs") == batch.getAs[Long]("up_change_ms"))
    assert(emitted.getAs[Long]("maxDn") == batch.getAs[Long]("max_cusum_dn"))
    assert(emitted.getAs[Long]("dnMs") == batch.getAs[Long]("dn_change_ms"))
  }

  test("dropDuplicatesWithinWatermark dedups across micro-batches, bounded state") {
    val src = graft.queries.EventsQueries.events(spark, sf0001)
      .select("event_id", "ts", "event_type", "user_id", "value")
    val dir = graft.tables.TmpDirs.create("graft-dedup-stream").toString
    // File 1: the full table. File 2: every 3rd event re-delivered
    // verbatim. maxFilesPerTrigger=1 forces the re-delivery into a
    // LATER micro-batch, so the dedup must come from the state store,
    // not from within-batch distinct.
    src.coalesce(1).write.mode("append").parquet(s"$dir/in")
    src.filter(col("event_id") % 3 === 0)
      .coalesce(1).write.mode("append").parquet(s"$dir/in")
    val stream = spark.readStream
      .option("maxFilesPerTrigger", "1")
      .schema(src.schema).parquet(s"$dir/in")
    val q = graft.streaming.EventsStreaming.dedupIngest(stream)
      .writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000), "dedup stream must drain within 300s")
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() == src.count(), "every duplicate re-delivery must be dropped")
    assert(out.select("event_id").distinct().count() == src.count())
    // Restart over the same input: the checkpoint makes it a no-op.
    val q2 = graft.streaming.EventsStreaming.dedupIngest(
      spark.readStream.option("maxFilesPerTrigger", "1")
        .schema(src.schema).parquet(s"$dir/in"))
      .writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q2.awaitTermination(300000), "restart must drain within 300s")
    assert(spark.read.parquet(s"$dir/out").count() == src.count(),
      "restart must not re-emit")
  }
}
