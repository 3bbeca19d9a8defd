package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time streaming analytics: watermarked tumbling-window
  * aggregation over an event stream (the streaming dual of the
  * `evt_hourly` batch query).
  *
  * The reference pipeline is count-driven, not time-driven (SURVEY.md
  * §2.4 — no watermarks), but the engine's stream surface supports
  * event-time semantics for the events workload: `withWatermark` bounds
  * state (late events beyond the delay are dropped and their windows
  * finalized), and the windowed aggregate shuffles once on
  * (window, event_type).
  *
  * Scale notes: state per key is one running aggregate (not buffered
  * rows); watermark delay bounds total state to (delay / window) × key
  * cardinality entries. Use the RocksDB provider for large cardinality.
  */
object EventsStreaming {

  /** input: streaming DataFrame with (ts TIMESTAMP, event_type STRING,
    * value DOUBLE). Output (append mode): finalized hourly windows. */
  def hourlyAgg(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(col("w.start").as("hour_ts"), col("event_type"), col("n"), col("total_value"))

  /** Sessionization as a streaming aggregate: native `session_window`
    * with a 30-minute inactivity gap. Spark merges overlapping per-event
    * windows into sessions in the state store; the watermark finalizes a
    * session once event time passes its end + delay, so state per user is
    * bounded by open sessions only. The batch dual is the oracle-gated
    * `evt_session_window` query (EventsStreamingSpec pins stream==batch). */
  def sessionAgg(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(col("user_id"),
        unix_millis(col("w.start")).as("session_start_ms"),
        unix_millis(col("w.end")).as("session_end_ms"),
        col("n_events"), col("total_value"))

  /** Exactly-once-per-id ingest dedup with BOUNDED state:
    * `dropDuplicatesWithinWatermark` keeps the first arrival of each
    * `event_id` and expires an id's dedup state once the watermark
    * passes its event time + delay. The unbounded alternative
    * (`dropDuplicates`) retains every id ever seen — at 100 TB/day of
    * at-least-once ingest that state never stops growing, while this
    * one holds only the ids inside the (re)delivery horizon. The batch
    * dual is a plain distinct-by-id (the `evt_stream_dedup` oracle):
    * duplicates arrive verbatim, so whichever copy wins is bytewise
    * identical and the result is deterministic. */
  def dedupIngest(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Date-partitioned streaming append: land the raw event stream as a
    * hive-style `event_date=...` parquet tree with an exactly-once sink
    * log. Streaming ingest writing straight into the partition-pruned
    * layout is the 100 TB landing pattern: downstream daily jobs read
    * one partition directory (planning-time pruning, see
    * tables/PartitionedTable) and maintenance (compaction / z-order)
    * runs per partition. Returns the started query. */
  def startPartitionedAppend(
      events: DataFrame,
      outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events
      .withColumn("event_date", to_date(col("ts")))
      .writeStream
      .format("parquet")
      .partitionBy("event_date")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()

  /** Stream-static broadcast enrichment: join the event stream against a
    * static dimension on user_id. STATELESS — no watermark, no state
    * store: the static side is (re)resolved per micro-batch and
    * broadcast, the stream side never shuffles. This is the streaming
    * dim-enrichment pattern at any scale (the static side just has to
    * stay broadcastable; bucket both sides for the bigger case). Left
    * join keeps unmatched events with null attributes rather than
    * silently dropping them. */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")

  /** Stream-stream interval join: per user, pair each error with the
    * clicks that follow it within `intervalSeconds`. Both sides carry
    * watermarks so join state is bounded (errors retained only until the
    * click-side watermark passes the interval horizon).
    *
    * Reference has no stream-stream joins (SURVEY.md §2.4); this is the
    * engine's beyond-reference streaming correlation primitive.
    */
  def errorClickJoin(
      events: DataFrame,
      intervalSeconds: Long,
      watermarkDelay: String = "2 hours"): DataFrame =
    errorClickJoinTyped(events, intervalSeconds, watermarkDelay, "inner")

  /** LEFT OUTER variant: errors with NO click inside the interval are
    * still emitted (null click columns) once the click-side watermark
    * passes their join horizon — the stream-stream formulation of
    * "which errors went unresolved". The watermark is what makes the
    * null verdict SAFE to emit: no future click can match anymore, so
    * state stays bounded AND the absence is final. */
  def errorClickJoinOuter(
      events: DataFrame,
      intervalSeconds: Long,
      watermarkDelay: String = "2 hours"): DataFrame =
    errorClickJoinTyped(events, intervalSeconds, watermarkDelay, "left_outer")

  private def errorClickJoinTyped(
      events: DataFrame,
      intervalSeconds: Long,
      watermarkDelay: String,
      joinType: String): DataFrame = {
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"),
        col("event_id").as("error_id"))
      .withWatermark("e_ts", watermarkDelay)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", watermarkDelay)
    errors.join(
      clicks,
      col("e_user") === col("c_user") &&
        col("c_ts") > col("e_ts") &&
        col("c_ts") <= col("e_ts") + expr(s"INTERVAL $intervalSeconds SECONDS"),
      joinType)
      .select(col("e_user").as("user_id"), col("error_id"), col("click_id"),
        col("e_ts"), col("c_ts"))
  }

  /** One metric stream's CUSUM drift state — the streaming dual of the
    * batch `evt_cusum_changepoint` closed form. Carrying (p, runMin,
    * runMax, extremes) IS the whole detector: CUSUM's recurrence is
    * incremental by construction, so state per key is eight longs
    * regardless of stream length. */
  final case class CusumEvent(key: String, ms: Long, eventId: Long, xq: Long)
  final case class CusumState(
      n: Long, p: Long, runMin: Long, runMax: Long,
      maxUp: Long, upMs: Long, maxDn: Long, dnMs: Long)
  final case class CusumStat(
      key: String, n: Long, maxUp: Long, upMs: Long, maxDn: Long, dnMs: Long)

  /** Streaming CUSUM monitor: per key, fold each micro-batch's events in
    * (ms, eventId) order into the running statistic against the FIXED
    * quantized target `kq` (calibrated offline — the batch query's
    * floor-mean; a streaming detector never re-fits its own reference).
    * Exactness contract: arithmetic identical to the batch closed form —
    * S_up(t) = P_t − min(0, min_{k≤t} P_k) — so after feeding the same
    * events IN ORDER, the emitted stat equals evt_cusum_changepoint's
    * row (EventsStreamingSpec pins it). Deliveries are assumed in-order
    * across batches (CDC/telemetry feeds are per-key ordered; an
    * out-of-order feed needs the batch dual on a closed window). */
  def cusumMonitor(
      events: org.apache.spark.sql.Dataset[CusumEvent],
      kq: Long): org.apache.spark.sql.Dataset[CusumStat] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .mapGroupsWithState[CusumState, CusumStat](GroupStateTimeout.NoTimeout()) {
        (key, it, state: GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(
            CusumState(0L, 0L, Long.MaxValue, Long.MinValue, 0L, -1L, 0L, -1L))
          it.toArray.sortBy(e => (e.ms, e.eventId)).foreach { e =>
            // first event pins both timestamps: the batch dual reports
            // min(ms) among rows attaining the max, and a statistic that
            // never rises above 0 attains it at the FIRST row
            if (st.n == 0L) st = st.copy(upMs = e.ms, dnMs = e.ms)
            val p = st.p + (e.xq - kq)
            val runMin = math.min(st.runMin, p)
            val runMax = math.max(st.runMax, p)
            val sUp = p - math.min(runMin, 0L)
            val sDn = math.max(runMax, 0L) - p
            st = CusumState(
              st.n + 1, p, runMin, runMax,
              if (sUp > st.maxUp) sUp else st.maxUp,
              if (sUp > st.maxUp) e.ms else st.upMs,
              if (sDn > st.maxDn) sDn else st.maxDn,
              if (sDn > st.maxDn) e.ms else st.dnMs)
          }
          state.update(st)
          CusumStat(key, st.n, st.maxUp, st.upMs, st.maxDn, st.dnMs)
      }
  }
}
