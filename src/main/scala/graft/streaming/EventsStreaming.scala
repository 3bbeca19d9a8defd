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
}
