package graft.buffering

import java.time.Instant

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

import graft.model.OrderStreamRow

/** The state-v2 (`transformWithState`) spelling of the transaction
  * buffer — same contract as [[TxBuffer]] (buffer per `xid:csn` until the
  * metadata-announced counts are met, then assemble and emit; optional
  * TTL drops wedged transactions), on Spark 4's arbitrary-stateful API:
  *
  *  - the buffer lives in a named `ValueState[TxState]` instead of the
  *    single implicit `GroupState` — state is schema'd, evolvable, and
  *    can coexist with other state variables in one processor;
  *  - TTL uses explicit processing-time TIMERS (`registerTimer` on every
  *    update, stale timers ignored by the generation check) rather than
  *    `setTimeoutDuration`, so expiry fires even if the key never sees
  *    another event — the exact hole in v1's timeout contract (a
  *    `flatMapGroupsWithState` timeout only fires when SOME batch runs,
  *    which holds in practice but couples TTL to traffic);
  *  - requires the RocksDB state store provider (the state-v2 backend),
  *    which SparkSessions/the specs already run, matching the
  *    reference's own provider choice (reference.conf:14).
  *
  * The shared per-event state machine (TxState fold, completion
  * predicate, assembly) is byte-for-byte the same code as v1 — this
  * class only swaps the state-store API around it. The oracle-gated
  * pipeline stays on v1 (`CdcPipeline.orderStream`); TxBufferV2Spec
  * pins this variant to identical emissions on the same scenarios.
  */
final class TxProcessor(processedTs: () => String, ttlMs: Long)
    extends StatefulProcessor[String, UnifiedEvent, OrderStreamRow] {

  @transient private var st: ValueState[TxState] = _
  @transient private var deadline: ValueState[java.lang.Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    st = getHandle.getValueState[TxState](
      "tx", Encoders.product[TxState], TTLConfig.NONE)
    deadline = getHandle.getValueState[java.lang.Long](
      "deadline", Encoders.LONG, TTLConfig.NONE)
  }

  override def handleInputRows(
      key: String,
      rows: Iterator[UnifiedEvent],
      timerValues: TimerValues): Iterator[OrderStreamRow] = {
    val (xid, csn) = key.split(":", 2) match {
      case Array(x, c) => (x, c)
      case _           => (key, "")
    }
    var s = if (st.exists()) st.get() else TxState.empty(xid, csn)
    rows.foreach { e =>
      s = if (e.event_type == "METADATA") s.withMetadata(e) else s.withEvent(e)
    }
    if (s.isComplete) {
      st.clear()
      deadline.clear()
      OrderAssembler.assemble(s, processedTs()).iterator
    } else {
      st.update(s)
      // TTL measured from the LAST event (v1's setTimeoutDuration
      // semantics): persist the refreshed deadline; earlier timers of
      // this key fire as stale and no-op against it.
      if (ttlMs > 0) {
        val dl = timerValues.getCurrentProcessingTimeInMs() + ttlMs
        deadline.update(dl)
        getHandle.registerTimer(dl)
      }
      Iterator.empty
    }
  }

  override def handleExpiredTimer(
      key: String,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[OrderStreamRow] = {
    // Completed keys already cleared everything; a superseded timer
    // (events arrived after it was set, pushing the deadline out) must
    // not drop a still-live transaction.
    val stale = deadline.exists() &&
      expiredTimerInfo.getExpiryTimeInMs() < deadline.get()
    if (!stale) {
      st.clear()
      deadline.clear()
    }
    Iterator.empty
  }
}

object TxBufferV2 {

  implicit private val eventEnc: Encoder[UnifiedEvent] = Encoders.product[UnifiedEvent]
  implicit private val outEnc: Encoder[OrderStreamRow] = Encoders.product[OrderStreamRow]
  implicit private val keyEnc: Encoder[String] = Encoders.STRING

  /** Drop-in equivalent of `TxBuffer.apply` on the state-v2 engine. */
  def apply(
      unified: DataFrame,
      processedTs: () => String = () => Instant.now().toString,
      stateTtl: Option[java.time.Duration] = None): Dataset[OrderStreamRow] = {
    val ts = processedTs
    val timeMode =
      if (stateTtl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    unified
      .select("xid", "csn", "table", "before", "after",
        "event_type", "expected_count", "data_collections")
      .as[UnifiedEvent]
      .groupByKey(e => e.xid + ":" + e.csn)
      .transformWithState(
        new TxProcessor(ts, stateTtl.map(_.toMillis).getOrElse(0L)),
        timeMode,
        OutputMode.Append())
  }
}
