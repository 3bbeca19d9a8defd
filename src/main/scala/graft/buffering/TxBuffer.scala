package graft.buffering

import java.time.Instant

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.{FieldCoercion, OrderStreamRow}

final case class CollectionCount(data_collection: String, event_count: java.lang.Integer)

/** The buffered projection of the unified envelope: ONLY the fields the
  * stateful operator consumes (routing key + images + completion
  * metadata). The envelope's op_type/op_ts/current_ts/pos never cross the
  * shuffle or enter the state store — the typed stateful operator is an
  * optimization barrier, so projecting before `groupByKey` is the one
  * optimization Catalyst can't do for us (SURVEY.md §4.2).
  *
  * Fields are plain nullable types, not Options: this row is materialized
  * once per event on the shuffle read and again per state round-trip, and
  * Option boxing is measurable at that rate. */
final case class UnifiedEvent(
    xid: String,
    csn: String,
    table: String,
    before: String,
    after: String,
    event_type: String,
    expected_count: java.lang.Integer,
    data_collections: Seq[CollectionCount]) {

  /** Short table name: schema prefix stripped
    * (reference: model/generic/DataChangeEvent.scala:43-45); null for
    * metadata events. */
  def tableName: String =
    if (table == null) null
    else {
      val i = table.lastIndexOf('.')
      if (i >= 0) table.substring(i + 1) else table
    }
}

/** Per-transaction mutable buffer carried in the state store
  * (reference: processor/TransactionState.scala:20-68). Immutable case
  * class — state updates replace the value, which is what GroupState
  * requires anyway.
  *
  * `expected*` are -1 until the metadata event arrives ("no metadata yet",
  * the reference models this as a null metadata object).
  */
final case class TxState(
    xid: String,
    csn: String,
    orderEvents: Seq[UnifiedEvent],
    detailEvents: Seq[UnifiedEvent],
    lineItemEvents: Seq[UnifiedEvent],
    expectedOrders: Int,
    expectedDetails: Int,
    expectedLineItems: Int) {

  def hasMetadata: Boolean = expectedOrders >= 0

  def withMetadata(e: UnifiedEvent): TxState = {
    def countFor(name: String): Int = {
      val dcs = if (e.data_collections == null) Nil else e.data_collections
      dcs.iterator
        .filter(c => c.data_collection != null &&
          (c.data_collection == name || c.data_collection.endsWith("." + name)))
        .collect { case c if c.event_count != null => c.event_count.intValue }
        .sum
    }
    copy(
      expectedOrders = countFor("ORDERS"),
      expectedDetails = countFor("ORDER_DETAILS"),
      expectedLineItems = countFor("ORDER_LINE_ITEMS"))
  }

  /** Route a CDC event to its per-table buffer; unknown tables are ignored
    * (reference: TransactionState.scala:49-56). */
  def withEvent(e: UnifiedEvent): TxState = e.tableName match {
    case "ORDERS"           => copy(orderEvents = orderEvents :+ e)
    case "ORDER_DETAILS"    => copy(detailEvents = detailEvents :+ e)
    case "ORDER_LINE_ITEMS" => copy(lineItemEvents = lineItemEvents :+ e)
    case _                  => this
  }

  /** `>=`, not `==` — late duplicate deliveries must not wedge the
    * transaction open (reference: TransactionState.scala:58-62). */
  def isComplete: Boolean =
    hasMetadata &&
      orderEvents.size >= expectedOrders &&
      detailEvents.size >= expectedDetails &&
      lineItemEvents.size >= expectedLineItems
}

object TxState {
  def empty(xid: String, csn: String): TxState =
    TxState(xid, csn, Vector.empty, Vector.empty, Vector.empty, -1, -1, -1)
}

/** THE core stateful operator: buffer CDC events per `xid:csn` until the
  * metadata-announced per-table counts are met, then join the buffered
  * events by ORDER_ID and emit denormalized rows
  * (reference: TransactionalCdcProcessingApp.scala:66-72, 138-223).
  *
  * Scale notes:
  *  - `groupByKey` hash-partitions by transaction key, so state for one
  *    transaction lives in exactly one task; parallelism = key cardinality,
  *    which at CDC scale is effectively unbounded.
  *  - The stateful lambda is an optimization barrier; callers should
  *    project to the 12 envelope columns before grouping (the parsers
  *    already do) so no extra bytes cross the shuffle.
  *  - State per key is one transaction's events — bounded by transaction
  *    size, not stream length; completed keys are removed eagerly.
  *  - Run streaming with the RocksDB state store provider for large key
  *    cardinality (see SparkSessions / app wiring).
  */
/** One TTL-dropped buffered event, with full image payloads so a
  * quarantined transaction can be inspected or replayed (the dead-letter
  * record the reference leaves as an open risk —
  * IMPLEMENTATION.md:177-183). */
final case class DeadEvent(
    xid: String,
    csn: String,
    table: String,
    event_type: String,
    before: String,
    after: String,
    reason: String)

/** Union output row of the dead-letter variant: exactly one of
  * `row`/`dead` is non-null (a streaming operator has one output — the
  * split into main/quarantine sinks happens downstream in foreachBatch). */
final case class BufferedOut(row: OrderStreamRow, dead: DeadEvent)

/** Per-transaction buffering progress — the operational signal an
  * operator stares at during an incident (reference:
  * processor/TransactionState.scala:64-67 logs the same counts).
  * Reported whenever the stateful lambda runs for a group that stays
  * incomplete: on every trigger that DELIVERS events for the
  * transaction, and (with a TTL configured) on its timeout — not on
  * event-less triggers in between, since flatMapGroupsWithState only
  * visits groups with input or expired timers. For stall detection,
  * configure the TTL: the quarantine/timeout path is the wake-up that
  * fires without new events. `expected* == -1` means the METADATA event
  * has not arrived yet. */
final case class TxProgress(
    xid: String,
    csn: String,
    orders: Int,
    expectedOrders: Int,
    details: Int,
    expectedDetails: Int,
    lineItems: Int,
    expectedLineItems: Int) {
  def render: String = {
    def part(n: Int, exp: Int) = if (exp < 0) s"$n/?" else s"$n/$exp"
    s"tx $xid:$csn buffering orders=${part(orders, expectedOrders)} " +
      s"details=${part(details, expectedDetails)} " +
      s"lineItems=${part(lineItems, expectedLineItems)}"
  }
}

object TxBuffer {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Progress hook, invoked ON THE EXECUTOR once per still-incomplete
    * transaction per trigger (the stateful lambda is the only place the
    * counts exist). Default logs at INFO, mirroring the reference's
    * worker-side progress strings; swappable (e.g. to a metrics client,
    * or a collector in specs — see TxBufferSpec). Looked up at call
    * time, not captured, so each executor JVM resolves its own. */
  @volatile var onProgress: TxProgress => Unit = p => log.info(p.render)

  private def reportProgress(st: TxState): Unit =
    onProgress(TxProgress(
      st.xid, st.csn,
      st.orderEvents.size, st.expectedOrders,
      st.detailEvents.size, st.expectedDetails,
      st.lineItemEvents.size, st.expectedLineItems))

  implicit private val eventEnc: Encoder[UnifiedEvent] = Encoders.product[UnifiedEvent]
  implicit private val stateEnc: Encoder[TxState] = Encoders.product[TxState]
  implicit private val outEnc: Encoder[OrderStreamRow] = Encoders.product[OrderStreamRow]
  implicit private val outDlEnc: Encoder[BufferedOut] = Encoders.product[BufferedOut]
  implicit private val keyEnc: Encoder[String] = Encoders.STRING

  /** Apply to a unified-envelope DataFrame (batch or streaming).
    *
    * @param processedTs processing timestamp supplier; pass a constant for
    *                    deterministic output in tests/correctness dumps.
    * @param stateTtl    optional per-transaction state TTL (streaming
    *                    only): transactions still incomplete this long
    *                    after their last event are dropped. Fixes the
    *                    reference's documented unbounded-state risk
    *                    (IMPLEMENTATION.md:177-183 — NoTimeout, state
    *                    leaks if metadata never arrives). None preserves
    *                    the reference's exact semantics.
    */
  def apply(
      unified: DataFrame,
      processedTs: () => String = () => Instant.now().toString,
      stateTtl: Option[java.time.Duration] = None): Dataset[OrderStreamRow] = {
    val ts = processedTs
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    unified
      .select("xid", "csn", "table", "before", "after",
        "event_type", "expected_count", "data_collections")
      .as[UnifiedEvent]
      .groupByKey(e => e.xid + ":" + e.csn)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        processTransaction(ts, stateTtl))
  }

  /** Like `apply`, but TTL-expired incomplete transactions are EMITTED
    * as dead-letter rows instead of silently dropped — the quarantine
    * answer to the reference's unbounded-state risk. Split the union
    * output downstream (`row` vs `dead`); see
    * CdcStreaming.startIngestQuarantined for the two-sink wiring. */
  def withDeadLetters(
      unified: DataFrame,
      processedTs: () => String = () => Instant.now().toString,
      stateTtl: java.time.Duration): Dataset[BufferedOut] = {
    val ts = processedTs
    unified
      .select("xid", "csn", "table", "before", "after",
        "event_type", "expected_count", "data_collections")
      .as[UnifiedEvent]
      .groupByKey(e => e.xid + ":" + e.csn)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout())(
        processTransactionDL(ts, stateTtl))
  }

  /** Fold this trigger's events into the transaction's state. */
  private def foldEvents(
      txKey: String,
      events: Iterator[UnifiedEvent],
      state: GroupState[TxState]): TxState = {
    val (xid, csn) = txKey.split(":", 2) match {
      case Array(x, c) => (x, c)
      case _           => (txKey, "")
    }
    var st = state.getOption.getOrElse(TxState.empty(xid, csn))
    events.foreach { e =>
      st = if (e.event_type == "METADATA") st.withMetadata(e) else st.withEvent(e)
    }
    st
  }

  private[buffering] def processTransaction(
      processedTs: () => String,
      stateTtl: Option[java.time.Duration] = None)(
      txKey: String,
      events: Iterator[UnifiedEvent],
      state: GroupState[TxState]): Iterator[OrderStreamRow] = {

    if (state.hasTimedOut) {
      // Incomplete past the TTL: drop (withDeadLetters is the variant
      // that quarantines instead).
      state.remove()
      return Iterator.empty
    }

    val st = foldEvents(txKey, events, state)
    if (st.isComplete) {
      state.remove()
      OrderAssembler.assemble(st, processedTs()).iterator
    } else {
      state.update(st)
      stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
      reportProgress(st)
      Iterator.empty
    }
  }

  private[buffering] def processTransactionDL(
      processedTs: () => String,
      stateTtl: java.time.Duration)(
      txKey: String,
      events: Iterator[UnifiedEvent],
      state: GroupState[TxState]): Iterator[BufferedOut] = {

    if (state.hasTimedOut) {
      val st = state.get
      state.remove()
      val reason =
        s"state TTL expired incomplete: orders ${st.orderEvents.size}/${st.expectedOrders}, " +
          s"details ${st.detailEvents.size}/${st.expectedDetails}, " +
          s"lineItems ${st.lineItemEvents.size}/${st.expectedLineItems}"
      return (st.orderEvents ++ st.detailEvents ++ st.lineItemEvents).iterator.map(e =>
        BufferedOut(null, DeadEvent(st.xid, st.csn, e.table, e.event_type, e.before, e.after, reason)))
    }

    val st = foldEvents(txKey, events, state)
    if (st.isComplete) {
      state.remove()
      OrderAssembler.assemble(st, processedTs()).iterator.map(BufferedOut(_, null))
    } else {
      state.update(st)
      state.setTimeoutDuration(stateTtl.toMillis)
      reportProgress(st)
      Iterator.empty
    }
  }
}

/** Joins one complete transaction's buffered events into denormalized
  * per-order rows (reference: processor/OrderJoiner.scala:29-88). Runs on
  * tiny in-memory per-transaction buffers inside the stateful operator —
  * plain Scala, no Spark join needed.
  */
object OrderAssembler {

  import graft.model.{LineItemRec, OrderDetailRec, OrderRec}

  def assemble(st: TxState, processedTs: String): Seq[OrderStreamRow] = {
    // LinkedHashMap: first-touched order first, matching insertion-order
    // emission; within one order, events keep arrival order. Key is
    // Option[Double]: an event with a missing ORDER_ID still yields a row
    // with null orderId, as in the reference (null-keyed HashMap entry).
    val byOrder = scala.collection.mutable.LinkedHashMap[Option[Double], (Vector[OrderRec], Vector[OrderDetailRec], Vector[LineItemRec])]()

    def touch(id: Option[Double]) = byOrder.getOrElseUpdate(id, (Vector.empty, Vector.empty, Vector.empty))

    // Delete events carry after=null and are silently skipped
    // (reference: OrderJoiner.scala:38,56,74 + replicat IGNOREDELETES).
    // Images travel as raw JSON and are Jackson-parsed here, once per
    // buffered event (reference does the same in OrderJoiner.convert).
    def beforeOf(e: UnifiedEvent): Option[Map[String, String]] =
      Option(e.before).map(FieldCoercion.parseImage)
    st.orderEvents.foreach { e =>
      if (e.after != null) {
        val rec = FieldCoercion.order(FieldCoercion.parseImage(e.after), beforeOf(e))
        val (o, d, l) = touch(rec.orderId); byOrder(rec.orderId) = (o :+ rec, d, l)
      }
    }
    st.detailEvents.foreach { e =>
      if (e.after != null) {
        val rec = FieldCoercion.detail(FieldCoercion.parseImage(e.after), beforeOf(e))
        val (o, d, l) = touch(rec.orderId); byOrder(rec.orderId) = (o, d :+ rec, l)
      }
    }
    st.lineItemEvents.foreach { e =>
      if (e.after != null) {
        val rec = FieldCoercion.lineItem(FieldCoercion.parseImage(e.after), beforeOf(e))
        val (o, d, l) = touch(rec.orderId); byOrder(rec.orderId) = (o, d, l :+ rec)
      }
    }

    byOrder.toSeq.map { case (orderId, (orders, details, lineItems)) =>
      OrderStreamRow(st.xid, st.csn, processedTs, orderId, orders, details, lineItems)
    }
  }
}
