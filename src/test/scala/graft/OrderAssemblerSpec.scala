package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.buffering.{OrderAssembler, TxState, UnifiedEvent}
import graft.model.FieldCoercion

/** Pure-Scala unit tests for the in-state assembly (no Spark session):
  * per-order grouping, delete skipping, missing-key handling, coercion.
  */
class OrderAssemblerSpec extends AnyFunSuite {

  private def ev(table: String, after: String, before: String = null): UnifiedEvent =
    UnifiedEvent("x", "1", table, before, after, "CDC", null, null)

  test("events group by ORDER_ID across the three tables") {
    val st = TxState.empty("x", "1")
      .withEvent(ev("ORDERS", """{"ORDER_ID":"1","VERSION":"1"}"""))
      .withEvent(ev("ORDERS", """{"ORDER_ID":"2","VERSION":"1"}"""))
      .withEvent(ev("ORDER_DETAILS", """{"ORDER_ID":"1","VERSION":"1"}"""))
      .withEvent(ev("ORDER_LINE_ITEMS", """{"LINE_ITEM_ID":"10","ORDER_ID":"1","VERSION":"1"}"""))
      .withEvent(ev("ORDER_LINE_ITEMS", """{"LINE_ITEM_ID":"20","ORDER_ID":"2","VERSION":"1"}"""))
    val rows = OrderAssembler.assemble(st, "ts")
    assert(rows.map(_.orderId) == Seq(Some(1.0), Some(2.0)), "insertion order per first touch")
    val r1 = rows.head
    assert(r1.orders.size == 1 && r1.orderDetails.size == 1 && r1.lineItems.size == 1)
    assert(rows(1).orderDetails.isEmpty && rows(1).lineItems.size == 1)
  }

  test("delete events (null after) are skipped entirely") {
    val st = TxState.empty("x", "1")
      .withEvent(ev("ORDERS", null, """{"ORDER_ID":"1","VERSION":"1"}"""))
    assert(OrderAssembler.assemble(st, "ts").isEmpty)
  }

  test("missing ORDER_ID still yields a row keyed on null") {
    val st = TxState.empty("x", "1")
      .withEvent(ev("ORDERS", """{"VERSION":"1","ORDER_STATUS":"P"}"""))
    val rows = OrderAssembler.assemble(st, "ts")
    assert(rows.size == 1 && rows.head.orderId.isEmpty)
  }

  test("unknown tables are ignored; coercion handles malformed numerics") {
    val st = TxState.empty("x", "1")
      .withEvent(ev("SOMETHING_ELSE", """{"ORDER_ID":"1"}"""))
      .withEvent(ev("ORDERS", """{"ORDER_ID":"not-a-number","VERSION":"1"}"""))
    val rows = OrderAssembler.assemble(st, "ts")
    assert(rows.size == 1 && rows.head.orderId.isEmpty, "unparseable id becomes null, not a crash")
    assert(st.orderEvents.size == 1, "unknown table not buffered")
  }

  test("image parsing skips null values and tolerates malformed JSON") {
    assert(FieldCoercion.parseImage("""{"A":"1","B":null,"C":"x"}""") == Map("A" -> "1", "C" -> "x"))
    assert(FieldCoercion.parseImage("""not json""") == Map.empty)
  }

  test("completion: >= semantics tolerate duplicate deliveries") {
    val meta = UnifiedEvent("x", "1", null, null, null, "METADATA", 1,
      Seq(graft.buffering.CollectionCount("ORDERS", 1)))
    val e = ev("ORDERS", """{"ORDER_ID":"1","VERSION":"1"}""")
    val st = TxState.empty("x", "1").withMetadata(meta).withEvent(e).withEvent(e)
    assert(st.isComplete, "2 delivered >= 1 expected must complete")
  }
}
