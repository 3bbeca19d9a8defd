package graft.cdcgen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkSessions.tablePath
import graft.envelope.Envelope

/** Deterministic CDC workload derived from the driver testdata.
  *
  * Maps the TPC-H-ish `orders`/`lineitem` tables onto the reference's CDC
  * envelope (FIXTURES.md §1-2; reference: README.md:70-98) so the full
  * pipeline — JSON parse → union → stateful buffering → assembly — has a
  * DuckDB-expressible oracle. Same spirit as the reference's deterministic
  * PL/SQL seed generator (reference: db/oracle-ddl.sql:87-176), but scaled
  * by the testdata SF instead of a fixed 100 orders.
  *
  * Workload shape (all modular arithmetic on o_orderkey, so the oracle can
  * reproduce it):
  *  - Base transactions group 5 consecutive orders per tx
  *    (xid `tx-<g>`, g = o_orderkey DIV 5): for each order an ORDERS
  *    insert + an ORDER_DETAILS insert + its line-item inserts — exercises
  *    the multi-order-per-transaction path.
  *  - Groups with g % 11 == 0 get NO metadata event → must never emit
  *    (completion gating).
  *  - Orders with o_orderkey % 7 == 0 get a second, single-order update
  *    transaction (xid `txu-<key>`) with before images and VERSION=2.
  *  - Orders with o_orderkey % 9 == 0 get a detail-only update transaction
  *    (xid `txs-<key>`) — SCD1 catch-all-clause and insert-guard coverage.
  *  - Orders with o_orderkey % 13 == 0 get a delete transaction
  *    (xid `txd-<key>`, op_type=D, after=null) → buffered, counted,
  *    complete, but assembles to zero rows (delete-skip semantics).
  *  - A handful of null-xid events are mixed in → dropped by the null
  *    guard before grouping.
  *  - Separately, `redeliveryFromTpch` builds a conflicting-redelivery
  *    wave (xid `txr-<key>`, o_orderkey % 17 == 0): the same order /
  *    detail / line-item images at their ORIGINAL versions but with
  *    changed content — the at-least-once shape that exercises the
  *    merge's target-wins-ties rule (reference:
  *    ScdType1MergeApp.scala:219-244). Kept out of the base workload so
  *    the tie semantics are observable in a dedicated oracle query.
  *
  * Two output shapes share all of the above wiring:
  *  - JSON (`fromTpch`): Kafka-like `value` strings rendered with plain
  *    codegen'd `concat` (no map/struct allocation or Jackson
  *    serialization per row; generated values contain no
  *    quotes/backslashes, so no escaping is needed). This is the
  *    CORRECTNESS path — it exercises Envelope.parseCdc end-to-end.
  *  - Direct envelope (`envelopeFromTpch`): the exact 12-column frame
  *    `Envelope.parseCdc`/`parseMetadata` would produce, built without
  *    the render+reparse round-trip. This is the BENCH fast lane for
  *    measuring the operators downstream of the parser; the before/after
  *    images are still the same JSON strings (the assembler consumes
  *    them as raw text either way).
  */
object CdcEventGen {

  final case class CdcStreams(
      orders: DataFrame,
      details: DataFrame,
      lineItems: DataFrame,
      metadata: DataFrame)

  /** How an event family renders: Kafka-like JSON `value` strings, or the
    * unified 12-column envelope directly. `before`/`after`/`xid`/`csn`
    * are passed as semantic columns (NULL when absent). */
  private sealed trait EventShape {
    def cdc(
        xid: Column, csn: Column, table: String, opType: Column,
        before: Column, after: Column): Seq[Column]
    def meta(
        xid: Column, csn: Column, eventCount: Column,
        collections: Seq[(String, Column)]): Seq[Column]
  }

  private def baseXid = concat(lit("tx-"), expr("CAST(o_orderkey DIV 5 AS STRING)"))
  private def baseCsn = expr("CAST(o_orderkey DIV 5 AS STRING)")

  private val carriers = array(lit("FEDEX"), lit("UPS"), lit("DHL"), lit("USPS"))
  private val methods = array(lit("STANDARD"), lit("EXPRESS"), lit("OVERNIGHT"), lit("PICKUP"))
  private val dstatus = array(lit("PENDING"), lit("IN_TRANSIT"), lit("DELIVERED"), lit("RETURNED"))
  private def modIdx = (pmod(col("o_orderkey"), lit(4)) + 1).cast("int")

  private val nullStr = lit(null).cast("string")

  // The testdata timestamps are all second-precision, so plain casts
  // replace date_format (a per-row formatter, ~3 calls/row, measurable at
  // sf0.1): CAST(ts AS STRING) == 'yyyy-MM-dd HH:mm:ss' in a UTC session.
  private def tsStr = col("o_orderdate").cast("string")
  private def dateStr = substring(tsStr, 1, 10)
  private def ts6Str = concat(tsStr, lit(".000000"))
  private def posStr = lpad(col("o_orderkey").cast("string"), 20, "0")

  /** JSON object of string-valued fields, via codegen'd concat. Values
    * must be non-null and quote-free (true for everything we render). */
  private def jsonObj(fields: (String, Column)*): Column = {
    val parts = fields.zipWithIndex.flatMap { case ((k, v), i) =>
      Seq(lit((if (i == 0) "\"" else ",\"") + k + "\":\""), v, lit("\""))
    }
    concat(lit("{") +: parts :+ lit("}"): _*)
  }

  /** Render a possibly-null string column as a quoted JSON string or the
    * literal `null` token. */
  private def strOrNull(c: Column): Column =
    coalesce(concat(lit("\""), c, lit("\"")), lit("null"))

  /** Kafka-like rendering: one `value` column of envelope JSON. */
  private object JsonShape extends EventShape {
    def cdc(
        xid: Column, csn: Column, table: String, opType: Column,
        before: Column, after: Column): Seq[Column] = {
      val ts6 = ts6Str
      Seq(concat(
        lit(s"""{"table":"$table","op_type":""""), opType,
        lit("""","op_ts":""""), ts6,
        lit("""","current_ts":""""), ts6,
        lit("""","pos":""""), posStr,
        lit("""","csn":"""), strOrNull(csn),
        lit(""","xid":"""), strOrNull(xid),
        lit(""","before":"""), coalesce(before, lit("null")),
        lit(""","after":"""), coalesce(after, lit("null")),
        lit("}")).as("value"))
    }

    def meta(
        xid: Column, csn: Column, eventCount: Column,
        collections: Seq[(String, Column)]): Seq[Column] = {
      val colls = collections.map { case (name, cnt) =>
        concat(
          lit(s"""{"data_collection":"$name","event_count":"""),
          cnt.cast("string"), lit("}"))
      }
      Seq(concat(
        lit("""{"xid":""""), xid,
        lit("""","csn":""""), csn,
        lit("""","tx_ts":""""), ts6Str,
        lit("""","event_count":"""), eventCount.cast("string"),
        lit(""","data_collections":["""), concat_ws(",", colls: _*),
        lit("]}")).as("value"))
    }
  }

  /** Direct rendering of the unified envelope: byte-equivalent to
    * parseCdc/parseMetadata output on the JSON shape. */
  private object DirectShape extends EventShape {
    private val collsType = "array<struct<data_collection:string,event_count:int>>"

    def cdc(
        xid: Column, csn: Column, table: String, opType: Column,
        before: Column, after: Column): Seq[Column] = Seq(
      xid.as("xid"),
      csn.as("csn"),
      lit(table).as("table"),
      opType.as("op_type"),
      ts6Str.as("op_ts"),
      ts6Str.as("current_ts"),
      posStr.as("pos"),
      before.as("before"),
      after.as("after"),
      lit(table.stripPrefix("APPUSER.")).as("event_type"),
      lit(null).cast("int").as("expected_count"),
      lit(null).cast(collsType).as("data_collections"))

    def meta(
        xid: Column, csn: Column, eventCount: Column,
        collections: Seq[(String, Column)]): Seq[Column] = Seq(
      xid.as("xid"),
      csn.as("csn"),
      nullStr.as("table"),
      nullStr.as("op_type"),
      nullStr.as("op_ts"),
      nullStr.as("current_ts"),
      nullStr.as("pos"),
      nullStr.as("before"),
      nullStr.as("after"),
      lit(Envelope.MetadataEventType).as("event_type"),
      eventCount.cast("int").as("expected_count"),
      array(collections.map { case (name, cnt) =>
        struct(lit(name).as("data_collection"), cnt.cast("int").as("event_count"))
      }: _*).as("data_collections"))
  }

  /** The order_details image; status column injectable so update events can
    * carry a changed delivery status. */
  private def detailImage(versionCol: Column, statusCol: Column): Column =
    jsonObj(
      "ORDER_ID" -> col("o_orderkey").cast("string"),
      "VERSION" -> versionCol,
      "SHIPPING_METHOD" -> element_at(methods, modIdx),
      "TRACKING_NUMBER" -> concat(lit("TRK-"), col("o_orderkey").cast("string")),
      "SHIPPED_TS" -> tsStr,
      "ESTIMATED_DELIVERY_DATE" -> dateStr,
      "CARRIER" -> element_at(carriers, modIdx),
      "DELIVERY_STATUS" -> statusCol)

  /** The shared order `after` image (all values strings, as in the
    * GoldenGate envelope; typed coercion happens in the engine). */
  private def orderImage(versionCol: Column, statusCol: Column): Column =
    jsonObj(
      "ORDER_ID" -> col("o_orderkey").cast("string"),
      "ORDER_REF" -> concat(lit("ORD-"), col("o_orderkey").cast("string")),
      "VERSION" -> versionCol,
      "ORDER_DATE" -> dateStr,
      "ORDER_TS" -> tsStr,
      "ORDER_STATUS" -> statusCol,
      "ORDER_TYPE" -> col("o_orderpriority"),
      "TOTAL_AMOUNT" -> col("o_totalprice").cast("string"),
      "CURRENCY" -> lit("USD"),
      "CUSTOMER_ID" -> concat(lit("CUST-"), col("o_custkey").cast("string")),
      "SHIPPING_ADDRESS_ID" -> concat(lit("ADDR-"), pmod(col("o_custkey"), lit(100)).cast("string")),
      "CREATED_TS" -> tsStr)

  /** The order_line_items image; qty column injectable so redelivery
    * events can carry a conflicting quantity at the same version. */
  private def lineItemImage(versionCol: Column, qtyCol: Column): Column =
    jsonObj(
      "LINE_ITEM_ID" -> (col("o_orderkey") * 10 + col("l_linenumber")).cast("string"),
      "ORDER_ID" -> col("o_orderkey").cast("string"),
      "VERSION" -> versionCol,
      "PRODUCT_ID" -> concat(lit("PROD-"), col("l_partkey").cast("string")),
      "ITEM_QTY" -> qtyCol.cast("string"),
      "ITEM_PRICE" -> col("l_extendedprice").cast("string"),
      // No round(): Spark and DuckDB disagree on half-way decimal ties,
      // but a raw IEEE-754 product round-trips string→double exactly and
      // matches DuckDB's identical multiply bit-for-bit.
      "ITEM_AMOUNT" -> (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("string"),
      "ITEM_CURRENCY" -> lit("USD"))

  /** lineitem renamed so the envelope helpers (keyed on o_* columns) work. */
  private def liAsOrders(lineitem: DataFrame): DataFrame =
    lineitem.select(
      col("l_orderkey").as("o_orderkey"),
      col("l_shipdate").as("o_orderdate"),
      col("l_linenumber"), col("l_partkey"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"))

  private def buildStreams(spark: SparkSession, sfDir: String, shape: EventShape): CdcStreams = {
    val orders = spark.read.parquet(tablePath(sfDir, "orders"))
    val lineitem = spark.read.parquet(tablePath(sfDir, "lineitem"))

    // --- ORDERS events ---
    val orderInserts = orders.select(shape.cdc(
      baseXid, baseCsn, "APPUSER.ORDERS", lit("I"),
      nullStr, orderImage(lit("1"), col("o_orderstatus"))): _*)

    val orderUpdates = orders
      .filter(col("o_orderkey") % 7 === 0)
      .select(shape.cdc(
        concat(lit("txu-"), col("o_orderkey").cast("string")),
        (col("o_orderkey") + lit(1000000000L)).cast("string"),
        "APPUSER.ORDERS", lit("U"),
        orderImage(lit("1"), col("o_orderstatus")),
        orderImage(lit("2"), concat(lit("UPDATED-"), col("o_orderstatus")))): _*)

    val orderDeletes = orders
      .filter(col("o_orderkey") % 13 === 0)
      .select(shape.cdc(
        concat(lit("txd-"), col("o_orderkey").cast("string")),
        (col("o_orderkey") + lit(2000000000L)).cast("string"),
        "APPUSER.ORDERS", lit("D"),
        orderImage(lit("1"), col("o_orderstatus")), nullStr): _*)

    // Null-xid noise: must be dropped by the pipeline's null guard.
    val nullKeyNoise = orders
      .filter(col("o_orderkey") % 500 === 1)
      .select(shape.cdc(
        nullStr, nullStr,
        "APPUSER.ORDERS", lit("I"), nullStr, orderImage(lit("1"), col("o_orderstatus"))): _*)

    val allOrderEvents = orderInserts.unionByName(orderUpdates)
      .unionByName(orderDeletes).unionByName(nullKeyNoise)

    // --- ORDER_DETAILS events (1:1 with orders) ---
    val detailInserts = orders.select(shape.cdc(
      baseXid, baseCsn, "APPUSER.ORDER_DETAILS", lit("I"), nullStr,
      detailImage(lit("1"), element_at(dstatus, modIdx))): _*)

    // Detail-only update transactions (o_orderkey % 9 == 0): parent version
    // does NOT advance → exercises the SCD1 merge's catch-all clause (parent
    // preserved, child struct + tx context updated), and for orders whose
    // base tx was withheld AND that have no parent update, the insert guard
    // (source.version IS NULL → no orphan insert).
    val detailUpdates = orders
      .filter(col("o_orderkey") % 9 === 0)
      .select(shape.cdc(
        concat(lit("txs-"), col("o_orderkey").cast("string")),
        (col("o_orderkey") + lit(3000000000L)).cast("string"),
        "APPUSER.ORDER_DETAILS", lit("U"),
        detailImage(lit("1"), element_at(dstatus, modIdx)),
        detailImage(lit("2"), concat(lit("UPDATED-"), element_at(dstatus, modIdx)))): _*)

    val allDetailEvents = detailInserts.unionByName(detailUpdates)

    // --- ORDER_LINE_ITEMS events (insert-only, from lineitem) ---
    val lineItemInserts = liAsOrders(lineitem).select(shape.cdc(
      baseXid, baseCsn, "APPUSER.ORDER_LINE_ITEMS", lit("I"), nullStr,
      lineItemImage(lit("1"), col("l_quantity"))): _*)

    // --- Transaction metadata ---
    // Base groups: per g = o_orderkey DIV 5 — counts of orders, details
    // (1:1) and line items in the group. Groups g % 11 == 0 are withheld.
    val liCounts = lineitem
      .groupBy(expr("l_orderkey DIV 5").as("g"))
      .agg(count(lit(1)).cast("int").as("n_li"))
    val baseMeta = orders
      .groupBy(expr("o_orderkey DIV 5").as("g"))
      .agg(count(lit(1)).cast("int").as("n_ord"), max("o_orderdate").as("o_orderdate"))
      .join(liCounts, Seq("g"), "left")
      .na.fill(0, Seq("n_li"))
      .filter(col("g") % 11 =!= 0)
      .select(shape.meta(
        concat(lit("tx-"), col("g").cast("string")),
        col("g").cast("string"),
        col("n_ord") * 2 + col("n_li"),
        Seq(
          "ORDERS" -> col("n_ord"),
          "ORDER_DETAILS" -> col("n_ord"),
          "ORDER_LINE_ITEMS" -> col("n_li"))): _*)

    def singleOrderMeta(filterMod: Int, prefix: String, csnOffset: Long, coll: String) = orders
      .filter(col("o_orderkey") % filterMod === 0)
      .select(shape.meta(
        concat(lit(prefix), col("o_orderkey").cast("string")),
        (col("o_orderkey") + lit(csnOffset)).cast("string"),
        lit(1),
        Seq(coll -> lit(1))): _*)

    val metadata = baseMeta
      .unionByName(singleOrderMeta(7, "txu-", 1000000000L, "ORDERS"))
      .unionByName(singleOrderMeta(13, "txd-", 2000000000L, "ORDERS"))
      .unionByName(singleOrderMeta(9, "txs-", 3000000000L, "ORDER_DETAILS"))

    CdcStreams(allOrderEvents, allDetailEvents, lineItemInserts, metadata)
  }

  /** JSON-shaped streams (Kafka-like `value` columns) — the correctness
    * path through Envelope.parseCdc/parseMetadata. */
  def fromTpch(spark: SparkSession, sfDir: String): CdcStreams =
    buildStreams(spark, sfDir, JsonShape)

  /** The unified envelope built directly (bench fast lane): identical
    * rows to `Envelope.unionAll(parse(fromTpch(...)))` without the JSON
    * render + from_json round-trip. */
  def envelopeFromTpch(spark: SparkSession, sfDir: String): DataFrame = {
    val s = buildStreams(spark, sfDir, DirectShape)
    Envelope.unionAll(Seq(s.orders, s.details, s.lineItems, s.metadata))
  }

  /** Conflicting-redelivery wave for orders with o_orderkey % 17 == 0:
    * one transaction per order (xid `txr-<key>`, csn key+4e9) re-sending
    * the order image, its detail image and ALL its line items at their
    * ORIGINAL version 1 but with changed content ('REDELIVERED-' status
    * prefixes, line-item qty + 1000). Merging this against an
    * already-current table exercises every tie rule: target must win the
    * version-tied struct and array elements, while rows the base workload
    * never materialized (withheld groups) insert the redelivered content.
    */
  def redeliveryFromTpch(spark: SparkSession, sfDir: String): CdcStreams =
    buildRedelivery(spark, sfDir, JsonShape)

  /** Redelivery wave as a direct unified envelope (bench fast lane). */
  def redeliveryEnvelope(spark: SparkSession, sfDir: String): DataFrame = {
    val s = buildRedelivery(spark, sfDir, DirectShape)
    Envelope.unionAll(Seq(s.orders, s.details, s.lineItems, s.metadata))
  }

  private def buildRedelivery(spark: SparkSession, sfDir: String, shape: EventShape): CdcStreams = {
    val orders = spark.read.parquet(tablePath(sfDir, "orders"))
      .filter(col("o_orderkey") % 17 === 0)
    val lineitem = spark.read.parquet(tablePath(sfDir, "lineitem"))
      .filter(col("l_orderkey") % 17 === 0)

    def xid = concat(lit("txr-"), col("o_orderkey").cast("string"))
    def csn = (col("o_orderkey") + lit(4000000000L)).cast("string")

    val redelOrders = orders.select(shape.cdc(
      xid, csn, "APPUSER.ORDERS", lit("I"), nullStr,
      orderImage(lit("1"), concat(lit("REDELIVERED-"), col("o_orderstatus")))): _*)

    val redelDetails = orders.select(shape.cdc(
      xid, csn, "APPUSER.ORDER_DETAILS", lit("I"), nullStr,
      detailImage(lit("1"), concat(lit("REDELIVERED-"), element_at(dstatus, modIdx)))): _*)

    val redelLineItems = liAsOrders(lineitem).select(shape.cdc(
      xid, csn, "APPUSER.ORDER_LINE_ITEMS", lit("I"), nullStr,
      lineItemImage(lit("1"), col("l_quantity") + lit(1000))): _*)

    val liCounts = lineitem
      .groupBy(col("l_orderkey").as("k"))
      .agg(count(lit(1)).cast("int").as("n_li"))
    val metadata = orders
      .join(liCounts, col("o_orderkey") === col("k"), "left")
      .na.fill(0, Seq("n_li"))
      .select(shape.meta(
        xid, csn,
        lit(2) + col("n_li"),
        Seq(
          "ORDERS" -> lit(1),
          "ORDER_DETAILS" -> lit(1),
          "ORDER_LINE_ITEMS" -> col("n_li"))): _*)

    CdcStreams(redelOrders, redelDetails, redelLineItems, metadata)
  }
}
