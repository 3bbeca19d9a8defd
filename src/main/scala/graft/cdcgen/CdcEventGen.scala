package graft.cdcgen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkSessions.tablePath

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
  * The JSON is rendered with plain string `concat` (codegen'd, no
  * map/struct allocation or Jackson serialization per row) instead of
  * `to_json(struct(map(...)))`. Generated values contain no
  * quotes/backslashes, so no escaping is needed.
  */
object CdcEventGen {

  final case class CdcStreams(
      orders: DataFrame,
      details: DataFrame,
      lineItems: DataFrame,
      metadata: DataFrame)

  private def baseXid = concat(lit("tx-"), expr("CAST(o_orderkey DIV 5 AS STRING)"))
  private def baseCsn = expr("CAST(o_orderkey DIV 5 AS STRING)")

  private val carriers = array(lit("FEDEX"), lit("UPS"), lit("DHL"), lit("USPS"))
  private val methods = array(lit("STANDARD"), lit("EXPRESS"), lit("OVERNIGHT"), lit("PICKUP"))
  private val dstatus = array(lit("PENDING"), lit("IN_TRANSIT"), lit("DELIVERED"), lit("RETURNED"))
  private def modIdx = (pmod(col("o_orderkey"), lit(4)) + 1).cast("int")

  // The testdata timestamps are all second-precision, so plain casts
  // replace date_format (a per-row formatter, ~3 calls/row, measurable at
  // sf0.1): CAST(ts AS STRING) == 'yyyy-MM-dd HH:mm:ss' in a UTC session.
  private def tsStr = col("o_orderdate").cast("string")
  private def dateStr = substring(tsStr, 1, 10)
  private def ts6Str = concat(tsStr, lit(".000000"))

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

  private val nullJson = lit("null")

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

  private def envelope(
      xid: Column,
      csn: Column,
      table: String,
      opType: Column,
      before: Column,
      after: Column) = {
    val ts6 = ts6Str
    concat(
      lit(s"""{"table":"$table","op_type":""""), opType,
      lit("""","op_ts":""""), ts6,
      lit("""","current_ts":""""), ts6,
      lit("""","pos":""""), lpad(col("o_orderkey").cast("string"), 20, "0"),
      lit("""","csn":"""), strOrNull(csn),
      lit(""","xid":"""), strOrNull(xid),
      lit(""","before":"""), before,
      lit(""","after":"""), after,
      lit("}")).as("value")
  }

  private def metaJson(
      xid: Column,
      csn: Column,
      txTs: Column,
      eventCount: Column,
      collections: Column) =
    concat(
      lit("""{"xid":""""), xid,
      lit("""","csn":""""), csn,
      lit("""","tx_ts":""""), txTs,
      lit("""","event_count":"""), eventCount.cast("string"),
      lit(""","data_collections":["""), collections,
      lit("]}")).as("value")

  private def collection(name: String, countCol: Column): Column =
    concat(
      lit(s"""{"data_collection":"$name","event_count":"""),
      countCol.cast("string"), lit("}"))

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

  def fromTpch(spark: SparkSession, sfDir: String): CdcStreams = {
    val orders = spark.read.parquet(tablePath(sfDir, "orders"))
    val lineitem = spark.read.parquet(tablePath(sfDir, "lineitem"))

    // --- ORDERS events ---
    val orderInserts = orders.select(envelope(
      baseXid, baseCsn, "APPUSER.ORDERS", lit("I"),
      nullJson, orderImage(lit("1"), col("o_orderstatus"))))

    val orderUpdates = orders
      .filter(col("o_orderkey") % 7 === 0)
      .select(envelope(
        concat(lit("txu-"), col("o_orderkey").cast("string")),
        (col("o_orderkey") + lit(1000000000L)).cast("string"),
        "APPUSER.ORDERS", lit("U"),
        orderImage(lit("1"), col("o_orderstatus")),
        orderImage(lit("2"), concat(lit("UPDATED-"), col("o_orderstatus")))))

    val orderDeletes = orders
      .filter(col("o_orderkey") % 13 === 0)
      .select(envelope(
        concat(lit("txd-"), col("o_orderkey").cast("string")),
        (col("o_orderkey") + lit(2000000000L)).cast("string"),
        "APPUSER.ORDERS", lit("D"),
        orderImage(lit("1"), col("o_orderstatus")), nullJson))

    // Null-xid noise: must be dropped by the pipeline's null guard.
    val nullKeyNoise = orders
      .filter(col("o_orderkey") % 500 === 1)
      .select(envelope(
        lit(null).cast("string"), lit(null).cast("string"),
        "APPUSER.ORDERS", lit("I"), nullJson, orderImage(lit("1"), col("o_orderstatus"))))

    val allOrderEvents = orderInserts.unionByName(orderUpdates)
      .unionByName(orderDeletes).unionByName(nullKeyNoise)

    // --- ORDER_DETAILS events (1:1 with orders) ---
    val detailInserts = orders.select(envelope(
      baseXid, baseCsn, "APPUSER.ORDER_DETAILS", lit("I"), nullJson,
      detailImage(lit("1"), element_at(dstatus, modIdx))))

    // Detail-only update transactions (o_orderkey % 9 == 0): parent version
    // does NOT advance → exercises the SCD1 merge's catch-all clause (parent
    // preserved, child struct + tx context updated), and for orders whose
    // base tx was withheld AND that have no parent update, the insert guard
    // (source.version IS NULL → no orphan insert).
    val detailUpdates = orders
      .filter(col("o_orderkey") % 9 === 0)
      .select(envelope(
        concat(lit("txs-"), col("o_orderkey").cast("string")),
        (col("o_orderkey") + lit(3000000000L)).cast("string"),
        "APPUSER.ORDER_DETAILS", lit("U"),
        detailImage(lit("1"), element_at(dstatus, modIdx)),
        detailImage(lit("2"), concat(lit("UPDATED-"), element_at(dstatus, modIdx)))))

    val allDetailEvents = detailInserts.unionByName(detailUpdates)

    // --- ORDER_LINE_ITEMS events (insert-only, from lineitem) ---
    val lineItemInserts = liAsOrders(lineitem).select(envelope(
      baseXid, baseCsn, "APPUSER.ORDER_LINE_ITEMS", lit("I"), nullJson,
      lineItemImage(lit("1"), col("l_quantity"))))

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
      .select(metaJson(
        concat(lit("tx-"), col("g").cast("string")),
        col("g").cast("string"),
        ts6Str,
        col("n_ord") * 2 + col("n_li"),
        concat_ws(",",
          collection("ORDERS", col("n_ord")),
          collection("ORDER_DETAILS", col("n_ord")),
          collection("ORDER_LINE_ITEMS", col("n_li")))))

    def singleOrderMeta(filterMod: Int, prefix: String, csnOffset: Long, coll: String) = orders
      .filter(col("o_orderkey") % filterMod === 0)
      .select(metaJson(
        concat(lit(prefix), col("o_orderkey").cast("string")),
        (col("o_orderkey") + lit(csnOffset)).cast("string"),
        ts6Str,
        lit(1),
        collection(coll, lit(1))))

    val metadata = baseMeta
      .unionByName(singleOrderMeta(7, "txu-", 1000000000L, "ORDERS"))
      .unionByName(singleOrderMeta(13, "txd-", 2000000000L, "ORDERS"))
      .unionByName(singleOrderMeta(9, "txs-", 3000000000L, "ORDER_DETAILS"))

    CdcStreams(allOrderEvents, allDetailEvents, lineItemInserts, metadata)
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
  def redeliveryFromTpch(spark: SparkSession, sfDir: String): CdcStreams = {
    val orders = spark.read.parquet(tablePath(sfDir, "orders"))
      .filter(col("o_orderkey") % 17 === 0)
    val lineitem = spark.read.parquet(tablePath(sfDir, "lineitem"))
      .filter(col("l_orderkey") % 17 === 0)

    def xid = concat(lit("txr-"), col("o_orderkey").cast("string"))
    def csn = (col("o_orderkey") + lit(4000000000L)).cast("string")

    val redelOrders = orders.select(envelope(
      xid, csn, "APPUSER.ORDERS", lit("I"), nullJson,
      orderImage(lit("1"), concat(lit("REDELIVERED-"), col("o_orderstatus")))))

    val redelDetails = orders.select(envelope(
      xid, csn, "APPUSER.ORDER_DETAILS", lit("I"), nullJson,
      detailImage(lit("1"), concat(lit("REDELIVERED-"), element_at(dstatus, modIdx)))))

    val redelLineItems = liAsOrders(lineitem).select(envelope(
      xid, csn, "APPUSER.ORDER_LINE_ITEMS", lit("I"), nullJson,
      lineItemImage(lit("1"), col("l_quantity") + lit(1000))))

    val liCounts = lineitem
      .groupBy(col("l_orderkey").as("k"))
      .agg(count(lit(1)).cast("int").as("n_li"))
    val metadata = orders
      .join(liCounts, col("o_orderkey") === col("k"), "left")
      .na.fill(0, Seq("n_li"))
      .select(metaJson(
        xid, csn, ts6Str,
        lit(2) + col("n_li"),
        concat_ws(",",
          collection("ORDERS", lit(1)),
          collection("ORDER_DETAILS", lit(1)),
          collection("ORDER_LINE_ITEMS", col("n_li")))))

    CdcStreams(redelOrders, redelDetails, redelLineItems, metadata)
  }
}
