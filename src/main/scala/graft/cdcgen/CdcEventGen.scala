package graft.cdcgen

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *  - Orders with o_orderkey % 13 == 0 get a delete transaction
  *    (xid `txd-<key>`, op_type=D, after=null) → buffered, counted,
  *    complete, but assembles to zero rows (delete-skip semantics).
  *  - A handful of null-xid events are mixed in → dropped by the null
  *    guard before grouping.
  *
  * Everything is a declarative DataFrame transform ending in
  * `to_json(struct(...))`, producing Kafka-like `value: STRING` streams.
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

  /** The order_details image; status column injectable so update events can
    * carry a changed delivery status. */
  private def detailImage(versionCol: org.apache.spark.sql.Column, statusCol: org.apache.spark.sql.Column) =
    map(
      lit("ORDER_ID"), col("o_orderkey").cast("string"),
      lit("VERSION"), versionCol,
      lit("SHIPPING_METHOD"), element_at(methods, modIdx),
      lit("TRACKING_NUMBER"), concat(lit("TRK-"), col("o_orderkey").cast("string")),
      lit("SHIPPED_TS"), date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
      lit("ESTIMATED_DELIVERY_DATE"), date_format(col("o_orderdate"), "yyyy-MM-dd"),
      lit("CARRIER"), element_at(carriers, modIdx),
      lit("DELIVERY_STATUS"), statusCol)

  /** The shared order `after` image (all values strings, as in the
    * GoldenGate envelope; typed coercion happens in the engine). */
  private def orderImage(versionCol: org.apache.spark.sql.Column, statusCol: org.apache.spark.sql.Column) =
    map(
      lit("ORDER_ID"), col("o_orderkey").cast("string"),
      lit("ORDER_REF"), concat(lit("ORD-"), col("o_orderkey").cast("string")),
      lit("VERSION"), versionCol,
      lit("ORDER_DATE"), date_format(col("o_orderdate"), "yyyy-MM-dd"),
      lit("ORDER_TS"), date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
      lit("ORDER_STATUS"), statusCol,
      lit("ORDER_TYPE"), col("o_orderpriority"),
      lit("TOTAL_AMOUNT"), col("o_totalprice").cast("string"),
      lit("CURRENCY"), lit("USD"),
      lit("CUSTOMER_ID"), concat(lit("CUST-"), col("o_custkey").cast("string")),
      lit("SHIPPING_ADDRESS_ID"), concat(lit("ADDR-"), pmod(col("o_custkey"), lit(100)).cast("string")),
      lit("CREATED_TS"), date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))

  private def envelope(
      xid: org.apache.spark.sql.Column,
      csn: org.apache.spark.sql.Column,
      table: String,
      opType: org.apache.spark.sql.Column,
      before: org.apache.spark.sql.Column,
      after: org.apache.spark.sql.Column) =
    to_json(struct(
      lit(table).as("table"),
      opType.as("op_type"),
      date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("op_ts"),
      date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("current_ts"),
      lpad(col("o_orderkey").cast("string"), 20, "0").as("pos"),
      csn.as("csn"),
      xid.as("xid"),
      before.as("before"),
      after.as("after"))).as("value")

  def fromTpch(spark: SparkSession, sfDir: String): CdcStreams = {
    val orders = spark.read.parquet(tablePath(sfDir, "orders"))
    val lineitem = spark.read.parquet(tablePath(sfDir, "lineitem"))
    val nullMap = lit(null).cast("map<string,string>")

    // --- ORDERS events ---
    val orderInserts = orders.select(envelope(
      baseXid, baseCsn, "APPUSER.ORDERS", lit("I"),
      nullMap, orderImage(lit("1"), col("o_orderstatus"))))

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
        orderImage(lit("1"), col("o_orderstatus")), nullMap))

    // Null-xid noise: must be dropped by the pipeline's null guard.
    val nullKeyNoise = orders
      .filter(col("o_orderkey") % 500 === 1)
      .select(envelope(
        lit(null).cast("string"), lit(null).cast("string"),
        "APPUSER.ORDERS", lit("I"), nullMap, orderImage(lit("1"), col("o_orderstatus"))))

    val allOrderEvents = orderInserts.unionByName(orderUpdates)
      .unionByName(orderDeletes).unionByName(nullKeyNoise)

    // --- ORDER_DETAILS events (1:1 with orders) ---
    val detailInserts = orders.select(envelope(
      baseXid, baseCsn, "APPUSER.ORDER_DETAILS", lit("I"), nullMap,
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
    val liWithOrderDate = lineitem.select(
      col("l_orderkey").as("o_orderkey"),
      to_timestamp(date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss")).as("o_orderdate"),
      col("l_linenumber"), col("l_partkey"), col("l_quantity"),
      col("l_extendedprice"), col("l_discount"))
    val lineItemInserts = liWithOrderDate.select(envelope(
      baseXid, baseCsn, "APPUSER.ORDER_LINE_ITEMS", lit("I"), nullMap,
      map(
        lit("LINE_ITEM_ID"), (col("o_orderkey") * 10 + col("l_linenumber")).cast("string"),
        lit("ORDER_ID"), col("o_orderkey").cast("string"),
        lit("VERSION"), lit("1"),
        lit("PRODUCT_ID"), concat(lit("PROD-"), col("l_partkey").cast("string")),
        lit("ITEM_QTY"), col("l_quantity").cast("string"),
        lit("ITEM_PRICE"), col("l_extendedprice").cast("string"),
        // No round(): Spark and DuckDB disagree on half-way decimal ties,
        // but a raw IEEE-754 product round-trips string→double exactly and
        // matches DuckDB's identical multiply bit-for-bit.
        lit("ITEM_AMOUNT"), (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("string"),
        lit("ITEM_CURRENCY"), lit("USD"))))

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
      .select(to_json(struct(
        concat(lit("tx-"), col("g").cast("string")).as("xid"),
        col("g").cast("string").as("csn"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("tx_ts"),
        (col("n_ord") * 2 + col("n_li")).as("event_count"),
        array(
          struct(lit("ORDERS").as("data_collection"), col("n_ord").as("event_count")),
          struct(lit("ORDER_DETAILS").as("data_collection"), col("n_ord").as("event_count")),
          struct(lit("ORDER_LINE_ITEMS").as("data_collection"), col("n_li").as("event_count"))
        ).as("data_collections"))).as("value"))

    def singleOrderMeta(filterMod: Int, prefix: String, csnOffset: Long, collection: String) = orders
      .filter(col("o_orderkey") % filterMod === 0)
      .select(to_json(struct(
        concat(lit(prefix), col("o_orderkey").cast("string")).as("xid"),
        (col("o_orderkey") + lit(csnOffset)).cast("string").as("csn"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("tx_ts"),
        lit(1).as("event_count"),
        array(struct(lit(collection).as("data_collection"), lit(1).as("event_count")))
          .as("data_collections"))).as("value"))

    val metadata = baseMeta
      .unionByName(singleOrderMeta(7, "txu-", 1000000000L, "ORDERS"))
      .unionByName(singleOrderMeta(13, "txd-", 2000000000L, "ORDERS"))
      .unionByName(singleOrderMeta(9, "txs-", 3000000000L, "ORDER_DETAILS"))

    CdcStreams(allOrderEvents, allDetailEvents, lineItemInserts, metadata)
  }
}
