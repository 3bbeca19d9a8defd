package graft.model

/** Row models for the `order_stream` SCD Type 2 table.
  *
  * Field names/casing and types mirror the reference's output table
  * (reference: db/create_table.deltalake.sql:9-90 and the
  * model/order bean classes): ids/versions/amounts are nullable DOUBLE,
  * dates/timestamps are carried as STRING end-to-end, `before` images are
  * nested structs of the same shape minus their own before.
  *
  * Scala case classes + product encoders (idiomatic) instead of the
  * reference's Java-bean encoders; `Option[_]` produces nullable columns.
  */
final case class OrderImage(
    orderId: Option[Double],
    orderRef: Option[String],
    version: Option[Double],
    orderDate: Option[String],
    orderTs: Option[String],
    orderStatus: Option[String],
    orderType: Option[String],
    totalAmount: Option[Double],
    currency: Option[String],
    customerId: Option[String],
    shippingAddressId: Option[String],
    createdTs: Option[String])

final case class OrderRec(
    orderId: Option[Double],
    orderRef: Option[String],
    version: Option[Double],
    orderDate: Option[String],
    orderTs: Option[String],
    orderStatus: Option[String],
    orderType: Option[String],
    totalAmount: Option[Double],
    currency: Option[String],
    customerId: Option[String],
    shippingAddressId: Option[String],
    createdTs: Option[String],
    before: Option[OrderImage])

final case class OrderDetailImage(
    orderId: Option[Double],
    version: Option[Double],
    shippingMethod: Option[String],
    trackingNumber: Option[String],
    shippedTs: Option[String],
    estimatedDeliveryDate: Option[String],
    carrier: Option[String],
    deliveryStatus: Option[String])

final case class OrderDetailRec(
    orderId: Option[Double],
    version: Option[Double],
    shippingMethod: Option[String],
    trackingNumber: Option[String],
    shippedTs: Option[String],
    estimatedDeliveryDate: Option[String],
    carrier: Option[String],
    deliveryStatus: Option[String],
    before: Option[OrderDetailImage])

final case class LineItemImage(
    lineItemId: Option[Double],
    orderId: Option[Double],
    version: Option[Double],
    productId: Option[String],
    itemQty: Option[Double],
    itemPrice: Option[Double],
    itemAmount: Option[Double],
    itemCurrency: Option[String])

final case class LineItemRec(
    lineItemId: Option[Double],
    orderId: Option[Double],
    version: Option[Double],
    productId: Option[String],
    itemQty: Option[Double],
    itemPrice: Option[Double],
    itemAmount: Option[Double],
    itemCurrency: Option[String],
    before: Option[LineItemImage])

/** One denormalized SCD2 row: all events of one transaction for one order.
  * (reference: model/order/OrderStream.scala, one row per xid:csn × orderId,
  * TransactionalCdcProcessingApp.scala:66-79). */
final case class OrderStreamRow(
    xid: String,
    csn: String,
    dwhProcessedTs: String,
    orderId: Option[Double],
    orders: Seq[OrderRec],
    orderDetails: Seq[OrderDetailRec],
    lineItems: Seq[LineItemRec])

object FieldCoercion {

  /** Shared Jackson mapper (thread-safe for reads); Jackson ships with
    * Spark's classpath and is what the reference used for the same job
    * (processor/OrderJoiner.scala:90-98). */
  private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Raw image JSON ({"COL":"val",...}) → string map. Null-valued and
    * non-textual entries are skipped (reference skips null map values at
    * OrderJoiner.scala:95); malformed JSON yields an empty map rather
    * than killing the stream. */
  def parseImage(json: String): Map[String, String] =
    try {
      val node = mapper.readTree(json)
      val b = Map.newBuilder[String, String]
      val it = node.fields()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue.isValueNode && !e.getValue.isNull)
          b += (e.getKey -> e.getValue.asText())
      }
      b.result()
    } catch { case _: Exception => Map.empty }

  /** Reproduces the reference's Jackson string→typed coercion
    * (reference: processor/OrderJoiner.scala:90-98): null map values and
    * absent keys become null fields; unknown keys are ignored; numeric
    * strings parse to Double (null if unparseable rather than throwing —
    * Jackson would throw, but CDC envelopes carry well-formed numerics and
    * a poisoned event must not kill the stream at scale). */
  def str(m: Map[String, String], k: String): Option[String] =
    m.get(k).flatMap(Option(_))

  def dbl(m: Map[String, String], k: String): Option[Double] =
    str(m, k).flatMap(v => scala.util.Try(v.toDouble).toOption)

  def order(after: Map[String, String], before: Option[Map[String, String]]): OrderRec =
    OrderRec(
      orderId = dbl(after, "ORDER_ID"),
      orderRef = str(after, "ORDER_REF"),
      version = dbl(after, "VERSION"),
      orderDate = str(after, "ORDER_DATE"),
      orderTs = str(after, "ORDER_TS"),
      orderStatus = str(after, "ORDER_STATUS"),
      orderType = str(after, "ORDER_TYPE"),
      totalAmount = dbl(after, "TOTAL_AMOUNT"),
      currency = str(after, "CURRENCY"),
      customerId = str(after, "CUSTOMER_ID"),
      shippingAddressId = str(after, "SHIPPING_ADDRESS_ID"),
      createdTs = str(after, "CREATED_TS"),
      before = before.map(b =>
        OrderImage(dbl(b, "ORDER_ID"), str(b, "ORDER_REF"), dbl(b, "VERSION"),
          str(b, "ORDER_DATE"), str(b, "ORDER_TS"), str(b, "ORDER_STATUS"),
          str(b, "ORDER_TYPE"), dbl(b, "TOTAL_AMOUNT"), str(b, "CURRENCY"),
          str(b, "CUSTOMER_ID"), str(b, "SHIPPING_ADDRESS_ID"), str(b, "CREATED_TS"))))

  def detail(after: Map[String, String], before: Option[Map[String, String]]): OrderDetailRec =
    OrderDetailRec(
      orderId = dbl(after, "ORDER_ID"),
      version = dbl(after, "VERSION"),
      shippingMethod = str(after, "SHIPPING_METHOD"),
      trackingNumber = str(after, "TRACKING_NUMBER"),
      shippedTs = str(after, "SHIPPED_TS"),
      estimatedDeliveryDate = str(after, "ESTIMATED_DELIVERY_DATE"),
      carrier = str(after, "CARRIER"),
      deliveryStatus = str(after, "DELIVERY_STATUS"),
      before = before.map(b =>
        OrderDetailImage(dbl(b, "ORDER_ID"), dbl(b, "VERSION"),
          str(b, "SHIPPING_METHOD"), str(b, "TRACKING_NUMBER"), str(b, "SHIPPED_TS"),
          str(b, "ESTIMATED_DELIVERY_DATE"), str(b, "CARRIER"), str(b, "DELIVERY_STATUS"))))

  def lineItem(after: Map[String, String], before: Option[Map[String, String]]): LineItemRec =
    LineItemRec(
      lineItemId = dbl(after, "LINE_ITEM_ID"),
      orderId = dbl(after, "ORDER_ID"),
      version = dbl(after, "VERSION"),
      productId = str(after, "PRODUCT_ID"),
      itemQty = dbl(after, "ITEM_QTY"),
      itemPrice = dbl(after, "ITEM_PRICE"),
      itemAmount = dbl(after, "ITEM_AMOUNT"),
      itemCurrency = str(after, "ITEM_CURRENCY"),
      before = before.map(b =>
        LineItemImage(dbl(b, "LINE_ITEM_ID"), dbl(b, "ORDER_ID"), dbl(b, "VERSION"),
          str(b, "PRODUCT_ID"), dbl(b, "ITEM_QTY"), dbl(b, "ITEM_PRICE"),
          dbl(b, "ITEM_AMOUNT"), str(b, "ITEM_CURRENCY"))))
}
