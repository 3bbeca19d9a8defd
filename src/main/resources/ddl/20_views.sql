-- Views over the SCD2/SCD1 tables (parquet-ized versions of the
-- reference's views, db/create_table.deltalake.sql:93-129 and
-- db/create_scd1_table.deltalake.sql:94-108).

-- Latest stream row per order (change-log head).
CREATE OR REPLACE VIEW order_stream_current AS
SELECT * FROM (
  SELECT *,
    row_number() OVER (PARTITION BY orderId ORDER BY csn DESC, xid DESC) AS _rn
  FROM order_stream
) WHERE _rn = 1;

-- Change-detection view: one row per order event with its change type
-- (LATERAL VIEW explode + before-image CASE — reference
-- db/create_table.deltalake.sql:119-129).
CREATE OR REPLACE VIEW order_stream_changes AS
SELECT
  s.xid, s.csn, s.orderId,
  o.orderRef, o.version, o.orderStatus, o.totalAmount,
  CASE WHEN o.before IS NOT NULL THEN 'UPDATED' ELSE 'INSERTED' END AS change_type,
  o.before.orderStatus AS previous_status
FROM order_stream s
LATERAL VIEW explode(s.orders) orders_table AS o;

-- Flat SCD1 summary (reference db/create_scd1_table.deltalake.sql:94-108).
CREATE OR REPLACE VIEW orders_current_summary AS
SELECT
  orderId, orderRef, version, orderStatus, totalAmount,
  orderDetails.version AS detail_version,
  orderDetails.deliveryStatus AS delivery_status,
  size(lineItems) AS n_line_items,
  aggregate(lineItems, CAST(0.0 AS DOUBLE), (acc, li) -> acc + li.itemQty) AS total_qty
FROM orders_current;
