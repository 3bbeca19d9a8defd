-- Seed DDL for the graft engine (parquet-ized version of the reference's
-- db/create_table.deltalake.sql + db/create_scd1_table.deltalake.sql;
-- Delta-specific TBLPROPERTIES are storage features and intentionally
-- dropped — SURVEY.md §2.3 Q16). ${order_stream_dir} must contain the
-- append-only SCD2 parquet; ${orders_current_dir} the current SCD1
-- snapshot version directory.

DROP TABLE IF EXISTS order_stream;

CREATE TABLE order_stream
USING PARQUET
LOCATION '${order_stream_dir}';

DROP TABLE IF EXISTS orders_current;

CREATE TABLE orders_current
USING PARQUET
LOCATION '${orders_current_dir}';
