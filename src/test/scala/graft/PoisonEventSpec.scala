package graft

import org.apache.spark.sql.functions._

/** Poisoned input must never kill the pipeline: malformed JSON, wrong
  * shapes, and garbage values flow through parse (PERMISSIVE nulls) and
  * either drop at the null-key guard or coerce to null fields.
  */
class PoisonEventSpec extends SparkSuite {

  test("malformed and hostile events are dropped or null-coerced, never fatal") {
    val s = spark
    import s.implicits._
    val poison = Seq(
      "not json at all",
      "{}",
      """{"table":"APPUSER.ORDERS"}""", // no xid/csn → null guard drops
      """{"xid":"P","csn":"1","table":"APPUSER.ORDERS","op_type":"I","after":{"ORDER_ID":"oops","VERSION":[1,2]}}""",
      """{"xid":"P","csn":"1","table":123,"after":"zzz"}""",
      """{"xid":"P","csn":"1","table":"APPUSER.UNKNOWN_TABLE","op_type":"I","after":{"X":"1"}}"""
    ).toDF("value")
    val good = Seq(
      """{"xid":"G","csn":"2","table":"APPUSER.ORDERS","op_type":"I","after":{"ORDER_ID":"5","VERSION":"1"}}"""
    ).toDF("value")
    val meta = Seq(
      """{"xid":"G","csn":"2","tx_ts":"t","event_count":1,"data_collections":[{"data_collection":"ORDERS","event_count":1}]}""",
      """{"xid":"P","csn":"1","tx_ts":"t","event_count":2,"data_collections":[{"data_collection":"ORDERS","event_count":2}]}"""
    ).toDF("value")
    val empty = Seq.empty[String].toDF("value")

    val outRows = CdcPipeline.orderStream(
      poison.unionByName(good), empty, empty, meta, () => "ts").collect()

    // G completes normally despite the poison sharing the stream.
    val g = outRows.filter(_.xid == "G")
    assert(g.length == 1 && g.head.orderId.contains(5.0))
    // P: two parseable-but-hostile events count toward its metadata (2
    // expected) → completes; garbage values coerce to null fields.
    val p = outRows.filter(_.xid == "P")
    assert(p.forall(_.orders.forall(_.orderId.isEmpty)),
      "hostile ORDER_ID values must coerce to null, not crash or invent ids")
  }
}
