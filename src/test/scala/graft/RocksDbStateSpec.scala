package graft

import java.nio.file.Files

import graft.cdcgen.CdcEventGen
import graft.streaming.CdcStreaming

/** The transaction buffer on the RocksDB state store provider — the
  * provider a large-key-cardinality deployment runs (state spills off
  * heap; SURVEY §4.2 / TxBuffer scale notes). Same events, same output
  * as the batch path and therefore as the default HDFS-backed provider.
  */
class RocksDbStateSpec extends SparkSuite {

  test("ingest on RocksDB state store matches the batch path") {
    val root = graft.tables.TmpDirs.create("graft-rocks")
    def dir(name: String): String = {
      val d = root.resolve(name); Files.createDirectories(d); d.toString
    }

    val streams = CdcEventGen.fromTpch(spark, sf0001)
    Seq(
      "orders" -> streams.orders, "details" -> streams.details,
      "lineitems" -> streams.lineItems, "metadata" -> streams.metadata
    ).foreach { case (name, df) =>
      df.coalesce(2).write.mode("overwrite").text(dir(s"in/$name"))
    }

    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = CdcStreaming.startIngest(
        spark,
        dir("in/orders"), dir("in/details"), dir("in/lineitems"), dir("in/metadata"),
        dir("order_stream"), dir("ckpt/ingest"))
      q.awaitTermination(300000)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }

    val streamed = spark.read.parquet(dir("order_stream"))
    val batch = CdcPipeline.orderStreamCached(spark, sf0001)
    assert(streamed.count() == batch.count())
    def flat(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("xid", "orderId", "size(orders)", "size(orderDetails)", "size(lineItems)")
        .collect().map(_.toSeq.mkString("|")).sorted
    assert(flat(streamed).sameElements(flat(batch)))
  }
}
