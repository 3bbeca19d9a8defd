package graft.apps

import org.apache.spark.sql.SparkSession

import graft.SparkSessions
import graft.streaming.CdcStreaming
import graft.tables.SqlScriptRunner

/** Thin app mains (reference: TransactionalCdcProcessingApp /
  * ScdType1MergeApp / SeedJob), config passed as plain args instead of
  * HOCON. Sessions enable the RocksDB state store provider for the
  * stateful pipeline (reference: reference.conf:14 — rocksdbjni ships in
  * /opt/spark/jars).
  */
object AppSessions {
  def streamingSession(name: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    SparkSessions.builder(s"local[$cpus]", cpus)
      .appName(name)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
  }
}

/** args: ordersDir detailsDir lineItemsDir metadataDir outDir checkpointDir */
object CdcIngestApp {
  def main(args: Array[String]): Unit = {
    val Array(o, d, l, m, out, ckpt) = args
    val spark = AppSessions.streamingSession("graft-cdc-ingest")
    val q = CdcStreaming.startIngest(spark, o, d, l, m, out, ckpt,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("10 seconds"))
    q.awaitTermination()
  }
}

/** args: orderStreamDir targetDir checkpointDir */
object Scd1MergeApp {
  def main(args: Array[String]): Unit = {
    val Array(src, target, ckpt) = args
    val spark = AppSessions.streamingSession("graft-scd1-merge")
    val q = CdcStreaming.startScd1Merge(spark, src, target, ckpt,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("10 seconds"))
    q.awaitTermination()
  }
}

/** args: scriptsDir [key=value ...] */
object SeedApp {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val vars = args.tail.map { kv =>
      val Array(k, v) = kv.split("=", 2); k -> v
    }.toMap
    val spark = AppSessions.streamingSession("graft-seed")
    SqlScriptRunner.runDir(spark, dir, vars)
    spark.stop()
  }
}
