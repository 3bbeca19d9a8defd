package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc stage profiler (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val streams = graft.cdcgen.CdcEventGen.fromTpch(spark, sfDir)
    time("gen orders events")(streams.orders.count())
    time("gen lineitem events")(streams.lineItems.count())
    time("gen metadata")(streams.metadata.count())
    val unified = CdcPipeline.unified(streams.orders, streams.details, streams.lineItems, streams.metadata)
    time("unified parse+union")(unified.count())
    val buffered = CdcPipeline.orderStream(streams.orders, streams.details, streams.lineItems, streams.metadata, () => "t")
    time("full buffer+assemble")(buffered.count())
    time("full buffer again (no cache)")(buffered.count())
    spark.stop()
  }
}
