package graft

import org.apache.spark.sql.functions._

/** Runtime Bloom-filter join pruning (InjectRuntimeFilter): when a large
  * shuffle join's build side is selectively filtered, Catalyst plants a
  * bloom_filter_agg on the build side and a might_contain probe on the
  * stream side's SCAN, discarding non-joining rows before the shuffle —
  * at 100 TB this is the difference between shuffling the whole fact
  * table and shuffling only the ~matching fraction. Local thresholds are
  * tuned down (the heuristics are sized for clusters); the PLAN SHAPE is
  * what this pins. */
class RuntimeFilterSpec extends SparkSuite {

  test("selective shuffle join injects a bloom probe on the stream side") {
    val s = spark
    val defaults = Seq(
      "spark.sql.autoBroadcastJoinThreshold" ->
        s.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        s.conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" ->
        s.conf.get("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"))
    try {
      // Force a shuffle join (no broadcast) and drop the size heuristics
      // that assume cluster-scale inputs.
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")

      val lineitem = s.read.parquet(s"$sf001/lineitem.parquet")
      val orders = s.read.parquet(s"$sf001/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey"))
        .groupBy("o_orderpriority").count()

      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no bloom probe injected:\n$optimized")
      assert(optimized.contains("bloom_filter_agg"),
        s"no bloom build side:\n$optimized")
      // And it still computes the right answer with the filter in place.
      val n = joined.collect().map(_.getLong(1)).sum
      val o2 = s.read.parquet(s"$sf001/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val expected = lineitem.join(o2, lineitem("l_orderkey") === o2("o_orderkey")).count()
      assert(n == expected && n > 0)
    } finally defaults.foreach { case (k, v) => s.conf.set(k, v) }
  }
}
