package graft

import org.apache.spark.sql.functions._

/** Pins that Spark's InjectRuntimeFilter actually plants a bloom filter
  * for the q30 shape: the dim's non-key predicate is not statically
  * inferable onto the fact side, so with the conf on, the fact filter
  * must carry `might_contain(<bloom_filter_agg subquery>)`. Without the
  * plan assertion the query would hash-match even if injection silently
  * stopped firing (it is semantics-preserving) — this spec is the teeth
  * behind the PLANS.md claim. */
class RuntimeFilterSpec extends SparkSuite {

  private def plan(enabled: Boolean): String = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", enabled.toString)
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val li = s2.read.parquet(s"$sf0001/lineitem.parquet")
    val o = s2.read.parquet(s"$sf0001/orders.parquet")
      .filter("o_orderpriority = '1-URGENT'")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("l_returnflag").agg(count(lit(1)))
      .queryExecution.optimizedPlan.toString
  }

  test("bloom filter injected on the fact side when enabled, absent when off") {
    val on = plan(enabled = true)
    assert(on.contains("might_contain") && on.contains("bloom_filter_agg"),
      s"expected a runtime bloom filter in:\n${on.take(1200)}")
    val off = plan(enabled = false)
    assert(!off.contains("might_contain"), "conf off must mean no injection")
  }

  test("injected filter preserves the join result") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def agg(s: org.apache.spark.sql.SparkSession) = {
      val li = s.read.parquet(s"$sf0001/lineitem.parquet")
      val o = s.read.parquet(s"$sf0001/orders.parquet")
        .filter("o_orderpriority = '1-URGENT'")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    assert(agg(s2) == agg(spark))
  }
}
