package graft

import org.apache.spark.sql.functions._

import graft.plans.ApproxDistinctRule

/** The AQP rewrite must be invisible until opted in, LOSSLESS when every
  * group's cardinality sits below k (the sketch's exact branch), close
  * on genuinely heavy groups, and must preserve FILTER clauses and leave
  * multi-column distincts exact. */
class ApproxDistinctSpec extends SparkSuite {

  test("count(distinct) rewrites to the KMV sketch under the conf") {
    val s = spark
    val li = s.read.parquet(s"$sf001/lineitem.parquet")
    def q = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("nd"), count(lit(1)).as("n"))

    s.conf.unset(ApproxDistinctRule.ConfKey)
    val exact = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!q.queryExecution.optimizedPlan.toString.contains("kmv_distinct"))

    try {
      // k far above every group's cardinality → sketch exact branch →
      // identical answers through the rewritten plan.
      s.conf.set(ApproxDistinctRule.ConfKey, "200000")
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("kmv_distinct"), s"rewrite did not fire:\n$plan")
      val approxHi = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(approxHi == exact, "below-k sketch must be lossless")

      // k well below the cardinality → a real estimate, within 15%.
      s.conf.set(ApproxDistinctRule.ConfKey, "128")
      q.collect().foreach { r =>
        val est = r.getLong(1).toDouble
        val tru = exact(r.getString(0)).toDouble
        assert(math.abs(est - tru) / tru < 0.15,
          s"estimate $est too far from $tru for ${r.getString(0)}")
      }

      // FILTER clause preserved; multi-column distinct left exact.
      val f = s.sql(
        s"""SELECT count(DISTINCT l_orderkey) FILTER (WHERE l_quantity > 25),
           |  count(DISTINCT l_orderkey, l_partkey)
           |FROM parquet.`$sf001/lineitem.parquet`""".stripMargin)
      assert(f.queryExecution.optimizedPlan.toString.contains("kmv_distinct"))
      s.conf.unset(ApproxDistinctRule.ConfKey)
      val exactF = f.collect().head
      s.conf.set(ApproxDistinctRule.ConfKey, "200000")
      val approxF = f.collect().head
      assert(approxF.getLong(0) == exactF.getLong(0), "FILTER must survive the rewrite")
      assert(approxF.getLong(1) == exactF.getLong(1), "pair distinct must stay exact")
    } finally s.conf.unset(ApproxDistinctRule.ConfKey)
  }
}
