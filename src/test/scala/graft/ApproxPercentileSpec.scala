package graft

import org.apache.spark.sql.functions._

import graft.plans.ApproxPercentileRule

/** AQP rewrite #2: invisible until opted in, lossless when a group's
  * value count sits inside the summary's exact regime, close on heavy
  * groups, and integer-typed percentiles must stay EXACT (the two
  * functions disagree on result type there — swapping would change the
  * schema). */
class ApproxPercentileSpec extends SparkSuite {

  test("percentile(double) rewrites to approx_percentile under the conf") {
    val s = spark
    val li = s.read.parquet(s"$sf001/lineitem.parquet")
    def q = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("med"),
        expr("percentile(l_quantity, 0.5)").as("med_int"))

    s.conf.unset(ApproxPercentileRule.ConfKey)
    val exact = q.collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(!q.queryExecution.optimizedPlan.toString.contains("percentile_approx"))

    try {
      // Accuracy far above every group's size → the summary never
      // compresses → the answer is an exact rank's ACTUAL value. It
      // still differs from percentile() by at most one value gap
      // (interpolation vs nearest-rank — the documented semantic
      // delta), so assert near-equality, not bit equality.
      s.conf.set(ApproxPercentileRule.ConfKey, "1000000")
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("percentile_approx"), s"rewrite did not fire:\n$plan")
      val hi = q.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      exact.foreach { case (flag, med, _) =>
        assert(math.abs(hi(flag) - med) / med < 0.001,
          s"uncompressed answer ${hi(flag)} beyond one value gap from $med for $flag")
      }

      // Tight accuracy → a real estimate, within the quantile band:
      // rank error ≤ n/accuracy, assert the VALUE lands within 5% here.
      s.conf.set(ApproxPercentileRule.ConfKey, "100")
      val est = q.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      exact.foreach { case (flag, med, _) =>
        assert(math.abs(est(flag) - med) / med < 0.05,
          s"estimate ${est(flag)} too far from $med for $flag")
      }

      // Integer-typed percentile (l_quantity is DOUBLE in this corpus,
      // so cast one): result type differs between the two functions →
      // the rule must leave it exact.
      val iq = li.select(expr("CAST(l_quantity AS BIGINT)").as("qi"))
        .agg(expr("percentile(qi, 0.5)").as("m"))
      assert(!iq.queryExecution.optimizedPlan.toString.contains("percentile_approx"),
        "integer-typed percentile must not rewrite (schema would change)")
      assert(iq.schema("m").dataType.typeName == "double")
    } finally s.conf.unset(ApproxPercentileRule.ConfKey)
  }
}
