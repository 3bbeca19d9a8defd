package graft

import org.apache.spark.sql.functions._

import graft.queries.ExactSum

/** The shared order-free exact sum (ExactSum.qsum) must be invariant to
  * partitioning — the property float `sum` lacks and the ordered
  * collect_list fold bought at OOM-tail prices. */
class ExactSumSpec extends SparkSuite {

  test("qsum is partition-count invariant, plain double sum shows why it must be") {
    val s = spark
    import s.implicits._
    // Summands engineered for float-order sensitivity: wildly mixed
    // magnitudes so a plain double sum's value depends on add order.
    val df = (1 to 20000).map { i =>
      ("g" + (i % 3), math.pow(-1.0, i) * (1.0 / i) + (i % 7) * 0.1)
    }.toDF("g", "v")

    def q(parts: Int): Map[String, Double] =
      df.repartition(parts).groupBy("g")
        .agg(expr(ExactSum.qsum("v")).as("s"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    val one = q(1)
    assert(q(7) == one, "qsum changed under repartition(7)")
    assert(q(32) == one, "qsum changed under repartition(32)")

    // And the quantization error against the exact ordered sum is
    // bounded by n·grain: each addend loses < 1e-9 to floor.
    val exact = df.collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted.sum).toMap
    one.foreach { case (g, v) =>
      assert(math.abs(v - exact(g)) < 20000 * 1e-9, s"$g: $v vs ${exact(g)}")
    }
  }

  test("qsum state is one i64: plan partial-aggregates (no collect_list, no Sort)") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(i => ("g" + (i % 2), i * 0.5)).toDF("g", "v")
    val agg = df.groupBy("g").agg(expr(ExactSum.qsum("v")).as("s"))
    assert(agg.count() == 2)
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("collect_list") && !plan.contains("Sort"), plan)
    assert(plan.contains("partial_sum") || plan.contains("partial"),
      s"expected a partial (map-side) aggregate:\n$plan")
  }
}
