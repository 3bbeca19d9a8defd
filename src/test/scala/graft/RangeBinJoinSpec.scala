package graft

import org.apache.spark.sql.functions._

import graft.plans.RangeBinJoinRule

/** The auto-binning range-join rule must (a) turn a pure interval join
  * into an equi-join — no nested-loop/cartesian in the physical plan —
  * with bit-identical results including negative values, strict bounds,
  * NULLs, and inverted intervals; and (b) leave equi-keyed and
  * non-inner joins alone. */
class RangeBinJoinSpec extends SparkSuite {

  private def mkData() = {
    val s = spark
    import s.implicits._
    // Points span negatives (exercises trunc-div bins below zero).
    val points = (1L to 2000L).map(i => (i, i * 7 % 1000 - 100)).toDF("id", "p")
    // Intervals of varied width; j=7 inverted (lo > hi), j=13 NULL hi.
    val ivals = (1L to 300L).map { j =>
      val lo = j * 3 - 150
      val hi = if (j == 7) lo - 5 else lo + (j % 40)
      (j, lo, if (j == 13) None else Some(hi))
    }.toDF("iid", "lo", "hi")
    (points, ivals)
  }

  test("pure interval join rewrites to a binned equi-join, same results") {
    val (points, ivals) = mkData()
    def joined = points.join(ivals, col("p") >= col("lo") && col("p") <= col("hi"))

    spark.conf.unset(RangeBinJoinRule.ConfKey)
    val naive = joined.queryExecution.executedPlan.toString
    assert(naive.contains("BroadcastNestedLoopJoin") || naive.contains("CartesianProduct"),
      s"control: the naive plan should nested-loop\n$naive")
    val expected = joined.collect().map(_.toSeq).toSeq
      .sortBy(_.mkString(","))

    try {
      spark.conf.set(RangeBinJoinRule.ConfKey, "32")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"rule should have removed the nested loop\n$plan")
      assert(plan.contains("__graft_bin"), "rewrite markers missing from plan")
      val got = joined.collect().map(_.toSeq).toSeq.sortBy(_.mkString(","))
      assert(got == expected, s"binned results diverge: ${got.size} vs ${expected.size} rows")
    } finally spark.conf.unset(RangeBinJoinRule.ConfKey)
  }

  test("strict bounds and point-on-right orientation preserved") {
    val (points, ivals) = mkData()
    // point sits on the RIGHT side; strict inequalities.
    def joined = ivals.join(points, col("p") > col("lo") && col("p") < col("hi"))
    spark.conf.unset(RangeBinJoinRule.ConfKey)
    val expected = joined.collect().map(_.toSeq).toSeq.sortBy(_.mkString(","))
    try {
      spark.conf.set(RangeBinJoinRule.ConfKey, "7")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
      val got = joined.collect().map(_.toSeq).toSeq.sortBy(_.mkString(","))
      assert(got == expected)
    } finally spark.conf.unset(RangeBinJoinRule.ConfKey)
  }

  test("equi-keyed and non-inner joins are left alone") {
    val (points, ivals) = mkData()
    try {
      spark.conf.set(RangeBinJoinRule.ConfKey, "32")
      // Cross-side equality present → native hash join, no bin markers.
      val equi = points.join(ivals,
        col("id") === col("iid") && col("p") >= col("lo") && col("p") <= col("hi"))
      assert(!equi.queryExecution.executedPlan.toString.contains("__graft_bin"))
      // LEFT join → untouched (the rewrite is inner-only).
      val left = points.join(ivals,
        col("p") >= col("lo") && col("p") <= col("hi"), "left")
      assert(!left.queryExecution.executedPlan.toString.contains("__graft_bin"))
    } finally spark.conf.unset(RangeBinJoinRule.ConfKey)
  }
}
