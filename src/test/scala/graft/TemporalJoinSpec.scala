package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.join.TemporalJoins

/** Semantics + plan-shape pins for the temporal joins.
  *
  * As-of semantics are checked on hand data where every edge is explicit
  * (inclusive bound, same-ms tie-break, tolerance nulling, no-match) and
  * the plan is pinned to a single keyed shuffle — the union-window
  * formulation's whole point. The range join pins the binned big-big
  * variant bit-equal to the broadcast variant, with the expected join
  * strategies on each.
  */
class TemporalJoinSpec extends SparkSuite {

  import scala.jdk.CollectionConverters._
  private def df(rows: Seq[org.apache.spark.sql.Row], schema: String) =
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType.fromDDL(schema))
  private def R(vals: Any*) = org.apache.spark.sql.Row(vals: _*)

  test("as-of join: inclusive bound, max-id tie-break, tolerance, no-match") {
    val left = df(Seq(
      R(10L, 1L, 1000L), // matches click 3 (same ms, inclusive; beats id 2)
      R(11L, 1L, 5000L), // matches click 4 (latest <= 5000)
      R(12L, 2L, 1000L), // user 2 has no clicks -> nulls
      R(13L, 3L, 9000L)  // user 3's only click is 8000ms old -> tolerance nulls it
    ), "event_id BIGINT, user_id BIGINT, ms BIGINT")
    val right = df(Seq(
      R(1L, 2L, 500L),  // user 1, before everything
      R(1L, 3L, 1000L), // tie at 1000 with click 2 -> 3 wins
      R(1L, 4L, 4000L),
      R(3L, 9L, 1000L)
    ), "user_id BIGINT, click_id BIGINT, cms BIGINT")

    val out = TemporalJoins.asOfJoinBackward(
        left, right, key = "user_id", leftTs = "ms", rightTs = "cms",
        payload = Seq("click_id"), tieBreak = "click_id",
        toleranceMs = Some(5000L))
      .select("event_id", "asof_click_id", "asof_gap_ms")
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap

    assert(out(10L) == ((Some(3L), Some(0L))))
    assert(out(11L) == ((Some(4L), Some(1000L))))
    assert(out(12L) == ((None, None)))
    assert(out(13L) == ((None, None)))
  }

  test("forward as-of: inclusive bound, max-id tie-break, next not prev") {
    val left = df(Seq(
      R(10L, 1L, 1000L), // matches click 3 (same ms, inclusive; beats 2)
      R(11L, 1L, 1500L), // matches click 4 (next at 4000, skipping past)
      R(12L, 1L, 9000L)  // nothing after -> nulls
    ), "event_id BIGINT, user_id BIGINT, ms BIGINT")
    val right = df(Seq(
      R(1L, 2L, 1000L), // tie at 1000 with 3 -> 3 wins
      R(1L, 3L, 1000L),
      R(1L, 4L, 4000L),
      R(1L, 9L, 500L)   // BEFORE every left row: must never match forward
    ), "user_id BIGINT, click_id BIGINT, cms BIGINT")
    val out = TemporalJoins.asOfJoinForward(
        left, right, "user_id", "ms", "cms", Seq("click_id"), "click_id")
      .select("event_id", "asof_click_id", "asof_gap_ms")
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(out(10L) == ((Some(3L), Some(0L))))
    assert(out(11L) == ((Some(4L), Some(2500L))))
    assert(out(12L) == ((None, None)))
  }

  test("as-of plan: ONE keyed shuffle, no join operator") {
    val e = graft.queries.EventsQueries.events(spark, sf0001)
      .withColumn("ms", unix_millis(col("ts")))
    val purchases = e.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ms")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ms").as("cms"))
    val out = TemporalJoins.asOfJoinBackward(purchases, clicks,
      "user_id", "ms", "cms", Seq("click_id"), "click_id")
    assert(out.count() > 0)
    val plan = out.queryExecution.executedPlan.collectFirst {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
    }.getOrElse(out.queryExecution.executedPlan.toString)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected exactly 1 keyed shuffle, got $shuffles:\n$plan")
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
  }

  test("range join: binned variant == broadcast variant, expected strategies") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .withColumn("ship_ms", unix_millis(col("l_shipdate").cast("timestamp")))
    val weekly = spark.read.parquet(s"$sf0001/orders.parquet")
      .withColumn("wk", expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 604800000L"))
      .groupBy("wk").agg(count(lit(1)).as("n_orders"))
    val windows = weekly
      .select((col("wk") * 604800000L).as("w_start_ms"),
        ((col("wk") + 1L) * 604800000L).as("w_end_ms"))

    val broad = TemporalJoins.rangeJoinBroadcast(
      li, windows, col("ship_ms"), col("w_start_ms"), col("w_end_ms"))
    // Bin narrower than the interval width so intervals span multiple bins
    // (exercises the explode) — results must not depend on binMs.
    val binned = TemporalJoins.rangeJoinBinned(
      li, "ship_ms", windows, "w_start_ms", "w_end_ms", binMs = 86400000L)

    val key = Seq("l_orderkey", "l_linenumber", "w_start_ms")
    assert(broad.count() > 0)
    assert(binned.select(key.map(col): _*).except(broad.select(key.map(col): _*)).isEmpty)
    assert(broad.select(key.map(col): _*).except(binned.select(key.map(col): _*)).isEmpty)

    assert(broad.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    val binnedPlan = binned.queryExecution.executedPlan.toString
    assert(!binnedPlan.contains("NestedLoop") && !binnedPlan.contains("Cartesian"),
      s"binned range join must be a pure equi-join plan:\n$binnedPlan")
  }
}
