package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.join.TemporalJoins

/** Temporal-join operators, oracle-gated: backward as-of join (union-window
  * plan), banded equi+range join, and a pure interval join against a
  * derived window table. These are beyond-reference additions — the
  * training-data/feature-engineering joins (point-in-time correctness,
  * attribution windows, calendar joins) a 100 TB pipeline needs.
  *
  * All timestamps are compared as epoch-millisecond BIGINTs on both the
  * Spark and DuckDB sides so ordering and arithmetic are integer-exact.
  */
object JoinQueries extends QueryModule {

  private def ev(s: SparkSession, dir: String): DataFrame =
    EventsQueries.events(s, dir).withColumn("ms", unix_millis(col("ts")))

  /** 72 h as-of tolerance — events are sparse in time, so hour-scale
    * tolerances would null nearly every match. */
  private val TolMs = 259200000L

  override def queries: Seq[EngineQuery] = Seq(

    // Backward as-of join: each purchase matched to the user's most
    // recent click at-or-before it (ties: click at the same ms matches;
    // among same-ms clicks the max event_id wins), nulled past 72 h.
    EngineQuery(
      "asof_purchase_click",
      (s, dir) => {
        val e = ev(s, dir)
        val purchases = e.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ms")
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"), col("ms").as("cms"))
        TemporalJoins.asOfJoinBackward(
            purchases, clicks,
            key = "user_id", leftTs = "ms", rightTs = "cms",
            payload = Seq("click_id"), tieBreak = "click_id",
            toleranceMs = Some(TolMs))
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("asof_click_id"), col("asof_gap_ms"))
      },
      Some(s"""WITH e AS (
             |  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events),
             |u AS (
             |  SELECT user_id, ms, 0 AS side, event_id AS click_id,
             |         NULL::BIGINT AS purchase_id
             |  FROM e WHERE event_type = 'click'
             |  UNION ALL
             |  SELECT user_id, ms, 1, NULL, event_id
             |  FROM e WHERE event_type = 'purchase'),
             |f AS (
             |  SELECT user_id, ms, side, purchase_id,
             |    last_value(click_id IGNORE NULLS) OVER w AS asof_click_id,
             |    last_value(CASE WHEN side = 0 THEN ms END IGNORE NULLS) OVER w AS asof_ms
             |  FROM u
             |  WINDOW w AS (
             |    PARTITION BY user_id
             |    ORDER BY ms, side, coalesce(click_id, -9223372036854775807 - 1)
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |SELECT purchase_id, user_id,
             |  CASE WHEN ms - asof_ms <= $TolMs THEN asof_click_id END AS asof_click_id,
             |  CASE WHEN ms - asof_ms <= $TolMs THEN ms - asof_ms END AS asof_gap_ms
             |FROM f WHERE side = 1""".stripMargin)),

    // Forward as-of: each click matched to the user's NEXT purchase
    // at-or-after it (conversion latency), nulled past 72 h. Same
    // union-window plan scanning time descending.
    EngineQuery(
      "asof_click_purchase",
      (s, dir) => {
        val e = ev(s, dir)
        val clicks = e.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ms")
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"), col("ms").as("pms"))
        TemporalJoins.asOfJoinForward(
            clicks, purchases,
            key = "user_id", leftTs = "ms", rightTs = "pms",
            payload = Seq("purchase_id"), tieBreak = "purchase_id",
            toleranceMs = Some(TolMs))
          .select(col("event_id").as("click_id"), col("user_id"),
            col("asof_purchase_id"), col("asof_gap_ms"))
      },
      Some(s"""WITH e AS (
             |  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events),
             |u AS (
             |  SELECT user_id, ms, 0 AS side, event_id AS purchase_id,
             |         NULL::BIGINT AS click_id
             |  FROM e WHERE event_type = 'purchase'
             |  UNION ALL
             |  SELECT user_id, ms, 1, NULL, event_id
             |  FROM e WHERE event_type = 'click'),
             |f AS (
             |  SELECT user_id, ms, side, click_id,
             |    last_value(purchase_id IGNORE NULLS) OVER w AS asof_purchase_id,
             |    last_value(CASE WHEN side = 0 THEN ms END IGNORE NULLS) OVER w AS asof_ms
             |  FROM u
             |  WINDOW w AS (
             |    PARTITION BY user_id
             |    ORDER BY ms DESC, side, coalesce(purchase_id, -9223372036854775807 - 1)
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |SELECT click_id, user_id,
             |  CASE WHEN asof_ms - ms <= $TolMs THEN asof_purchase_id END AS asof_purchase_id,
             |  CASE WHEN asof_ms - ms <= $TolMs THEN asof_ms - ms END AS asof_gap_ms
             |FROM f WHERE side = 1""".stripMargin)),

    // ASOF JOIN as SQL text — the DuckDB spelling, rewritten by GraftSql
    // onto the SAME union-window plan the programmatic asof queries use
    // (one keyed shuffle, no range probe). The oracle runs DuckDB's
    // NATIVE ASOF JOIN — two independent implementations of the
    // point-in-time contract agreeing row-for-row. The right side is
    // pre-deduped to one row per (user, ms): with duplicate timestamps
    // ANY asof engine's pick is arbitrary (DuckDB documents the same
    // caveat), so determinism requires the dedup on both sides.
    EngineQuery(
      "sql_asof_join",
      (s, dir) => {
        val e = ev(s, dir)
        e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ms"))
          .createOrReplaceTempView("asof_purchases")
        e.filter(col("event_type") === "click")
          .groupBy("user_id", "ms")
          .agg(max("event_id").as("click_id"))
          .createOrReplaceTempView("asof_clicks")
        graft.tables.GraftSql.sql(s,
          """SELECT p.event_id AS purchase_id, p.user_id AS user_id,
            |  c.click_id AS click_id, p.ms - c.ms AS gap_ms
            |FROM asof_purchases p ASOF JOIN asof_clicks c
            |  ON p.user_id = c.user_id AND p.ms >= c.ms""".stripMargin)
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events),
             |p AS (SELECT event_id, user_id, ms FROM e WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, ms, max(event_id) AS click_id
             |      FROM e WHERE event_type = 'click' GROUP BY 1, 2)
             |SELECT p.event_id AS purchase_id, p.user_id AS user_id,
             |  c.click_id AS click_id, p.ms - c.ms AS gap_ms
             |FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ms >= c.ms""".stripMargin)),

    // Banded equi+range join (attribution window): per purchase, how many
    // clicks by the same user in the preceding 24 h. With an equi key
    // present, the right plan is a keyed shuffle join carrying the range
    // as a join condition — no binning needed.
    EngineQuery(
      "range_band_join",
      (s, dir) => {
        val e = ev(s, dir)
        val purchases = e.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ms")
        // Renamed columns (not df("col") refs): both sides derive from the
        // same frame, and plain renames sidestep AMBIGUOUS_SELF_JOIN.
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id").as("c_uid"), col("event_id").as("click_id"),
            col("ms").as("cms"))
        purchases
          .join(clicks,
            col("c_uid") === col("user_id") &&
              col("cms") >= col("ms") - 86400000L && col("cms") < col("ms"),
            "left")
          .groupBy(col("event_id").as("purchase_id"), col("user_id"))
          .agg(count(col("click_id")).as("n_clicks_24h"))
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events)
             |SELECT p.event_id AS purchase_id, p.user_id,
             |  CAST(count(c.event_id) AS BIGINT) AS n_clicks_24h
             |FROM e p
             |LEFT JOIN e c ON c.user_id = p.user_id AND c.event_type = 'click'
             |  AND c.ms >= p.ms - 86400000 AND c.ms < p.ms
             |WHERE p.event_type = 'purchase'
             |GROUP BY 1, 2""".stripMargin)),

    // Pure interval join: lineitem shipments falling inside
    // busier-than-average order weeks. The window table is derived (weekly
    // order counts, kept when strictly above the all-weeks mean — compared
    // in exact integer arithmetic, n*weeks > total, so no float tie can
    // flip a week between engines) and broadcast: the big side streams
    // through a BroadcastNestedLoopJoin unshuffled. RangeJoinSpec pins the
    // binned big-big variant equal to this plan on the same inputs.
    EngineQuery(
      "range_join_busy_weeks",
      (s, dir) => {
        val orders = s.read.parquet(graft.SparkSessions.tablePath(dir, "orders"))
        // TPC-H date columns are TIMESTAMP_NTZ; the session tz is UTC, so
        // a TIMESTAMP cast yields the same epoch ms DuckDB's epoch_ms
        // computes on the naive value.
        val li = s.read.parquet(graft.SparkSessions.tablePath(dir, "lineitem"))
          .withColumn("ship_ms", unix_millis(col("l_shipdate").cast("timestamp")))
        val weekly = orders
          .withColumn("wk", expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) DIV 604800000L"))
          .groupBy("wk").agg(count(lit(1)).as("n_orders"))
        val tot = weekly.agg(sum("n_orders").as("total"), count(lit(1)).as("n_weeks"))
        val windows = weekly.crossJoin(tot)
          .filter(col("n_orders") * col("n_weeks") > col("total"))
          .select((col("wk") * 604800000L).as("w_start_ms"),
            ((col("wk") + 1L) * 604800000L).as("w_end_ms"), col("n_orders"))
        TemporalJoins.rangeJoinBroadcast(
            li, windows, col("ship_ms"), col("w_start_ms"), col("w_end_ms"))
          .groupBy("w_start_ms", "n_orders")
          .agg(count(lit(1)).as("n_items"), round(sum("l_quantity"), 2).as("total_qty"))
      },
      Some("""WITH wkly AS (
             |  SELECT epoch_ms(o_orderdate) // 604800000 AS wk, count(*) AS n_orders
             |  FROM orders GROUP BY 1),
             |tot AS (SELECT sum(n_orders) AS total, count(*) AS n_weeks FROM wkly),
             |win AS (
             |  SELECT wk * 604800000 AS w_start_ms, (wk + 1) * 604800000 AS w_end_ms,
             |         n_orders
             |  FROM wkly, tot WHERE n_orders * n_weeks > total)
             |SELECT w.w_start_ms, w.n_orders, CAST(count(*) AS BIGINT) AS n_items,
             |  round(sum(l.l_quantity), 2) AS total_qty
             |FROM lineitem l JOIN win w
             |  ON epoch_ms(l.l_shipdate) >= w.w_start_ms
             | AND epoch_ms(l.l_shipdate) < w.w_end_ms
             |GROUP BY 1, 2""".stripMargin)),

    // The NAIVE interval-join spelling, auto-rewritten: events joined to
    // derived busier-than-average hour windows with nothing but the two
    // inequalities — the shape Spark plans as a nested loop — while
    // graft.plans.RangeBinJoinRule (enabled here via its bin-size conf,
    // hour-wide bins) rewrites it into a binned equi-join at
    // optimization time. RangeBinJoinSpec pins the plan shape and
    // equivalence; this query pins the RESULT against DuckDB running
    // the same naive SQL. The semantics-changing conf is set on a
    // CLONED session (s.newSession() — own SQLConf, shared
    // context/cache/extensions), so concurrently-compiling queries on
    // the shared session can never pick up the rewrite;
    // memoized+persisted as before.
    EngineQuery(
      "range_autobin_join",
      (s, dir) => autobinCache.getOrElseUpdate(s, dir)({
        val s2 = s.newSession()
        s2.conf.set(graft.plans.RangeBinJoinRule.ConfKey, "3600000")
        val e = ev(s2, dir)
        val hourly = e.withColumn("hr", expr("ms DIV 3600000L"))
          .groupBy("hr").agg(count(lit(1)).as("n_ev"))
        val tot = hourly.agg(sum("n_ev").as("total"), count(lit(1)).as("n_hours"))
        val windows = hourly.crossJoin(tot)
          .filter(col("n_ev") * col("n_hours") > col("total"))
          .select((col("hr") * 3600000L).as("h_start_ms"),
            ((col("hr") + 1L) * 3600000L).as("h_end_ms"), col("n_ev"))
        val joined = e
          .join(windows, col("ms") >= col("h_start_ms") && col("ms") < col("h_end_ms"))
          .groupBy("h_start_ms", "n_ev")
          .agg(count(lit(1)).as("n_in_window"), countDistinct("user_id").as("n_users"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        joined.count()
        joined
      }),
      Some("""WITH e AS (SELECT epoch_ms(ts) AS ms, user_id FROM events),
             |hr AS (SELECT ms // 3600000 AS hr, count(*) AS n_ev FROM e GROUP BY 1),
             |tot AS (SELECT sum(n_ev) AS total, count(*) AS n_hours FROM hr),
             |win AS (
             |  SELECT hr * 3600000 AS h_start_ms, (hr + 1) * 3600000 AS h_end_ms, n_ev
             |  FROM hr, tot WHERE n_ev * n_hours > total)
             |SELECT w.h_start_ms, w.n_ev, CAST(count(*) AS BIGINT) AS n_in_window,
             |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
             |FROM e JOIN win w ON e.ms >= w.h_start_ms AND e.ms < w.h_end_ms
             |GROUP BY 1, 2""".stripMargin)),

    // Spark's RUNTIME bloom-filter join pruning (InjectRuntimeFilter):
    // the dim side's non-key predicate ('1-URGENT') cannot be statically
    // inferred onto the fact side, so with the conf on Catalyst plants
    // `might_contain(<bloom_filter_agg subquery>, xxhash64(l_orderkey))`
    // into the fact scan's filter — at 100 TB that's the difference
    // between shuffling every lineitem and shuffling ~1/5 of them, with
    // zero query changes. Cloned session + memoized like the other
    // conf-gated rewrites; RuntimeFilterSpec pins that might_contain is
    // actually in the optimized plan (a silent non-injection would be an
    // ordinary join and still hash-match — the spec is the teeth).
    EngineQuery(
      "q30_runtime_filter",
      (s, dir) => runtimeFilterCache.getOrElseUpdate(s, dir)({
        val s2 = s.newSession()
        s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
        // The 10 MB creation-side default would silently stop injection
        // just above current data sizes (sf1 orders is already 8.7 MB)
        // and nothing would notice — the filter is semantics-preserving.
        s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
        s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val li = s2.read.parquet(graft.SparkSessions.tablePath(dir, "lineitem"))
        val o = s2.read.parquet(graft.SparkSessions.tablePath(dir, "orders"))
          .filter("o_orderpriority = '1-URGENT'")
        val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            round(sum("l_quantity"), 2).as("sum_qty"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        joined.count()
        joined
      }),
      Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
             |  round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderpriority = '1-URGENT'
             |GROUP BY l_returnflag""".stripMargin))
  )

  private val runtimeFilterCache =
    new graft.tables.SessionMemo[String, DataFrame]

  private val autobinCache =
    new graft.tables.SessionMemo[String, DataFrame]
}
