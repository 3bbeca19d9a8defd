package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSessions.tablePath

/** Event-stream analytics over the `events` table (event_id, ts, user_id,
  * event_type, value, props-JSON). These are the batch duals of the
  * streaming operators (tumbling windows, sessionization, JSON
  * extraction); the streaming wiring itself lives in graft.streaming and
  * is exercised by ScalaTest, while these give the semantics a DuckDB
  * oracle.
  *
  * Float-determinism: sums of 2-decimal doubles are rounded back to 2
  * decimals (the true sum has exactly 2 decimals, so both engines recover
  * it bit-identically); we never round an avg of doubles (its true value
  * can sit exactly on a rounding tie where Spark and DuckDB disagree).
  */
object EventsQueries extends QueryModule {

  /** Driver generations of events.parquet have carried three physical
    * types for `ts`: TIMESTAMP(NANOS) (readable only as BIGINT nanos via
    * the legacy conf), plain INT64 epoch-nanos (ScaleGen replicas of the
    * nanos era), and TIMESTAMP(MICROS) (current data, surfaced by Spark
    * as TIMESTAMP_NTZ). Normalize all of them to a session-zoned
    * TIMESTAMP so downstream arithmetic (`unix_millis`, `window()`) sees
    * one type; the session tz is UTC, so the wall-clock values match
    * DuckDB's naive read of the same file in every case. */
  private[graft] def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(tablePath(dir, "events"))
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Pre-build the partitioned seed AND the streaming-dedup ingest
    * (Bench times this as an explicit `build_*` entry so query numbers
    * measure only themselves). */
  def ensureSeeded(s: SparkSession, dir: String): Unit = {
    // Independent sub-builds (hive-partitioned write vs the streaming
    // dedup ingest; both read events.parquet directly) overlapped per
    // guide §2.6: the AvailableNow stream's microbatch barriers leave
    // cores idle that the partitioned write back-fills.
    SeedPar.all(Seq(
      () => partitionedDir(s, dir),
      () => streamDeduped(s, dir)))
    ()
  }

  private val partSeed =
    new graft.tables.SessionMemo[String, String]

  /** Events seeded once per (session, dir) into a date-partitioned
    * hive-style layout (UTC session tz == DuckDB's naive CAST(ts AS DATE)). */
  private def partitionedDir(s: SparkSession, dir: String): String =
    partSeed.getOrElseUpdate(s, dir)({
      val base = graft.tables.TmpDirs.create("graft-evt-part")
        .resolve("events").toString
      graft.tables.PartitionedTable.write(
        events(s, dir).withColumn("event_date", to_date(col("ts"))), base, Seq("event_date"))
      base
    })

  private val streamDedupCache =
    new graft.tables.SessionMemo[String, DataFrame]

  /** Runs the REAL streaming dedup end-to-end (file source with verbatim
    * duplicate deliveries → watermark → dropDuplicatesWithinWatermark →
    * checkpointed parquet sink), memoized per (session, dir) so bench
    * times the ingest once. */
  private def streamDeduped(s: SparkSession, dir: String): DataFrame =
    streamDedupCache.getOrElseUpdate(s, dir)({
      val src = events(s, dir).select("event_id", "ts", "event_type", "user_id", "value")
      val base = graft.tables.TmpDirs.create("graft-evtdedup").toString
      src.coalesce(3).write.mode("overwrite").parquet(s"$base/in")
      // At-least-once delivery simulated: every 7th event re-delivered
      // VERBATIM in a later file — whichever copy wins is bytewise
      // identical, so the deduped result is deterministic.
      src.filter(col("event_id") % 7 === 0)
        .coalesce(1).write.mode("append").parquet(s"$base/in")
      val stream = s.readStream.schema(src.schema).parquet(s"$base/in")
      val q = graft.streaming.EventsStreaming.dedupIngest(stream)
        .writeStream.format("parquet")
        .option("path", s"$base/out").option("checkpointLocation", s"$base/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      require(q.awaitTermination(300000),
        "evt_stream_dedup: the dedup ingest did not drain within 300s — " +
          "a partial sink must never reach the gate")
      val out = s.read.parquet(s"$base/out")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count()
      out
    })

  override def queries: Seq[EngineQuery] = Seq(

    // Typed COGROUP (KeyValueGroupedDataset.cogroup): the per-key
    // imperative merge of TWO datasets — the operator for logic a join
    // can't express without exploding (here: each user's clicks merged
    // against their purchase timeline). ONE co-partitioned shuffle of
    // both sides; per-task state is a single user's events (the
    // mapGroups contract), never the partition. This is the typed
    // API's answer to applyInPandas-style cogrouped processing, with
    // the whole result replayable as SQL for the gate.
    EngineQuery(
      "evt_cogroup_funnel",
      (s, dir) => {
        import s.implicits._
        val e = events(s, dir).withColumn("ms", unix_millis(col("ts")))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ms")).as[(Long, Long)]
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ms")).as[(Long, Long)]
        clicks.groupByKey(_._1).cogroup(purchases.groupByKey(_._1)) { (uid, cs, ps) =>
          val cl = cs.map(_._2).toArray
          val pl = ps.map(_._2).toArray
          val firstP = if (pl.isEmpty) Long.MaxValue else pl.min
          Iterator((uid, cl.length.toLong, pl.length.toLong,
            cl.count(_ < firstP).toLong))
        }.toDF("user_id", "n_clicks", "n_purchases", "clicks_before_first_purchase")
      },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_ms(ts) AS ms, event_type FROM events
             |  WHERE event_type IN ('click', 'purchase')),
             |p AS (SELECT user_id, min(ms) AS first_p
             |      FROM e WHERE event_type = 'purchase' GROUP BY 1)
             |SELECT e.user_id,
             |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks,
             |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
             |  CAST(sum(CASE WHEN event_type = 'click'
             |             AND (p.first_p IS NULL OR e.ms < p.first_p)
             |           THEN 1 ELSE 0 END) AS BIGINT) AS clicks_before_first_purchase
             |FROM e LEFT JOIN p ON e.user_id = p.user_id
             |GROUP BY e.user_id""".stripMargin)),

    // Streaming ingest dedup (dropDuplicatesWithinWatermark): the
    // at-least-once landing path every 100 TB pipeline needs — exactly
    // one row per event_id survives re-delivery, with dedup state
    // BOUNDED by the watermark horizon instead of growing forever. The
    // oracle is the batch truth: duplicates are verbatim, so the
    // deduped stream must equal the original events table exactly.
    EngineQuery(
      "evt_stream_dedup",
      (s, dir) =>
        streamDeduped(s, dir)
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            countDistinct("event_id").as("n_ids"),
            sum(expr("CAST(round(value * 100, 0) AS BIGINT)")).as("cents")),
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |  CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids,
             |  CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
             |FROM events GROUP BY event_type""".stripMargin)),

    // Tumbling hourly window per event type (epoch-aligned in both
    // engines: Spark window() and DuckDB time_bucket).
    EngineQuery(
      "evt_hourly",
      (s, dir) =>
        events(s, dir)
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
          .select(col("w.start").as("hour_ts"), col("event_type"), col("n"), col("total_value")),
      Some("""SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_ts, event_type,
             |  CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total_value
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // Sessionization: per-user session count with a 30-minute inactivity
    // gap (lag + cumulative-sum session ids; millisecond-exact integers).
    EngineQuery(
      "evt_sessions",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        events(s, dir)
          .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(w))
          .withColumn("new_session",
            when(col("prev_ms").isNull || unix_millis(col("ts")) - col("prev_ms") > 1800000L, 1L)
              .otherwise(0L))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"), sum("new_session").as("n_sessions"))
      },
      Some("""WITH x AS (
             |  SELECT user_id,
             |    CASE WHEN lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000
             |         THEN 1 ELSE 0 END AS new_session
             |  FROM events)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(new_session) AS BIGINT) AS n_sessions
             |FROM x GROUP BY user_id""".stripMargin)),

    // Cohort retention: users grouped by the epoch-week of their FIRST
    // event, tallied by distinct activity in each subsequent week — the
    // (cohort × offset) retention matrix. Integer epoch-week arithmetic
    // (ms DIV week) is engine-exact. Both the first-event aggregate and
    // the join back are keyed on user_id, so one hash partitioning
    // carries through aggregate → join before the small final rollup.
    EngineQuery(
      "evt_retention",
      (s, dir) => {
        val e = events(s, dir)
          .selectExpr("user_id", "unix_millis(ts) DIV 604800000 AS wk")
        val cohort = e.groupBy("user_id").agg(min("wk").as("cohort_week"))
        e.join(cohort, "user_id")
          .groupBy(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"))
          .agg(countDistinct("user_id").as("n_users"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_ms(ts) // 604800000 AS wk FROM events),
             |c AS (SELECT user_id, min(wk) AS cohort_week FROM e GROUP BY 1)
             |SELECT cohort_week, wk - cohort_week AS week_offset,
             |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
             |FROM e JOIN c ON e.user_id = c.user_id
             |GROUP BY 1, 2""".stripMargin)),

    // Native session_window operator (30 min inactivity gap) pinned
    // against an INDEPENDENT formulation: the DuckDB dual rebuilds
    // sessions from scratch with lag + cumulative session ids. Spark's
    // session end = last event + gap, start = first event.
    EngineQuery(
      "evt_session_window",
      (s, dir) =>
        events(s, dir)
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
          .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
          .select(col("user_id"),
            unix_millis(col("w.start")).as("session_start_ms"),
            unix_millis(col("w.end")).as("session_end_ms"),
            col("n_events"), col("total_value")),
      Some("""WITH x AS (
             |  SELECT user_id, epoch_ms(ts) AS ms, value,
             |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
             |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
             |         THEN 1 ELSE 0 END AS new_session
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id, ms, value,
             |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ms
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM x)
             |SELECT user_id, min(ms) AS session_start_ms,
             |  max(ms) + 1800000 AS session_end_ms,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  round(sum(value), 2) AS total_value
             |FROM s GROUP BY user_id, sid""".stripMargin)),

    // JSON property extraction + aggregation (props is a JSON string).
    EngineQuery(
      "evt_json_extract",
      (s, dir) =>
        events(s, dir)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            sum("k").as("sum_k"),
            round(avg("k"), 4).as("avg_k")),
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
             |  round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k
             |FROM events GROUP BY event_type""".stripMargin)),

    // The same extraction through Spark 4's VARIANT type (parse once,
    // typed path access — the semi-structured column format that
    // replaces per-query JSON string re-parsing; at scale the parsed
    // variant is what you'd persist). Distinct outputs from
    // evt_json_extract: typed min/max and a missing-path count (variant
    // null-safety), aggregated so no VARIANT reaches the output schema.
    EngineQuery(
      "evt_variant_extract",
      (s, dir) =>
        events(s, dir)
          .withColumn("v", expr("parse_json(props)"))
          .withColumn("k", expr("variant_get(v, '$.k', 'int')"))
          .withColumn("missing", expr("variant_get(v, '$.absent', 'int')"))
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            min("k").as("min_k"), max("k").as("max_k"),
            sum(when(col("missing").isNull, 1L).otherwise(0L)).as("n_missing_path")),
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |  CAST(min(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
             |  CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k,
             |  CAST(sum(CASE WHEN json_extract_string(props, '$.absent') IS NULL
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_path
             |FROM events GROUP BY event_type""".stripMargin)),

    // Funnel: users whose first 'error' is followed by a 'click' within
    // 24 hours (sequential pattern via per-user window functions; events
    // are sparse in time, so a short window matches nothing).
    EngineQuery(
      "evt_funnel",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
        val e = events(s, dir)
          .withColumn("ms", unix_millis(col("ts")))
          .withColumn("first_error_ms",
            min(when(col("event_type") === "error", col("ms"))).over(w))
        e.filter(
            col("event_type") === "click" &&
              col("first_error_ms").isNotNull &&
              col("ms") > col("first_error_ms") &&
              col("ms") - col("first_error_ms") <= 86400000L)
          .groupBy("user_id")
          .agg(count(lit(1)).as("clicks_after_error"),
            min("ms").as("first_click_ms"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type, epoch_ms(ts) AS ms,
             |    min(CASE WHEN event_type = 'error' THEN epoch_ms(ts) END)
             |      OVER (PARTITION BY user_id) AS first_error_ms
             |  FROM events)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS clicks_after_error,
             |  CAST(min(ms) AS BIGINT) AS first_click_ms
             |FROM e
             |WHERE event_type = 'click' AND first_error_ms IS NOT NULL
             |  AND ms > first_error_ms AND ms - first_error_ms <= 86400000
             |GROUP BY user_id""".stripMargin)),

    // Daily rollup over a date-PARTITIONED layout: events are seeded once
    // into a hive-style `event_date=...` directory tree
    // (tables/PartitionedTable), and the week filter prunes whole
    // partition directories at planning time — `PartitionFilters` on the
    // scan, zero IO for the other 23 days (PartitionedTableSpec pins the
    // pruning itself; this query pins the semantics against the oracle).
    EngineQuery(
      "evt_partition_prune",
      (s, dir) => {
        val pdir = partitionedDir(s, dir)
        s.read.parquet(pdir)
          .filter(col("event_date").between(
            lit(java.sql.Date.valueOf("2024-01-08")), lit(java.sql.Date.valueOf("2024-01-14"))))
          .groupBy("event_date", "event_type")
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      },
      Some("""SELECT CAST(ts AS DATE) AS event_date, event_type,
             |  CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total_value
             |FROM events
             |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
             |GROUP BY 1, 2""".stripMargin)),

    // Generated-partition-column pruning: the user filters ONLY on ts
    // over the date-partitioned tree; GeneratedPartitionRule derives
    // the implied event_date bounds (partCol = CAST(ts AS DATE) is
    // monotone), so the scan gets PartitionFilters WITHOUT the query
    // ever mentioning the partition column — Delta's generated-column
    // pruning as a Catalyst rule. GeneratedPartitionSpec pins the
    // derived filter's presence, result parity with the rule off, and
    // the no-refire guard; this oracle pins the values.
    EngineQuery(
      "evt_generated_prune",
      (s, dir) => {
        val pdir = partitionedDir(s, dir)
        graft.plans.GeneratedPartitionRule.register(pdir, "event_date", "ts")
        s.read.parquet(pdir)
          .filter(col("ts").between(
            lit(java.sql.Timestamp.valueOf("2024-01-08 06:00:00")),
            lit(java.sql.Timestamp.valueOf("2024-01-12 18:00:00"))))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      },
      Some("""SELECT event_type,
             |  CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total_value
             |FROM events
             |WHERE ts BETWEEN TIMESTAMP '2024-01-08 06:00:00' AND TIMESTAMP '2024-01-12 18:00:00'
             |GROUP BY 1""".stripMargin)),

    // Cohort retention matrix — the product-analytics staple: users
    // cohorted by FIRST-ACTIVE week (ISO date_trunc, Monday-aligned in
    // both engines), then for each (cohort, week-offset) the count of
    // cohort members active that week and the retention fraction vs the
    // cohort's size. Shape at scale: one user-keyed min-agg (first
    // week), one distinct (user, week) projection joined back to the
    // cohort (user-keyed, co-partitioned), one (cohort, offset) rollup,
    // and a |cohorts|-row broadcast for the denominator. No window, no
    // per-user state beyond the aggregates.
    EngineQuery(
      "evt_retention_cohorts",
      (s, dir) => {
        val wk = events(s, dir)
          .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
          .distinct()
        val firsts = wk.groupBy("user_id").agg(min("wk").as("cohort"))
        val cells = wk.join(firsts, "user_id")
          .selectExpr("cohort", "CAST(datediff(wk, cohort) / 7 AS INT) AS offset_weeks", "user_id")
          .groupBy("cohort", "offset_weeks")
          .agg(countDistinct("user_id").as("n_users"))
        val sizes = cells.where(col("offset_weeks") === 0)
          .select(col("cohort"), col("n_users").as("cohort_size"))
        cells.join(broadcast(sizes), "cohort")
          .selectExpr("cohort", "offset_weeks", "n_users", "cohort_size",
            "round(CAST(n_users AS DOUBLE) / CAST(cohort_size AS DOUBLE), 4) AS retention")
      },
      Some("""WITH wk AS (SELECT DISTINCT user_id,
             |    CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
             |f AS (SELECT user_id, min(wk) AS cohort FROM wk GROUP BY user_id),
             |cells AS (SELECT cohort,
             |    CAST(date_diff('day', cohort, wk) / 7 AS INT) AS offset_weeks,
             |    CAST(count(DISTINCT wk.user_id) AS BIGINT) AS n_users
             |  FROM wk JOIN f ON wk.user_id = f.user_id
             |  GROUP BY 1, 2),
             |sz AS (SELECT cohort, n_users AS cohort_size FROM cells WHERE offset_weeks = 0)
             |SELECT cells.cohort, offset_weeks, n_users, cohort_size,
             |  round(CAST(n_users AS DOUBLE) / CAST(cohort_size AS DOUBLE), 4) AS retention
             |FROM cells JOIN sz ON cells.cohort = sz.cohort""".stripMargin)),

    // RUNTIME dynamic partition pruning (DPP) — the join-driven
    // complement to evt_partition_prune's static filter: the fact side
    // is the same hive-partitioned tree, but the qualifying dates are
    // only knowable by FILTERING THE DIM SIDE (dow_bucket = 2), so
    // Catalyst plants a `dynamicpruning#` subquery into the fact scan's
    // PartitionFilters — at execution the dim's broadcast result prunes
    // whole date directories before any fact IO (DppSpec pins the
    // subquery's presence and result parity with pruning disabled). At
    // 100 TB this is THE mechanism that keeps star-schema joins from
    // scanning every partition of the fact table.
    EngineQuery(
      "evt_dpp_join",
      (s, dir) => {
        val pdir = partitionedDir(s, dir)
        val dim = s.range(31).selectExpr(
          "date_add(DATE '2024-01-01', CAST(id AS INT)) AS event_date",
          "CAST(id % 7 AS INT) AS dow_bucket")
        s.read.parquet(pdir)
          .join(dim.where(col("dow_bucket") === 2), "event_date")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      },
      Some("""WITH dim AS (SELECT (DATE '2024-01-01' + CAST(i AS INT)) AS event_date,
             |    CAST(i % 7 AS INT) AS dow_bucket FROM range(0, 31) t(i))
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |  round(sum(value), 2) AS total_value
             |FROM events JOIN dim ON CAST(ts AS DATE) = dim.event_date
             |WHERE dow_bucket = 2
             |GROUP BY event_type""".stripMargin)),

    // Sliding (hopping) window: 2 h windows advancing every 1 h — each
    // event lands in exactly w/s = 2 windows. Spark's window() emits the
    // per-event window structs directly; the DuckDB dual reconstructs the
    // same window starts as the 1 h bucket at offsets {0, 1} hours
    // (epoch-aligned in both engines).
    EngineQuery(
      "evt_sliding",
      (s, dir) =>
        events(s, dir)
          .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
          .select(col("w.start").as("win_ts"), col("event_type"), col("n"), col("total_value")),
      Some("""SELECT time_bucket(INTERVAL '1 hour', ts) - j.off AS win_ts, event_type,
             |  CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total_value
             |FROM events
             |CROSS JOIN (VALUES (INTERVAL '0 hour'), (INTERVAL '1 hour')) j(off)
             |GROUP BY 1, 2""".stripMargin)),

    // Per-type value stats (sum rounded to the data's 2-decimal grain;
    // min/max are order-free).
    EngineQuery(
      "evt_type_stats",
      (s, dir) =>
        events(s, dir)
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            round(sum("value"), 2).as("total_value"),
            min("value").as("min_value"),
            max("value").as("max_value"),
            countDistinct("user_id").as("n_users")),
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |  round(sum(value), 2) AS total_value, min(value) AS min_value,
             |  max(value) AS max_value, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             |FROM events GROUP BY event_type""".stripMargin)),

    // DAU / trailing-7-day WAU / stickiness — the product-analytics
    // engagement rollup. Sliding DISTINCT can't ride a window frame, so
    // each event CONTRIBUTES itself to the 7 days it keeps a user
    // "weekly active" for (one ×7 explode, one shuffle, map-side
    // partial distinct) — the scale-honest dual of a per-day self-join
    // over the full week of events. Counts are integers; stickiness is
    // one exact division.
    EngineQuery(
      "evt_dau_wau",
      (s, dir) => {
        val ev = events(s, dir).select(to_date(col("ts")).as("day"), col("user_id"))
        val days = ev.select("day").distinct()
        val dau = ev.groupBy("day")
          .agg(countDistinct("user_id").cast("long").as("dau"))
        val wau = ev
          .select(explode(expr("sequence(0, 6)")).as("i"), col("day"), col("user_id"))
          .select(expr("date_add(day, i)").as("day"), col("user_id"))
          .join(days, "day")
          .groupBy("day")
          .agg(countDistinct("user_id").cast("long").as("wau"))
        days.join(dau, "day").join(wau, "day")
          .selectExpr("day", "dau", "wau",
            "round(CAST(dau AS DOUBLE) / wau, 4) AS stickiness")
      },
      Some("""WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
             |dau AS (SELECT CAST(ts AS DATE) AS day,
             |    CAST(count(DISTINCT user_id) AS BIGINT) AS dau
             |  FROM events GROUP BY 1),
             |contrib AS (SELECT CAST(ts AS DATE) + CAST(i AS INTEGER) AS day, user_id
             |  FROM events CROSS JOIN range(0, 7) t(i)),
             |wau AS (SELECT c.day, CAST(count(DISTINCT c.user_id) AS BIGINT) AS wau
             |  FROM contrib c JOIN d ON d.day = c.day GROUP BY c.day)
             |SELECT d.day, dau.dau, wau.wau,
             |  round(CAST(dau.dau AS DOUBLE) / wau.wau, 4) AS stickiness
             |FROM d JOIN dau ON dau.day = d.day JOIN wau ON wau.day = d.day""".stripMargin)),

    // Pearson correlation of value vs hour-of-day per event type — the
    // CORR aggregate made cross-engine-deterministic: every raw moment
    // is either integer-exact (hour sums) or rounded back to its
    // decimal grain (Σv to 2, Σv², Σv·h to their product grains), and
    // all derived arithmetic (means, covariance, sigmas, ratio) is the
    // same IEEE expression text in both engines. One aggregate pass,
    // map-side combined.
    EngineQuery(
      "evt_value_hour_corr",
      (s, dir) =>
        events(s, dir).filter(col("value").isNotNull)
          .selectExpr("event_type", "value",
            "CAST(hour(ts) AS BIGINT) AS h")
          .groupBy("event_type")
          .agg(
            count(lit(1)).cast("long").as("n"),
            round(sum("value"), 2).as("sx"),
            sum("h").cast("long").as("sy"),
            round(sum(col("value") * col("value")), 4).as("sxx"),
            sum(col("h") * col("h")).cast("long").as("syy"),
            round(sum(col("value") * col("h")), 2).as("sxy"))
          .selectExpr("event_type", "n",
            "round((sxy / n - (sx / n) * (CAST(sy AS DOUBLE) / n)) / " +
              "(sqrt(sxx / n - (sx / n) * (sx / n)) * sqrt(CAST(syy AS DOUBLE) / n - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))), 6) AS corr"),
      Some("""WITH m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |    round(sum(value), 2) AS sx,
             |    CAST(sum(h) AS BIGINT) AS sy,
             |    round(sum(value * value), 4) AS sxx,
             |    CAST(sum(h * h) AS BIGINT) AS syy,
             |    round(sum(value * h), 2) AS sxy
             |  FROM (SELECT event_type, value, CAST(hour(ts) AS BIGINT) AS h
             |        FROM events WHERE value IS NOT NULL)
             |  GROUP BY event_type)
             |SELECT event_type, n,
             |  round((sxy / n - (sx / n) * (CAST(sy AS DOUBLE) / n)) /
             |    (sqrt(sxx / n - (sx / n) * (sx / n)) * sqrt(CAST(syy AS DOUBLE) / n - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))), 6) AS corr
             |FROM m""".stripMargin)),

    // Z-score anomaly detection per event type: two aggregate passes
    // (per-type moments broadcast back to the stream) flag |z| > 3
    // events. Determinism contract: the raw sums are rounded back to the
    // data's decimal grain (2 for Σv, 4 for Σv² — the true values have
    // exactly those decimals, so both engines recover them bit-
    // identically regardless of accumulation order), and every derived
    // op (mean, variance, sqrt, z) is the same IEEE expression text.
    EngineQuery(
      "evt_outliers",
      (s, dir) => {
        val ev = events(s, dir).filter(col("value").isNotNull)
        val stats = ev.groupBy("event_type").agg(
          count(lit(1)).cast("long").as("n"),
          round(sum("value"), 2).as("s1"),
          round(sum(col("value") * col("value")), 4).as("s2"))
          .selectExpr("event_type", "s1 / n AS mu",
            "sqrt(s2 / n - (s1 / n) * (s1 / n)) AS sigma")
        ev.join(broadcast(stats), "event_type")
          .filter(expr("abs((value - mu) / sigma) > 3.0"))
          .selectExpr("event_id", "event_type", "value",
            "round((value - mu) / sigma, 6) AS z")
      },
      Some("""WITH s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |    round(sum(value), 2) AS s1, round(sum(value * value), 4) AS s2
             |  FROM events WHERE value IS NOT NULL GROUP BY event_type),
             |m AS (SELECT event_type, s1 / n AS mu,
             |    sqrt(s2 / n - (s1 / n) * (s1 / n)) AS sigma FROM s)
             |SELECT event_id, event_type, value, round((value - mu) / sigma, 6) AS z
             |FROM events JOIN m USING (event_type)
             |WHERE value IS NOT NULL AND abs((value - mu) / sigma) > 3.0""".stripMargin)),

    // Exponentially-decayed per-user value (EWMA family): one ordered
    // left fold acc = acc·0.9 + value over each user's (ts, event_id)
    // -sorted history — recency-weighted engagement, the time-decay
    // feature a training pipeline derives per entity. The recurrence is
    // inherently sequential, so it runs as ONE shuffle on user_id with
    // the fold inside the aggregation group (state bounded by per-user
    // history, the sessionization family's bound); both engines execute
    // the identical IEEE sequence — no libm, no unordered float sums.
    // (0.9^k scaling emerges from the fold itself; Spark's zero-init
    // fold matches DuckDB's first-element init since 0.0·0.9 + v1 = v1.)
    EngineQuery(
      "evt_time_decay",
      (s, dir) =>
        events(s, dir)
          .filter(col("value").isNotNull)
          .groupBy("user_id")
          // Residual ordered fold (ExactSum survey, r12): acc·0.9 + v is
          // genuinely order-dependent — the decay IS the ordering, so no
          // commutative rewrite exists (0.9^k would need transcendental
          // pow, banned cross-engine). Array bounded by one user's event
          // count.
          .agg(
            count(lit(1)).as("n_events"),
            sort_array(collect_list(struct(col("ts"), col("event_id"), col("value"))))
              .as("vs"))
          .selectExpr(
            "user_id",
            "CAST(n_events AS BIGINT) AS n_events",
            "round(aggregate(vs, CAST(0.0 AS DOUBLE), (acc, e) -> acc * 0.9 + e.value), 6) AS decayed"),
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |  round(list_reduce(list(value ORDER BY ts, event_id), (x, y) -> x * 0.9 + y), 6) AS decayed
             |FROM events WHERE value IS NOT NULL GROUP BY user_id""".stripMargin)),

    // Peak concurrency via interval sweep: gap-sessionize (same 30-min
    // rule as evt_sessions), collapse each session to [start_ms, end_ms],
    // then count starts/ends PER MILLISECOND and walk a running sum. The
    // per-ms pre-aggregation makes the sweep order-free within a
    // timestamp (peak at t = active_before + starts(t), so touching
    // sessions count as overlapping — pinned identically in the oracle),
    // and shrinks the sweep domain to distinct boundary timestamps. The
    // running sum itself is SequencePack.withStartOffsets — the
    // distributed two-pass prefix sum (range partition on ms, partial
    // sums, broadcast offsets) — so no unpartitioned Window appears
    // anywhere: the inclusive running sum of delta=(n_start-n_end) plus
    // n_end collapses to start_off + n_start.
    EngineQuery(
      "evt_max_concurrency",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val sess = events(s, dir)
          .withColumn("ms", unix_millis(col("ts")))
          .withColumn("prev_ms", lag("ms", 1).over(w))
          .withColumn("new_s",
            when(col("prev_ms").isNull || col("ms") - col("prev_ms") > 1800000L, 1L)
              .otherwise(0L))
          .withColumn("sid", sum("new_s").over(w))
          .groupBy("user_id", "sid")
          .agg(min("ms").as("s_ms"), max("ms").as("e_ms"))
        val pts = sess.select(col("s_ms").as("ms"), lit(1L).as("st"), lit(0L).as("en"))
          .unionAll(sess.select(col("e_ms").as("ms"), lit(0L).as("st"), lit(1L).as("en")))
          .groupBy("ms").agg(sum("st").as("n_start"), sum("en").as("n_end"))
          .withColumn("delta", col("n_start") - col("n_end"))
        val sweep = graft.text.SequencePack
          .withStartOffsets(pts, Seq("ms"), "delta", 32, keepCols = Seq("n_start"))
          .withColumn("peak", col("start_off") + col("n_start"))
        val mx = sweep.agg(max("peak").as("mp"))
        sweep.join(broadcast(mx)).filter(col("peak") === col("mp"))
          .agg(max("peak").as("max_concurrent"), count(lit(1)).as("n_peaks"),
            min("ms").as("first_peak_ms"))
      },
      Some("""WITH x AS (
             |  SELECT user_id, ts, event_id, epoch_ms(ts) AS ms,
             |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
             |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
             |         THEN 1 ELSE 0 END AS new_s
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sid AS (SELECT user_id, ms,
             |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM x),
             |sess AS (SELECT user_id, sid, min(ms) AS s_ms, max(ms) AS e_ms
             |  FROM sid GROUP BY 1, 2),
             |pts AS (SELECT ms, sum(st) AS n_start, sum(en) AS n_end FROM (
             |    SELECT s_ms AS ms, 1 AS st, 0 AS en FROM sess
             |    UNION ALL
             |    SELECT e_ms AS ms, 0 AS st, 1 AS en FROM sess) u GROUP BY 1),
             |sweep AS (SELECT ms,
             |    sum(n_start - n_end) OVER (ORDER BY ms
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + n_end AS peak
             |  FROM pts)
             |SELECT CAST(max(peak) AS BIGINT) AS max_concurrent,
             |  CAST(count(*) AS BIGINT) AS n_peaks,
             |  CAST(min(ms) AS BIGINT) AS first_peak_ms
             |FROM sweep WHERE peak = (SELECT max(peak) FROM sweep)""".stripMargin)),

    // Time-series gap filling: a dense hourly spine (every hour between
    // the corpus min and max, per event type) left-joined to the actual
    // hourly counts, empty hours zero-filled — the resample/densify step
    // before any rolling-window feature. The spine GENERATES (types ×
    // hours) from two tiny broadcast inputs instead of scanning, so the
    // only full-data work is one hourly pre-aggregation; integer-exact
    // throughout. Output pins the fill: total hours, zero-filled hours,
    // and event mass per type.
    EngineQuery(
      "evt_gapfill",
      (s, dir) => {
        val e = events(s, dir)
          .withColumn("hr", expr("unix_millis(ts) DIV 3600000L"))
        val bounds = e.agg(min("hr").as("lo"), max("hr").as("hi"))
        val types = e.select("event_type").distinct()
        val spine = types.crossJoin(broadcast(bounds))
          .selectExpr("event_type", "explode(sequence(lo, hi)) AS hr")
        val counts = e.groupBy("event_type", "hr").agg(count(lit(1)).as("n"))
        spine.join(counts, Seq("event_type", "hr"), "left")
          .withColumn("n", coalesce(col("n"), lit(0L)))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_hours"),
            sum(when(col("n") === 0L, 1L).otherwise(0L)).as("n_gap_hours"),
            sum("n").as("n_events"))
      },
      Some("""WITH e AS (SELECT event_type, epoch_ms(ts) // 3600000 AS hr FROM events),
             |b AS (SELECT min(hr) AS lo, max(hr) AS hi FROM e),
             |t AS (SELECT DISTINCT event_type FROM e),
             |spine AS (SELECT event_type, unnest(range(lo, hi + 1)) AS hr FROM t, b),
             |c AS (SELECT event_type, hr, count(*) AS n FROM e GROUP BY 1, 2),
             |f AS (SELECT s.event_type, s.hr, coalesce(c.n, 0) AS n
             |  FROM spine s LEFT JOIN c ON s.event_type = c.event_type AND s.hr = c.hr)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
             |  CAST(sum(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gap_hours,
             |  CAST(sum(n) AS BIGINT) AS n_events
             |FROM f GROUP BY 1""".stripMargin)),

    // LOCF imputation (last observation carried forward): each user's
    // sparse signal — the value of their PURCHASE events — forward-
    // filled onto every subsequent event via an IGNORE NULLS running
    // last_value. The feature-imputation step for irregular sensors /
    // sparse labels: one user_id shuffle, one ordered window, no
    // self-join. Carried values are raw 2-decimal doubles, so the
    // per-user sum rounds back exactly on both engines.
    EngineQuery(
      "evt_locf_impute",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, dir)
          .withColumn("carried",
            last(when(col("event_type") === "purchase", col("value")), ignoreNulls = true)
              .over(w))
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n_events"),
            sum(when(col("carried").isNotNull && col("event_type") =!= "purchase", 1L)
              .otherwise(0L)).as("n_imputed"),
            round(sum("carried"), 2).as("total_carried"))
      },
      Some("""WITH x AS (
             |  SELECT user_id, event_type,
             |    last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried
             |  FROM events)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CASE WHEN carried IS NOT NULL AND event_type <> 'purchase'
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_imputed,
             |  round(sum(carried), 2) AS total_carried
             |FROM x GROUP BY user_id""".stripMargin)),

    // Path analysis: the most-travelled 3-step event-type sequences
    // WITHIN a session (24 H gap — events are hours apart in this
    // corpus, so the 30-min web rule would leave only singleton
    // sessions; the operator shape is identical) — the
    // navigation-pattern mining behind funnel discovery. Trigrams come from two lags inside the session window
    // (order-safe — no collect_list whose struct comparison could
    // diverge), so the whole thing is one user_id shuffle, the
    // session-window pass, and a bounded count: |event_types|³ keys at
    // most, collapsed map-side.
    EngineQuery(
      "evt_top_paths",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val wsid = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
        events(s, dir)
          .withColumn("ms", unix_millis(col("ts")))
          .withColumn("prev_ms", lag("ms", 1).over(w))
          .withColumn("new_s",
            when(col("prev_ms").isNull || col("ms") - col("prev_ms") > 86400000L, 1L)
              .otherwise(0L))
          .withColumn("sid", sum("new_s").over(w))
          .withColumn("t2", lag("event_type", 2).over(wsid))
          .withColumn("t1", lag("event_type", 1).over(wsid))
          .filter(col("t2").isNotNull)
          .select(concat_ws(">", col("t2"), col("t1"), col("event_type")).as("path"))
          .groupBy("path").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("path").asc)
          .limit(5)
      },
      Some("""WITH x AS (
             |  SELECT user_id, ts, event_id, event_type, epoch_ms(ts) AS ms,
             |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
             |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 86400000
             |         THEN 1 ELSE 0 END AS new_s
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sid AS (SELECT user_id, ts, event_id, event_type,
             |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM x),
             |tri AS (SELECT
             |    lag(event_type, 2) OVER ws AS t2,
             |    lag(event_type, 1) OVER ws AS t1,
             |    event_type
             |  FROM sid
             |  WINDOW ws AS (PARTITION BY user_id, sid ORDER BY ts, event_id))
             |SELECT concat_ws('>', t2, t1, event_type) AS path,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM tri WHERE t2 IS NOT NULL
             |GROUP BY 1 ORDER BY n DESC, path ASC LIMIT 5""".stripMargin)),

    // Seasonal-naive forecasting baseline + backtest: the hour-of-day
    // mean per event type fit on the first three weeks, scored by MAE
    // on the held-out tail — the sanity baseline every anomaly/forecast
    // system is graded against. Engine-exactness by construction: values
    // go to centi-units first, so each row's error |v·c − Σ| is an exact
    // BIGINT and every group's MAE is ONE division of exact integers —
    // no double accumulation anywhere (the trap with a naive avg-of-abs:
    // float sums are order-dependent across engines). Two aggregates +
    // a broadcast of the 120-row model; eval rows join co-partitioned.
    EngineQuery(
      "evt_seasonal_baseline",
      (s, dir) => {
        val ev = events(s, dir).selectExpr(
          "event_type",
          "CAST(round(value * 100, 0) AS BIGINT) AS v100",
          "hour(ts) AS hr",
          "ts >= TIMESTAMP '2024-01-22 00:00:00' AS is_eval")
        val model = ev.filter(!col("is_eval"))
          .groupBy("event_type", "hr")
          .agg(sum("v100").as("s_t"), count(lit(1)).as("c_t"))
        ev.filter(col("is_eval"))
          .join(broadcast(model), Seq("event_type", "hr"))
          .groupBy("event_type", "hr")
          .agg(
            count(lit(1)).as("n_eval"),
            max("s_t").as("s_t"), max("c_t").as("c_t"),
            sum(abs(col("v100") * col("c_t") - col("s_t"))).as("err_num"))
          .selectExpr(
            // round(x, 4) spelled as round(x·10⁴)/10⁴ — DuckDB's own
            // evaluation order for fractional rounding, so the halfway
            // class agrees bit-for-bit: at sf0.001 one group hits
            // s_t/c_t·100 = 50.94875 whose double is just UNDER the
            // .5 grid line — DuckDB (std::round on the scaled double)
            // yields .9487 while Spark's round (BigDecimal on the
            // shortest decimal repr "50.94875", HALF_UP) yields .9488.
            // Rounding the SCALED product makes both engines see the
            // same double; verified ≡ round(x,4) over 2M DuckDB probes
            // and over every currently-matching oracle row.
            "event_type", "hr", "n_eval",
            "round(s_t / CAST(c_t * 100 AS DOUBLE) * 10000, 0) / 10000 AS baseline",
            "round(err_num / CAST(c_t * n_eval * 100 AS DOUBLE) * 10000, 0) / 10000 AS mae")
      },
      Some("""WITH ev AS (
             |  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS v100,
             |    hour(ts) AS hr, ts >= TIMESTAMP '2024-01-22 00:00:00' AS is_eval
             |  FROM events),
             |model AS (
             |  SELECT event_type, hr, CAST(sum(v100) AS BIGINT) AS s_t,
             |    CAST(count(*) AS BIGINT) AS c_t
             |  FROM ev WHERE NOT is_eval GROUP BY 1, 2)
             |SELECT ev.event_type, ev.hr,
             |  CAST(count(*) AS BIGINT) AS n_eval,
             |  round(max(s_t) / CAST(max(c_t) * 100 AS DOUBLE), 4) AS baseline,
             |  round(CAST(sum(abs(v100 * c_t - s_t)) AS BIGINT) / CAST(max(c_t) * count(*) * 100 AS DOUBLE), 4) AS mae
             |FROM ev JOIN model ON ev.event_type = model.event_type AND ev.hr = model.hr
             |WHERE is_eval GROUP BY 1, 2""".stripMargin)),

    // Marketing attribution: every purchase credits its FIRST-touch and
    // LAST-touch acquisition event (click/view) for the same user. The
    // carried-forward touch rides ONE user-partitioned window as an
    // integer-encoded running extreme — key = ts_ms·8 + type_code packs
    // "latest ts wins, code breaks same-ms ties" into a plain max/min
    // (no struct comparison, so both engines order identically). One
    // shuffle on user_id, then a |types|²-row rollup; time-to-convert
    // decodes arithmetically from the same key.
    EngineQuery(
      "evt_attribution",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, dir)
          .selectExpr("user_id", "ts", "event_id", "event_type",
            """CASE WHEN event_type IN ('click', 'view')
              |  THEN unix_millis(ts) * 8 + IF(event_type = 'click', 1L, 2L)
              |END AS touch_key""".stripMargin)
          .withColumn("last_touch", max("touch_key").over(w))
          .withColumn("first_touch", min("touch_key").over(w))
          .where(col("event_type") === "purchase" && col("last_touch").isNotNull)
          .selectExpr(
            "IF(last_touch % 8 = 1, 'click', 'view') AS last_touch_type",
            "IF(first_touch % 8 = 1, 'click', 'view') AS first_touch_type",
            "unix_millis(ts) - CAST(last_touch div 8 AS BIGINT) AS ms_since_touch")
          .groupBy("last_touch_type", "first_touch_type")
          .agg(
            count(lit(1)).as("n_purchases"),
            round(avg(col("ms_since_touch") / lit(60000.0)), 4).as("avg_min_to_convert"))
      },
      Some("""WITH tk AS (
             |  SELECT user_id, ts, event_id, event_type,
             |    CASE WHEN event_type IN ('click', 'view')
             |      THEN epoch_ms(ts) * 8 + CASE WHEN event_type = 'click' THEN 1 ELSE 2 END
             |    END AS touch_key
             |  FROM events),
             |c AS (SELECT event_type, epoch_ms(ts) AS pms,
             |    max(touch_key) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_touch,
             |    min(touch_key) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_touch
             |  FROM tk)
             |SELECT CASE WHEN last_touch % 8 = 1 THEN 'click' ELSE 'view' END AS last_touch_type,
             |  CASE WHEN first_touch % 8 = 1 THEN 'click' ELSE 'view' END AS first_touch_type,
             |  CAST(count(*) AS BIGINT) AS n_purchases,
             |  round(avg((pms - last_touch // 8) / 60000.0), 4) AS avg_min_to_convert
             |FROM c WHERE event_type = 'purchase' AND last_touch IS NOT NULL
             |GROUP BY 1, 2""".stripMargin)),

    // Shuffle-key skew diagnosis — the "know your keys before you run
    // the join" report: per-key row counts reduced to scalar
    // concentration metrics. Exact integer arithmetic throughout: HHI's
    // Σcnt² stays BIGINT until ONE final division; the top-10 mass is a
    // TakeOrdered(10) (never a global sort); no window, no percentile —
    // every metric is a scalar aggregate that scales to any key count.
    EngineQuery(
      "dq_skew_report",
      (s, dir) => {
        val counts = events(s, dir).groupBy("user_id")
          .agg(count(lit(1)).as("cnt"))
        val top10 = counts
          .orderBy(col("cnt").desc, col("user_id"))
          .limit(10)
          .agg(sum("cnt").as("top10_rows"))
        counts.agg(
            count(lit(1)).as("n_keys"),
            sum("cnt").as("total_rows"),
            max("cnt").as("max_cnt"),
            sum(col("cnt") * col("cnt")).as("sum_sq"))
          .crossJoin(broadcast(top10))
          .selectExpr(
            "n_keys", "total_rows", "max_cnt",
            "round(total_rows / CAST(n_keys AS DOUBLE), 4) AS avg_cnt",
            "round(max_cnt / (total_rows / CAST(n_keys AS DOUBLE)), 4) AS skew_ratio",
            "round(top10_rows / CAST(total_rows AS DOUBLE), 6) AS top10_share",
            "round(sum_sq / (CAST(total_rows AS DOUBLE) * total_rows), 8) AS hhi")
      },
      Some("""WITH counts AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1),
             |t10 AS (SELECT CAST(sum(cnt) AS BIGINT) AS top10_rows FROM (
             |  SELECT cnt FROM counts ORDER BY cnt DESC, user_id LIMIT 10)),
             |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
             |    CAST(sum(cnt) AS BIGINT) AS total_rows,
             |    CAST(max(cnt) AS BIGINT) AS max_cnt,
             |    CAST(sum(cnt * cnt) AS BIGINT) AS sum_sq
             |  FROM counts)
             |SELECT n_keys, total_rows, max_cnt,
             |  round(total_rows / CAST(n_keys AS DOUBLE), 4) AS avg_cnt,
             |  round(max_cnt / (total_rows / CAST(n_keys AS DOUBLE)), 4) AS skew_ratio,
             |  round(top10_rows / CAST(total_rows AS DOUBLE), 6) AS top10_share,
             |  round(sum_sq / (CAST(total_rows AS DOUBLE) * total_rows), 8) AS hhi
             |FROM agg CROSS JOIN t10""".stripMargin)),

    // First-order Markov transition matrix over the same 24H-gap
    // sessions: P(next_type | cur_type) from one lag inside the session
    // window — the generative model behind the path mining (user-journey
    // simulation, next-event prediction baselines). Probabilities are
    // single integer-count ratios; the matrix is |types|² rows.
    EngineQuery(
      "evt_markov_transitions",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val wsid = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
        val pairs = events(s, dir)
          .withColumn("ms", unix_millis(col("ts")))
          .withColumn("prev_ms", lag("ms", 1).over(w))
          .withColumn("new_s",
            when(col("prev_ms").isNull || col("ms") - col("prev_ms") > 86400000L, 1L)
              .otherwise(0L))
          .withColumn("sid", sum("new_s").over(w))
          .withColumn("cur_type", lag("event_type", 1).over(wsid))
          .filter(col("cur_type").isNotNull)
          .select(col("cur_type"), col("event_type").as("next_type"))
        val counts = pairs.groupBy("cur_type", "next_type").agg(count(lit(1)).as("n"))
        val tot = counts.groupBy("cur_type").agg(sum("n").as("row_n"))
        counts.join(broadcast(tot), "cur_type")
          .selectExpr("cur_type", "next_type", "n",
            "round(CAST(n AS DOUBLE) / row_n, 6) AS p")
      },
      Some("""WITH x AS (
             |  SELECT user_id, ts, event_id, event_type, epoch_ms(ts) AS ms,
             |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
             |           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 86400000
             |         THEN 1 ELSE 0 END AS new_s
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sid AS (SELECT user_id, ts, event_id, event_type,
             |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM x),
             |pr AS (SELECT
             |    lag(event_type, 1) OVER ws AS cur_type, event_type AS next_type
             |  FROM sid
             |  WINDOW ws AS (PARTITION BY user_id, sid ORDER BY ts, event_id)),
             |c AS (SELECT cur_type, next_type, CAST(count(*) AS BIGINT) AS n
             |  FROM pr WHERE cur_type IS NOT NULL GROUP BY 1, 2),
             |t AS (SELECT cur_type, CAST(sum(n) AS BIGINT) AS row_n FROM c GROUP BY 1)
             |SELECT c.cur_type, c.next_type, c.n,
             |  round(CAST(c.n AS DOUBLE) / t.row_n, 6) AS p
             |FROM c JOIN t ON c.cur_type = t.cur_type""".stripMargin)),

    // Welch's t-statistic per event type against the 'view' baseline —
    // the A/B-experiment readout. Determinism via the decimal-grain
    // moment technique (evt_value_hour_corr): Σv rounded to 2 and Σv²
    // to 4 decimals are EXACT (2-decimal values), then both engines
    // derive mean/variance/t from identical expression text — sqrt is
    // correctly rounded under IEEE-754, so the doubles match bitwise.
    // One aggregation pass, baseline broadcast back.
    EngineQuery(
      "evt_ab_welch",
      (s, dir) => {
        val a = events(s, dir).filter(col("value").isNotNull)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            round(sum("value"), 2).as("s1"),
            round(sum(col("value") * col("value")), 4).as("s2"))
        val base = a.filter(col("event_type") === "view")
          .select(col("n").as("bn"), col("s1").as("bs1"), col("s2").as("bs2"))
        a.filter(col("event_type") =!= "view")
          .crossJoin(broadcast(base))
          .selectExpr("event_type", "n",
            "round(s1 / n - bs1 / bn, 6) AS mean_diff",
            "round((s1 / n - bs1 / bn) / sqrt(((s2 - s1 * s1 / n) / (n - 1)) / n + ((bs2 - bs1 * bs1 / bn) / (bn - 1)) / bn), 6) AS welch_t")
      },
      Some("""WITH a AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |    round(sum(value), 2) AS s1, round(sum(value * value), 4) AS s2
             |  FROM events WHERE value IS NOT NULL GROUP BY 1),
             |b AS (SELECT n AS bn, s1 AS bs1, s2 AS bs2 FROM a WHERE event_type = 'view')
             |SELECT event_type, n,
             |  round(s1 / n - bs1 / bn, 6) AS mean_diff,
             |  round((s1 / n - bs1 / bn) / sqrt(((s2 - s1 * s1 / n) / (n - 1)) / n + ((bs2 - bs1 * bs1 / bn) / (bn - 1)) / bn), 6) AS welch_t
             |FROM a, b WHERE event_type <> 'view'""".stripMargin)),

    // Distribution-drift detection: χ² distance between each variant's
    // unit-bin value histogram and the 'view' baseline — the monitoring
    // check a training pipeline runs before trusting a new data slice.
    // Every probability is a ratio of integer counts (identical division
    // text both engines) and the per-bin terms sum through the
    // ORDER-FREE quantized-integer sum (ExactSum.qsum, r12 — formerly a
    // bin-ordered collect_list fold whose per-group array grew with the
    // bin count): |term| ≤ 2, so the i64 never overflows, partial
    // aggregation is back on, and per-group state is one i64. Spine =
    // variants × observed bins, generated from two tiny aggregates —
    // the full-data work is one (type, bin) count.
    EngineQuery(
      "evt_drift_chi2",
      (s, dir) => {
        val e = events(s, dir).filter(col("value").isNotNull)
          .withColumn("b", floor(col("value")).cast("long"))
        val counts = e.groupBy("event_type", "b").agg(count(lit(1)).as("c"))
        val tot = e.groupBy("event_type").agg(count(lit(1)).as("n"))
        val vb = counts.filter(col("event_type") === "view")
          .select(col("b"), col("c").as("cv"))
        val nv = tot.filter(col("event_type") === "view")
          .select(col("n").as("n_v"))
        val spine = counts.select("event_type").distinct()
          .filter(col("event_type") =!= "view")
          .crossJoin(counts.select("b").distinct())
        val terms = spine
          .join(counts, Seq("event_type", "b"), "left")
          .join(vb, Seq("b"), "left")
          .join(broadcast(tot), Seq("event_type"))
          .crossJoin(broadcast(nv))
          .withColumn("c", coalesce(col("c"), lit(0L)))
          .withColumn("cv", coalesce(col("cv"), lit(0L)))
          .filter(col("c") + col("cv") > 0)
          .selectExpr("event_type", "b",
            "(CAST(c AS DOUBLE) / n - CAST(cv AS DOUBLE) / n_v) * (CAST(c AS DOUBLE) / n - CAST(cv AS DOUBLE) / n_v) / (CAST(c AS DOUBLE) / n + CAST(cv AS DOUBLE) / n_v) AS term")
        terms.groupBy("event_type")
          .agg(count(lit(1)).as("n_bins"),
            expr(ExactSum.qsum("term")).as("chi2q"))
          .selectExpr("event_type", "n_bins", "round(chi2q, 6) AS chi2")
      },
      Some(s"""WITH e AS (SELECT event_type, CAST(floor(value) AS BIGINT) AS b
             |  FROM events WHERE value IS NOT NULL),
             |counts AS (SELECT event_type, b, CAST(count(*) AS BIGINT) AS c
             |  FROM e GROUP BY 1, 2),
             |tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1),
             |vb AS (SELECT b, c AS cv FROM counts WHERE event_type = 'view'),
             |nv AS (SELECT n AS n_v FROM tot WHERE event_type = 'view'),
             |spine AS (SELECT t.event_type, ab.b FROM
             |  (SELECT DISTINCT event_type FROM counts WHERE event_type <> 'view') t
             |  CROSS JOIN (SELECT DISTINCT b FROM counts) ab),
             |terms AS (SELECT s.event_type, s.b,
             |    (CAST(coalesce(c.c, 0) AS DOUBLE) / tot.n - CAST(coalesce(vb.cv, 0) AS DOUBLE) / nv.n_v) * (CAST(coalesce(c.c, 0) AS DOUBLE) / tot.n - CAST(coalesce(vb.cv, 0) AS DOUBLE) / nv.n_v) / (CAST(coalesce(c.c, 0) AS DOUBLE) / tot.n + CAST(coalesce(vb.cv, 0) AS DOUBLE) / nv.n_v) AS term
             |  FROM spine s
             |  LEFT JOIN counts c ON c.event_type = s.event_type AND c.b = s.b
             |  LEFT JOIN vb ON vb.b = s.b
             |  JOIN tot ON tot.event_type = s.event_type
             |  CROSS JOIN nv
             |  WHERE coalesce(c.c, 0) + coalesce(vb.cv, 0) > 0)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n_bins,
             |  round(${ExactSum.qsum("term")}, 6) AS chi2
             |FROM terms GROUP BY event_type""".stripMargin)),

    // CUSUM changepoint detection over the purchase-value stream
    // (Page 1954): the classic recurrence S_t = max(0, S_{t-1} + d_t)
    // LOOKS inherently sequential, but has the closed form
    // S_t = P_t − min_{k≤t} P_k over the deviation prefix sums P — so
    // the detector becomes two parallel scans (SequencePack's two-pass
    // prefix sum + running min/max), never a global window. Values are
    // quantized to the 1e-3 grain ONCE (floor, identical in both
    // engines) and everything downstream is exact i64 arithmetic: the
    // target is the integer floor-mean, deviations/prefixes/extremes
    // stay BIGINT end-to-end, so the result is hash-exact with zero
    // float drift. i64 headroom: |P| ≤ n·max|d| ≈ 5e5·n — overflow
    // needs ~2e13 rows in ONE monitored stream; segment the scan window
    // long before that. Output: the max upward and downward CUSUM
    // statistics and their first-attainment timestamps (the changepoint
    // estimates), one row.
    EngineQuery(
      "evt_cusum_changepoint",
      (s, dir) => {
        val e = events(s, dir).where(col("event_type") === "purchase")
          .select(unix_millis(col("ts")).as("ms"), col("event_id"),
            floor(col("value") * 1000).cast("long").as("x"))
        // scalar stats: one row collected (bounded). floorDiv, not /: the
        // oracle's `//` floors toward -inf, Scala's / truncates toward 0
        // — they differ on a negative sum (refund-heavy streams).
        val st = e.agg(sum("x").as("sx"), count(lit(1)).as("n")).head()
        val n = st.getLong(1)
        require(n > 0, "evt_cusum_changepoint: no rows in the monitored stream")
        val k = Math.floorDiv(st.getLong(0), n)
        val d = e.select(col("ms"), col("event_id"), (col("x") - lit(k)).as("d"))
        val p = graft.text.SequencePack
          .withStartOffsets(d, Seq("ms", "event_id"), "d", 32)
          .select(col("ms"), col("event_id"), (col("start_off") + col("d")).as("p"))
        // least/greatest with 0 folds the EMPTY prefix P_0 = 0 into the
        // running extreme, making s_up exactly Page's recurrence
        // S_t = max(0, S_{t-1} + d_t) (SequencePackSpec pins the identity).
        val scan = graft.text.SequencePack
          .withRunningMinMax(p, Seq("ms", "event_id"), "p", 32)
          .select(col("ms"),
            (col("p") - least(col("run_min"), lit(0L))).as("s_up"),
            (greatest(col("run_max"), lit(0L)) - col("p")).as("s_dn"))
        val mx = scan.agg(max("s_up").as("mu"), max("s_dn").as("md"))
        scan.join(broadcast(mx))
          .agg(
            max(lit(n)).as("n"), max(lit(k)).as("k_q"),
            max("mu").as("max_cusum_up"),
            min(when(col("s_up") === col("mu"), col("ms"))).as("up_change_ms"),
            max("md").as("max_cusum_dn"),
            min(when(col("s_dn") === col("md"), col("ms"))).as("dn_change_ms"))
      },
      Some("""WITH e AS (SELECT epoch_ms(ts) AS ms, event_id,
             |    CAST(floor(value * 1000) AS BIGINT) AS x
             |  FROM events WHERE event_type = 'purchase'),
             |t AS (SELECT CAST(sum(x) AS BIGINT) // CAST(count(*) AS BIGINT) AS k,
             |    CAST(count(*) AS BIGINT) AS n FROM e),
             |p AS (SELECT ms, event_id,
             |    CAST(sum(x - t.k) OVER (ORDER BY ms, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p
             |  FROM e CROSS JOIN t),
             |sc AS (SELECT ms,
             |    p - least(CAST(min(p) OVER (ORDER BY ms, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT), 0) AS s_up,
             |    greatest(CAST(max(p) OVER (ORDER BY ms, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT), 0) - p AS s_dn
             |  FROM p),
             |m AS (SELECT CAST(max(s_up) AS BIGINT) AS mu,
             |    CAST(max(s_dn) AS BIGINT) AS md FROM sc)
             |SELECT t.n AS n, t.k AS k_q,
             |  m.mu AS max_cusum_up,
             |  (SELECT CAST(min(ms) AS BIGINT) FROM sc WHERE sc.s_up = m.mu) AS up_change_ms,
             |  m.md AS max_cusum_dn,
             |  (SELECT CAST(min(ms) AS BIGINT) FROM sc WHERE sc.s_dn = m.md) AS dn_change_ms
             |FROM t CROSS JOIN m""".stripMargin)),

    // Pareto concentration (the 80/20 readout): the minimum number of
    // heaviest users covering ≥80% of all events — capacity planning's
    // "how top-heavy is the workload". NO global ranking over users:
    // per-user counts collapse to a count-of-counts histogram (domain
    // bounded by max per-user activity, never user count), the
    // cumulation windows over THAT bounded domain (the quantile_bins
    // pattern), and the mid-bucket crossing resolves by integer
    // ceiling arithmetic — everything exact, one user-keyed shuffle.
    EngineQuery(
      "evt_pareto_users",
      (s, dir) => {
        val per = events(s, dir).groupBy("user_id").agg(count(lit(1)).as("c"))
        val coc = per.groupBy("c").agg(count(lit(1)).as("nu"))
        val w = Window.orderBy(col("c").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = coc
          .withColumn("cum_ev", sum(col("c") * col("nu")).over(w))
          .withColumn("cum_us", sum(col("nu")).over(w))
        val tot = per.agg(sum("c").as("tot_ev"), count(lit(1)).as("tot_us"))
        cum.crossJoin(broadcast(tot))
          .filter(col("cum_ev") * 5 >= col("tot_ev") * 4)
          .orderBy(col("c").desc).limit(1)
          .selectExpr("tot_us AS n_users", "tot_ev AS n_events",
            """(cum_us - nu) + (4 * tot_ev - 5 * (cum_ev - c * nu) + 5 * c - 1)
              | DIV (5 * c) AS users_for_80pct""".stripMargin.replace("\n", ""))
          .withColumn("user_share_pct",
            col("users_for_80pct").cast("double") * lit(100.0) /
              col("n_users").cast("double"))
      },
      Some("""WITH per AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1),
             |coc AS (SELECT c, count(*) AS nu FROM per GROUP BY c),
             |cum AS (SELECT c, nu,
             |    sum(c * nu) OVER (ORDER BY c DESC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_ev,
             |    sum(nu) OVER (ORDER BY c DESC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_us
             |  FROM coc),
             |t AS (SELECT sum(c) AS tot_ev, count(*) AS tot_us FROM per),
             |x AS (SELECT cum.*, t.tot_ev, t.tot_us FROM cum, t
             |  WHERE cum_ev * 5 >= tot_ev * 4
             |  ORDER BY c DESC LIMIT 1)
             |SELECT CAST(tot_us AS BIGINT) AS n_users,
             |  CAST(tot_ev AS BIGINT) AS n_events,
             |  CAST((cum_us - nu) + (4 * tot_ev - 5 * (cum_ev - c * nu) + 5 * c - 1)
             |    // (5 * c) AS BIGINT) AS users_for_80pct,
             |  CAST((cum_us - nu) + (4 * tot_ev - 5 * (cum_ev - c * nu) + 5 * c - 1)
             |    // (5 * c) AS DOUBLE) * 100.0 / CAST(tot_us AS DOUBLE) AS user_share_pct
             |FROM x""".stripMargin)),

    // Interval union per user (gaps-and-islands MERGE): each event opens
    // a 5-minute activity interval; overlaps merge, and the user's TRUE
    // active time is the summed length of the merged islands — the
    // billing/engagement metric a raw Σ durations double-counts. A new
    // island starts where ts exceeds the running max of previous ends
    // (one user-keyed window — partition cardinality ∝ users); island
    // totals are exact ms integers. The overlap-aware twin of
    // evt_max_concurrency's sweep.
    EngineQuery(
      "evt_active_time_merge",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val iv = events(s, dir)
          .selectExpr("user_id", "event_id", "ts",
            "unix_millis(ts) AS s_ms", "unix_millis(ts) + 300000 AS e_ms")
          .withColumn("run_end", max("e_ms").over(w))
          .withColumn("prev_end", lag("run_end", 1).over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")))
          .withColumn("new_isl",
            when(col("prev_end").isNull || col("s_ms") > col("prev_end"), 1L)
              .otherwise(0L))
          .withColumn("isl", sum("new_isl").over(w))
        iv.groupBy("user_id", "isl")
          .agg(min("s_ms").as("i_start"), max("e_ms").as("i_end"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_islands"),
            sum(col("i_end") - col("i_start")).as("active_ms"))
      },
      Some("""WITH iv AS (SELECT user_id, event_id, ts,
             |    epoch_ms(ts) AS s_ms, epoch_ms(ts) + 300000 AS e_ms
             |  FROM events),
             |r0 AS (SELECT user_id, ts, event_id, s_ms, e_ms,
             |    max(e_ms) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_end
             |  FROM iv),
             |r AS (SELECT user_id, ts, event_id, s_ms, e_ms,
             |    lag(run_end, 1) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS prev_end
             |  FROM r0),
             |f AS (SELECT user_id, ts, event_id, s_ms, e_ms,
             |    CASE WHEN prev_end IS NULL OR s_ms > prev_end THEN 1 ELSE 0 END AS new_isl
             |  FROM r),
             |g AS (SELECT user_id, s_ms, e_ms,
             |    sum(new_isl) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
             |  FROM f),
             |i AS (SELECT user_id, isl, min(s_ms) AS i_start, max(e_ms) AS i_end
             |  FROM g GROUP BY 1, 2)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
             |  CAST(sum(i_end - i_start) AS BIGINT) AS active_ms
             |FROM i GROUP BY user_id""".stripMargin)),

    // Day-of-week × hour-of-day activity heatmap — the ops-dashboard
    // readout behind load forecasting and maintenance-window choice.
    // Both axes derive from INTEGER epoch arithmetic (epoch-day % 7,
    // epoch-hour % 24) rather than each engine's calendar functions
    // (Spark's dayofweek is 1=Sunday, DuckDB's 0=Sunday — the classic
    // off-by-one); dow 0 = Thursday (1970-01-01). One (dow, hour)
    // count with map-side combine — output fixed at ≤168 cells at any
    // event volume.
    EngineQuery(
      "evt_activity_heatmap",
      (s, dir) =>
        events(s, dir)
          .selectExpr(
            "(unix_millis(ts) DIV 86400000L) % 7 AS dow",
            "(unix_millis(ts) DIV 3600000L) % 24 AS hod",
            "value")
          .groupBy("dow", "hod")
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("value_centis")),
      Some("""SELECT (epoch_ms(ts) // 86400000) % 7 AS dow,
             |  (epoch_ms(ts) // 3600000) % 24 AS hod,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_centis
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // Per-type hourly-volume trend by exact least-squares: y = events per
    // hour over the DENSE hourly spine (zero-filled — an OLS on observed
    // hours only would bias every sparse type upward), x = hours since
    // the global min hour. All four moments (Σx, Σy, Σxy, Σx²) are exact
    // BIGINTs — slope and intercept each touch floating point in exactly
    // ONE division at the end, so both engines agree bitwise. Work: one
    // (type, hour) count with map-side combine + a |types|-row moment
    // rollup; the spine generates from a broadcast 1-row bounds agg —
    // nothing here grows faster than hours × types at any event volume.
    EngineQuery(
      "evt_trend_ols",
      (s, dir) => {
        val e = events(s, dir)
          .withColumn("hr", expr("unix_millis(ts) DIV 3600000L"))
        val bounds = e.agg(min("hr").as("lo"), max("hr").as("hi"))
        val types = e.select("event_type").distinct()
        val spine = types.crossJoin(broadcast(bounds))
          .selectExpr("event_type", "explode(sequence(lo, hi)) AS hr", "lo")
        val counts = e.groupBy("event_type", "hr").agg(count(lit(1)).as("y"))
        val m = spine.join(counts, Seq("event_type", "hr"), "left")
          .select(col("event_type"), (col("hr") - col("lo")).as("x"),
            coalesce(col("y"), lit(0L)).as("y"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
        val slope = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
        m.select(col("event_type"), col("n"), col("sy").as("n_events"),
          slope.as("slope_per_hour"),
          ((col("sy").cast("double") - slope * col("sx").cast("double")) /
            col("n").cast("double")).as("intercept"))
      },
      Some("""WITH e AS (SELECT event_type, epoch_ms(ts) // 3600000 AS hr FROM events),
             |b AS (SELECT min(hr) AS lo, max(hr) AS hi FROM e),
             |t AS (SELECT DISTINCT event_type FROM e),
             |spine AS (SELECT event_type, unnest(range(lo, hi + 1)) AS hr, lo FROM t, b),
             |c AS (SELECT event_type, hr, count(*) AS y FROM e GROUP BY 1, 2),
             |f AS (SELECT s.event_type, s.hr - s.lo AS x, coalesce(c.y, 0) AS y
             |  FROM spine s LEFT JOIN c ON s.event_type = c.event_type AND s.hr = c.hr),
             |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
             |  FROM f GROUP BY 1)
             |SELECT event_type, n, sy AS n_events,
             |  CAST(n * sxy - sx * sy AS DOUBLE) /
             |    CAST(n * sxx - sx * sx AS DOUBLE) AS slope_per_hour,
             |  (CAST(sy AS DOUBLE) - (CAST(n * sxy - sx * sy AS DOUBLE) /
             |    CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
             |    / CAST(n AS DOUBLE) AS intercept
             |FROM m""".stripMargin))
  )
}
