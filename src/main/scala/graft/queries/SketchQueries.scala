package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSessions.tablePath
import graft.text.TextAnalysis.{hash60Duck, hash60Spark}

/** Sketch operators, oracle-gated. Sketches use engine-private hash
  * functions in stock Spark (`approx_count_distinct`, `approx_percentile`)
  * which no external oracle can replay — these formulations keep the same
  * bounded-state, mergeable shape while hashing through md5, so the
  * estimates themselves sit behind the DuckDB correctness gate:
  *
  *  - KMV distinct-count, global: the k smallest distinct hashes via
  *    sort-limit — Spark plans TakeOrderedAndProject (per-partition top-k,
  *    merged on the driver: nothing shuffles but k values per partition).
  *  - KMV distinct-count, per group: the custom `kmv_distinct` Catalyst
  *    aggregate (graft.sketch.KmvDistinct) — bounded per-group state,
  *    associative merge, map-side partial aggregation.
  *  - Quantiles over a fixed-width histogram: unit-width value bins +
  *    one cumulative window over the (bounded) histogram, reading three
  *    quantiles in a single pass — the two-pass exact sort is replaced by
  *    one narrow aggregation at 100 TB.
  */
object SketchQueries extends QueryModule {

  private def lineitem(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(tablePath(dir, "lineitem"))

  /** 2^60 as an exact double; hashes are uniform on [0, 2^60). */
  private val HashSpace = 1.152921504606846976e18

  override def queries: Seq[EngineQuery] = Seq(

    // Global KMV built from existing operators: distinct hashes -> global
    // top-k (TakeOrderedAndProject) -> estimator. exact_distinct rides
    // along to show the estimate lands near truth.
    EngineQuery(
      "sketch_kmv_distinct",
      (s, dir) => {
        val k = 1024
        val li = lineitem(s, dir)
        val kept = li
          .selectExpr(s"${hash60Spark("CAST(l_orderkey AS STRING)")} AS h")
          .distinct().orderBy("h").limit(k)
        kept.agg(count(lit(1)).as("n_kept"), max("h").as("max_h"))
          .crossJoin(li.agg(countDistinct("l_orderkey").as("exact_distinct")))
          .select(
            col("n_kept"),
            when(col("n_kept") < k, col("n_kept").cast("double"))
              .otherwise(lit((k - 1).toDouble * HashSpace) / col("max_h").cast("double"))
              .as("est_distinct"),
            col("exact_distinct"))
      },
      Some(s"""WITH h AS (
             |  SELECT DISTINCT ${hash60Duck("CAST(l_orderkey AS VARCHAR)")} AS h
             |  FROM lineitem),
             |kept AS (SELECT h FROM h ORDER BY h LIMIT 1024),
             |s AS (SELECT CAST(count(*) AS BIGINT) AS n_kept, max(h) AS max_h FROM kept),
             |e AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct
             |      FROM lineitem)
             |SELECT n_kept,
             |  CASE WHEN n_kept < 1024 THEN CAST(n_kept AS DOUBLE)
             |       ELSE (1023.0 * 1152921504606846976.0) / CAST(max_h AS DOUBLE) END
             |    AS est_distinct,
             |  exact_distinct
             |FROM s, e""".stripMargin)),

    // Per-group KMV through the custom Catalyst aggregate. The oracle
    // replays the sketch exactly: k smallest distinct hashes per group via
    // row_number, then the same estimator arithmetic.
    EngineQuery(
      "sketch_kmv_groups",
      (s, dir) =>
        lineitem(s, dir)
          .withColumn("h", expr(hash60Spark("CAST(l_orderkey AS STRING)")))
          .groupBy("l_returnflag")
          .agg(
            expr("kmv_distinct(h, 256)").as("est_distinct"),
            countDistinct("l_orderkey").as("exact_distinct")),
      Some(s"""WITH h AS (
             |  SELECT DISTINCT l_returnflag AS g,
             |    ${hash60Duck("CAST(l_orderkey AS VARCHAR)")} AS h
             |  FROM lineitem),
             |r AS (
             |  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM h),
             |s AS (SELECT g, count(*) AS n, max(h) AS max_h FROM r WHERE rn <= 256 GROUP BY g),
             |e AS (SELECT l_returnflag AS g, CAST(count(DISTINCT l_orderkey) AS BIGINT)
             |        AS exact_distinct FROM lineitem GROUP BY 1)
             |SELECT s.g AS l_returnflag,
             |  CASE WHEN s.n < 256 THEN CAST(s.n AS DOUBLE)
             |       ELSE (255.0 * 1152921504606846976.0) / CAST(max_h AS DOUBLE) END
             |    AS est_distinct,
             |  e.exact_distinct
             |FROM s JOIN e ON s.g = e.g""".stripMargin)),

    // Heavy hitters via Misra-Gries candidates + exact verify (the
    // candidates -> exact-verify pattern the LSH dedup path uses):
    // languages above 1/4 of the corpus — only `en` (~44%) qualifies, so
    // the exact pass genuinely prunes the candidates. Integer-exact
    // threshold (c*4 > n): no float tie can flip a value between engines.
    EngineQuery(
      "sketch_heavy_hitters",
      (s, dir) =>
        graft.sketch.Sketches.heavyHitters(
          s.read.parquet(graft.SparkSessions.tablePath(dir, "documents")),
          col("lang"),
          den = 4),
      Some("""SELECT lang AS v, CAST(count(*) AS BIGINT) AS c
             |FROM documents
             |GROUP BY 1
             |HAVING count(*) * 4 > (SELECT count(*) FROM documents)""".stripMargin)),

    // Grouped histogram quantiles: same bounded-histogram sketch, one
    // cumulative window PER GROUP — grouped p50/p90/p99 in a single pass
    // with state bounded by |groups| × |bins|, never a per-group sort.
    EngineQuery(
      "sketch_quantile_groups",
      (s, dir) => {
        val li = lineitem(s, dir)
        val hist = li
          .groupBy(col("l_returnflag"), floor(col("l_extendedprice")).as("bin"))
          .agg(count(lit(1)).as("c"))
        val cum = hist.withColumn("cum", sum("c").over(
          Window.partitionBy("l_returnflag").orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val n = li.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        val qs = s.range(1).select(
          explode(array(lit(0.5), lit(0.9), lit(0.99))).as("p"))
        cum.join(n, "l_returnflag")
          .join(broadcast(qs), col("cum") >= col("p") * col("n"))
          .groupBy("l_returnflag", "p").agg(min("bin").as("approx"))
      },
      Some("""WITH b AS (
             |  SELECT l_returnflag, CAST(floor(l_extendedprice) AS BIGINT) AS bin,
             |    count(*) AS c
             |  FROM lineitem GROUP BY 1, 2),
             |cum AS (
             |  SELECT l_returnflag, bin, CAST(sum(c) OVER (PARTITION BY l_returnflag
             |    ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS BIGINT) AS cum
             |  FROM b),
             |n AS (SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1),
             |q AS (SELECT CAST(p AS DOUBLE) AS p FROM (VALUES (0.5), (0.9), (0.99)) v(p))
             |SELECT c.l_returnflag, p, min(bin) AS approx
             |FROM cum c JOIN n ON c.l_returnflag = n.l_returnflag CROSS JOIN q
             |WHERE cum >= p * n.n
             |GROUP BY 1, 2""".stripMargin)),

    // Histogram-sketch quantiles: unit-width bins of l_extendedprice, one
    // cumulative window over the bounded histogram, three quantiles read
    // from the same cumulative counts. Quantile thresholds are cast to
    // DOUBLE on both sides so p*n rounds identically (a DECIMAL literal in
    // DuckDB would compare exactly where Spark's double rounds).
    EngineQuery(
      "sketch_quantile_bins",
      (s, dir) => {
        val li = lineitem(s, dir)
        val hist = li
          .groupBy(floor(col("l_extendedprice")).as("bin"))
          .agg(count(lit(1)).as("c"))
        val cum = hist
          .withColumn("cum", sum("c").over(
            Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .crossJoin(li.agg(count(lit(1)).as("n")))
        val qs = s.range(1).select(
          explode(array(lit(0.5), lit(0.9), lit(0.99))).as("p"))
        cum.join(broadcast(qs), col("cum") >= col("p") * col("n"))
          .groupBy("p").agg(min("bin").as("approx"))
      },
      Some("""WITH b AS (
             |  SELECT CAST(floor(l_extendedprice) AS BIGINT) AS bin, count(*) AS c
             |  FROM lineitem GROUP BY 1),
             |cum AS (
             |  SELECT bin, CAST(sum(c) OVER (ORDER BY bin
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
             |  FROM b),
             |n AS (SELECT count(*) AS n FROM lineitem),
             |q AS (SELECT CAST(p AS DOUBLE) AS p FROM (VALUES (0.5), (0.9), (0.99)) v(p))
             |SELECT p, min(bin) AS approx
             |FROM cum, n, q
             |WHERE cum >= p * n
             |GROUP BY p""".stripMargin)),

    // Count-Min point estimates, hash-checked INCLUDING the collisions:
    // the custom `cms_counters` aggregate (sketch/CountMin — 4×64 longs,
    // elementwise-add merge, so the state is partition-invariant) builds
    // the matrix in one bounded-state pass; estimates for the probe keys
    // read min-over-rows from the broadcast 1-row matrix. Row hashing is
    // the public md5/hash60 recipe with a row tag, so the oracle rebuilds
    // the IDENTICAL matrix from a plain GROUP BY — where the sketch
    // over-counts (cms_n > exact_n), the oracle over-counts the same.
    EngineQuery(
      "sketch_cms_counts",
      (s, dir) => {
        val ev = EventsQueries.events(s, dir)
        val counters = ev.agg(
          expr("cms_counters(CAST(user_id AS STRING), 4, 64)").as("cnt"))
        val probes = ev.filter(col("user_id") < 10)
          .groupBy("user_id")
          .agg(count(lit(1)).cast("long").as("exact_n"))
        val h = hash60Spark("concat(CAST(r AS STRING), ':', CAST(user_id AS STRING))")
        probes.crossJoin(broadcast(counters))
          .selectExpr(
            "user_id", "exact_n",
            s"aggregate(sequence(0, 3), CAST(9223372036854775807 AS BIGINT), " +
              s"(m, r) -> least(m, element_at(cnt, CAST(r * 64 + ($h % 64) AS INT) + 1))) AS cms_n")
      },
      Some(s"""WITH keys AS (SELECT CAST(user_id AS VARCHAR) AS k,
              |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
              |cells AS (SELECT t.r,
              |    (${hash60Duck("CAST(t.r AS VARCHAR) || ':' || k")} % 64) AS idx, n
              |  FROM keys CROSS JOIN range(0, 4) t(r)),
              |counters AS (SELECT r, idx, CAST(sum(n) AS BIGINT) AS cnt
              |  FROM cells GROUP BY r, idx),
              |probes AS (SELECT k, n FROM keys WHERE CAST(k AS BIGINT) < 10),
              |pc AS (SELECT p.k, p.n, c.cnt
              |  FROM probes p CROSS JOIN range(0, 4) t(r)
              |  JOIN counters c ON c.r = t.r
              |    AND c.idx = (${hash60Duck("CAST(t.r AS VARCHAR) || ':' || p.k")} % 64))
              |SELECT CAST(k AS BIGINT) AS user_id, n AS exact_n, min(cnt) AS cms_n
              |FROM pc GROUP BY k, n""".stripMargin)),

    // KMV set-OVERLAP estimation: |clickers ∩ purchasers| from two KMV
    // sketches alone (the sketch-algebra composition: union sketch =
    // k smallest of merged kept-sets; ρ = members of the union sketch
    // present in BOTH kept-sets; est∩ = ρ/|union sketch| · est∪). The
    // audience-overlap estimator — at 100 TB the two kept-sets are the
    // only state exchanged (k hashes each, broadcastable), never the
    // user sets themselves. exact_intersection rides along as truth.
    EngineQuery(
      "sketch_kmv_overlap",
      (s, dir) => {
        val k = 64 // << |users|: the ESTIMATOR branch, not the exact small-set branch, is what the oracle pins
        val ev = EventsQueries.events(s, dir)
        def kept(t: String) = ev.filter(col("event_type") === t)
          .selectExpr(s"${hash60Spark("CAST(user_id AS STRING)")} AS h")
          .distinct().orderBy("h").limit(k)
        val ka = kept("click")
        val kb = kept("purchase")
        val ku = ka.unionByName(kb).distinct().orderBy("h").limit(k)
        val su = ku.agg(count(lit(1)).as("n_u"), max("h").as("max_u"))
        val nboth = ku.join(ka, Seq("h"), "left_semi").join(kb, Seq("h"), "left_semi")
          .agg(count(lit(1)).as("n_both"))
        val exact = ev.filter(col("event_type").isin("click", "purchase"))
          .groupBy("user_id")
          .agg(
            max(when(col("event_type") === "click", 1).otherwise(0)).as("c"),
            max(when(col("event_type") === "purchase", 1).otherwise(0)).as("p"))
          .filter(col("c") === 1 && col("p") === 1)
          .agg(count(lit(1)).as("exact_intersection"))
        // Identical expression TEXT on both engines: the single double
        // division and multiply execute in the same IEEE order.
        val estU = s"CASE WHEN n_u < $k THEN CAST(n_u AS DOUBLE) " +
          s"ELSE (${k - 1}.0 * 1152921504606846976.0) / CAST(max_u AS DOUBLE) END"
        su.crossJoin(nboth).crossJoin(exact).selectExpr(
          "n_u", "n_both",
          s"round($estU, 6) AS est_union",
          s"round((CAST(n_both AS DOUBLE) / CAST(n_u AS DOUBLE)) * ($estU), 6) AS est_intersection",
          "exact_intersection")
      },
      Some(s"""WITH ka AS (SELECT DISTINCT ${hash60Duck("CAST(user_id AS VARCHAR)")} AS h
             |    FROM events WHERE event_type = 'click' ORDER BY h LIMIT 64),
             |kb AS (SELECT DISTINCT ${hash60Duck("CAST(user_id AS VARCHAR)")} AS h
             |    FROM events WHERE event_type = 'purchase' ORDER BY h LIMIT 64),
             |ku AS (SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb)
             |    ORDER BY h LIMIT 64),
             |su AS (SELECT CAST(count(*) AS BIGINT) AS n_u, max(h) AS max_u FROM ku),
             |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_both FROM ku
             |    WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)),
             |ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_intersection FROM (
             |    SELECT user_id,
             |      max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
             |      max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
             |    FROM events WHERE event_type IN ('click', 'purchase')
             |    GROUP BY user_id) t WHERE c = 1 AND p = 1)
             |SELECT n_u, n_both,
             |  round(CASE WHEN n_u < 64 THEN CAST(n_u AS DOUBLE)
             |    ELSE (63.0 * 1152921504606846976.0) / CAST(max_u AS DOUBLE) END, 6) AS est_union,
             |  round((CAST(n_both AS DOUBLE) / CAST(n_u AS DOUBLE)) *
             |    (CASE WHEN n_u < 64 THEN CAST(n_u AS DOUBLE)
             |     ELSE (63.0 * 1152921504606846976.0) / CAST(max_u AS DOUBLE) END), 6)
             |    AS est_intersection,
             |  exact_intersection
             |FROM su, nb, ex""".stripMargin)),

    // The AQP rewrite end-to-end (plans/ApproxDistinctRule): a plain
    // count(DISTINCT …) aggregation, with the conf opting the plan into
    // the KMV sketch — the oracle replays the SKETCH (row_number over
    // distinct hashes + the same estimator arithmetic + the same
    // rounding), so a silent failure to rewrite would hash-MISMATCH
    // (the exact answers differ from the estimates at k=128).
    // The semantics-changing conf is set on a CLONED session
    // (s.newSession() — own SQLConf, shared context/cache/extensions),
    // so concurrently-compiling queries on the shared session can never
    // pick up the rewrite; memoized+persisted as before.
    EngineQuery(
      "sketch_approx_rewrite",
      (s, dir) => arCache.getOrElseUpdate(s, dir)({
        val s2 = s.newSession()
        s2.conf.set(graft.plans.ApproxDistinctRule.ConfKey, "128")
        val df = lineitem(s2, dir)
          .groupBy("l_linestatus")
          .agg(countDistinct(col("l_partkey")).as("nd_est"),
            count(lit(1)).as("n"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        df.count()
        df
      }),
      Some(s"""WITH h AS (
             |  SELECT DISTINCT l_linestatus AS g,
             |    ${hash60Duck("CAST(l_partkey AS VARCHAR)")} AS h
             |  FROM lineitem),
             |r AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM h),
             |s AS (SELECT g, count(*) AS n_kept, max(h) AS max_h FROM r WHERE rn <= 128 GROUP BY g),
             |c AS (SELECT l_linestatus AS g, CAST(count(*) AS BIGINT) AS n
             |  FROM lineitem GROUP BY 1)
             |SELECT s.g AS l_linestatus,
             |  CAST(round(CASE WHEN n_kept < 128 THEN CAST(n_kept AS DOUBLE)
             |    ELSE (127.0 * 1152921504606846976.0) / CAST(max_h AS DOUBLE) END, 0) AS BIGINT)
             |    AS nd_est,
             |  c.n
             |FROM s JOIN c ON s.g = c.g""".stripMargin)),

    // EXACT distinct counting with sketch-shaped state: roaring-style
    // fixed-width bitmaps (Spark's bitmap_* family, the Databricks
    // pattern for exact COUNT(DISTINCT) at warehouse scale). The key
    // space is carved into 32768-bit buckets (bitmap_bucket_number /
    // bitmap_bit_position); per (group, bucket) a 4 KB bitmap is OR-
    // aggregated WITH map-side partial merge — per-group state is
    // bounded by the live key range, never by row count — then
    // bucket popcounts sum to the exact distinct. Unlike the plain
    // count(DISTINCT) plan (Expand + re-shuffle of every raw value),
    // the shuffle carries only merged bitmaps; buckets are disjoint so
    // the final sum needs no cross-bucket dedup. The same bitmaps,
    // persisted per partition-grain, make the count INCREMENTALLY
    // maintainable — OR the new day's bitmaps in, never rescan.
    EngineQuery(
      "sketch_bitmap_distinct",
      (s, dir) =>
        lineitem(s, dir)
          // +1 keeps every key strictly positive: bitmap_bucket_number's
          // 1-indexed bucket formula and the oracle's integer division
          // agree only on positive keys (l_orderkey starts at 0 here).
          .select(col("l_returnflag"),
            expr("bitmap_bucket_number(l_orderkey + 1)").as("bkt"),
            expr("bitmap_bit_position(l_orderkey + 1)").as("pos"))
          .groupBy("l_returnflag", "bkt")
          .agg(expr("bitmap_construct_agg(pos)").as("bm"))
          .groupBy("l_returnflag")
          .agg(sum(expr("bitmap_count(bm)")).as("n_distinct"),
            count(lit(1)).as("n_buckets")),
      Some("""SELECT l_returnflag,
             |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_distinct,
             |  CAST(count(DISTINCT l_orderkey // 32768) AS BIGINT) AS n_buckets
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // Sliding-window EXACT distinct via bitmap algebra: per (day,
    // bucket) bitmaps OR-merge across each trailing-7-day window, then
    // popcounts sum — the naive formulation re-shuffles every raw
    // user_id once PER WINDOW (24× the data motion at daily grain);
    // this one shuffles each day's merged ≤4 KB bitmaps once and the
    // window fan-out is bounded by (windows × buckets), independent of
    // row count. The same persisted bitmaps answer any other window
    // length without touching the fact table again.
    EngineQuery(
      "sketch_sliding_distinct",
      (s, dir) => {
        val e = graft.queries.EventsQueries.events(s, dir)
          .select(
            expr("unix_millis(date_trunc('DAY', ts)) div 86400000").as("day"),
            expr("bitmap_bucket_number(user_id + 1)").as("bkt"),
            expr("bitmap_bit_position(user_id + 1)").as("pos"))
        val daily = e.groupBy("day", "bkt")
          .agg(expr("bitmap_construct_agg(pos)").as("bm"))
        val days = daily.select(col("day").as("w_day")).distinct()
        // Each day's bitmap EXPLODES into the ≤7 windows it serves —
        // a narrow bounded fan-out instead of a range join; the final
        // broadcast semi-join just drops phantom windows past the
        // observed day range (the days frame is calendar-sized).
        daily
          .withColumn("w_day", explode(sequence(col("day"), col("day") + 6L)))
          .groupBy("w_day", "bkt")
          .agg(expr("bitmap_or_agg(bm)").as("wbm"))
          .groupBy("w_day")
          .agg(sum(expr("bitmap_count(wbm)")).as("n_users_7d"))
          .join(broadcast(days), Seq("w_day"))
      },
      Some("""WITH e AS (
             |  SELECT CAST(epoch_ms(date_trunc('day', ts)) // 86400000 AS BIGINT) AS day,
             |         user_id
             |  FROM events),
             |d AS (SELECT DISTINCT day AS w_day FROM e)
             |SELECT d.w_day,
             |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users_7d
             |FROM d JOIN e ON e.day BETWEEN d.w_day - 6 AND d.w_day
             |GROUP BY d.w_day""".stripMargin))
  )

  private val arCache =
    new graft.tables.SessionMemo[String, DataFrame]
}
