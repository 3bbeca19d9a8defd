package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSessions.tablePath

/** Core analytical query surface over the driver testdata tables.
  *
  * These exercise the reference's SQL capability set (SURVEY.md §2.3:
  * scan+count, top-k, group-by aggregates, HAVING, multi-key group-by,
  * CASE, arithmetic, UNION ALL) on the TPC-H-ish corpus, shaped so every
  * result is deterministic (total order on any LIMIT; money sums rounded
  * so double accumulation order can't flip the hash).
  *
  * Scale notes: all aggregations are partial-aggregate-friendly (hash agg
  * with map-side combine), joins against dimension tables are broadcast
  * (dims are tiny at any SF), filters/projections are plain column refs so
  * Catalyst pushes them into the parquet scan.
  */
object AnalyticsQueries extends QueryModule {

  private def li(s: SparkSession, dir: String) = s.read.parquet(tablePath(dir, "lineitem"))
  private def ord(s: SparkSession, dir: String) = s.read.parquet(tablePath(dir, "orders"))
  private def cust(s: SparkSession, dir: String) = s.read.parquet(tablePath(dir, "customer"))
  private def t(s: SparkSession, dir: String, name: String) = s.read.parquet(tablePath(dir, name))

  /** Benford first-digit expected shares as a CASE over literals —
    * log₁₀(1+1/d) computed once HERE so both engines interpolate the
    * identical double text and neither evaluates a transcendental. */
  private val benfordCase: String =
    "CASE d " + (1 to 9).map(dd =>
      s"WHEN $dd THEN ${math.log10(1.0 + 1.0 / dd)}").mkString(" ") + " ELSE 0.0 END"

  /** One statement text for both engines (q42): aggregate FILTER. */
  private val Q42Sql =
    """SELECT o_orderpriority,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
      |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
      |    FILTER (WHERE o_orderkey % 2 = 0) AS BIGINT) AS even_cents,
      |  CAST(min(o_orderkey) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS min_open_key
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** One statement text for both engines (q44): a NAMED window (the
    * ANSI WINDOW clause) shared by several functions — the spelling
    * that keeps one sort for N window functions. Partitioned by
    * l_orderkey (cardinality ∝ corpus, never a constant key), rolled
    * up inside the same statement so the result is compact. */
  private val Q44Sql =
    """WITH r AS (
      |  SELECT l_returnflag,
      |    sum(l_quantity) OVER w AS run_qty,
      |    row_number() OVER w AS rn
      |  FROM lineitem
      |  WINDOW w AS (PARTITION BY l_orderkey
      |               ORDER BY l_linenumber, l_partkey, l_extendedprice, l_quantity
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(round(run_qty * 100, 0) AS BIGINT)) AS BIGINT) AS run_qty_cents,
      |  CAST(sum(rn) AS BIGINT) AS rank_mass
      |FROM r GROUP BY l_returnflag""".stripMargin

  /** One statement text for both engines (q45): bag-semantics set
    * operators (INTERSECT ALL keeps min multiplicity, EXCEPT ALL
    * subtracts multiplicities) — both engines plan these as a single
    * counted anti/semi aggregation, no row explosion. */
  private val Q45Sql =
    """WITH a AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'),
      |     b AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
      |SELECT 'intersect_all' AS op, CAST(count(*) AS BIGINT) AS n,
      |       CAST(count(DISTINCT k) AS BIGINT) AS nk
      |FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
      |UNION ALL
      |SELECT 'except_all', CAST(count(*) AS BIGINT),
      |       CAST(count(DISTINCT k) AS BIGINT)
      |FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)""".stripMargin

  /** One statement text for both engines (q48): lateral column aliases
    * — each derived metric references the previous one in the SAME
    * select list (cents → with_tax → per_unit-ish chain), exact in
    * integer arithmetic so the chain is hash-stable. */
  private val Q48Sql =
    """SELECT o_orderstatus,
      |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents,
      |  cents * 2 AS double_cents,
      |  double_cents + cents AS triple_cents,
      |  CAST(count(*) AS BIGINT) AS n,
      |  triple_cents / n AS triple_per_order
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  /** One statement text for both engines (q47): null-safe comparison
    * (ANSI IS [NOT] DISTINCT FROM) — the three-valued-logic footgun
    * spelled safely; a plain <> would silently drop every NULL row
    * from both filter counts. */
  private val Q47Sql =
    """WITH x AS (
      |  SELECT o_orderkey AS k,
      |         CASE WHEN o_orderkey % 10 = 0 THEN NULL
      |              ELSE o_orderstatus END AS s
      |  FROM orders)
      |SELECT
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(*) FILTER (WHERE s IS DISTINCT FROM 'O') AS BIGINT) AS n_not_open,
      |  CAST(count(*) FILTER (WHERE s IS NOT DISTINCT FROM NULL) AS BIGINT) AS n_masked,
      |  CAST(count(*) FILTER (WHERE s <> 'O') AS BIGINT) AS n_neq_naive
      |FROM x""".stripMargin

  /** One statement text for both engines (q38): GROUP BY ALL. */
  private val Q38Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(count(*) AS BIGINT) AS n,
      |  round(sum(l_extendedprice), 2) AS revenue
      |FROM lineitem GROUP BY ALL""".stripMargin

  override def queries: Seq[EngineQuery] = Seq(
    // Q1/Q3: scan + group-by aggregates (TPC-H Q1 shape).
    EngineQuery(
      "q1_agg",
      (s, dir) =>
        li(s, dir)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            round(sum("l_quantity"), 2).as("sum_qty"),
            round(sum("l_extendedprice"), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
            round(avg("l_quantity"), 4).as("avg_qty"),
            count(lit(1)).as("count_order")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base_price,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  count(*) AS count_order
             |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // Q2: sort + limit (top-k) with a total order for determinism.
    EngineQuery(
      "q2_topk",
      (s, dir) =>
        ord(s, dir)
          .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(10),
      Some("""SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
             |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin)),

    // Q4: HAVING (post-aggregation filter).
    EngineQuery(
      "q4_having",
      (s, dir) =>
        li(s, dir)
          .groupBy("l_orderkey")
          .agg(count(lit(1)).as("n_items"), round(sum("l_quantity"), 2).as("sum_qty"))
          .filter(col("n_items") >= 5),
      Some("""SELECT l_orderkey, count(*) AS n_items, round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem GROUP BY l_orderkey HAVING count(*) >= 5""".stripMargin)),

    // Q5: multi-key group-by with a broadcast dimension join + CASE (Q10).
    EngineQuery(
      "q5_multikey_join",
      (s, dir) => {
        val o = ord(s, dir)
        val c = cust(s, dir)
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy("c_mktsegment", "o_orderstatus")
          .agg(
            count(lit(1)).as("n_orders"),
            round(sum("o_totalprice"), 2).as("revenue"),
            sum(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)).as("n_urgent"))
      },
      Some("""SELECT c_mktsegment, o_orderstatus, count(*) AS n_orders,
             |  round(sum(o_totalprice), 2) AS revenue,
             |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment, o_orderstatus""".stripMargin)),

    // Skewed-key rollup via explicit two-phase salted aggregation
    // (graft.ops.SkewOps): 3 ultra-hot keys spread over 32 salts, then
    // re-aggregated — result identical to the direct group-by (integral
    // sums, so the regrouped summation order cannot drift).
    EngineQuery(
      "q3_salted_agg",
      (s, dir) =>
        graft.ops.SkewOps.saltedSumCount(
          li(s, dir), Seq("l_returnflag"), "l_quantity",
          col("l_orderkey") * 10 + col("l_linenumber"), 32)
          .select(col("l_returnflag"),
            round(col("sum_l_quantity"), 2).as("sum_qty"), col("n")),
      Some("""SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // Distribution window functions: percent_rank / cume_dist / ntile
    // over a priority-partitioned price ordering. percent_rank/cume_dist
    // are rational rank arithmetic over the price-only ordering (tie
    // groups get identical values by the SQL definitions in both
    // engines); ntile is NOT tie-stable — equal prices land in arbitrary
    // quartiles — so it runs over a second, totally-ordered window
    // (price, orderkey tiebreak), mirrored in the oracle.
    EngineQuery(
      "q23_dist_windows",
      (s, dir) => {
        val w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
        val wt = Window.partitionBy("o_orderpriority")
          .orderBy("o_totalprice", "o_orderkey")
        ord(s, dir)
          .filter(col("o_custkey") < 50)
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cume"),
            ntile(4).over(wt).as("quartile"))
      },
      Some("""SELECT o_orderkey, o_orderpriority, o_totalprice,
             |  round(percent_rank() OVER w, 6) AS pct_rank,
             |  round(cume_dist() OVER w, 6) AS cume,
             |  CAST(ntile(4) OVER wt AS INT) AS quartile
             |FROM orders WHERE o_custkey < 50
             |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice),
             |  wt AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)""".stripMargin)),

    // Explicit GROUPING SETS (beyond ROLLUP/CUBE): the two single-key
    // marginals without the grand total — only expressible as literal
    // grouping sets. SQL-text surface, grouping() flags distinguish the
    // all-rows NULL from a data NULL.
    EngineQuery(
      "q24_grouping_sets",
      (s, dir) => {
        li(s, dir).createOrReplaceTempView("q24_lineitem")
        s.sql("""SELECT l_returnflag, l_linestatus,
                |  round(sum(l_quantity), 2) AS sum_qty,
                |  CAST(count(*) AS BIGINT) AS n,
                |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
                |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status
                |FROM q24_lineitem
                |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
             |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin)),

    // TPC-H Q3 (shipping priority): revenue of unshipped orders for one
    // market segment — the classic 3-way join + group + top-k. Both
    // fact joins shuffle on their keys, customer broadcasts, top-10 is
    // TakeOrderedAndProject. Revenue = 2-decimal-grain sums, rounded.
    EngineQuery(
      "q27_tpch_q3",
      (s, dir) => {
        val c = cust(s, dir).filter(col("c_mktsegment") === "BUILDING")
        val o = ord(s, dir).filter(col("o_orderdate") < "1995-03-15")
        val l = li(s, dir).filter(col("l_shipdate") > "1995-03-15")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy("l_orderkey", "o_orderdate")
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey").asc)
          .limit(10)
      },
      Some("""SELECT l_orderkey, o_orderdate,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < DATE '1995-03-15'
             |  AND l_shipdate > DATE '1995-03-15'
             |GROUP BY l_orderkey, o_orderdate
             |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin)),

    // TPC-H Q10 (returned items): revenue lost to returns per customer,
    // top 20 — fact-fact join + broadcast dim + top-k.
    EngineQuery(
      "q28_tpch_q10",
      (s, dir) => {
        val l = li(s, dir).filter(col("l_returnflag") === "R")
        val o = ord(s, dir)
        val c = cust(s, dir)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy("c_custkey", "c_mktsegment")
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"), count(lit(1)).as("n_items"))
          .orderBy(col("revenue").desc, col("c_custkey").asc)
          .limit(20)
      },
      Some("""SELECT c_custkey, c_mktsegment,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
             |  count(*) AS n_items
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE l_returnflag = 'R'
             |GROUP BY c_custkey, c_mktsegment
             |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin)),

    // max_by / min_by (argmax aggregates): which order carries each
    // priority's highest/lowest price. Plain max_by ties are
    // engine-nondeterministic, so the ordering key is the composite
    // BIGINT price·100 (exact — 2-decimal grain) ·1e9 + orderkey:
    // totally ordered, ties impossible, same argument in both engines.
    EngineQuery(
      "q26_minmax_by",
      (s, dir) =>
        ord(s, dir)
          .selectExpr("o_orderpriority", "o_orderkey", "o_totalprice",
            "CAST(round(o_totalprice * 100, 0) AS BIGINT) * 1000000000 + o_orderkey AS ordkey")
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).cast("long").as("n"),
            expr("max_by(o_orderkey, ordkey)").as("top_order"),
            expr("min_by(o_orderkey, ordkey)").as("bottom_order"),
            round(max("o_totalprice"), 2).as("top_price")),
      Some("""WITH t AS (SELECT o_orderpriority, o_orderkey, o_totalprice,
             |    CAST(round(o_totalprice * 100, 0) AS BIGINT) * 1000000000 + o_orderkey AS ordkey
             |  FROM orders)
             |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
             |  max_by(o_orderkey, ordkey) AS top_order,
             |  min_by(o_orderkey, ordkey) AS bottom_order,
             |  round(max(o_totalprice), 2) AS top_price
             |FROM t GROUP BY o_orderpriority""".stripMargin)),

    // Correlated EXISTS / NOT EXISTS in SQL text (the subquery spelling
    // of q17's semi/anti joins — Catalyst rewrites both to the same
    // left-semi/left-anti physical joins): customers with an URGENT
    // order but no F-status order.
    EngineQuery(
      "q25_exists",
      (s, dir) => {
        ord(s, dir).createOrReplaceTempView("q25_orders")
        cust(s, dir).createOrReplaceTempView("q25_customer")
        s.sql("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
                |FROM q25_customer c
                |WHERE EXISTS (SELECT 1 FROM q25_orders o
                |              WHERE o.o_custkey = c.c_custkey
                |                AND o.o_orderpriority = '1-URGENT')
                |  AND NOT EXISTS (SELECT 1 FROM q25_orders o
                |                  WHERE o.o_custkey = c.c_custkey
                |                    AND o.o_orderstatus = 'F')
                |GROUP BY c_mktsegment""".stripMargin)
      },
      Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
             |FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey
             |                AND o.o_orderpriority = '1-URGENT')
             |  AND NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey
             |                    AND o.o_orderstatus = 'F')
             |GROUP BY c_mktsegment""".stripMargin)),

    // Skewed-key JOIN, SIZE-AWARE (SkewOps.adaptiveSkewJoin): the mode
    // derives from the optimizer's estimate of the dim side instead of
    // a static bet — broadcast-hash (no shuffle, so no hot reduce key)
    // while the dim fits the session threshold; plain shuffle join
    // under AQE's runtime skew split once it doesn't. The old static
    // salted spelling broadcast an 8×-REPLICATED dim side: it silently
    // flipped to sort-merge at sf1 and paid the replication on top
    // (16.5× on 10× data). Explicit static salting survives as
    // SkewOps.saltedJoin for skew known in advance (SkewJoinSpec).
    // Must be row-identical to the plain join — the oracle IS the
    // unsalted SQL. (Integral-valued quantity sums, so regrouped order
    // cannot drift.)
    EngineQuery(
      "q22_salted_join",
      (s, dir) => {
        val o = ord(s, dir)
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
        graft.ops.SkewOps.adaptiveSkewJoin(
            li(s, dir).select("l_orderkey", "l_linenumber", "l_quantity"),
            o, Seq("l_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            round(sum("l_quantity"), 2).as("sum_qty"))
      },
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
             |  round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority""".stripMargin)),

    // Five-way join through the dimension chain (TPC-H Q5 shape):
    // lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region, filter on region,
    // revenue by nation. Dimension sides broadcast; the two fact joins
    // shuffle on their keys with AQE picking build sides at runtime.
    EngineQuery(
      "q7_multiway_join",
      (s, dir) => {
        val l = li(s, dir); val o = ord(s, dir); val c = cust(s, dir)
        val n = t(s, dir, "nation"); val r = t(s, dir, "region")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .filter(r("r_name") === "ASIA")
          .groupBy(n("n_name").as("n_name"))
          .agg(
            count(lit(1)).as("n_items"),
            round(sum(col("l_extendedprice")), 2).as("revenue"))
      },
      Some("""SELECT n_name, CAST(count(*) AS BIGINT) AS n_items,
             |  round(sum(l_extendedprice), 2) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY n_name""".stripMargin)),

    // Part/supplier enrichment join (TPC-H Q9 shape, simplified):
    // revenue by part brand for one supplier nation.
    EngineQuery(
      "q9_part_supplier",
      (s, dir) => {
        val l = li(s, dir)
        val p = t(s, dir, "part"); val su = t(s, dir, "supplier")
        l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
          .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
          .groupBy(p("p_brand").as("p_brand"), su("s_nationkey").as("s_nationkey"))
          .agg(
            count(lit(1)).as("n_items"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("net_revenue"))
      },
      Some("""SELECT p_brand, s_nationkey, CAST(count(*) AS BIGINT) AS n_items,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS net_revenue
             |FROM lineitem
             |JOIN part ON l_partkey = p_partkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY p_brand, s_nationkey""".stripMargin)),

    // Analytic window functions: per-customer order sequence with
    // row_number, lag and a running sum (frame-ordered left fold — the
    // partial sums are bit-identical across engines because the frame
    // order is total and deterministic).
    EngineQuery(
      "q8_window_analytics",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        ord(s, dir)
          .filter(col("o_custkey") % 50 === 0)
          .select(
            col("o_custkey"), col("o_orderkey"),
            row_number().over(w).as("order_seq"),
            lag("o_totalprice", 1).over(w).as("prev_total"),
            sum("o_totalprice").over(
              w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
              .as("running_total"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(row_number() OVER w AS INT) AS order_seq,
             |  lag(o_totalprice, 1) OVER w AS prev_total,
             |  sum(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_total
             |FROM orders
             |WHERE o_custkey % 50 = 0
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin)),

    // Q12: UNION ALL of two count branches.
    EngineQuery(
      "q12_union_all",
      (s, dir) => {
        val a = ord(s, dir).agg(lit("orders").as("src"), count(lit(1)).as("n"))
        val b = li(s, dir).agg(lit("lineitem").as("src"), count(lit(1)).as("n"))
        a.unionByName(b)
      },
      Some("""SELECT 'orders' AS src, count(*) AS n FROM orders
             |UNION ALL SELECT 'lineitem' AS src, count(*) AS n FROM lineitem""".stripMargin)),

    // Grouping sets family (the Expand operator): ROLLUP with grouping_id
    // disambiguating subtotal rows from genuine NULL groups. Expand
    // multiplies rows BEFORE the aggregate, but partial aggregation still
    // applies per grouping set — one shuffle, map-side combined.
    EngineQuery(
      "q13_rollup",
      (s, dir) =>
        li(s, dir)
          .rollup("l_returnflag", "l_linestatus")
          .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"),
            grouping_id().as("gid")),
      Some("""SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)),

    EngineQuery(
      "q14_cube",
      (s, dir) =>
        ord(s, dir)
          .cube("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"),
            grouping_id().as("gid")),
      Some("""SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
             |  round(sum(o_totalprice), 2) AS total,
             |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
             |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin)),

    // Pivot: one aggregate per pivoted value — compiles to a single-pass
    // conditional aggregation (no self-joins), the shape the DuckDB dual
    // spells out explicitly.
    EngineQuery(
      "q15_pivot",
      (s, dir) =>
        li(s, dir)
          .groupBy("l_linestatus")
          .pivot("l_returnflag", Seq("A", "N", "R"))
          .agg(round(sum("l_quantity"), 2)),
      Some("""SELECT l_linestatus,
             |  round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS A,
             |  round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS N,
             |  round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS R
             |FROM lineitem GROUP BY l_linestatus""".stripMargin)),

    // Ranking-window family beyond q8's row_number/lag: ntile buckets,
    // percent_rank and cume_dist (both exact int/int divisions in double —
    // identical IEEE results in both engines), aggregated so the output
    // stays small while pinning every rank position.
    EngineQuery(
      "q16_ranking",
      (s, dir) =>
        ord(s, dir)
          .withColumn("q4", ntile(4).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("o_orderpriority")
              .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
          .withColumn("pr", percent_rank().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("o_orderpriority")
              .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
          .groupBy("o_orderpriority", "q4")
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"),
            max("pr").as("max_pr")),
      Some("""WITH r AS (
             |  SELECT o_orderpriority, o_totalprice,
             |    ntile(4) OVER w AS q4, percent_rank() OVER w AS pr
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_orderpriority
             |               ORDER BY o_totalprice DESC, o_orderkey))
             |SELECT o_orderpriority, CAST(q4 AS INT) AS q4, CAST(count(*) AS BIGINT) AS n,
             |  round(sum(o_totalprice), 2) AS total, max(pr) AS max_pr
             |FROM r GROUP BY 1, 2""".stripMargin)),

    // Semi/anti joins (EXISTS / NOT EXISTS): customers with vs without
    // urgent orders. Both plan as broadcast/shuffled semi joins — no
    // row multiplication, no distinct needed.
    EngineQuery(
      "q17_semi_anti",
      (s, dir) => {
        val urgent = ord(s, dir).filter(col("o_orderpriority") === "1-URGENT")
          .select("o_custkey")
        val c = cust(s, dir)
        val withU = c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_semi")
          .agg(lit("with_urgent").as("side"), count(lit(1)).as("n"),
            round(sum("c_acctbal"), 2).as("acctbal"))
        val without = c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
          .agg(lit("without_urgent").as("side"), count(lit(1)).as("n"),
            round(sum("c_acctbal"), 2).as("acctbal"))
        withU.unionByName(without)
      },
      Some("""SELECT 'with_urgent' AS side, CAST(count(*) AS BIGINT) AS n,
             |  round(sum(c_acctbal), 2) AS acctbal
             |FROM customer c WHERE EXISTS (SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
             |UNION ALL
             |SELECT 'without_urgent' AS side, CAST(count(*) AS BIGINT) AS n,
             |  round(sum(c_acctbal), 2) AS acctbal
             |FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')""".stripMargin)),

    // Correlated scalar subquery — Catalyst decorrelates it into a left
    // outer aggregate join (RewriteCorrelatedScalarSubquery), so the
    // per-customer "subquery" costs one keyed aggregate, not N probes.
    // Same SQL text runs on both engines.
    EngineQuery(
      "q18_corr_subquery",
      (s, dir) => {
        ord(s, dir).createOrReplaceTempView("q18_orders")
        cust(s, dir).createOrReplaceTempView("q18_customer")
        s.sql("""SELECT c_mktsegment,
                |  CAST(count(*) AS BIGINT) AS n,
                |  round(sum(max_order), 2) AS sum_max_order
                |FROM (
                |  SELECT c_mktsegment,
                |    (SELECT max(o_totalprice) FROM q18_orders o
                |     WHERE o.o_custkey = c.c_custkey) AS max_order
                |  FROM q18_customer c)
                |WHERE max_order IS NOT NULL
                |GROUP BY c_mktsegment""".stripMargin)
      },
      Some("""SELECT c_mktsegment,
             |  CAST(count(*) AS BIGINT) AS n,
             |  round(sum(max_order), 2) AS sum_max_order
             |FROM (
             |  SELECT c_mktsegment,
             |    (SELECT max(o_totalprice) FROM orders o
             |     WHERE o.o_custkey = c.c_custkey) AS max_order
             |  FROM customer c) t
             |WHERE max_order IS NOT NULL
             |GROUP BY c_mktsegment""".stripMargin)),

    // Set operators beyond UNION ALL: INTERSECT / EXCEPT (both dedup by
    // definition; Spark plans them as left-semi / left-anti aggregates).
    EngineQuery(
      "q19_setops",
      (s, dir) => {
        val urgent = ord(s, dir).filter(col("o_orderpriority") === "1-URGENT")
          .select("o_custkey")
        val high = ord(s, dir).filter(col("o_totalprice") > 200000.0)
          .select("o_custkey")
        val both = urgent.intersect(high)
          .agg(lit("urgent_and_high").as("side"), count(lit(1)).as("n"))
        val onlyU = urgent.except(high)
          .agg(lit("urgent_only").as("side"), count(lit(1)).as("n"))
        both.unionByName(onlyU)
      },
      Some("""WITH u AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
             |h AS (SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0)
             |SELECT 'urgent_and_high' AS side, CAST(count(*) AS BIGINT) AS n
             |FROM (SELECT * FROM u INTERSECT SELECT * FROM h)
             |UNION ALL
             |SELECT 'urgent_only' AS side, CAST(count(*) AS BIGINT) AS n
             |FROM (SELECT * FROM u EXCEPT SELECT * FROM h)""".stripMargin)),

    // Grouped top-k WITHOUT sorting: the custom bounded-heap aggregate
    // `topk_by` (sketch/TopKBy) keeps k pairs per group per partition and
    // merges k-bounded — the window dual (row_number <= k) still fully
    // sorts each task's partition even under Spark 4's WindowGroupLimit.
    // The oracle IS that window dual; GroupedTopKSpec pins the two equal
    // in Spark as well.
    EngineQuery(
      "q20_grouped_topk",
      (s, dir) =>
        cust(s, dir)
          .groupBy("c_mktsegment")
          .agg(expr("topk_by(c_acctbal, c_custkey, 3)").as("top"))
          .select(col("c_mktsegment"), explode(col("top")).as("t"))
          .select(col("c_mktsegment"), col("t.score").as("c_acctbal"),
            col("t.id").as("c_custkey")),
      Some("""SELECT c_mktsegment, c_acctbal, c_custkey FROM (
             |  SELECT c_mktsegment, c_acctbal, c_custkey,
             |    row_number() OVER (PARTITION BY c_mktsegment
             |      ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
             |  FROM customer)
             |WHERE rn <= 3""".stripMargin)),

    // Value-based RANGE frame (vs q8's row frames): for each order, how
    // many orders in its segment price-band (totalprice within 10k below
    // it) and their summed value. RANGE frames include ALL ties of the
    // current value, so the result is deterministic without a tiebreak
    // column; aggregated per band bucket to keep the output small.
    EngineQuery(
      "q21_range_frame",
      (s, dir) =>
        ord(s, dir)
          .withColumn("band_n", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("o_orderpriority").orderBy("o_totalprice")
              .rangeBetween(-10000L, 0L)))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), max("band_n").as("max_band"),
            round(avg("band_n"), 4).as("avg_band")),
      Some("""WITH b AS (
             |  SELECT o_orderpriority,
             |    count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
             |      RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS band_n
             |  FROM orders)
             |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
             |  CAST(max(band_n) AS BIGINT) AS max_band,
             |  round(avg(band_n), 4) AS avg_band
             |FROM b GROUP BY 1""".stripMargin)),

    // 2-D Pareto frontier (skyline): parts no other part beats on BOTH
    // (cheaper-or-equal price, larger-or-equal size, one strict). The
    // oracle spells the quadratic NOT EXISTS; the engine reduces each
    // price group to its max size (one map-side-combining shuffle), then
    // one price-ordered running max decides domination: p is dominated
    // iff a strictly-cheaper group reaches its size (m1 >= p_size) or a
    // same-or-cheaper group strictly exceeds it (m2 > p_size). The
    // ordered window runs over DISTINCT prices only — the compressed
    // domain, tiny at any SF (and a prefix max decomposes into a
    // per-partition two-pass scan if the domain ever outgrows one task).
    EngineQuery(
      "q29_skyline",
      (s, dir) => {
        val pts = t(s, dir, "part").select("p_partkey", "p_retailprice", "p_size")
        val g = pts.groupBy("p_retailprice").agg(max("p_size").as("gmax"))
        val wPrev = Window.orderBy("p_retailprice").rowsBetween(Window.unboundedPreceding, -1)
        val wCur = Window.orderBy("p_retailprice").rowsBetween(Window.unboundedPreceding, 0)
        val gm = g.withColumn("m1", max("gmax").over(wPrev))
          .withColumn("m2", max("gmax").over(wCur))
        pts.join(gm, Seq("p_retailprice"))
          .filter(!(coalesce(col("m1") >= col("p_size"), lit(false)) ||
            col("m2") > col("p_size")))
          .select("p_partkey", "p_retailprice", "p_size")
      },
      Some("""SELECT p_partkey, p_retailprice, p_size FROM part p
             |WHERE NOT EXISTS (SELECT 1 FROM part q
             |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
             |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))""".stripMargin)),

    // Exact per-group median (percentile with linear interpolation).
    // Medians of 2-decimal prices land on at most 3 decimals, so the
    // 4-decimal round is never on a rounding boundary — engine-exact.
    // (At 100 TB the exact percentile buffers each group; the sketch
    // path is sketch_quantile_groups.)
    EngineQuery(
      "q30_brand_median",
      (s, dir) =>
        t(s, dir, "part").groupBy("p_brand")
          .agg(round(expr("percentile(p_retailprice, 0.5)"), 4).as("median_price"),
            count(lit(1)).as("n")),
      Some("""SELECT p_brand, round(quantile_cont(p_retailprice, 0.5), 4) AS median_price,
             |  CAST(count(*) AS BIGINT) AS n FROM part GROUP BY 1""".stripMargin)),

    // Single-pass data-quality profile: null count, exact distinct count,
    // min/max for each measure column, emitted one row per column via
    // stack(). One scan, one aggregate (Catalyst expands the distinct
    // counts into an Expand + two-phase agg); at 100 TB swap the exact
    // distincts for approx_count_distinct and the plan collapses to a
    // single partial-aggregable pass.
    EngineQuery(
      "dq_profile",
      (s, dir) => {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val aggs = cols.flatMap { c =>
          Seq(
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nn"),
            count_distinct(col(c)).as(s"${c}_nd"),
            min(col(c)).as(s"${c}_mn"),
            max(col(c)).as(s"${c}_mx"))
        }
        val one = li(s, dir).agg(aggs.head, aggs.tail: _*)
        val stackArgs = cols.map(c => s"'$c', ${c}_nn, ${c}_nd, ${c}_mn, ${c}_mx").mkString(", ")
        one.selectExpr(
          s"stack(${cols.size}, $stackArgs) AS (col_name, n_null, n_distinct, min_v, max_v)")
      },
      Some(Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").map { c =>
        s"""SELECT '$c' AS col_name,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  min($c) AS min_v, max($c) AS max_v FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n"))),

    // Correlated LATERAL subquery with ORDER BY + LIMIT (top-2 orders
    // per customer), in SQL text: Catalyst decorrelates the per-row
    // subquery into a window top-k over ONE orders shuffle — no
    // per-customer re-execution (the row_number plan q20 spells by hand,
    // reached here from the declarative spelling).
    EngineQuery(
      "q31_lateral_topn",
      (s, dir) => s.sql(
        s"""SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
           |FROM parquet.`${tablePath(dir, "customer")}` c,
           |LATERAL (SELECT o_orderkey, o_totalprice
           |         FROM parquet.`${tablePath(dir, "orders")}` o
           |         WHERE o.o_custkey = c.c_custkey
           |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t""".stripMargin),
      Some("""SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
             |FROM customer c,
             |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             |         WHERE o.o_custkey = c.c_custkey
             |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t""".stripMargin)),

    // Robust outlier detection via MAD (median absolute deviation) — the
    // median-based twin of evt_outliers' z-scores, immune to the outliers
    // it hunts. Integer quantities keep every stage engine-exact: group
    // medians land on .0/.5, deviations on multiples of 0.5, the MAD on
    // multiples of 0.25 (4-decimal rounds never sit on a tie), and the
    // 1.5·MAD fence compares exactly-representable doubles computed
    // identically on both engines (ties resolve the same way). Two grouped exact
    // percentiles + one broadcast join back — the sketch path at 100 TB
    // swaps in the bounded histogram (sketch_quantile_groups).
    EngineQuery(
      "q33_robust_mad",
      (s, dir) => {
        val med = li(s, dir).groupBy("l_returnflag")
          .agg(expr("percentile(l_quantity, 0.5)").as("med"))
        val dev = li(s, dir).join(broadcast(med), "l_returnflag")
          .withColumn("adev", abs(col("l_quantity") - col("med")))
        val mad = dev.groupBy("l_returnflag")
          .agg(expr("percentile(adev, 0.5)").as("mad"))
        dev.join(broadcast(mad), "l_returnflag")
          .groupBy("l_returnflag")
          .agg(
            round(max("med"), 4).as("median_qty"),
            round(max("mad"), 4).as("mad"),
            sum(when(col("adev") > lit(1.5) * col("mad"), 1L).otherwise(0L))
              .as("n_outliers"),
            count(lit(1)).as("n"))
      },
      Some("""WITH m AS (
             |  SELECT l_returnflag AS g, quantile_cont(l_quantity, 0.5) AS med
             |  FROM lineitem GROUP BY 1),
             |d AS (SELECT l.l_returnflag AS g, abs(l.l_quantity - m.med) AS adev, m.med
             |  FROM lineitem l JOIN m ON l.l_returnflag = m.g),
             |md AS (SELECT g, quantile_cont(adev, 0.5) AS mad FROM d GROUP BY g)
             |SELECT d.g AS l_returnflag,
             |  round(max(d.med), 4) AS median_qty,
             |  round(max(md.mad), 4) AS mad,
             |  CAST(sum(CASE WHEN d.adev > 1.5 * md.mad THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_outliers,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM d JOIN md ON d.g = md.g GROUP BY 1""".stripMargin)),

    // Q32: UNPIVOT — wide measure columns to long (measure, value) form,
    // the relational dual of q15_pivot. Runs over an already-aggregated
    // |returnflag|-sized frame, so the unpivot explode is dimension-
    // bounded; on a raw fact table it is a narrow projection per measure
    // unioned map-side (no shuffle at any scale). Spark's Dataset.unpivot
    // vs DuckDB's SQL-standard UNPIVOT clause.
    EngineQuery(
      "q32_unpivot",
      (s, dir) =>
        li(s, dir)
          .groupBy("l_returnflag")
          .agg(
            round(sum("l_quantity"), 2).as("qty"),
            round(sum("l_extendedprice"), 2).as("price"),
            round(sum("l_discount"), 2).as("disc"))
          .unpivot(
            Array(col("l_returnflag")),
            Array(col("qty"), col("price"), col("disc")),
            "measure", "val"),
      Some("""SELECT l_returnflag, measure, val FROM (
             |  SELECT l_returnflag,
             |    round(sum(l_quantity), 2) AS qty,
             |    round(sum(l_extendedprice), 2) AS price,
             |    round(sum(l_discount), 2) AS disc
             |  FROM lineitem GROUP BY 1)
             |UNPIVOT (val FOR measure IN (qty, price, disc))""".stripMargin)),

    // Q37: correlated SCALAR subqueries in the select list — the
    // remaining correlated-subquery spelling next to q18 (WHERE-clause
    // agg compare) and q25 (EXISTS): per customer, the max order value
    // and the count, inline. Catalyst decorrelates both into left outer
    // aggregates over o_custkey — one co-partitioned join each, never a
    // per-row re-execution (the plan is the proof this spelling is safe
    // at scale, unlike actual nested-loop subquery engines).
    EngineQuery(
      "q37_scalar_subquery",
      (s, dir) => {
        ord(s, dir).createOrReplaceTempView("q37_orders")
        cust(s, dir).createOrReplaceTempView("q37_customer")
        s.sql("""SELECT c_custkey,
                |  (SELECT round(max(o_totalprice), 2) FROM q37_orders o
                |   WHERE o.o_custkey = c.c_custkey) AS best_order,
                |  (SELECT CAST(count(*) AS BIGINT) FROM q37_orders o
                |   WHERE o.o_custkey = c.c_custkey) AS n_orders
                |FROM q37_customer c
                |WHERE c_custkey <= 200""".stripMargin)
      },
      Some("""SELECT c_custkey,
             |  (SELECT round(max(o_totalprice), 2) FROM orders o
             |   WHERE o.o_custkey = c.c_custkey) AS best_order,
             |  (SELECT CAST(count(*) AS BIGINT) FROM orders o
             |   WHERE o.o_custkey = c.c_custkey) AS n_orders
             |FROM customer c
             |WHERE c_custkey <= 200""".stripMargin)),

    // Q38: GROUP BY ALL — the analyst-ergonomics spelling (every
    // non-aggregate select item becomes a grouping key) supported
    // natively by BOTH engines since Spark 3.4 / DuckDB 0.6, so the
    // SAME statement text runs on each: the engine side goes through
    // spark.sql, the oracle through DuckDB, zero rewriting.
    EngineQuery(
      "q38_group_by_all",
      (s, dir) => {
        li(s, dir).createOrReplaceTempView("q38_lineitem")
        s.sql(Q38Sql.replace("lineitem", "q38_lineitem"))
      },
      Some(Q38Sql)),

    // Q36: the long-tail window-function surface — percent_rank,
    // cume_dist, nth_value, first/last_value with explicit frames —
    // over (priority × order-month) partitions, so no window partition
    // grows with the fact table (month count × 5 priorities bounds the
    // grain; within-partition ranks are what the functions mean).
    // Rolled up per partition: deterministic via the (price, orderkey)
    // total tiebreak inside every window.
    EngineQuery(
      "q36_window_funcs",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val base = ord(s, dir).selectExpr(
          "o_orderpriority", "o_orderkey",
          "CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents",
          "CAST(date_trunc('month', o_orderdate) AS DATE) AS mon")
        val w = Window.partitionBy("o_orderpriority", "mon")
          .orderBy(col("cents").desc, col("o_orderkey"))
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        base
          .withColumn("pr", percent_rank().over(w))
          .withColumn("cd", cume_dist().over(w))
          .withColumn("second_key", nth_value(col("o_orderkey"), 2).over(wf))
          .withColumn("best_key", first(col("o_orderkey")).over(wf))
          .withColumn("worst_key", last(col("o_orderkey")).over(wf))
          .groupBy("o_orderpriority", "mon")
          .agg(
            count(lit(1)).as("n"),
            max("second_key").as("second_key"),
            max("best_key").as("best_key"),
            max("worst_key").as("worst_key"),
            sum(when(col("pr") <= 0.25, 1L).otherwise(0L)).as("top_quartile_n"),
            round(sum("cd"), 6).as("cd_mass"))
      },
      Some("""WITH base AS (
             |  SELECT o_orderpriority, o_orderkey,
             |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
             |    CAST(date_trunc('month', o_orderdate) AS DATE) AS mon
             |  FROM orders),
             |wf AS (SELECT o_orderpriority, mon,
             |    percent_rank() OVER (PARTITION BY o_orderpriority, mon ORDER BY cents DESC, o_orderkey) AS pr,
             |    cume_dist() OVER (PARTITION BY o_orderpriority, mon ORDER BY cents DESC, o_orderkey) AS cd,
             |    nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderpriority, mon ORDER BY cents DESC, o_orderkey
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_key,
             |    first_value(o_orderkey) OVER (PARTITION BY o_orderpriority, mon ORDER BY cents DESC, o_orderkey
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS best_key,
             |    last_value(o_orderkey) OVER (PARTITION BY o_orderpriority, mon ORDER BY cents DESC, o_orderkey
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS worst_key
             |  FROM base)
             |SELECT o_orderpriority, mon, CAST(count(*) AS BIGINT) AS n,
             |  max(second_key) AS second_key, max(best_key) AS best_key,
             |  max(worst_key) AS worst_key,
             |  CAST(sum(CASE WHEN pr <= 0.25 THEN 1 ELSE 0 END) AS BIGINT) AS top_quartile_n,
             |  round(sum(cd), 6) AS cd_mass
             |FROM wf GROUP BY 1, 2""".stripMargin)),

    // Benford first-digit audit — the classic fabricated-numbers DQ
    // check: observed first-digit distribution of order totals against
    // Benford's log₁₀(1+1/d) expectation, scored by total-variation
    // distance. The expected shares are interpolated from ONE Scala
    // computation into BOTH engines' SQL (PageRank's baseNum trick), so
    // no engine evaluates a transcendental. One narrow projection + a
    // 9-row aggregate; the distance folds over 9 rows.
    EngineQuery(
      "dq_benford",
      (s, dir) => {
        val n = ord(s, dir).count()
        val digits = ord(s, dir).selectExpr(
            "CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING), 1, 1) AS INT) AS d")
          .groupBy("d").agg(count(lit(1)).as("n_obs"))
        // The interpolated CASE literals parse as DECIMAL in both engines,
        // but round(DECIMAL) infers different precision in Spark
        // (DECIMAL(7,6)) vs DuckDB (DECIMAL(18,6)) — identical values,
        // divergent parquet schema (oracle trap #2). CAST to DOUBLE first.
        digits.select(
          col("d"), col("n_obs"),
          round(col("n_obs") / lit(n.toDouble), 6).as("obs_share"),
          round(expr(benfordCase).cast("double"), 6).as("benford_share"),
          round(abs(col("n_obs") / lit(n.toDouble) - expr(benfordCase).cast("double")), 6).as("abs_dev"))
      },
      Some(s"""WITH d AS (
              |  SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS d,
              |    CAST(count(*) AS BIGINT) AS n_obs
              |  FROM orders GROUP BY 1),
              |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders)
              |SELECT d.d, d.n_obs,
              |  round(n_obs / CAST(n.n AS DOUBLE), 6) AS obs_share,
              |  round(CAST(($benfordCase) AS DOUBLE), 6) AS benford_share,
              |  round(abs(n_obs / CAST(n.n AS DOUBLE) - CAST(($benfordCase) AS DOUBLE)), 6) AS abs_dev
              |FROM d CROSS JOIN n""".stripMargin)),

    // EXACT grouped quantiles with NO window — the ExactNtile boundary
    // machinery exposed as order statistics: per priority, the three
    // quartile-edge ROWS of the (price DESC, orderkey ASC) order — the
    // rank-K_j rows ntile(4) would cut at — found via histogram +
    // boundary-bin refinement and nothing group-partitioned anywhere
    // (o_orderpriority has 5 values; a priority-partitioned window
    // would sort N/5 rows in one task at scale). percentile_disc-class
    // results but exact, deterministic, and tie-resolved by key.
    EngineQuery(
      "q39_exact_quartiles",
      (s, dir) => {
        val o = ord(s, dir)
          .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
        graft.ops.ExactNtile
          .boundaries(o, "o_orderpriority", "o_totalprice", "o_orderkey",
            tiles = 4, binScale = 0.01)
          .select(col("o_orderpriority"),
            col("boundary_idx").cast("int").as("boundary_idx"),
            round(col("b_score"), 2).as("edge_price"),
            col("b_tie").cast("long").as("edge_orderkey"))
      },
      Some("""WITH n AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
             |  FROM orders GROUP BY 1),
             |r AS (SELECT o_orderpriority, o_totalprice, o_orderkey,
             |    row_number() OVER (PARTITION BY o_orderpriority
             |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
             |  FROM orders),
             |k AS (SELECT n.o_orderpriority, j.j,
             |    CAST(j.j * (n.n // 4) + least(j.j, n.n % 4) AS BIGINT) AS kj
             |  FROM n CROSS JOIN (SELECT unnest([1, 2, 3]) AS j) j)
             |SELECT r.o_orderpriority, CAST(k.j AS INT) AS boundary_idx,
             |  round(r.o_totalprice, 2) AS edge_price,
             |  CAST(r.o_orderkey AS BIGINT) AS edge_orderkey
             |FROM r JOIN k ON r.o_orderpriority = k.o_orderpriority AND r.rn = k.kj""".stripMargin)),

    // Winsorization at the exact per-group quartile edges — the robust
    // outlier-clamping step before any mean-based feature: prices clamp
    // into [lower-quartile edge, upper-quartile edge], both REAL data
    // rows from q39's histogram/boundary-refinement machinery (no
    // group-partitioned window, no interpolation). The 5-row edge table
    // broadcasts back over the fact scan; clamped cents sum exactly in
    // BIGINT, so the whole readout is engine-exact.
    EngineQuery(
      "q41_winsorize",
      (s, dir) => {
        val o = ord(s, dir)
          .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
        val b = graft.ops.ExactNtile
          .boundaries(o, "o_orderpriority", "o_totalprice", "o_orderkey",
            tiles = 4, binScale = 0.01)
        // lo = the LAST boundary row (max idx), not literally idx 3:
        // boundaryFrame collapses duplicate ranks on groups with < 4
        // rows, and the max-idx row is exactly what the oracle's
        // duplicate-k_j rank selection lands on there (idx 3 == max idx
        // on any group with >= 4 rows, so big groups are unchanged).
        val edges = b.groupBy("o_orderpriority").agg(
          max(when(col("boundary_idx") === 1, col("b_score"))).as("hi"),
          max_by(col("b_score"), col("boundary_idx")).as("lo"))
        o.join(broadcast(edges), Seq("o_orderpriority"))
          .withColumn("w", least(greatest(col("o_totalprice"), col("lo")), col("hi")))
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("o_totalprice") < col("lo"), 1L).otherwise(0L)).as("n_clamped_lo"),
            sum(when(col("o_totalprice") > col("hi"), 1L).otherwise(0L)).as("n_clamped_hi"),
            sum(expr("CAST(round(w * 100, 0) AS BIGINT)")).as("w_cents"))
      },
      Some("""WITH n AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
             |  FROM orders GROUP BY 1),
             |r AS (SELECT o_orderpriority, o_totalprice, o_orderkey,
             |    row_number() OVER (PARTITION BY o_orderpriority
             |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
             |  FROM orders),
             |k AS (SELECT n.o_orderpriority, j.j,
             |    CAST(j.j * (n.n // 4) + least(j.j, n.n % 4) AS BIGINT) AS kj
             |  FROM n CROSS JOIN (SELECT unnest([1, 3]) AS j) j),
             |e AS (SELECT r.o_orderpriority,
             |    max(CASE WHEN k.j = 1 THEN r.o_totalprice END) AS hi,
             |    max(CASE WHEN k.j = 3 THEN r.o_totalprice END) AS lo
             |  FROM r JOIN k ON r.o_orderpriority = k.o_orderpriority AND r.rn = k.kj
             |  GROUP BY 1),
             |w AS (SELECT o.o_orderpriority, o.o_totalprice AS p,
             |    least(greatest(o.o_totalprice, e.lo), e.hi) AS w
             |  FROM orders o JOIN e USING (o_orderpriority))
             |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN p < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_lo,
             |  CAST(sum(CASE WHEN p > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_hi,
             |  CAST(sum(CAST(round(w * 100, 0) AS BIGINT)) AS BIGINT) AS w_cents
             |FROM w JOIN e USING (o_orderpriority) GROUP BY 1""".stripMargin)),

    // Referential-integrity audit: orphan counts per foreign-key edge of
    // the star schema, each a LEFT ANTI join (the scan of the child
    // side + a broadcast/shuffle probe of the parent keys — never a
    // full join materialization). One row, four edges.
    EngineQuery(
      "dq_fk_orphans",
      (s, dir) => {
        def orphans(child: DataFrame, ck: String, parent: DataFrame, pk: String) =
          child.select(col(ck)).join(
            parent.select(col(pk).as(ck)), Seq(ck), "left_anti").count()
        val li0 = li(s, dir); val o0 = ord(s, dir); val c0 = cust(s, dir)
        val res = Seq(
          orphans(li0, "l_orderkey", o0, "o_orderkey"),
          orphans(li0, "l_partkey", t(s, dir, "part"), "p_partkey"),
          orphans(o0, "o_custkey", c0, "c_custkey"),
          orphans(c0, "c_nationkey", t(s, dir, "nation"), "n_nationkey"))
        import s.implicits._
        Seq((res(0), res(1), res(2), res(3)))
          .toDF("li_no_order", "li_no_part", "ord_no_cust", "cust_no_nation")
      },
      Some("""SELECT
             |  CAST((SELECT count(*) FROM lineitem l WHERE NOT EXISTS
             |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT) AS li_no_order,
             |  CAST((SELECT count(*) FROM lineitem l WHERE NOT EXISTS
             |    (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)) AS BIGINT) AS li_no_part,
             |  CAST((SELECT count(*) FROM orders o WHERE NOT EXISTS
             |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT) AS ord_no_cust,
             |  CAST((SELECT count(*) FROM customer c WHERE NOT EXISTS
             |    (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT) AS cust_no_nation""".stripMargin)),

    // Q34: market-basket association rules — support / confidence / lift
    // over parts co-ordered in the same order. The scale design is the
    // a-priori property made physical: items below min-support are
    // pruned BEFORE the pair self-join (a frequent pair's items are
    // both frequent, so no answer is lost), which turns the join from
    // |basket|² over everything into |basket'|² over frequent items
    // only. The per-order pair fan-out is bounded by basket size (≤13
    // here; a 100 TB run caps baskets or salts the hot orders). Both
    // joins are equi-joins on l_orderkey; item counts broadcast back.
    EngineQuery(
      "q34_basket_lift",
      (s, dir) => {
        val minSup = 3L
        // `baskets` (the distinct pairs) feeds FIVE consumers: the item
        // counts, both sides of the pair self-join, and the eager order
        // count — spelled lazily that was 8 lineitem scans + 4 distinct
        // shuffles in one plan plus a separate scan for the count
        // (plans/r16/q34_basket_lift_before.txt). localCheckpoint the
        // distinct ONCE and derive everything from it: one scan + one
        // distinct shuffle total. Measured (4 warm in-JVM rounds each):
        // 2.0–2.9 s vs 2.3–3.1 lazy vs 3.4–4.1 with a columnar persist
        // — the row-level checkpoint skips InMemoryRelation's encode
        // cost, and the checkpointed blocks release with the plan via
        // ContextCleaner (the recursive-CTE frontier lifecycle). The
        // cached set is the distinct pair projection, bounded by the
        // same shuffle the lazy plan already paid 4×.
        val baskets = graft.tables.Checkpoints.cut(
          li(s, dir).select("l_orderkey", "l_partkey").distinct())
        val itemCnt = baskets.groupBy("l_partkey")
          .agg(count(lit(1)).as("item_cnt"))
          .where(col("item_cnt") >= minSup)
        // itemCnt is bounded by the part CATALOG (dimension-sized, not
        // fact-sized) — broadcast holds far longer than the fact scan.
        val frequent = baskets.join(broadcast(itemCnt), "l_partkey")
        val orderCnt = baskets.select("l_orderkey").distinct().count()
        val a = frequent.select(
          col("l_orderkey"),
          col("l_partkey").as("p1"), col("item_cnt").as("cnt1"))
        val b = frequent.select(
          col("l_orderkey"),
          col("l_partkey").as("p2"), col("item_cnt").as("cnt2"))
        a.join(b, Seq("l_orderkey"))
          .where(col("p1") < col("p2"))
          .groupBy("p1", "p2", "cnt1", "cnt2")
          .agg(count(lit(1)).as("pair_cnt"))
          .where(col("pair_cnt") >= minSup)
          .select(
            col("p1"), col("p2"), col("pair_cnt"), col("cnt1"), col("cnt2"),
            round(col("pair_cnt") / col("cnt1"), 4).as("confidence"),
            round(col("pair_cnt") * lit(orderCnt.toDouble) / (col("cnt1") * col("cnt2")), 4)
              .as("lift"))
          .orderBy(col("lift").desc, col("p1"), col("p2"))
          .limit(20)
      },
      Some("""WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |ic AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS item_cnt
             |       FROM baskets GROUP BY 1 HAVING count(*) >= 3),
             |f AS (SELECT b.l_orderkey, b.l_partkey, ic.item_cnt
             |      FROM baskets b JOIN ic USING (l_partkey)),
             |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM baskets),
             |pairs AS (
             |  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
             |         CAST(count(*) AS BIGINT) AS pair_cnt,
             |         max(a.item_cnt) AS cnt1, max(b.item_cnt) AS cnt2
             |  FROM f a JOIN f b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |  GROUP BY 1, 2 HAVING count(*) >= 3)
             |SELECT p1, p2, pair_cnt, cnt1, cnt2,
             |  round(pair_cnt / cnt1, 4) AS confidence,
             |  round(pair_cnt * n.n_orders / (cnt1 * cnt2), 4) AS lift
             |FROM pairs, n
             |ORDER BY lift DESC, p1, p2 LIMIT 20""".stripMargin)),

    // Q35: RFM segmentation — per-customer Recency / Frequency /
    // Monetary quartile scores, rolled up per segment cell. NOT the
    // textbook global-ntile (a single-partition window over every
    // customer — the scale-killer PlanInvariantsSpec exists to forbid):
    // quartile BOUNDARIES come from one scalar percentile aggregate
    // (mergeable, one row out) broadcast back over the customer grain,
    // so the whole plan is two hash aggregates + a scalar cross join.
    // Threshold-bucketing (score = 1 + Σ v>q_i) keeps ties together,
    // which is also what makes it engine-exact: every input is an exact
    // integer and a quartile interpolation a+(b−a)·f with f∈{0,¼,½,¾}
    // is an exact dyadic rational in both engines, so the > compares
    // can never diverge (same integer-grain argument as q33's MAD).
    EngineQuery(
      "q35_rfm_segments",
      (s, dir) => {
        val cust = ord(s, dir).groupBy("o_custkey").agg(
          // o_orderdate reads as TIMESTAMP_NTZ; the session tz is UTC, so
          // casting to session-zoned TIMESTAMP preserves the wall clock
          // and unix_millis matches DuckDB's epoch_ms of the naive value.
          expr("max(unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000)").as("rec_day"),
          count(lit(1)).as("freq"),
          sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")).as("cents"))
        val qs = cust.agg(
          expr("percentile(rec_day, array(0.25, 0.5, 0.75))").as("rq"),
          expr("percentile(freq, array(0.25, 0.5, 0.75))").as("fq"),
          expr("percentile(cents, array(0.25, 0.5, 0.75))").as("mq"))
        cust.crossJoin(broadcast(qs))
          .selectExpr(
            "cents",
            "1 + CAST(rec_day > rq[0] AS INT) + CAST(rec_day > rq[1] AS INT) + CAST(rec_day > rq[2] AS INT) AS r_score",
            "1 + CAST(freq > fq[0] AS INT) + CAST(freq > fq[1] AS INT) + CAST(freq > fq[2] AS INT) AS f_score",
            "1 + CAST(cents > mq[0] AS INT) + CAST(cents > mq[1] AS INT) + CAST(cents > mq[2] AS INT) AS m_score")
          .groupBy("r_score", "f_score", "m_score")
          .agg(
            count(lit(1)).as("n_customers"),
            sum("cents").as("seg_cents"))
      },
      Some("""WITH cust AS (
             |  SELECT o_custkey,
             |    max(epoch_ms(o_orderdate) // 86400000) AS rec_day,
             |    CAST(count(*) AS BIGINT) AS freq,
             |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
             |  FROM orders GROUP BY 1),
             |qs AS (
             |  SELECT quantile_cont(rec_day, [0.25, 0.5, 0.75]) AS rq,
             |    quantile_cont(freq, [0.25, 0.5, 0.75]) AS fq,
             |    quantile_cont(cents, [0.25, 0.5, 0.75]) AS mq
             |  FROM cust),
             |scored AS (
             |  SELECT cents,
             |    1 + CAST(rec_day > rq[1] AS INT) + CAST(rec_day > rq[2] AS INT) + CAST(rec_day > rq[3] AS INT) AS r_score,
             |    1 + CAST(freq > fq[1] AS INT) + CAST(freq > fq[2] AS INT) + CAST(freq > fq[3] AS INT) AS f_score,
             |    1 + CAST(cents > mq[1] AS INT) + CAST(cents > mq[2] AS INT) + CAST(cents > mq[3] AS INT) AS m_score
             |  FROM cust, qs)
             |SELECT r_score, f_score, m_score,
             |  CAST(count(*) AS BIGINT) AS n_customers,
             |  CAST(sum(cents) AS BIGINT) AS seg_cents
             |FROM scored GROUP BY 1, 2, 3""".stripMargin)),

    // k-anonymity audit (privacy/data-governance): rows grouped by a
    // quasi-identifier tuple; any group with < k members re-identifies
    // its rows. One count shuffle keyed on the QI tuple + a scalar
    // rollup — group cardinality bounds the second stage, never rows.
    // The release gate a dataset needs before leaving the trust zone.
    EngineQuery(
      "dq_k_anonymity",
      (s, dir) =>
        t(s, dir, "customer")
          .selectExpr("c_nationkey", "c_mktsegment",
            "CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band")
          .groupBy("c_nationkey", "c_mktsegment", "bal_band")
          .agg(count(lit(1)).as("grp_n"))
          .agg(
            count(lit(1)).as("n_groups"),
            sum(when(col("grp_n") < 5L, 1L).otherwise(0L)).as("n_small_groups"),
            sum(when(col("grp_n") < 5L, col("grp_n")).otherwise(0L)).as("n_rows_at_risk"),
            min("grp_n").as("min_k"),
            sum("grp_n").as("n_rows")),
      Some("""WITH g AS (SELECT c_nationkey, c_mktsegment,
             |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
             |    count(*) AS grp_n
             |  FROM customer GROUP BY 1, 2, 3)
             |SELECT CAST(count(*) AS BIGINT) AS n_groups,
             |  CAST(sum(CASE WHEN grp_n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_small_groups,
             |  CAST(sum(CASE WHEN grp_n < 5 THEN grp_n ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
             |  CAST(min(grp_n) AS BIGINT) AS min_k,
             |  CAST(sum(grp_n) AS BIGINT) AS n_rows
             |FROM g""".stripMargin)),

    // ANSI-safe error-handling expressions: try_cast yields NULL instead
    // of throwing on a bad cast, try_divide NULLs division by zero —
    // the spellings that keep a 100 TB batch job alive through dirty
    // rows instead of dying on task 48151. DuckDB's duals are TRY_CAST
    // and NULLIF-guarded division; quotient sums ride floor-quantized
    // i64 (order-free exact).
    EngineQuery(
      "q43_try_ops",
      (s, dir) =>
        ord(s, dir)
          .selectExpr(
            "try_cast(o_orderstatus AS INT) AS bad_cast",
            "try_cast(CAST(o_orderkey AS STRING) AS INT) AS good_cast",
            "try_divide(o_totalprice, CAST(o_orderkey % 3 AS DOUBLE)) AS q")
          .agg(
            count(lit(1)).as("n"),
            count(col("bad_cast")).as("n_bad_ok"),
            count(col("good_cast")).as("n_good_ok"),
            count(col("q")).as("n_div_ok"),
            sum(expr("CAST(floor(q * 1000) AS BIGINT)")).as("q_millis")),
      Some("""SELECT CAST(count(*) AS BIGINT) AS n,
             |  CAST(count(TRY_CAST(o_orderstatus AS INT)) AS BIGINT) AS n_bad_ok,
             |  CAST(count(TRY_CAST(CAST(o_orderkey AS VARCHAR) AS INT)) AS BIGINT) AS n_good_ok,
             |  CAST(count(o_totalprice / NULLIF(CAST(o_orderkey % 3 AS DOUBLE), 0.0)) AS BIGINT) AS n_div_ok,
             |  CAST(sum(CAST(floor((o_totalprice / NULLIF(CAST(o_orderkey % 3 AS DOUBLE), 0.0)) * 1000) AS BIGINT)) AS BIGINT) AS q_millis
             |FROM orders""".stripMargin)),

    // Aggregate FILTER clause (ANSI 2003) — per-aggregate predicates
    // without CASE gymnastics; native in Spark and DuckDB since years,
    // so the SAME statement text runs on both engines (the q38-style
    // zero-rewrite parity, the strongest gate a surface op can have).
    // Compiles to conditional partial aggregation — one scan, one
    // shuffle, no extra pass per FILTER.
    EngineQuery(
      "q42_agg_filter",
      (s, dir) => {
        ord(s, dir).createOrReplaceTempView("orders")
        s.sql(Q42Sql)
      },
      Some(Q42Sql)),

    // LISTAGG / string_agg — ordered string aggregation (ANSI 2016's
    // LISTAGG ... WITHIN GROUP), the SQL-surface op that turns a group
    // into one delimited string (report rows, label lists, compacted
    // fan-out). Determinism is the whole game: the concatenation order
    // is pinned by an explicit sort inside the aggregate on both sides,
    // so the strings hash-match exactly. Engine spelling is
    // collect_set → array_sort → array_join (map-side partial
    // collect_set keeps the shuffle at distinct-values size, and the
    // per-group state is bounded by the type-catalog cardinality —
    // a dimension, not the fact table).
    EngineQuery(
      "q40_listagg",
      (s, dir) =>
        t(s, dir, "part")
          .groupBy("p_brand")
          .agg(
            countDistinct("p_type").as("n_types"),
            array_join(array_sort(collect_set(col("p_type"))), "|").as("types_csv"),
            sum(expr("CAST(round(p_retailprice * 100, 0) AS BIGINT)")).as("cents")),
      Some("""SELECT p_brand,
             |  CAST(count(DISTINCT p_type) AS BIGINT) AS n_types,
             |  string_agg(DISTINCT p_type, '|' ORDER BY p_type) AS types_csv,
             |  CAST(sum(CAST(round(p_retailprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
             |FROM part GROUP BY p_brand""".stripMargin)),

    // Named WINDOW clause (ANSI): one window definition shared by
    // several functions — one sort in the plan, N functions riding it.
    // Native in Spark and DuckDB: the SAME statement text runs on both.
    EngineQuery(
      "q44_window_clause",
      (s, dir) => {
        li(s, dir).createOrReplaceTempView("lineitem")
        s.sql(Q44Sql)
      },
      Some(Q44Sql)),

    // INTERSECT ALL / EXCEPT ALL — bag-semantics set operators (min /
    // subtracted multiplicities); the DISTINCT variants are q19. Same
    // statement text on both engines.
    EngineQuery(
      "q45_setops_all",
      (s, dir) => {
        ord(s, dir).createOrReplaceTempView("orders")
        s.sql(Q45Sql)
      },
      Some(Q45Sql)),

    // SELECT * EXCEPT — the column-subtraction star (Spark 3.4+ /
    // BigQuery spelling; DuckDB spells it EXCLUDE), plus ORDER BY ALL
    // (native in both). Column pruning still reaches the scan: the
    // planner prunes to the surviving columns, so the "subtract"
    // spelling costs nothing over an explicit list.
    EngineQuery(
      "q46_star_except",
      (s, dir) => {
        li(s, dir).createOrReplaceTempView("lineitem")
        s.sql("""SELECT l_returnflag, l_linestatus,
                |  CAST(count(*) AS BIGINT) AS n,
                |  CAST(sum(l_orderkey) AS BIGINT) AS keysum
                |FROM (SELECT * EXCEPT (l_partkey, l_suppkey, l_linenumber, l_quantity,
                |                       l_extendedprice, l_discount, l_tax, l_shipdate)
                |      FROM lineitem)
                |GROUP BY ALL ORDER BY ALL""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(l_orderkey) AS BIGINT) AS keysum
             |FROM (SELECT * EXCLUDE (l_partkey, l_suppkey, l_linenumber, l_quantity,
             |                        l_extendedprice, l_discount, l_tax, l_shipdate)
             |      FROM lineitem)
             |GROUP BY ALL ORDER BY ALL""".stripMargin)),

    // Lateral column aliases (Spark 3.4+/DuckDB): a select item
    // referencing an alias defined EARLIER in the same list — the
    // derived-metric chain that otherwise forces a nested subquery per
    // step. One statement text on both engines; the chain folds into a
    // single Project (no subquery tower in the plan).
    EngineQuery(
      "q48_lateral_alias",
      (s, dir) => {
        ord(s, dir).createOrReplaceTempView("orders")
        s.sql(Q48Sql)
      },
      Some(Q48Sql)),

    // IS [NOT] DISTINCT FROM — null-safe comparison as one statement
    // text on both engines; the naive <> column rides along to pin the
    // three-valued-logic difference the safe spelling exists for.
    EngineQuery(
      "q47_null_safe",
      (s, dir) => {
        ord(s, dir).createOrReplaceTempView("orders")
        s.sql(Q47Sql)
      },
      Some(Q47Sql)),

    // Dataset.observe — metrics as a SIDE CHANNEL of a real action:
    // the aggregates ride the same single pass that produces the
    // output (here the count), costing zero extra scans — the
    // operational-telemetry pattern for 100 TB ingest jobs (row counts
    // and value bounds observed while writing, not re-computed after).
    // The observed values themselves are the gated result.
    EngineQuery(
      "dq_observe_metrics",
      (s, dir) => {
        val obs = new org.apache.spark.sql.Observation()
        val observed = ord(s, dir).observe(obs,
          count(lit(1)).as("n_rows"),
          sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")).as("cents"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        observed.write.format("noop").mode("overwrite").save() // the real action
        val m = obs.get
        import s.implicits._
        Seq((m("n_rows").asInstanceOf[Long], m("cents").asInstanceOf[Long],
          m("min_key").asInstanceOf[Long], m("max_key").asInstanceOf[Long]))
          .toDF("n_rows", "cents", "min_key", "max_key")
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents,
             |  CAST(min(o_orderkey) AS BIGINT) AS min_key,
             |  CAST(max(o_orderkey) AS BIGINT) AS max_key
             |FROM orders""".stripMargin)),

    // Declarative data-quality rule suite (the Deequ/VerificationSuite
    // pattern, VLDB'18 "Automating Large-Scale Data Quality Verification"):
    // N assertions — completeness, key uniqueness, value bounds, domain
    // membership, date sanity — evaluated in ONE scan. Every rule's
    // metric is an aggregate over the same pass (Catalyst expands the
    // lone exact distinct; drop it to approx_count_distinct at 100 TB and
    // the plan is a single partial-aggregable pass), then one stack()
    // pivots the metrics row into (rule, metric, passed) verdicts. The
    // alternative — one query per rule — scans the fact table N times.
    EngineQuery(
      "dq_rules_suite",
      (s, dir) => {
        val m = ord(s, dir).agg(
          count(lit(1)).as("n_rows"),
          count(col("o_custkey")).as("n_custkey"),
          countDistinct(col("o_orderkey")).as("n_distinct_key"),
          min(col("o_totalprice")).as("min_price"),
          sum(when(col("o_orderstatus").isin("O", "F", "P"), 0L).otherwise(1L))
            .as("n_bad_status"),
          sum(when(col("o_orderdate") < lit("1990-01-01").cast("timestamp"), 1L)
            .otherwise(0L)).as("n_early"))
        m.selectExpr(
          """stack(5,
            |  'completeness_custkey', CAST(n_custkey AS DOUBLE) / n_rows, n_custkey = n_rows,
            |  'uniqueness_orderkey', CAST(n_distinct_key AS DOUBLE) / n_rows, n_distinct_key = n_rows,
            |  'min_price_nonneg', min_price, min_price >= 0.0,
            |  'status_in_set', CAST(n_bad_status AS DOUBLE), n_bad_status = 0,
            |  'date_lower_bound', CAST(n_early AS DOUBLE), n_early = 0
            |) AS (rule_name, metric, passed)""".stripMargin)
          .orderBy("rule_name")
      },
      Some("""WITH m AS (SELECT
             |    CAST(count(*) AS BIGINT) AS n_rows,
             |    CAST(count(o_custkey) AS BIGINT) AS n_custkey,
             |    CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct_key,
             |    min(o_totalprice) AS min_price,
             |    CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END) AS BIGINT) AS n_bad_status,
             |    CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS n_early
             |  FROM orders)
             |SELECT 'completeness_custkey' AS rule_name, CAST(n_custkey AS DOUBLE) / n_rows AS metric, n_custkey = n_rows AS passed FROM m
             |UNION ALL SELECT 'uniqueness_orderkey', CAST(n_distinct_key AS DOUBLE) / n_rows, n_distinct_key = n_rows FROM m
             |UNION ALL SELECT 'min_price_nonneg', min_price, min_price >= 0.0 FROM m
             |UNION ALL SELECT 'status_in_set', CAST(n_bad_status AS DOUBLE), n_bad_status = 0 FROM m
             |UNION ALL SELECT 'date_lower_bound', CAST(n_early AS DOUBLE), n_early = 0 FROM m
             |ORDER BY rule_name""".stripMargin))
  )
}
