package graft

import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** PLANS.md's "rules this repo holds itself to", as a TEST: headline
  * queries must never plan a cartesian/nested-loop join, and no Window
  * may sit on a single-partition exchange (the canonical 100 TB
  * scale-killer this repo twice removed — pack_sequences in r4,
  * evt_max_concurrency in r5). Runs with AQE off on a cloned session so
  * the physical tree is traversable directly. */
class PlanInvariantsSpec extends SparkSuite {

  // Cheap queries spanning every family; the deliberate quadratic
  // yardsticks (dedup_jaccard_pairs, sim brute-force baselines) are the
  // documented exceptions and stay out of this list.
  private val guarded = Seq(
    "q1_agg", "q2_topk", "q7_multiway_join", "q23_dist_windows",
    "text_split", "text_chunking", "text_rep_flags", "text_mixture_plan",
    "evt_max_concurrency", "evt_sessions", "sim_mean_pool",
    "dedup_prefix_pairs", "sample_bernoulli_docs",
    // Covered by the join rule; their global-window exception is below.
    "q29_skyline", "sketch_quantile_bins",
    // Round-6 additions: the SQL-spelling, state-v2, and new operator paths.
    "tt_select_version_as_of", "se_sql_ddl", "sim_semdedup", "text_mixture_take",
    // Round-11: the de-weaked ccnet bucketing (ExactNtile, no constant-key
    // window) and the new scan/graph operators.
    "text_ccnet_buckets", "evt_cusum_changepoint", "sim_knn_graph",
    // Round-11 session 2: the bitmap-distinct family, the epoch
    // oversampler, the asof SQL rewrite, the cogroup merge, and the
    // one-scan DQ suite.
    "sketch_bitmap_distinct", "sketch_sliding_distinct", "sample_epochs",
    "sql_asof_join", "evt_cogroup_funnel", "dq_rules_suite",
    "q44_window_clause", "q46_star_except", "text_unicode_clean",
    // Round-12: the de-weaked probe-ranking queries (bounded-heap
    // topk_by / topk_by_str instead of constant-key windows), the
    // persisted-index searches, the MIPS-over-IVF row, and the labeled
    // brute-force yardstick — sanctions for the yardstick/bounded
    // shapes are explicit sets below, so the class is ENFORCED rather
    // than re-found per round.
    "sim_mips", "sim_mips_ivf", "text_tfidf_terms", "sim_binary_hamming",
    "sim_ivf_index_topk", "sim_cosine_topk", "sim_hard_negatives_cells",
    // Round-12 sweep of the newly-enumerable query_id/source keys: the
    // de-weaked heap rankings and the remaining labeled yardsticks.
    "sim_pq_adc", "text_domain_cap", "sim_hard_negatives", "sim_ivf_recall",
    "sim_mips_recall", "sim_retrieval_metrics", "sim_ivf_hier_topk")

  /** Sanctioned bounded-side BroadcastNestedLoopJoins: one side is a
    * CONSTANT probe/centroid set (a fixed handful of rows independent
    * of SF), so the "quadratic" join is really one linear corpus scan ×
    * a constant — the brute-force-yardstick and probe-scan shapes. The
    * scalar-aggregate exemption in the join rule cannot see these (the
    * bounded side is a filtered scan, not an agg). */
  private val boundedSideJoin = Set(
    "sim_mips",            // 4-probe broadcast against the corpus scan
    "sim_binary_hamming",  // 5-probe broadcast, bit-packed scan
    "sim_cosine_topk",     // the LABELED brute-force recall yardstick
    "sim_pq_adc",          // 5-probe × 16-seed distance-table build
    "sim_hard_negatives",  // 8-probe broadcast (labeled baseline; _cells is the scale path)
    "sim_ivf_recall",      // brute-force half of the recall audit, by design
    "sim_mips_recall",     // same: the true-dot brute half IS the audit
    "sim_retrieval_metrics") // 8-probe broadcast over the corpus scan
  // (The persisted-index searches need no join sanction: their
  // probe × centroid cross-join is collected eagerly during probe
  // assignment and never appears in the returned plan.)

  /** The ONLY sanctioned Window-on-SinglePartition sites, each with a
    * written bound on the serialized domain. A global ordered window is
    * fine when it runs over a COMPRESSED domain that stays tiny at any
    * SF — these two run over distinct-value groups, not rows:
    *  - q29_skyline: distinct p_retailprice values (TPC-H retail prices
    *    are generated from a fixed formula — ~100k distinct values at
    *    ANY scale factor; the running max is a prefix max that
    *    decomposes into the two-pass SequencePack scan if the domain
    *    ever outgrows one task);
    *  - sketch_quantile_bins: floor(price) histogram bins (same fixed
    *    price domain — bounded by the price range, not row count).
    * Anything else on SinglePartition fails the window test. */
  private val boundedGlobalWindow = Set("q29_skyline", "sketch_quantile_bins")

  private def planOf(name: String): SparkPlan = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val df = SparkEntry.queries(name)(s2, sf0001)
    df.queryExecution.executedPlan
  }

  test("no cartesian or nested-loop join in any guarded query") {
    for (name <- guarded if !boundedSideJoin(name)) {
      val plan = planOf(name)
      val bad = plan.collect {
        case c: CartesianProductExec => c
        case b: BroadcastNestedLoopJoinExec
            // single-row scalar broadcasts (count/total cross joins) are
            // bounded by construction — the rule targets data×data loops
            if b.left.collectLeaves().nonEmpty && b.right.collectLeaves().nonEmpty &&
              !isScalarSide(b.left) && !isScalarSide(b.right) => b
      }
      assert(bad.isEmpty,
        s"$name plans a quadratic join:\n${bad.map(_.nodeName).mkString(", ")}")
    }
  }

  /** An aggregate with no grouping keys produces exactly one row — the
    * broadcast scalar-join pattern (total counts, corpus stats). */
  private def isScalarSide(p: SparkPlan): Boolean =
    p.collectFirst {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec
          if a.groupingExpressions.isEmpty => a
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
          if a.groupingExpressions.isEmpty => a
      case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec
          if a.groupingExpressions.isEmpty => a
    }.isDefined

  test("no Window over a single-partition exchange in any guarded query") {
    for (name <- guarded if !boundedGlobalWindow(name)) {
      val plan = planOf(name)
      plan.collect { case w: WindowExec => w }.foreach { w =>
        val firstExchange = w.child.collectFirst { case e: ShuffleExchangeExec => e }
        firstExchange.foreach { e =>
          assert(e.outputPartitioning != SinglePartition,
            s"$name: Window fed by Exchange SinglePartition — the whole " +
              s"window serializes into one task:\n$w")
        }
      }
    }
  }

  /** Columns whose value domain is a small CONSTANT — independent of row
    * count — so a window partitioned solely by them serializes N/|domain|
    * rows into one task at any scale (the r10 text_ccnet_buckets weak:
    * ntile over 5 lang partitions). Names, not stats: these are the
    * repo's known enumerable keys across the testdata + derived tables. */
  private val enumerableKeys = Set(
    "lang", "flag", "status", "bucket", "label", "tier", "split",
    "l_returnflag", "l_linestatus", "o_orderstatus", "o_orderpriority",
    "c_mktsegment", "event_type", "l_shipmode",
    // r12 (the keys the r11 sim_mips / text_tfidf_terms weaks escaped
    // through): a fixed probe set's id and the ~20-value source column
    // are constants too — windows keyed only by them serialize
    // corpus-sized input into a constant task count.
    "source", "query_id", "probe_id")

  /** Sanctioned constant-key windows — each with a written bound:
    *  - q23_dist_windows: input pre-filtered to o_custkey < 50, a FIXED
    *    customer set whose order count does not grow with SF;
    *  - sim_ivf_index_topk / sim_mips_ivf / sim_hard_negatives_cells:
    *    query_id-keyed windows whose INPUT is cell-confined by the IVF
    *    layout — bounded by TargetCellSize × nprobe per probe, flat in
    *    N because autoCells grows the cell count ∝ N;
    *  - sim_cosine_topk: the LABELED brute-force recall yardstick — its
    *    corpus-sized probe window is the documented baseline the ANN
    *    paths are measured against, not a shipped scale path. */
  private val boundedConstantKeyWindow = Set(
    "q23_dist_windows",
    "sim_ivf_index_topk", "sim_mips_ivf", "sim_hard_negatives_cells",
    // Labeled brute-force yardsticks: corpus-sized probe windows ARE
    // the documented baselines their ANN/cell paths are measured
    // against (sim_ivf_recall's brute half is the audit's definition).
    "sim_cosine_topk", "sim_hard_negatives", "sim_ivf_recall",
    // sim_mips_recall's ivf half rides the cell-bounded search window,
    // sim_ivf_hier_topk's window input is cell-confined like the rest.
    "sim_mips_recall", "sim_ivf_hier_topk")

  /** The offender detector, factored out so the guard itself is
    * regression-testable (see the "guard still fires" test): windows
    * whose partition keys are ALL enumerable constants. */
  private def constantKeyWindowOffenders(plan: SparkPlan): Seq[WindowExec] =
    plan.collect { case w: WindowExec => w }.filter { w =>
      val keys = w.partitionSpec.flatMap(_.references.map(_.name.toLowerCase))
      keys.nonEmpty && keys.forall(k => enumerableKeys(k.takeWhile(_ != '#')))
    }

  test("no Window partitioned solely by enumerable-constant keys") {
    for (name <- guarded
         if !boundedGlobalWindow(name) && !boundedConstantKeyWindow(name)) {
      val offenders = constantKeyWindowOffenders(planOf(name))
      assert(offenders.isEmpty,
        s"$name: Window partitioned only by enumerable-constant key(s) — " +
          s"partition count is a constant, one task sorts N/|domain| rows " +
          s"at scale. Use topk_by / topk_by_str / ExactNtile instead:\n" +
          offenders.mkString("\n"))
    }
  }

  test("the constant-key-window guard itself still fires on the pre-r12 shapes") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    import s2.implicits._
    // The r11 sim_mips shape: ranking via a window keyed ONLY by the
    // 4-value probe id. If someone reintroduces it, the detector (and
    // with it the test above) must flag the plan.
    val mips = Seq((0L, 1L, 0.5), (1L, 2L, 0.25)).toDF("query_id", "neighbor_id", "d2")
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("d2").asc, col("neighbor_id").asc)))
      .where(col("rank") <= 3)
    assert(constantKeyWindowOffenders(mips.queryExecution.executedPlan).nonEmpty,
      "detector no longer flags a query_id-only window — the r11 sim_mips " +
        "weak would ship unnoticed")
    // The r11 text_tfidf_terms shape: top-5 keyed only by ~20-value source.
    val tfidf = Seq(("web", "a", 1.0)).toDF("source", "term", "weight")
      .withColumn("rank", row_number().over(
        Window.partitionBy("source").orderBy(col("weight").desc, col("term").asc)))
      .where(col("rank") <= 5)
    assert(constantKeyWindowOffenders(tfidf.queryExecution.executedPlan).nonEmpty,
      "detector no longer flags a source-only window — the r11 " +
        "text_tfidf_terms weak would ship unnoticed")
    // And a corpus-keyed window (doc_id grows with the data) must NOT trip.
    val ok = Seq((1L, 2.0)).toDF("doc_id", "v")
      .withColumn("rank", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("v").desc)))
    assert(constantKeyWindowOffenders(ok.queryExecution.executedPlan).isEmpty,
      "detector over-fires on growing keys")
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    val plan = planOf("q2_topk").toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("multiway join pushes filters into the scans") {
    val plan = planOf("q7_multiway_join").toString
    assert(plan.contains("PushedFilters: [Is") || plan.contains("PushedFilters: [*"),
      s"expected pushed filters in the fact scans:\n$plan")
  }

  test("q22 skew join mode is size-aware: broadcast small dim, AQE-SMJ big dim") {
    // Small dim (test SF under the session threshold): the UNREPLICATED
    // orders side must broadcast-hash — no shuffle, no hot reduce key,
    // and crucially no static salt replication anywhere in the plan.
    val small = planOf("q22_salted_join").toString
    assert(small.contains("BroadcastHashJoin"),
      s"q22 should broadcast the sub-threshold dim side:\n$small")
    assert(!small.contains("_salt"),
      s"the size-aware path must not replicate statically:\n$small")

    // Dim side over the threshold (forced with -1): the SAME code must
    // flip to a plain shuffle join (AQE skew split handles hot keys at
    // runtime, SkewJoinSpec) — again without salt replication, which is
    // exactly what the old static spelling paid on top of its sf1 SMJ.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val big = SparkEntry.queries("q22_salted_join")(s2, sf0001)
      .queryExecution.executedPlan.toString
    assert(big.contains("SortMergeJoin"),
      s"q22 over-threshold should shuffle-join under AQE skew handling:\n$big")
    assert(!big.contains("_salt") && !big.contains("BroadcastHashJoin"), big)
  }
}
