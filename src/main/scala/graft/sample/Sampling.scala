package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis.hash60Spark

/** Deterministic, content-stable sampling operators.
  *
  * Spark's `df.sample()` is seeded per-partition — the kept set changes
  * with partitioning, retries, and scale-up, which is poison for training
  * pipelines (a re-run of a 100 TB job must sample the SAME rows, and an
  * oracle must be able to replay the choice). These operators decide
  * per-row from an md5 hash of a stable key instead: keep iff
  * hash60(key) < frac * 2^60. No RNG state, no partitioning sensitivity,
  * identical row set on any cluster layout — and replayable in ANSI SQL.
  *
  * All predicates are narrow codegen'd expressions fused into the scan's
  * codegen stage: sampling never shuffles and reads no column beyond the
  * key and strata columns it hashes.
  */
object Sampling {

  /** frac mapped onto the 60-bit hash space, exact at build time so the
    * Spark predicate and the SQL oracle share one integer literal. */
  def threshold(frac: Double): Long = {
    require(frac >= 0.0 && frac <= 1.0, s"frac out of range: $frac")
    (frac * 1.152921504606846976e18).toLong
  }

  private def keep(keyExpr: String, thr: Long): Column =
    expr(hash60Spark(keyExpr)) < lit(thr)

  /** Bernoulli(frac) sample keyed on a stable column (cast to string for
    * hashing). */
  def bernoulli(df: DataFrame, keyExpr: String, frac: Double): DataFrame =
    df.filter(keep(keyExpr, threshold(frac)))

  /** Rebalance: downsample every stratum to the observed size of the
    * smallest one (the "equal shares" training mix), with the rate
    * DERIVED from the data rather than supplied. Fully declarative: the
    * per-stratum counts aggregate (bounded by |strata|), a global-window
    * min picks the floor, and the rate joins back as a broadcast — no
    * driver collect at any cardinality. The rate arithmetic
    * (min/cnt * 2^60, explicitly floor'd — Spark truncates double→long
    * casts where DuckDB rounds, so the floor is load-bearing) is fixed
    * IEEE order, replayable in SQL. */
  def rebalance(df: DataFrame, keyExpr: String, strataCol: String): DataFrame = {
    val counts = df.groupBy(strataCol).agg(count(lit(1)).as("cnt"))
    val rates = counts
      .withColumn("min_cnt",
        min("cnt").over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col(strataCol),
        (col("min_cnt").cast("double") / col("cnt").cast("double")).as("rate"))
    df.join(broadcast(rates), strataCol)
      .filter(expr(hash60Spark(keyExpr)) <
        floor(col("rate") * lit(1.152921504606846976e18)).cast("long"))
      .drop("rate")
  }

  /** Weight-budget rebalance: like [[rebalance]], but strata equalize on
    * SUM(weight) (tokens, characters, bytes) instead of row count — the
    * actual pretraining-mix primitive ("equal token share per source").
    * Keep decisions are still per-row by hash, so each stratum's kept
    * weight is binomially concentrated at the target. Weight sums are
    * cast to BIGINT on both engines before the double division (DuckDB
    * sums BIGINT into HUGEINT). */
  def rebalanceByWeight(
      df: DataFrame, keyExpr: String, strataCol: String, weightCol: String): DataFrame = {
    val sums = df.groupBy(strataCol).agg(sum(weightCol).cast("bigint").as("wsum"))
    val rates = sums
      .withColumn("min_w",
        min("wsum").over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col(strataCol),
        (col("min_w").cast("double") / col("wsum").cast("double")).as("rate"))
    df.join(broadcast(rates), strataCol)
      .filter(expr(hash60Spark(keyExpr)) <
        floor(col("rate") * lit(1.152921504606846976e18)).cast("long"))
      .drop("rate")
  }

  /** Weighted sampling without replacement: pick `k` rows with selection
    * probability increasing in `weightCol`, deterministically. Each row
    * gets priority = hash60(key) DIV weight — the integer-arithmetic
    * analogue of the Efraimidis–Spiridakis exponential keys (rank by
    * u^(1/w)): the hash is a fixed uniform draw in [0, 2^60) and dividing
    * by the weight shrinks heavy rows' priorities, so the k smallest
    * priorities are a weighted sample. Integer division instead of the
    * float formula keeps the oracle replay exact. The global top-k by
    * (priority, key) compiles to TakeOrderedAndProject — per-partition
    * bounded heaps merged on the driver, no global sort, no shuffle of
    * anything beyond k rows per partition at any corpus size. Weights
    * must be >= 1. */
  def weightedTopK(
      df: DataFrame, keyExpr: String, weightCol: String, k: Int): DataFrame =
    df.withColumn("priority",
        expr(s"${hash60Spark(keyExpr)} DIV CAST($weightCol AS BIGINT)"))
      .orderBy(col("priority"), expr(keyExpr))
      .limit(k)

  /** Stratified sampling: a different keep-rate per stratum value —
    * the source-rebalancing primitive for training mixes (downsample the
    * over-represented stratum, keep the rest). Strata not in `rates` use
    * `defaultFrac`. The rate choice compiles to a when-chain, so the
    * whole predicate stays inside whole-stage codegen. */
  def stratified(
      df: DataFrame,
      keyExpr: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultFrac: Double): DataFrame = {
    val h = expr(hash60Spark(keyExpr))
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit(threshold(defaultFrac))) {
      case (acc, (stratum, frac)) =>
        when(col(strataCol) === stratum, lit(threshold(frac))).otherwise(acc)
    }
    df.filter(h < thr)
  }

  /** Fractional-epoch mixture oversampling — the training-mix move when
    * a source's target weight exceeds 1 (DoReMi/Llama-style data
    * recipes quote "1.7 epochs of X"): every row repeats floor(w)
    * times, plus one more for the content-stable Bernoulli(frac(w))
    * subset, tagged with an `epoch` index (1-based). w < 1 downsamples,
    * w = 0 drops the stratum — and a stratum ABSENT from `weights` gets
    * `defaultWeight` copies (default 0.0, i.e. dropped: a mixture plan
    * lists what it wants; pass defaultWeight = 1.0 for "keep everything
    * I didn't rebalance"). Deterministic end-to-end: the fractional
    * pick hashes the row key (suffixed so it is independent of other
    * samples on the same key), so the same corpus yields the same mix
    * on any partitioning — and the plan is one narrow projection + an
    * explode, no shuffle, no RNG. */
  def epochs(
      df: DataFrame,
      keyExpr: String,
      strataCol: String,
      weights: Map[String, Double],
      defaultWeight: Double = 0.0): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0.0 && w < 100.0),
      "epoch weights must be in [0, 100)")
    val h = expr(hash60Spark(s"$keyExpr || ':ep'"))
    def chain(f: Double => Long): Column =
      weights.toSeq.sortBy(_._1).foldLeft(lit(f(defaultWeight))) { case (acc, (stratum, w)) =>
        when(col(strataCol) === stratum, lit(f(w))).otherwise(acc)
      }
    val fullC = chain(w => math.floor(w).toLong)
    val fracThr = chain(w => threshold(w - math.floor(w)))
    df.withColumn("__n_copies", fullC + when(h < fracThr, 1L).otherwise(0L))
      .filter(col("__n_copies") >= 1L)
      .withColumn("epoch", explode(sequence(lit(1L), col("__n_copies"))))
      .drop("__n_copies")
  }
}
