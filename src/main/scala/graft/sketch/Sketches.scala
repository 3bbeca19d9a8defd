package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composed sketch operators: sketch for candidates, exact pass for the
  * answer — deterministic results from order-sensitive summaries. */
object Sketches {

  /** Exact heavy hitters: every value of `value` occurring in strictly
    * more than 1/`den` of the rows, with its exact count.
    *
    * Plan: one bounded-state MG pass (k = den-1 counters — enough for the
    * MG guarantee freq > n/k ⇒ tracked, with n/k ≤ n·(1/den) iff
    * den ≤ k+1) collects ≤ k candidate values to the driver, then one
    * exact count over only those values. The threshold compares in exact
    * integer arithmetic (c·den > n) so no float tie can flip a value
    * between engines. Unlike a plain groupBy/HAVING, nothing ever holds
    * per-distinct-value state proportional to the column's cardinality.
    */
  def heavyHitters(df: DataFrame, value: Column, den: Int): DataFrame = {
    require(den >= 2, s"den must be >= 2, got $den")
    val k = den - 1
    val v = df.select(value.as("v"))
    // Driver collect is bounded: one row, one <= k-element array, one long.
    val head = v.agg(expr(s"mg_candidates(v, $k)").as("cand"), count(lit(1)).as("n")).head()
    val cand = head.getSeq[String](0)
    val n = head.getLong(1)
    v.filter(col("v").isin(cand: _*))
      .groupBy("v")
      .agg(count(lit(1)).as("c"))
      .filter(col("c") * den > n)
  }
}
