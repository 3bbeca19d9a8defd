package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling aggregation: two-phase salted aggregate for hot keys.
  *
  * `groupBy(k).agg(sum/count/...)` already does partial (map-side)
  * aggregation, which absorbs most skew; salting matters when the
  * DISTINCT-ish or collect-style aggregates (or extreme key heat) make
  * even the reduce side of one key too large for a task. Phase 1 groups
  * by (key, salt) — salt derived deterministically from a row-unique
  * column so re-runs are stable — phase 2 re-aggregates the partials by
  * key. Works for any algebraic aggregate (sum/count/min/max).
  *
  * At 100 TB this is the pattern for hot-key rollups; AQE's skew-join
  * handling covers joins, but aggregation salting must be explicit.
  */
object SkewOps {

  /** Salted large-large equi-join for a skewed key: every left row gets a
    * deterministic salt in [0, salts) from a row-unique column, every
    * right row is replicated once per salt value, and the join runs on
    * (key, salt) — a hot key's probe rows split across `salts` reduce
    * tasks instead of landing in one. The result is row-identical to the
    * plain join (each left row meets each matching right row in exactly
    * one salt group); the cost is a `salts`× replication of the right
    * side, so salt the side whose partner is the smaller of the two.
    * This is the STATIC skew recipe — AQE's runtime skew split
    * (SkewJoinSpec) needs no replication but only triggers on observed
    * partition stats; explicit salting is how you pin the plan when the
    * skew is known in advance. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: Seq[String],
      saltSource: Column,
      salts: Int): DataFrame = {
    val l = left.withColumn("_salt", pmod(hash(saltSource), lit(salts)))
    val r = right.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, key :+ "_salt").drop("_salt")
  }

  /** The SIZE-AWARE mode decision for a skewed equi-join, derived from
    * the optimizer's estimate of the replicated-side size (file
    * statistics × selectivity — no job runs):
    *
    *  - `"broadcast"`: the dim side fits the session broadcast threshold
    *    → a broadcast-hash join has NO shuffle and therefore no hot
    *    reduce key; salting would pay `salts`× replication for nothing.
    *  - `"aqe-smj"`: the dim side is too big to broadcast → static
    *    replication would multiply the DOMINANT shuffle by `salts`
    *    on top of the sort-merge join it was meant to avoid (the q22
    *    sf1 16.5× flip). The join runs plain and AQE's runtime skew
    *    split (`spark.sql.adaptive.skewJoin`) handles observed hot
    *    partitions with zero replication.
    *
    * Static salting ([[saltedJoin]]) remains the explicit-opt-in recipe
    * for skew that is KNOWN in advance on a broadcast-sized dim. */
  def skewJoinMode(right: DataFrame): String = {
    val spark = right.sparkSession
    val raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    // Bare numbers (including the disabling "-1") are legal conf values
    // that JavaUtils' suffixed-byte-string parser rejects.
    val threshold = scala.util.Try(raw.trim.toLong).getOrElse(
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw))
    val est = right.queryExecution.optimizedPlan.stats.sizeInBytes
    if (threshold >= 0 && est <= BigInt(threshold)) "broadcast" else "aqe-smj"
  }

  /** Size-aware skewed equi-join: picks the physical strategy from the
    * measured build side via [[skewJoinMode]] instead of betting
    * statically. Row-identical to `left.join(right, key)` in both modes.
    * Note the UNREPLICATED dim is what broadcasts — the static salted
    * path's 8×-replicated broadcast side is exactly what flipped q22 to
    * sort-merge at sf1 (the replication ate the threshold headroom). */
  def adaptiveSkewJoin(
      left: DataFrame,
      right: DataFrame,
      key: Seq[String]): DataFrame =
    skewJoinMode(right) match {
      case "broadcast" => left.join(broadcast(right), key)
      case _           => left.join(right, key)
    }

  /** sum/count aggregate over `valueCol` grouped by `key`, salted into
    * `salts` sub-groups by a deterministic row hash. */
  def saltedSumCount(
      df: DataFrame,
      key: Seq[String],
      valueCol: String,
      saltSource: Column,
      salts: Int): DataFrame = {
    val keyCols = key.map(col)
    val partial = df
      .withColumn("_salt", pmod(hash(saltSource), lit(salts)))
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pcnt"))
    partial
      .groupBy(keyCols: _*)
      .agg(sum("_psum").as(s"sum_$valueCol"), sum("_pcnt").as("n"))
  }
}
