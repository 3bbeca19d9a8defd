package graft.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark has no built-in form for: backward as-of
  * join and interval (range) join.
  *
  * Neither needs a custom `SparkPlan` — both reduce to shapes Catalyst
  * already executes well, which is the preferred implementation order for
  * operators the engine adds beyond the reference (compose built-ins
  * before dropping to custom plans):
  *
  *  - As-of join: the classic union-window formulation. Tag both inputs,
  *    union them, and run `last(payload, ignoreNulls)` over a
  *    key-partitioned, time-ordered window. ONE shuffle on the key, a
  *    linear per-key scan, no range explosion — the plan you want at
  *    100 TB (a naive `left.join(right, lt >= rt).groupBy(max)` is a
  *    quadratic band join by contrast).
  *  - Range join: for a small interval table, a broadcast join with the
  *    range predicate (BroadcastNestedLoopJoin — the big side is never
  *    shuffled); for two large inputs, bin the time axis, explode each
  *    interval into the bins it spans, and equi-join on bin so the
  *    non-equi predicate only runs inside co-bucketed pairs.
  */
object TemporalJoins {

  /** Backward as-of join: for each left row, the single most recent right
    * row with the same `key` and `rightTs <= leftTs` (inclusive).
    *
    * Semantics (pinned by the `asof_purchase_click` oracle + AsOfJoinSpec):
    *  - ties on `rightTs` between right rows are broken by the largest
    *    `tieBreak` value (must be a non-null numeric right column);
    *  - a right row AT the left timestamp matches (inclusive bound);
    *  - `toleranceMs` (if set) nulls matches older than the tolerance,
    *    like pandas `merge_asof(tolerance=...)`.
    *
    * Output: all left columns plus `asof_<p>` for each payload column and
    * `asof_gap_ms` (leftTs - matched rightTs; null when no match).
    *
    * `leftTs` / `rightTs` are epoch-millisecond BIGINT columns — callers
    * convert timestamps first so ordering is integer-exact.
    */
  def asOfJoinBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tieBreak: String,
      toleranceMs: Option[Long] = None): DataFrame =
    asOfJoin(left, right, key, leftTs, rightTs, payload, tieBreak, toleranceMs,
      forward = false)

  /** Forward as-of join: the single EARLIEST right row with
    * `rightTs >= leftTs` (inclusive) — conversion-latency / next-event
    * semantics. Same plan, tie and tolerance contract as the backward
    * variant; `asof_gap_ms` = matched rightTs - leftTs. */
  def asOfJoinForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tieBreak: String,
      toleranceMs: Option[Long] = None): DataFrame =
    asOfJoin(left, right, key, leftTs, rightTs, payload, tieBreak, toleranceMs,
      forward = true)

  private def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tieBreak: String,
      toleranceMs: Option[Long],
      forward: Boolean): DataFrame = {
    require(payload.contains(tieBreak), s"tieBreak $tieBreak must be a payload column")
    val clash = payload.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"payload columns clash with left columns: ${clash.mkString(",")}")
    val l = left
      .withColumn("__t", col(leftTs))
      .withColumn("__side", lit(1))
    val r = right
      .select(col(key) +: col(rightTs).as("__t") +: payload.map(col): _*)
      .withColumn("__side", lit(0))
    // unionByName(allowMissingColumns) null-fills each side's missing
    // columns with the other side's types — no manual typed-null casts.
    val u = l.unionByName(r, allowMissingColumns = true)

    // Backward scans time ascending, forward descending; either way right
    // rows sort before left rows at equal __t (side 0 < 1) so the
    // inclusive bound holds, and among right ties the largest tieBreak is
    // scanned last and wins (tieBreak ascending in BOTH directions). Left
    // rows have a null tieBreak — coalesce keeps the sort key total so
    // both engines order identically.
    val tOrder = if (forward) col("__t").desc else col("__t").asc
    val w = Window
      .partitionBy(key)
      .orderBy(tOrder, col("__side").asc,
        coalesce(col(tieBreak), lit(Long.MinValue)).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // One projection for every windowed column -> a single Window (and a
    // single sort) in the physical plan.
    val asofCols =
      ("__asof_t", last(when(col("__side") === 0, col("__t")), ignoreNulls = true).over(w)) +:
        payload.map(p => (s"asof_$p", last(col(p), ignoreNulls = true).over(w)))
    val gap =
      if (forward) col("__asof_t") - col("__t") else col("__t") - col("__asof_t")
    val filled = u
      .select(u.columns.map(col) ++ asofCols.map { case (n, c) => c.as(n) }: _*)
      .filter(col("__side") === 1)
      .withColumn("asof_gap_ms", gap)

    val tol = toleranceMs.fold(filled) { t =>
      val keep = col("asof_gap_ms") <= t
      (payload.map(p => s"asof_$p") :+ "asof_gap_ms")
        .foldLeft(filled)((df, c) => df.withColumn(c, when(keep, col(c))))
    }
    val dropCols = Seq("__t", "__side", "__asof_t") ++ payload
    tol.drop(dropCols: _*)
  }

  /** Interval join, small interval table: broadcast the ranges and let the
    * non-equi predicate run as a BroadcastNestedLoopJoin — the big side
    * streams through executors unshuffled. Right plan whenever the
    * interval table fits in a broadcast (calendars, campaign windows,
    * maintenance windows). */
  def rangeJoinBroadcast(
      big: DataFrame, ranges: DataFrame,
      ts: Column, start: Column, end: Column): DataFrame =
    big.join(broadcast(ranges), ts >= start && ts < end)

  /** Interval join, both sides large: bin the time axis at `binMs`,
    * explode each interval into every bin it spans, and equi-join on the
    * bin. A point lives in exactly one bin and an interval appears once
    * per spanned bin, so each matching (point, interval) pair meets in
    * exactly one bucket — no post-join dedup. One shuffle per side, and
    * the range predicate only evaluates within co-bucketed pairs.
    *
    * `binMs` trades replication (long intervals span end/binMs - start/binMs
    * + 1 bins) against bucket selectivity; pick it near the median interval
    * length. Timestamps must be non-negative epoch ms (DIV truncation). */
  def rangeJoinBinned(
      points: DataFrame, ptTs: String,
      ranges: DataFrame, startCol: String, endCol: String,
      binMs: Long): DataFrame = {
    val p = points.withColumn("__bin", expr(s"$ptTs DIV ${binMs}L"))
    val r = ranges.withColumn("__bin",
      explode(sequence(expr(s"$startCol DIV ${binMs}L"), expr(s"($endCol - 1L) DIV ${binMs}L"))))
    p.join(r, Seq("__bin"))
      .filter(col(ptTs) >= col(startCol) && col(ptTs) < col(endCol))
      .drop("__bin")
  }
}
