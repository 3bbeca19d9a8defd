package graft.text

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing for pretraining: lay documents end-to-end in a
  * deterministic order and chunk the concatenated token stream into
  * fixed-budget training sequences ("bins"). A document's bin is
  * `floor(start_offset / budget)` where `start_offset` is the exclusive
  * prefix sum of token counts in document order — i.e. where the doc's
  * first token lands in the concatenated stream.
  *
  * The naive formulation is a global window cumulative sum
  * (`sum(n) OVER (ORDER BY doc_id)`): with no PARTITION BY, Spark plans a
  * single-partition Exchange and one task walks the whole corpus — the
  * canonical 100 TB scale-killer. This is the distributed dual, the
  * classic two-pass parallel prefix sum:
  *
  *   1. range-partition on the order key (partition p holds a contiguous
  *      key range, so partition order == global order) and persist that
  *      exact layout;
  *   2. pass 1 reduces each partition to ONE partial sum; the collect is
  *      bounded by the partition count, never the data;
  *   3. pass 2 re-walks each cached partition adding its exclusive
  *      partition offset — a narrow mapPartitions, no further shuffle.
  *
  * Total cost at any scale: one range shuffle over (keys, weight) rows +
  * two narrow scans of the cached rows. The same core gives a distributed
  * ROW_NUMBER over a total order (weight = 1) — see `withGlobalRank`.
  * SequencePackSpec pins both the bit-equality with the naive window and
  * the absence of any Window / single-partition Exchange in this plan.
  */
object SequencePack {

  /** Annotate rows with the exclusive prefix sum of `weightCol` in
    * `orderCols` order. The combined key must be a total order (pass a
    * unique tiebreak column last) and every order/weight value must be a
    * non-null long-castable. Output: orderCols (cast to long) ++
    * (weightCol cast to long) ++ keepCols (passed through untyped) ++
    * start_off.
    *
    * Partition offsets are keyed by each partition's FIRST KEY, not by a
    * runtime partition id: `TaskContext.getPartitionId()` lies when a
    * downstream `coalesce` merges this stage into fewer tasks (every
    * parent partition then reports the coalesced id), whereas boundary
    * keys are data values — correct under coalesce, AQE re-planning, and
    * even cache-eviction recompute. Pass 2 walks rows in order and
    * resets its running total whenever it crosses a boundary key. */
  def withStartOffsets(
      df: DataFrame, orderCols: Seq[String], weightCol: String,
      numParts: Int, keepCols: Seq[String] = Nil): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keys = orderCols.map(c => col(c).cast("long").as(c))
    val ranged = df
      .select(keys ++ (col(weightCol).cast("long").as(weightCol) +: keepCols.map(col)): _*)
      .repartitionByRange(numParts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .persist()
    val wIdx = orderCols.length
    def keyOf(r: Row): Seq[Long] = (0 until wIdx).map(r.getLong)
    def cmp(a: Seq[Long], b: Seq[Long]): Int =
      a.lazyZip(b).collectFirst { case (x, y) if x != y => java.lang.Long.compare(x, y) }
        .getOrElse(0)
    // Pass 1: (first key, partial sum) per non-empty partition. The
    // collect is bounded by the partition count, never the data.
    val partSums: Array[(Seq[Long], Long)] = ranged
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val first = it.next()
          var s = first.getLong(wIdx)
          val k = keyOf(first)
          it.foreach(s += _.getLong(wIdx))
          Iterator.single((k, s))
        }
      }
      .collect()
    // Exclusive prefix over boundary order = global key order.
    val boundaries: Array[(Seq[Long], Long)] = {
      var acc = 0L
      partSums.sortWith((a, b) => cmp(a._1, b._1) < 0).map { case (k, s) =>
        val off = acc; acc += s; k -> off
      }
    }
    val bc = spark.sparkContext.broadcast(boundaries)
    // Pass 2: narrow re-walk of the cached partitions (iterator order is
    // the sortWithinPartitions order; under coalesce, parents concatenate
    // in ascending range order) resetting at each boundary key.
    implicit val outEnc = Encoders.row(ranged.schema.add("start_off", LongType))
    ranged.mapPartitions { it =>
      val bs = bc.value
      var bi = -1
      var run = 0L
      it.map { r =>
        val k = keyOf(r)
        while (bi + 1 < bs.length && cmp(bs(bi + 1)._1, k) <= 0) {
          bi += 1; run = bs(bi)._2
        }
        val start = run; run += r.getLong(wIdx)
        Row.fromSeq(r.toSeq :+ start)
      }
    }
  }

  def withStartOffsets(
      df: DataFrame, orderCol: String, weightCol: String,
      numParts: Int): DataFrame =
    withStartOffsets(df, Seq(orderCol), weightCol, numParts)

  /** Distributed INCLUSIVE running min AND max of `valueCol` over the
    * total order `orderCols` — the same two-pass scan as
    * withStartOffsets with the monoid swapped from (+, 0) to
    * (min, +∞) × (max, −∞): pass 1 reduces each range partition to its
    * extremes (collect bounded by partition count), the exclusive
    * running extremes over partition extremes broadcast back, pass 2
    * re-walks each cached partition. This is the scan that turns
    * order-recurrences into closed forms — e.g. CUSUM's
    * S_t = max(0, S_{t-1} + d_t) equals P_t - min_{k<=t} P_k for the
    * prefix sums P, so a sequential-looking detector becomes two
    * parallel scans. Output: input columns + `run_min` + `run_max`. */
  def withRunningMinMax(
      df: DataFrame, orderCols: Seq[String], valueCol: String,
      numParts: Int, keepCols: Seq[String] = Nil): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keys = orderCols.map(c => col(c).cast("long").as(c))
    val ranged = df
      .select(keys ++ (col(valueCol).cast("long").as(valueCol) +: keepCols.map(col)): _*)
      .repartitionByRange(numParts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .persist()
    val vIdx = orderCols.length
    def keyOf(r: Row): Seq[Long] = (0 until vIdx).map(r.getLong)
    def cmp(a: Seq[Long], b: Seq[Long]): Int =
      a.lazyZip(b).collectFirst { case (x, y) if x != y => java.lang.Long.compare(x, y) }
        .getOrElse(0)
    val partExtremes: Array[(Seq[Long], Long, Long)] = ranged
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val first = it.next()
          var mn = first.getLong(vIdx); var mx = mn
          val k = keyOf(first)
          it.foreach { r =>
            val v = r.getLong(vIdx)
            if (v < mn) mn = v; if (v > mx) mx = v
          }
          Iterator.single((k, mn, mx))
        }
      }
      .collect()
    val boundaries: Array[(Seq[Long], Long, Long)] = {
      var accMn = Long.MaxValue; var accMx = Long.MinValue
      partExtremes.sortWith((a, b) => cmp(a._1, b._1) < 0).map { case (k, mn, mx) =>
        val exMn = accMn; val exMx = accMx
        accMn = math.min(accMn, mn); accMx = math.max(accMx, mx)
        (k, exMn, exMx)
      }
    }
    val bc = spark.sparkContext.broadcast(boundaries)
    implicit val outEnc =
      Encoders.row(ranged.schema.add("run_min", LongType).add("run_max", LongType))
    val out = ranged.mapPartitions { it =>
      val bs = bc.value
      var bi = -1
      var runMn = Long.MaxValue; var runMx = Long.MinValue
      it.map { r =>
        // advance to the LAST boundary at or before this key (a task may
        // start deep in the boundary order, and under coalesce it may
        // span several parents) — a while, not an if.
        while (bi + 1 < bs.length && cmp(keyOf(r), bs(bi + 1)._1) >= 0) {
          bi += 1; runMn = bs(bi)._2; runMx = bs(bi)._3
        }
        val v = r.getLong(vIdx)
        runMn = math.min(runMn, v); runMx = math.max(runMx, v)
        Row.fromSeq(r.toSeq :+ runMn :+ runMx)
      }
    }
    // materialize pass 2 (localCheckpoint cleans itself up via the
    // ContextCleaner once unreferenced), then RELEASE the cached layout
    // — without this every call pins a corpus-sized cache entry for the
    // session lifetime.
    val ck = graft.tables.Checkpoints.cut(out)
    ranged.unpersist()
    ck
  }

  /** Distributed ROW_NUMBER over a total order: global rank (1-based) by
    * `orderCols` with no Window and no single-partition exchange — the
    * prefix sum of weight 1. */
  def withGlobalRank(df: DataFrame, orderCols: Seq[String], numParts: Int): DataFrame =
    withStartOffsets(df.withColumn("__one", lit(1L)), orderCols, "__one", numParts)
      .withColumn("global_rank", col("start_off") + 1)
      .drop("__one", "start_off")

  /** Pack into fixed token-budget bins: per-bin doc count, token count and
    * doc-id range. Docs whose tokens straddle a bin boundary belong to the
    * bin their first token falls in (contiguous-fill semantics — the
    * stream is cut every `budget` tokens regardless of doc edges, exactly
    * how a pretraining loader chunks a concatenated corpus). */
  def packBins(
      df: DataFrame, orderCol: String, weightCol: String,
      budget: Long, numParts: Int): DataFrame =
    withStartOffsets(df, Seq(orderCol), weightCol, numParts)
      .selectExpr(orderCol, weightCol, s"start_off DIV $budget AS bin")
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(weightCol).as("n_tokens"),
        min(orderCol).as("first_doc"),
        max(orderCol).as("last_doc"))
}
