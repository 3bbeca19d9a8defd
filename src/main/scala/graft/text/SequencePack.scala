package graft.text

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * Total cost at any scale: one range shuffle over (key, weight) pairs +
  * two narrow scans of the cached pairs. SequencePackSpec pins both the
  * bit-equality with the naive window and the absence of any Window /
  * single-partition Exchange in this plan.
  */
object SequencePack {

  /** Annotate (orderCol, weightCol) rows with the exclusive prefix sum of
    * weight in orderCol order. Output columns: doc_id, n_tokens,
    * start_off (all BIGINT). Both inputs must be castable to long and
    * orderCol must be unique (it is the total order).
    */
  def withStartOffsets(
      df: DataFrame, orderCol: String, weightCol: String, numParts: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranged = df
      .select(col(orderCol).cast("long").as("doc_id"),
        col(weightCol).cast("long").as("n_tokens"))
      .repartitionByRange(numParts, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .as[(Long, Long)]
      .persist()
    // Pass 1: one partial sum per partition. Bounded by numParts — this
    // collect is O(partitions), independent of row count.
    val partSums: Array[(Int, Long)] = ranged
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var s = 0L
        it.foreach(s += _._2)
        Iterator.single((pid, s))
      }
      .collect()
    val offsets: Map[Int, Long] = {
      var acc = 0L
      partSums.sortBy(_._1).map { case (pid, s) =>
        val off = acc; acc += s; pid -> off
      }.toMap
    }
    val bc = spark.sparkContext.broadcast(offsets)
    // Pass 2: narrow re-walk of the SAME cached partitions (iterator order
    // is the sortWithinPartitions order) adding the partition offset.
    ranged
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var run = bc.value(pid)
        it.map { case (id, n) => val start = run; run += n; (id, n, start) }
      }
      .toDF("doc_id", "n_tokens", "start_off")
  }

  /** Pack into fixed token-budget bins: per-bin doc count, token count and
    * doc-id range. Docs whose tokens straddle a bin boundary belong to the
    * bin their first token falls in (contiguous-fill semantics — the
    * stream is cut every `budget` tokens regardless of doc edges, exactly
    * how a pretraining loader chunks a concatenated corpus). */
  def packBins(
      df: DataFrame, orderCol: String, weightCol: String,
      budget: Long, numParts: Int): DataFrame =
    withStartOffsets(df, orderCol, weightCol, numParts)
      .selectExpr("doc_id", "n_tokens", s"start_off DIV $budget AS bin")
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
}
