package graft.tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hilbert-curve clustering over exactly TWO numeric columns — the
  * locality-tighter sibling of [[ZOrder]] (Delta's OPTIMIZE gained the
  * same upgrade as liquid clustering's curve choice).
  *
  * Same grid as Z-order (ZOrder.bounds + ZOrder.ranks: one aggregate
  * pass for bounds, min-max integer ranks), but cells are ordered along
  * the Hilbert walk (codegen'd [[graft.expressions.HilbertXY]]) instead
  * of the Morton interleave. Successive Hilbert indexes are always
  * ADJACENT grid cells, so an equal-size index range — one output file
  * after the range partition — covers a tighter (x, y) box than the
  * Morton order, whose bit-carry seams jump across the plane: narrower
  * per-file min/max envelopes, more files pruned per box query
  * (HilbertOrderSpec measures both layouts on the same data).
  */
object HilbertOrder {

  /** Cluster `df` by the 2-D Hilbert index of `cols` into `numFiles`
    * range partitions, sorted within each — one shuffle, like
    * ZOrder.cluster. */
  def cluster(
      df: DataFrame, cols: Seq[String], numFiles: Int,
      bits: Int = ZOrder.DefaultBits): DataFrame = {
    require(cols.size == 2, s"hilbert clustering is 2-D; got ${cols.size} columns")
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val hcol = "__graft_hilbert"
    require(!df.columns.contains(hcol),
      s"input already has a $hcol column — rename it before clustering")
    val Seq(rx, ry) = ZOrder.ranks(ZOrder.bounds(df, cols), bits)
    df.withColumn(hcol, call_function("hilbert_xy", rx, ry, lit(bits)))
      .repartitionByRange(math.max(1, numFiles), col(hcol))
      .sortWithinPartitions(hcol)
      .drop(hcol)
  }
}
