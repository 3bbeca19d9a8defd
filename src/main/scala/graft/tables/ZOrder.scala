package graft.tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key over N numeric columns.
  *
  * WHY: parquet data skipping works off per-file / per-row-group min-max
  * stats. A single-column sort gives perfect skipping on that column and
  * none on any other; interleaving the bits of several columns' ranks
  * gives every listed column locality, so a range-partitioned sort on the
  * z-value yields files whose min-max spans are narrow in ALL the listed
  * dimensions — the same layout contract as Delta `OPTIMIZE ZORDER BY`
  * (reference: db/table_maintenance.sql OPTIMIZE guidance).
  *
  * Mechanics: each column is min-max normalized into a `bits`-wide integer
  * rank (one aggregate pass collects the 2N bounds — bounded driver state
  * at any scale), then the ranks' bits are interleaved LSB-first into one
  * LONG. The whole thing is built from `shiftright`/`shiftleft`/bitwise
  * `Column` primitives, so it stays inside whole-stage codegen — no UDF.
  */
object ZOrder {

  /** Max bits per column: with n columns the z-value occupies
    * n*bitsPerCol bits of the LONG; 16 keeps 3 columns well under 63 and
    * the generated expression tree small. */
  val DefaultBits = 16

  final case class ColBounds(name: String, min: Double, max: Double)

  /** One aggregate pass over `df` for the min/max of every z column. */
  def bounds(df: DataFrame, cols: Seq[String]): Seq[ColBounds] = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"__mn_$c"), max(col(c).cast("double")).as(s"__mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      val mn = Option(row.get(2 * i)).fold(0.0)(_.asInstanceOf[Double])
      val mx = Option(row.get(2 * i + 1)).fold(0.0)(_.asInstanceOf[Double])
      ColBounds(c, mn, mx)
    }
  }

  /** Min-max normalized `bits`-wide integer rank per bounded column —
    * the shared grid for any space-filling curve (Morton here, Hilbert
    * in [[HilbertOrder]]). NULLs rank lowest (coalesced to the min). */
  def ranks(bs: Seq[ColBounds], bits: Int = DefaultBits): Seq[Column] = {
    val maxRank = (1L << bits) - 1
    bs.map { b =>
      val c = coalesce(col(b.name).cast("double"), lit(b.min))
      val span = b.max - b.min
      if (span <= 0) lit(0L)
      else
        least(
          lit(maxRank),
          greatest(lit(0L), floor((c - lit(b.min)) / lit(span) * lit(maxRank.toDouble)).cast("long")))
    }
  }

  /** The interleaved z-value as a codegen-friendly LONG column. */
  def zvalue(bs: Seq[ColBounds], bits: Int = DefaultBits): Column = {
    require(bs.nonEmpty, "zorder needs at least one column")
    require(bs.size * bits <= 62, s"${bs.size} cols x $bits bits overflows LONG")
    val rs = ranks(bs, bits)
    val n = bs.size
    val terms = for {
      bit <- 0 until bits
      j <- 0 until n
    } yield shiftleft(shiftright(rs(j), bit).bitwiseAND(lit(1L)), bit * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** JVM reference for the interleave (spec parity check). */
  def zvalueJvm(ranks: Seq[Long], bits: Int = DefaultBits): Long = {
    var z = 0L
    val n = ranks.size
    var bit = 0
    while (bit < bits) {
      var j = 0
      while (j < n) {
        z |= ((ranks(j) >> bit) & 1L) << (bit * n + j)
        j += 1
      }
      bit += 1
    }
    z
  }

  /** Cluster `df` by the z-value of `cols` into `numFiles` range
    * partitions, sorted within each — every output file then covers a
    * narrow z-range, i.e. a narrow min-max span in every listed column.
    * One shuffle (the range exchange), same as Delta's OPTIMIZE rewrite. */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int, bits: Int = DefaultBits): DataFrame = {
    val zcol = "__graft_zorder"
    require(!df.columns.contains(zcol),
      s"input already has a $zcol column — rename it before z-ordering")
    val z = zvalue(bounds(df, cols), bits)
    df.withColumn(zcol, z)
      .repartitionByRange(math.max(1, numFiles), col(zcol))
      .sortWithinPartitions(zcol)
      .drop(zcol)
  }
}
