package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Hilbert-curve index: `hilbert_xy(xRank, yRank, bits)` maps a
  * `bits`-per-dimension grid cell to its position along the Hilbert
  * curve (the standard xy→d walk with per-level rotation).
  *
  * WHY a custom expression: Morton interleave is a pure bit shuffle
  * (ZOrder composes it from shift/and/or Columns), but the Hilbert walk
  * mutates (x, y) with data-dependent reflections at every level — as a
  * SQL `aggregate()` HOF it would run interpreted per row on the write
  * path. Same ladder rung as [[L2SqRange]]: semantics first, then
  * codegen. Hilbert's advantage over Morton for clustering: successive
  * indexes are always ADJACENT cells (no Morton "seams" that jump across
  * the plane), so equal-size index ranges span tighter boxes — narrower
  * per-file min/max envelopes for two-column range queries.
  *
  * NULL if either rank is NULL; ranks are masked into [0, 2^bits).
  */
case class HilbertXY(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ExpectsInputTypes {

  require(bits >= 1 && bits <= 31, s"hilbert_xy bits must be in [1, 31], got $bits")

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_xy"

  override protected def nullSafeEval(xa: Any, ya: Any): Any =
    HilbertXY.xy2d(bits, xa.asInstanceOf[Long], ya.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.expressions.HilbertXY.xy2d($bits, $x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertXY =
    copy(left = newLeft, right = newRight)
}

object HilbertXY {

  /** The reference walk (shared by interpreted eval, codegen — which
    * calls straight into it, one static call per row — and the spec's
    * adjacency/bijectivity checks). */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val mask = (1L << bits) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse walk (d → cell), for the spec's adjacency proof. */
  def d2xy(bits: Int, d0: Long): (Long, Long) = {
    var rx = 0L; var ry = 0L
    var x = 0L; var y = 0L
    var t = d0
    var s = 1L
    while (s < (1L << bits)) {
      rx = 1L & (t / 2)
      ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}
