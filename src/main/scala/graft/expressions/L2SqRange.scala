package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native squared-L2 distance over a SUBRANGE of two `array<float>`
  * columns: `l2_sq_range(a, b, offset)` = Σ over the `len` elements
  * starting at 1-based `offset` of (a[k] − b[k])², with `len` fixed at
  * plan time.
  *
  * WHY: product quantization scores each subspace separately — the HOF
  * spelling (`aggregate(sequence(...), ... element_at(a, m*8+i) ...)`)
  * interprets every element lambda, and the PQ assignment evaluates it
  * K×M times per vector. Same rationale as [[CosineSim]]: semantics
  * expressible with built-ins, performance not. The offset is a real
  * column (the subspace id picks it), so it rides as a child expression
  * rather than a literal.
  *
  * Numeric contract: strict left fold in index order of
  * (double(a[k]) − double(b[k]))², identical to the HOF/DuckDB
  * formulation — bit-identical results. NULL if any input is NULL or
  * the range falls outside either array.
  */
case class L2SqRange(first: Expression, second: Expression, third: Expression, len: Int)
    extends TernaryExpression with ExpectsInputTypes {

  require(len >= 1, s"l2_sq_range len must be >= 1, got $len")

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType), IntegerType)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "l2_sq_range"

  override protected def nullSafeEval(a: Any, b: Any, off: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val start = off.asInstanceOf[Int] - 1
    if (start < 0 || start + len > x.numElements() || start + len > y.numElements())
      return null
    var acc = 0.0
    var i = 0
    while (i < len) {
      val d = x.getFloat(start + i).toDouble - y.getFloat(start + i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, off) => {
      val i = ctx.freshName("i")
      val start = ctx.freshName("start")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $start = $off - 1;
         |if ($start < 0 || $start + $len > $x.numElements() || $start + $len > $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $len; $i++) {
         |    double $d = (double) $x.getFloat($start + $i) - (double) $y.getFloat($start + $i);
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): L2SqRange =
    copy(first = newFirst, second = newSecond, third = newThird)
}
