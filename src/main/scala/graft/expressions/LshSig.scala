package graft.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native `bits`-wide random-hyperplane LSH signature over an
  * `array<float>` embedding — the codegen'd twin of
  * `Similarity.lshSigSpark`'s HOF spelling.
  *
  * WHY (r15 measurement): the auto-width bucketed-NN tier made pair
  * work linear, at which point the sf10 profile moved INTO the
  * signature itself — the nested `aggregate` HOFs evaluate bits×dim
  * interpreted lambda steps per row (11×64 at sf10), the exact
  * shape the build plan reserves for a custom Expression with
  * `doGenCode` (same rationale as [[CosineSim]]).
  *
  * Numeric contract (bit-identical to the HOF spelling and the DuckDB
  * oracle, pinned in LshSigSpec):
  *   w(j,d) = double(((1103515245L·(j·dim+d) + 12345) mod 2^31) − 2^30)
  *   proj_j = left fold over d of emb[d]·w(j,d)   (double adds, d order)
  *   sig    = Σ_j (proj_j > 0 ? 1L<<j : 0)
  * All operands stay exactly the SQL formulation's: the LCG is integer,
  * each product double-widens emb[d] first, and the fold order is the
  * element order. `bits`/`dim` are plan-time literals (they size the
  * generated loops); dim must match the array length — enforced at
  * eval so a schema drift fails loudly instead of hashing garbage.
  * A null ARRAY yields null (nullSafeEval); a null ELEMENT yields
  * signature 0 — exactly what the HOF and DuckDB spellings produce
  * when the null nulls every projection fold (r15 review).
  */
case class LshSig(child: Expression, bits: Int, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(bits >= 1 && bits <= 63, s"lsh_sig bits must be in [1,63], got $bits")
  require(dim >= 1, s"lsh_sig dim must be >= 1, got $dim")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))

  override def dataType: DataType = LongType

  override def prettyName: String = "lsh_sig"

  private def checkLen(n: Int): Unit =
    if (n != dim) throw new IllegalArgumentException(
      s"lsh_sig: embedding has $n elements, expression compiled for dim=$dim")

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    checkLen(x.numElements())
    // A null ELEMENT nulls every proj_j in the HOF spelling, whose
    // CASE then contributes 0 for every bit — and the DuckDB dual's
    // NULL list_reduce does the same — so the signature is 0, not a
    // hash of null-as-0.0f (r15 review pinned the divergence).
    var nd = 0
    while (nd < dim) { if (x.isNullAt(nd)) return 0L; nd += 1 }
    var sig = 0L
    var j = 0
    while (j < bits) {
      var proj = 0.0
      var d = 0
      while (d < dim) {
        val w = ((1103515245L * (j.toLong * dim + d) + 12345L) % 2147483648L) - 1073741824L
        proj += x.getFloat(d).toDouble * w.toDouble
        d += 1
      }
      if (proj > 0.0) sig += (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val w = ctx.freshName("w")
      val proj = ctx.freshName("proj")
      val sig = ctx.freshName("sig")
      val hasNull = ctx.freshName("hasNull")
      s"""
         |if ($x.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "lsh_sig: embedding has " + $x.numElements() +
         |    " elements, expression compiled for dim=$dim");
         |}
         |long $sig = 0L;
         |boolean $hasNull = false;
         |for (int $d = 0; $d < $dim; $d++) {
         |  if ($x.isNullAt($d)) { $hasNull = true; break; }
         |}
         |if (!$hasNull) {
         |  for (int $j = 0; $j < $bits; $j++) {
         |    double $proj = 0.0;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      long $w = ((1103515245L * ((long) $j * $dim + $d) + 12345L)
         |        % 2147483648L) - 1073741824L;
         |      $proj += (double) $x.getFloat($d) * (double) $w;
         |    }
         |    if ($proj > 0.0) $sig += (1L << $j);
         |  }
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshSig =
    copy(child = newChild)
}
