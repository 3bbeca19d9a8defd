package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine similarity over two `array<float>` columns.
  *
  * WHY a custom Expression: Spark's higher-order functions (`aggregate`,
  * `zip_with`) do not participate in whole-stage codegen — every element
  * step is an interpreted lambda call, ~100× a fused loop. Cosine over
  * embeddings is a per-row hot path in the similarity operators, so this
  * is exactly the case the build plan reserves for a custom Catalyst
  * `Expression` with `doGenCode` (SURVEY §7.4): the semantics are
  * expressible with built-ins, the performance is not.
  *
  * Numeric contract (identical to `Similarity.cosineSpark` /
  * `cosineJvm` / the DuckDB oracle): strict left fold over the element
  * index of double-widened products, then `dot / (sqrt(na) * sqrt(nb))`
  * — bit-identical results across the interpreted HOF, this codegen'd
  * loop, and the oracle.
  *
  * Null semantics match the HOF formulation: NULL if either array is
  * NULL, and NULL on a length mismatch (`zip_with` pads the shorter
  * array with NULL, which nulls the fold). Arrays are assumed
  * element-non-null (embedding columns).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // Seq[DataType] is covariantly a Seq[AbstractDataType] (which is
  // private[sql] and thus unnameable here).
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  // Mismatched lengths yield NULL even over non-nullable children, so
  // ev.isNull must be a real variable in the generated code.
  override def nullable: Boolean = true

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = (double) $x.getFloat($i);
         |    double $yi = (double) $y.getFloat($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Registration: `SparkSessionExtensions.injectFunction` makes
  * `cosine_sim(a, b)` available to every SQL/selectExpr surface —
  * attach with `.withExtensions(GraftExtensions.apply)` at session
  * build time (SparkSessions does). */
object GraftExtensions {
  val cosineSimDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "cosine_sim takes exactly 2 arguments")
      CosineSim(children.head, children(1))
    })

  // The analyzer wraps a bare AggregateFunction from the registry in an
  // AggregateExpression, same as built-in aggregates; k must be a literal
  // because it sizes the aggregation buffer at plan time.
  val kmvDistinctDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kmv_distinct"),
    new ExpressionInfo(classOf[graft.sketch.KmvDistinct].getName, "kmv_distinct"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "kmv_distinct takes exactly 2 arguments: (hash60, k)")
      val k = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(i: Int, _) => i
        case other => throw new IllegalArgumentException(
          s"kmv_distinct k must be an integer literal, got $other")
      }
      graft.sketch.KmvDistinct(children.head, k)
    })

  val mgCandidatesDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("mg_candidates"),
    new ExpressionInfo(classOf[graft.sketch.MgCandidates].getName, "mg_candidates"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "mg_candidates takes exactly 2 arguments: (value, k)")
      val k = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(i: Int, _) => i
        case other => throw new IllegalArgumentException(
          s"mg_candidates k must be an integer literal, got $other")
      }
      graft.sketch.MgCandidates(children.head, k)
    })

  val topKByDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("topk_by"),
    new ExpressionInfo(classOf[graft.sketch.TopKBy].getName, "topk_by"),
    (children: Seq[Expression]) => {
      require(children.size == 3, "topk_by takes exactly 3 arguments: (score, id, k)")
      val k = children(2) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(i: Int, _) => i
        case other => throw new IllegalArgumentException(
          s"topk_by k must be an integer literal, got $other")
      }
      graft.sketch.TopKBy(children.head, children(1), k)
    })

  val topKByStrDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("topk_by_str"),
    new ExpressionInfo(classOf[graft.sketch.TopKByStr].getName, "topk_by_str"),
    (children: Seq[Expression]) => {
      require(children.size == 3, "topk_by_str takes exactly 3 arguments: (score, key, k)")
      val k = children(2) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(i: Int, _) => i
        case other => throw new IllegalArgumentException(
          s"topk_by_str k must be an integer literal, got $other")
      }
      graft.sketch.TopKByStr(children.head, children(1), k)
    })

  val cmsCountersDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cms_counters"),
    new ExpressionInfo(classOf[graft.sketch.CmsCounters].getName, "cms_counters"),
    (children: Seq[Expression]) => {
      require(children.size == 3, "cms_counters takes exactly 3 arguments: (key, depth, width)")
      val lits = children.tail.map {
        case org.apache.spark.sql.catalyst.expressions.Literal(i: Int, _) => i
        case other => throw new IllegalArgumentException(
          s"cms_counters depth/width must be integer literals, got $other")
      }
      graft.sketch.CmsCounters(children.head, lits(0), lits(1))
    })

  val l2SqRangeDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("l2_sq_range"),
    new ExpressionInfo(classOf[L2SqRange].getName, "l2_sq_range"),
    (children: Seq[Expression]) => {
      require(children.size == 4,
        "l2_sq_range takes exactly 4 arguments: (a, b, offset, len)")
      val len = children(3) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(i: Int, _) => i
        case other => throw new IllegalArgumentException(
          s"l2_sq_range len must be an integer literal, got $other")
      }
      L2SqRange(children.head, children(1), children(2), len)
    })

  val hilbertXYDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hilbert_xy"),
    new ExpressionInfo(classOf[HilbertXY].getName, "hilbert_xy"),
    (children: Seq[Expression]) => {
      require(children.size == 3,
        "hilbert_xy takes exactly 3 arguments: (x, y, bits)")
      val bits = children(2) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(i: Int, _) => i
        case other => throw new IllegalArgumentException(
          s"hilbert_xy bits must be an integer literal, got $other")
      }
      HilbertXY(children.head, children(1), bits)
    })

  val normalizeNfcDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NormalizeNfc].getName, "nfc_normalize"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "nfc_normalize takes exactly 1 argument")
      NormalizeNfc(children.head)
    })

  val lshSigDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("lsh_sig"),
    new ExpressionInfo(classOf[LshSig].getName, "lsh_sig"),
    (children: Seq[Expression]) => {
      require(children.size == 3, "lsh_sig takes exactly 3 arguments: (embedding, bits, dim)")
      def lit(e: Expression, name: String): Int = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(i: Int, _) => i
        case other => throw new IllegalArgumentException(
          s"lsh_sig $name must be an integer literal (it sizes the generated loops), got $other")
      }
      LshSig(children.head, lit(children(1), "bits"), lit(children(2), "dim"))
    })

  def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(cosineSimDescriptor)
    ext.injectFunction(lshSigDescriptor)
    ext.injectFunction(normalizeNfcDescriptor)
    ext.injectFunction(l2SqRangeDescriptor)
    ext.injectFunction(hilbertXYDescriptor)
    ext.injectFunction(kmvDistinctDescriptor)
    ext.injectFunction(mgCandidatesDescriptor)
    ext.injectFunction(topKByDescriptor)
    ext.injectFunction(topKByStrDescriptor)
    ext.injectFunction(cmsCountersDescriptor)
    ext.injectOptimizerRule(_ => graft.plans.RangeBinJoinRule)
    ext.injectOptimizerRule(_ => graft.plans.ApproxDistinctRule)
    ext.injectOptimizerRule(_ => graft.plans.GeneratedPartitionRule)
    ext.injectOptimizerRule(_ => graft.plans.ApproxPercentileRule)
  }
}
