package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native, codegen'd Expression.
  *
  * WHY: canonical-form normalization is the first step of any web-scale
  * text cleanup (the same visible string can arrive precomposed U+00E9 or
  * decomposed U+0065 U+0301 — dedup hashes, n-gram shingles, and tokenizer
  * merges all diverge unless the corpus is brought to one form). OSS Spark
  * has no normalization builtin, and a Scala UDF would pay
  * serialization + break whole-stage codegen on what is a per-row hot
  * path over every document byte.
  *
  * Evaluation contract: NULL→NULL; `java.text.Normalizer` (ICU-equivalent
  * for the NFC subset DuckDB's `nfc_normalize` implements via utf8proc —
  * both follow UAX#15, so results are oracle-comparable byte-for-byte).
  * The already-normalized fast path returns the INPUT UTF8String
  * unchanged — for the overwhelmingly-ASCII web corpus this is one
  * linear scan and zero allocation per row.
  */
case class NormalizeNfc(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeNfc.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NormalizeNfc.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)
}

object NormalizeNfc {
  /** Static kernel shared by interpreted and generated paths (the
    * generated call is a single static invoke — the loop lives in the
    * JDK's normalizer, nothing to fuse). */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
