package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native char-trigram language scoring:
  * `graft_lang_scores(text)` → array<long> of profile scores in
  * [[graft.ops.LangNgram.langs]] order. One pass over the text with a
  * JVM-static profile hash map — no join against a profile table, no
  * shuffle; language-ID of a 100 TB corpus stays a pure scan
  * projection. Semantics (normalization, trigram positions, integer
  * weights) live in [[graft.ops.LangNgram.scores]] — one kernel
  * shared by the expression, the spec reference, and the oracle
  * generator. CodegenFallback: the cost is the per-position hash
  * probes, not the interpreter hop (same call as BpeEncode).
  */
case class LangNgramScores(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_lang_scores"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: text argument must be string, got ${child.dataType.sql}")

  override def nullSafeEval(text: Any): Any =
    new GenericArrayData(graft.ops.LangNgram.scores(
      text.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
