package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Model-carrying language scoring:
  * `graft_lang_model_scores(modelKey, text)` → array<long> of profile
  * scores in the model's language order — the LOADED-profile twin of
  * [[LangNgramScores]] (whose profiles are JVM-static). The key
  * literal resolves to a driver-registered
  * [[graft.ops.LangProfiles.LangModel]] at function-build time (the
  * DropProbe pattern), and the model instance then ships to executors
  * inside the expression — the stage's task binary is broadcast once,
  * so a vocabulary-bounded model costs one send per stage, never a
  * join against the corpus. Scoring itself stays a zero-shuffle scan.
  */
case class LangModelScores(child: Expression,
    model: graft.ops.LangProfiles.LangModel)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_lang_model_scores"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: text argument must be string, got ${child.dataType.sql}")

  override def nullSafeEval(text: Any): Any =
    new GenericArrayData(model.scores(text.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
