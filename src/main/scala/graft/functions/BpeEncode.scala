package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE application: `graft_bpe_encode(text, merges)` → array of
  * subword tokens. `merges` must be a FOLDABLE array<string> of
  * space-joined pairs ("a b") in rank order — it is decoded once per
  * task, not per row; the per-word encoding is memoized in a per-task
  * cache (word frequency is Zipfian, so the cache removes nearly all
  * re-encoding). Semantics live in graft.ops.BpeOps.encode — one
  * implementation shared by the expression, the trainer, and the
  * differential spec.
  *
  * Why an expression and not a UDF: no ScalaUDF boxing of the row, no
  * per-row closure dispatch, and the output writes straight into an
  * ArrayData the downstream size()/array_join() consume without a
  * copy. CodegenFallback is fine here — the cost is the string work
  * itself, not the interpreter hop.
  */
case class BpeEncode(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "graft_bpe_encode"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = left.nullable

  /** Validate at ANALYSIS time on the driver — a malformed call fails
    * with an immediate AnalysisException instead of launching the job
    * and dying per-task (×4 retry attempts) in the executor lazy val.
    */
  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: text argument must be string, got ${left.dataType.sql}")
    else if (!right.dataType.isInstanceOf[ArrayType] ||
        right.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: merges argument must be array<string>, got ${right.dataType.sql}")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable (literal) merges argument")
    else right.eval() match {
      case null => TypeCheckResult.TypeCheckFailure(
        s"$prettyName: merges must not be NULL")
      case arr: ArrayData =>
        val bad = (0 until arr.numElements()).iterator.map { i =>
          val e = arr.getUTF8String(i)
          if (e == null) "null" else e.toString
        }.find { s =>
          val cut = s.indexOf(' ')
          cut <= 0 || cut >= s.length - 1
        }
        bad match {
          case Some(s) => TypeCheckResult.TypeCheckFailure(
            s"$prettyName: merge entry '$s' is not 'left right'")
          case None => TypeCheckResult.TypeCheckSuccess
        }
    }
  }

  @transient private lazy val model: graft.ops.BpeOps.BpeModel = {
    val arr = right.eval().asInstanceOf[ArrayData]
    new graft.ops.BpeOps.BpeModel(
      (0 until arr.numElements()).map { i =>
        val s = arr.getUTF8String(i).toString
        val cut = s.indexOf(' ')
        (s.substring(0, cut), s.substring(cut + 1))
      })
  }

  @transient private lazy val cache = graft.ops.BpeOps.newWordCache()

  override def nullSafeEval(text: Any, mergesIgnored: Any): Any = {
    val toks = graft.ops.BpeOps.encode(
      text.asInstanceOf[UTF8String].toString, model, cache)
    new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
