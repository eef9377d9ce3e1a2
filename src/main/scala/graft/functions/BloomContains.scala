package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_contains(bloomBytes, key)` — membership probe against a
  * serialized [[BloomFilter]], the probe half of a runtime semi-join
  * filter (see graft.ops.BloomOps): rows whose key cannot be on the
  * build side are dropped BEFORE the join shuffle.
  *
  * The first argument must be a foldable binary literal (the bloom,
  * built once on the driver); it is deserialized exactly once per
  * expression instance into a `@transient lazy val`, and `doGenCode`
  * pins the deserialized filter as a codegen reference object, so the
  * per-row work is a single `mightContainLong`/`mightContainString`
  * call inside the enclosing whole-stage-codegen span — never a
  * per-row (or even per-batch) deserialization.
  *
  * False positives pass (and are removed by the exact join that
  * follows); false negatives are impossible — semantics of the
  * composed pipeline stay exact.
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType || !left.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable binary serialized bloom as argument 1, " +
          s"got ${left.dataType.simpleString} (foldable=${left.foldable})")
    else right.dataType match {
      case LongType | IntegerType | ShortType | ByteType | StringType | NullType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName supports integral or string keys, got ${t.simpleString}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  @transient private lazy val bloom: BloomFilter = {
    val bytes = left.eval(InternalRow.empty).asInstanceOf[Array[Byte]]
    require(bytes != null, s"$prettyName: bloom bytes are null")
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(bloomBytes: Any, key: Any): Any = right.dataType match {
    case StringType => bloom.mightContainString(key.asInstanceOf[UTF8String].toString)
    case _ => bloom.mightContainLong(key.asInstanceOf[Number].longValue())
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, key) => right.dataType match {
      case StringType =>
        s"${ev.value} = $ref.mightContainString($key.toString());"
      case _ =>
        s"${ev.value} = $ref.mightContainLong((long) $key);"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
