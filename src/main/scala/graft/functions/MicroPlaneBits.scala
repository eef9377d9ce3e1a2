package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Scalar kernel shared by interpreted eval and generated code. */
object MicroPlaneBitsUtil {
  /** Sign-bucket bits over micro-unit plane projections: bit p is set
    * iff Σ_j round_half_up(vec_j · plane_p_j · 10⁶) ≥ 0, the sum a
    * sequential long fold — term-for-term the composed
    * `aggregate(zip_with(vec, plane, (x, sg) -> round(x·sg·10⁶, 0)
    * .cast(long)), 0L, _+_)` form, including Spark's decimal HALF_UP
    * rounding (BigDecimal.valueOf = Double.toString, exactly the
    * built-in Round's double path).
    */
  def bits(vec: ArrayData, planes: Array[Array[Double]]): Long = {
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      // fail loudly on malformed input: the composed HOF twin
      // null-propagates on a null element and zips only to the
      // shorter length — a silent min() here would let a
      // dim-mismatched or null-holding vector land in a DIFFERENT
      // bucket than the spec-pinned composed form (fail-loudly
      // discipline: a wrong bucket is a silent recall loss)
      if (vec.numElements() != pl.length) throw new IllegalArgumentException(
        s"graft_micro_plane_bits: vector dim ${vec.numElements()} != " +
          s"plane dim ${pl.length}")
      var acc = 0L
      var j = 0
      while (j < pl.length) {
        if (vec.isNullAt(j)) throw new IllegalArgumentException(
          s"graft_micro_plane_bits: null element at index $j")
        acc += java.math.BigDecimal.valueOf(vec.getDouble(j) * pl(j) * 1e6)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
        j += 1
      }
      if (acc >= 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }
}

/** Native md5-plane sign bucket: `graft_micro_plane_bits(vec, planes)`
  * → long bucket id with one bit per plane.
  *
  * Why native: the composed form is nbits nested zip_with/aggregate
  * HOF trees per row — seconds of whole-stage codegen per fresh plan
  * and per-element lambda overhead at eval (the NearestCells lesson).
  * This is one plan node calling a static kernel; the plane literal
  * is extracted once as a plan reference object. `planes` must be a
  * foldable array<array<double>> literal.
  */
case class MicroPlaneBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
      if (right.foldable) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable (literal) planes argument")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<array<double>>), got " +
        s"${l.simpleString(10)} and ${r.simpleString(10)}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_micro_plane_bits"

  @transient private lazy val planeArrays: Array[Array[Double]] = {
    val ad = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }

  override def nullSafeEval(v: Any, _ignored: Any): Any =
    MicroPlaneBitsUtil.bits(v.asInstanceOf[ArrayData], planeArrays)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planeArrays, "double[][]")
    val util = MicroPlaneBitsUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = $util.bits($v, $planesRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MicroPlaneBits =
    copy(left = newLeft, right = newRight)
}
