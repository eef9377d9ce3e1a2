package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Scalar kernel shared by interpreted eval and generated code. */
object NearestCellsUtil {
  /** Cell indices ranked by squared euclidean distance to `vec`
    * (stable: ties break on the lower index, matching an
    * array_sort over struct(dist, index)).
    */
  def rank(vec: ArrayData, centers: Array[Array[Double]]): ArrayData = {
    val n = centers.length
    val d = new Array[Double](n)
    var c = 0
    while (c < n) {
      val cv = centers(c)
      val m = math.min(vec.numElements(), cv.length)
      var acc = 0.0
      var j = 0
      while (j < m) { val t = vec.getDouble(j) - cv(j); acc += t * t; j += 1 }
      d(c) = acc
      c += 1
    }
    val idx = Array.range(0, n).sortBy(i => (d(i), i))
    new GenericArrayData(idx)
  }
}

/** Native IVF cell ranking: `graft_nearest_cells(vec, centers)` →
  * array<int> of quantizer-cell indices ordered nearest-first.
  *
  * Why native: composed `array_sort(transform(centers, c =>
  * struct(aggregate(zip_with(...)))))` is a deeply nested HOF tree
  * whose whole-stage codegen alone costs ~2s per fresh plan; this is
  * one node calling a static kernel, and the centers literal is
  * extracted once (a plan reference object, not per-element literal
  * nodes). `centers` must be a foldable array<array<double>> literal.
  */
case class NearestCells(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
      if (right.foldable) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable (literal) centers argument")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<array<double>>), got " +
        s"${l.simpleString(10)} and ${r.simpleString(10)}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_cells"

  @transient private lazy val centerArrays: Array[Array[Double]] = {
    val ad = right.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }

  override def nullSafeEval(v: Any, _ignored: Any): Any =
    NearestCellsUtil.rank(v.asInstanceOf[ArrayData], centerArrays)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centersRef = ctx.addReferenceObj("centers", centerArrays, "double[][]")
    val util = NearestCellsUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = $util.rank($v, $centersRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCells =
    copy(left = newLeft, right = newRight)
}
