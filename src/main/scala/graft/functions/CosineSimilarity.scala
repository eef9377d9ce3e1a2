package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, NullType}

/** Native cosine similarity over two array<double> columns.
  *
  * The composed-built-ins form (`aggregate(zip_with(a,b,_*_),0,_+_) /
  * (norm·norm)`) allocates an intermediate array per pair and walks
  * each input three times; this expression is one fused loop with no
  * allocation, and `doGenCode` emits straight-line Java inside the
  * enclosing whole-stage-codegen span — the preference order the
  * engine follows: native Expression > composed HOFs > UDF.
  *
  * Zero-norm inputs yield NaN, matching the composed form's x/0.0.
  * Length mismatch truncates to the shorter side (dot over the common
  * prefix), like zip_with's null-padding followed by null-propagating
  * multiply would poison the sum — callers validate dimensions.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case NullType => true // NULL literal: propagates to a null result
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    var j = n
    val xn = x.numElements()
    while (j < xn) { val v = x.getDouble(j); nx += v * v; j += 1 }
    j = n
    val yn = y.numElements()
    while (j < yn) { val v = y.getDouble(j); ny += v * v; j += 1 }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double xv = $x.getDouble($i); double yv = $y.getDouble($i);
         |  $dot += xv * yv; $nx += xv * xv; $ny += yv * yv;
         |}
         |for (int $i = $n; $i < $x.numElements(); $i++) {
         |  double $v = $x.getDouble($i); $nx += $v * $v;
         |}
         |for (int $i = $n; $i < $y.numElements(); $i++) {
         |  double $v = $y.getDouble($i); $ny += $v * $v;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
