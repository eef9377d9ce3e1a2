package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking kernel. The window hash is the EXACT
  * polynomial value Σ_j (code_j mod 128) · 128^(w-j-1) over the w
  * UTF-16 chars starting at i — exact integer arithmetic (max
  * 2^(7w) ≤ 2^56 for w ≤ 8, no wraparound), so an external engine
  * can replay it verbatim; the modulus (divisor) is what makes every
  * window char influence the cut decision (a power-of-two mask would
  * reduce to "last char in a set" — the classic base-2^k pitfall).
  * A cut lands AFTER the window (next chunk starts at i+w) when
  * h % divisor == 0. Rolling update is O(1) per position.
  */
object CdcChunksUtil {
  def chunks(text: UTF8String, w: Int, divisor: Int): ArrayData = {
    val s = text.toString
    val n = s.length
    if (n <= w)
      return new GenericArrayData(Array[Any](UTF8String.fromString(s)))
    var powW = 1L // 128^w
    var j = 0
    while (j < w) { powW *= 128L; j += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var h = 0L
    var i = 0
    while (i < w) { h = h * 128L + (s.charAt(i) & 127); i += 1 }
    var start = 0
    // i is one past the window end; window start = i - w
    var cutAt = if (h % divisor == 0) w else -1
    while (i < n) {
      if (cutAt == i) { // cut BEFORE this position
        out += UTF8String.fromString(s.substring(start, i))
        start = i
      }
      h = h * 128L + (s.charAt(i) & 127) - (s.charAt(i - w) & 127) * powW
      i += 1
      if (h % divisor == 0) cutAt = i
    }
    if (cutAt == n && start < n) {
      out += UTF8String.fromString(s.substring(start, n))
      start = n
    }
    if (start < n || out.isEmpty)
      out += UTF8String.fromString(s.substring(start, n))
    new GenericArrayData(out.toArray)
  }
}

/** `graft_cdc_chunks(text, window, divisor)` → array<string>: the
  * text split at content-defined boundaries. Identical content
  * produces identical chunks REGARDLESS of its offset in the
  * document — the property that makes chunk-fingerprint dedup
  * shift-tolerant where fixed-size blocks are not.
  */
case class CdcChunks(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType) =>
        if (!second.foldable || !third.foldable)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires literal window/divisor arguments")
        else if (windowW < 2 || windowW > 8)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName window must be in [2, 8] (exact-arithmetic bound), got $windowW")
        else if (div < 2)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName divisor must be >= 2, got $div")
        else TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int, int), got " +
          s"${a.simpleString(10)}, ${b.simpleString(10)}, ${c.simpleString(10)}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"

  @transient private lazy val windowW: Int =
    second.eval(null).asInstanceOf[Int]
  @transient private lazy val div: Int =
    third.eval(null).asInstanceOf[Int]

  override def nullSafeEval(t: Any, _w: Any, _d: Any): Any =
    CdcChunksUtil.chunks(t.asInstanceOf[UTF8String], windowW, div)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = CdcChunksUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (t, _, _) =>
      s"${ev.value} = $util.chunks($t, $windowW, $div);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): CdcChunks =
    copy(first = newFirst, second = newSecond, third = newThird)
}
