package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate kernel with a per-thread reusable Deflater: zlib's native
  * stream init dominates per-row cost if allocated per call, so each
  * task thread keys one compressor per level and `reset()`s it.
  */
object DeflateLenUtil {
  private val local = new ThreadLocal[java.util.HashMap[Int, Deflater]] {
    override def initialValue() = new java.util.HashMap[Int, Deflater]()
  }

  def len(s: UTF8String, level: Int): Int = {
    val m = local.get()
    var d = m.get(level)
    if (d == null) { d = new Deflater(level, true); m.put(level, d) }
    else d.reset()
    val bytes = s.getBytes
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

/** `graft_deflate_len(text, level)` → int: raw-deflate compressed
  * length of the UTF-8 bytes. The compression RATIO (deflate/raw) is
  * the classic corpus-quality signal: natural prose sits in a narrow
  * band, template/boilerplate text compresses far below it, and
  * random/encoded noise barely compresses at all — a one-number
  * repetition-and-entropy probe no n-gram statistic matches.
  *
  * Determinism contract: deflate output depends on the zlib build the
  * JVM bundles, so the signal is JVM-STATIC (same everywhere within a
  * cluster image; may shift across JVM upgrades) — the same frozen-
  * model discipline as the BPE merge table, and the reason this
  * signal is rows-only for the oracle (no SQL engine exposes zlib).
  * Thresholds derived from it must be re-calibrated per image.
  */
case class DeflateLen(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, IntegerType) if right.foldable =>
      if (level >= 1 && level <= 9) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName level must be in [1, 9], got $level")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, foldable int), got " +
        s"${l.simpleString(10)} and ${r.simpleString(10)}")
  }

  @transient private lazy val level: Int =
    right.eval(null).asInstanceOf[Int]

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_deflate_len"

  override def nullSafeEval(v: Any, _ignored: Any): Any =
    DeflateLenUtil.len(v.asInstanceOf[UTF8String], level)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = DeflateLenUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = $util.len($v, $level);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DeflateLen =
    copy(left = newLeft, right = newRight)
}
