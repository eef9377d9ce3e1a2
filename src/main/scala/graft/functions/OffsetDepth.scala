package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared scalar kernel for the gap-aware offset→depth computation
  * (SURVEY §2 P15; reference coring/sectionSummary.py:53-75,
  * feldman.py:52-74). Called from both `OffsetDepth.eval` and the
  * generated code, so interpreted and codegen paths are one
  * implementation.
  *
  * Numeric contract matches the composed-built-ins form it replaces
  * (graft.core.ops.DepthOps round/parse/filter/aggregate tree):
  *  - depth lookups are rounded to 3 decimals BEFORE arithmetic with
  *    Spark `round` semantics (HALF_UP on the decimal string value);
  *  - a null/blank Gaps payload contributes zero gap;
  *  - a gap token whose top does not parse is dropped (the cast-to-null
  *    + filter behavior); a counted token whose bottom does not parse
  *    poisons the whole sum to null (null propagation through
  *    `aggregate`'s `acc + (bot - top)`);
  *  - the scaled variant keeps the reference's unit quirk (curated in
  *    METERS vs drilled in CENTIMETERS, so compression effectively
  *    never fires) and falls back to the unscaled depth when either
  *    side of that comparison is null — exactly like the
  *    `when(curated > drilled, …).otherwise(depth)` it replaces.
  */
object OffsetDepthUtil {

  /** Spark `round(c, 3)` for DoubleType (MathExpressions.Round). */
  def r3(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Sum of gap lengths (cm) strictly above sectionDepth (cm); null on
    * a counted-but-unparseable bottom bound (see class doc).
    */
  def gapAboveCm(gaps: UTF8String, sectionDepthCm: Double): java.lang.Double = {
    if (gaps == null) return java.lang.Double.valueOf(0.0)
    val s = gaps.toString.trim
    if (s.isEmpty) return java.lang.Double.valueOf(0.0)
    var sum = 0.0
    val toks = s.split(" ", -1)
    var i = 0
    while (i < toks.length) {
      val parts = toks(i).split("-", -1)
      val top = if (parts.length >= 1) parseOrNull(parts(0)) else null
      if (top != null && sectionDepthCm > top.doubleValue()) {
        val bot = if (parts.length >= 2) parseOrNull(parts(1)) else null
        if (bot == null) return null // null poisons the aggregate
        sum += bot.doubleValue() - top.doubleValue()
      }
      i += 1
    }
    java.lang.Double.valueOf(sum)
  }

  /** Cast-to-double semantics: unparseable → null, not an exception. */
  private def parseOrNull(s: String): java.lang.Double = {
    val t = s.trim
    if (t.isEmpty) return null
    try java.lang.Double.valueOf(t)
    catch { case _: NumberFormatException => null }
  }

  /** Full kernel. secTop/offsetCm are non-null by the time this is
    * called (the expression short-circuits otherwise); secBot and
    * curatedLength arrive with explicit null flags because the scaled
    * branch treats their absence as "no compression", not null-out.
    * Returns null only via gap-sum poisoning (see gapAboveCm).
    */
  def compute(secTop: Double, gaps: UTF8String, offsetCm: Double, scaled: Boolean,
      secBotIsNull: Boolean, secBot: Double,
      curatedIsNull: Boolean, curatedLength: Double): java.lang.Double = {
    val top = r3(secTop)
    val gap = gapAboveCm(gaps, offsetCm)
    if (gap == null) return null
    val depth = top + offsetCm / 100.0 - gap.doubleValue() / 100.0
    if (scaled && !secBotIsNull && !curatedIsNull) {
      val curated = r3(curatedLength)
      val drilled = (r3(secBot) - top) * 100.0
      if (curated > drilled)
        return java.lang.Double.valueOf(top + (offsetCm / 100.0) * (drilled / curated))
    }
    java.lang.Double.valueOf(depth)
  }
}

/** Native P15: gap-aware section offset (cm) → total depth (m), fused
  * into one scalar call. `graft_offset_depth(secTop, secBot,
  * curatedLength, gaps, offsetCm, scaled)`.
  *
  * Why native: the composed form expands `parseGaps` (split + nested
  * transform/filter/aggregate lambdas) once per use, and the splice
  * resolver uses it four times per row set — Catalyst analysis +
  * whole-stage codegen of those trees dominated the convert pipeline
  * (27–32 MiB broadcast task binaries). This expression is one tree
  * node; its generated code is a single static call into
  * [[OffsetDepthUtil]].
  *
  * Null contract: null secTop or offsetCm → null (their values are
  * required); null gaps → no gaps; null secBot/curatedLength → the
  * scaled branch silently skips compression (matching the composed
  * `when(curated > drilled, …).otherwise(depth)` under null). The
  * `scaled` argument must be a foldable boolean.
  */
case class OffsetDepth(secTop: Expression, secBot: Expression,
    curatedLength: Expression, gaps: Expression, offsetCm: Expression,
    scaled: Expression)
    extends Expression with ImplicitCastInputTypes {

  override def children: Seq[Expression] =
    Seq(secTop, secBot, curatedLength, gaps, offsetCm, scaled)

  override def inputTypes: Seq[DataType] =
    Seq(DoubleType, DoubleType, DoubleType, StringType, DoubleType, BooleanType)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_offset_depth"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!scaled.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable (literal) boolean `scaled` argument")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val isScaled: Boolean = scaled.eval(null) match {
    case b: java.lang.Boolean => b.booleanValue()
    case null => false
  }

  override def eval(input: InternalRow): Any = {
    val topV = secTop.eval(input)
    val offV = offsetCm.eval(input)
    if (topV == null || offV == null) return null
    val botV = secBot.eval(input)
    val clV = curatedLength.eval(input)
    OffsetDepthUtil.compute(
      topV.asInstanceOf[Double],
      gaps.eval(input).asInstanceOf[UTF8String],
      offV.asInstanceOf[Double],
      isScaled,
      botV == null, if (botV == null) 0.0 else botV.asInstanceOf[Double],
      clV == null, if (clV == null) 0.0 else clV.asInstanceOf[Double])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val topG = secTop.genCode(ctx)
    val botG = secBot.genCode(ctx)
    val clG = curatedLength.genCode(ctx)
    val gapsG = gaps.genCode(ctx)
    val offG = offsetCm.genCode(ctx)
    val util = OffsetDepthUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val r = ctx.freshName("odResult")
    val code =
      code"""
         |${topG.code}
         |${offG.code}
         |boolean ${ev.isNull} = true;
         |double ${ev.value} = 0.0;
         |if (!${topG.isNull} && !${offG.isNull}) {
         |  ${botG.code}
         |  ${clG.code}
         |  ${gapsG.code}
         |  java.lang.Double $r = $util.compute(
         |    ${topG.value},
         |    ${gapsG.isNull} ? null : ${gapsG.value},
         |    ${offG.value},
         |    $isScaled,
         |    ${botG.isNull}, ${botG.isNull} ? 0.0 : ${botG.value},
         |    ${clG.isNull}, ${clG.isNull} ? 0.0 : ${clG.value});
         |  if ($r != null) { ${ev.isNull} = false; ${ev.value} = $r.doubleValue(); }
         |}
       """.stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): OffsetDepth =
    copy(secTop = newChildren(0), secBot = newChildren(1),
      curatedLength = newChildren(2), gaps = newChildren(3),
      offsetCm = newChildren(4), scaled = newChildren(5))
}
