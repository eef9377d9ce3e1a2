package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler kernel (Winkler 1990), BYTE-based to match DuckDB's
  * `jaro_winkler_similarity` exactly (measured: 'éé' vs 'ée' scores
  * as 4-vs-3 BYTE sequences, so multi-byte code points compare per
  * byte — identical inputs therefore score identically in both
  * engines, and ASCII corpora see the classical character semantics):
  *
  *   window  = max(|s|,|t|)/2 − 1
  *   jaro    = (m/|s| + m/|t| + (m − half-transpositions)/m) / 3
  *   winkler = jaro > 0.7 ? jaro + ℓ·0.1·(1−jaro), ℓ = common prefix ≤ 4
  *
  * Empty either side → 0 (DuckDB convention, measured — including
  * BOTH empty). O(|s|·window) with two small boolean scratch arrays;
  * no allocation beyond them.
  */
object JaroWinklerUtil {

  def jw(a: UTF8String, b: UTF8String): Double = {
    val s = a.getBytes
    val t = b.getBytes
    val la = s.length
    val lb = t.length
    if (la == 0 || lb == 0) return 0.0
    if (java.util.Arrays.equals(s, t)) return 1.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val sm = new Array[Boolean](la)
    val tm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!tm(j) && s(i) == t(j)) {
          sm(i) = true; tm(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0
    var trans = 0
    i = 0
    while (i < la) {
      if (sm(i)) {
        while (!tm(k)) k += 1
        if (s(i) != t(k)) trans += 1
        k += 1
      }
      i += 1
    }
    // DuckDB floors the half-transposition count to an INTEGER
    // (measured: 'hot rd' vs 'cold rod' has 3 out-of-order matches
    // and scores with t = 1, not 1.5) — classic Winkler-code
    // behavior; mirrored here for byte-exact parity.
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - trans / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val pmax = math.min(4, math.min(la, lb))
    while (l < pmax && s(l) == t(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** `graft_jaro_winkler(s, t)` → double in [0, 1]. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"${l.simpleString(10)} and ${r.simpleString(10)}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerUtil.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = JaroWinklerUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $util.jw($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
