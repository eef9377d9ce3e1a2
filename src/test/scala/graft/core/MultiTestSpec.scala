package graft.core

import graft.ops.ProfileOps
import org.apache.spark.sql.functions._

/** Hand-checked cases for the multiple-testing correction (BH/Holm)
  * and the exact 1-Wasserstein drift op.
  */
class MultiTestSpec extends SparkSpec {
  import spark.implicits._

  test("wasserstein: hand case on a two-value grid") {
    // a = [0,0,1], b = [1]; grid {0,1}, one gap of width 1.
    // F_a(0)=2/3 vs F_b(0)=0 -> W1 = 2/3 both directions.
    val df = Seq(("a", 0), ("a", 0), ("a", 1), ("b", 1)).toDF("g", "v")
    val r = ProfileOps.wassersteinAgainstRest(df, "g", "v")
      .collect().map(x => x.getString(0) -> x.getDouble(3)).toMap
    assert(r("a") == 0.666667 && r("b") == 0.666667)
  }

  test("wasserstein: identical distributions score zero") {
    val df = Seq(("a", 1), ("a", 5), ("b", 1), ("b", 5)).toDF("g", "v")
    val r = ProfileOps.wassersteinAgainstRest(df, "g", "v")
      .collect().map(x => x.getString(0) -> x.getDouble(3)).toMap
    assert(r("a") == 0.0 && r("b") == 0.0)
  }

  test("wasserstein: pure location shift = shift size") {
    // a = {0, 10}, b = {5, 15}: every quantile moved by 5 -> W1 = 5
    val df = Seq(("a", 0), ("a", 10), ("b", 5), ("b", 15)).toDF("g", "v")
    val r = ProfileOps.wassersteinAgainstRest(df, "g", "v")
      .collect().map(x => x.getString(0) -> x.getDouble(3)).toMap
    assert(r("a") == 5.0 && r("b") == 5.0)
  }

  test("ksFdr: adjusted p's replay the step procedures; flags at alpha") {
    // Engineer clearly separated vs identical groups so raw p's span
    // the range, then replay BH/Holm on the extracted raw p's.
    // six identical groups + one far outlier: each same-group's rest
    // is only 1/6 contaminated by far (D = 1/6, p ~ 0.3, no reject),
    // while far vs rest has D = 1 (p ~ 0, must survive both).
    val rows = (1 to 6).flatMap(k =>
      (0 until 40).map(i => (s"same$k", i))) ++
      (0 until 40).map(i => ("far", i + 1000))
    val df = rows.toDF("g", "v")
    val out = ProfileOps.ksFdr(df, "g", "v").collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getInt(6), r.getInt(7)))
    val byP = out.sortBy(t => (t._2, t._1))
    val m = byP.length
    // reference BH (step-up running min from the tail) and Holm
    val bhRaw = byP.zipWithIndex.map { case (t, i) => t._2 * m / (i + 1) }
    val bhRef = bhRaw.scanRight(Double.MaxValue)(math.min).init
      .map(x => math.rint(math.min(1.0, x) * 1e6) / 1e6)
    val holmRaw = byP.zipWithIndex.map { case (t, i) => t._2 * (m - i) }
    val holmRef = holmRaw.scanLeft(0.0)(math.max).tail
      .map(x => math.rint(math.min(1.0, x) * 1e6) / 1e6)
    byP.zip(bhRef.zip(holmRef)).foreach { case ((g, _, bh, holm, rb, rh), (eb, eh)) =>
      assert(bh == eb, s"$g bh")
      assert(holm == eh, s"$g holm")
      assert(rb == (if (bh <= 0.05) 1 else 0))
      assert(rh == (if (holm <= 0.05) 1 else 0))
    }
    // the far-shifted group must survive; the identical pair must not
    val far = out.find(_._1 == "far").get
    val s1 = out.find(_._1 == "same1").get
    assert(far._5 == 1 && far._6 == 1)
    assert(s1._5 == 0 && s1._6 == 0)
  }
}
