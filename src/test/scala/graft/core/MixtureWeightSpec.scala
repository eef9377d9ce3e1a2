package graft.core

import graft.ops.SampleOps
import org.apache.spark.sql.functions._

/** temperatureWeights invariants: α=1 is the natural distribution,
  * smaller α flattens (tail boosted above 1, head below), and target
  * shares always renormalize to 1.
  */
class MixtureWeightSpec extends SparkSpec {
  import spark.implicits._

  // 3 domains with 400:80:20 = 20:4:1 token mass.
  private lazy val df = (
    (1 to 80).map(i => (s"d$i", "big", "a b c d e")) ++
    (1 to 40).map(i => (s"m$i", "mid", "a b")) ++
    (1 to 20).map(i => (s"s$i", "small", "a"))
  ).toDF("id", "domain", "text")

  test("alpha=1 reproduces natural shares; q sums to 1") {
    val w = SampleOps.temperatureWeights(df, "domain", "text", alpha = 1.0)
      .collect().map(r => r.getString(0) -> ((r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    w.values.foreach { case (p, q, boost) =>
      assert(math.abs(p - q) < 1e-6, s"alpha=1 must keep q=p: $p vs $q")
      assert(math.abs(boost - 1.0) < 1e-3)
    }
    assert(math.abs(w.values.map(_._2).sum - 1.0) < 1e-5)
  }

  test("alpha<1 flattens: tail boosted, head damped, order preserved") {
    val w = SampleOps.temperatureWeights(df, "domain", "text", alpha = 0.3)
      .collect().map(r => r.getString(0) -> ((r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(w("big")._3 < 1.0, s"head boost ${w("big")._3}")
    assert(w("small")._3 > 1.0, s"tail boost ${w("small")._3}")
    // Flattening never reorders domains.
    assert(w("big")._2 > w("mid")._2 && w("mid")._2 > w("small")._2)
    assert(math.abs(w.values.map(_._2).sum - 1.0) < 1e-5)
  }
}
