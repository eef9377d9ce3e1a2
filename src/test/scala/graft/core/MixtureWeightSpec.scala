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

  // ---- excessLossWeights (DoReMi-flavored) ----

  test("excess loss: identical-content domains have zero excess, weight == share") {
    val same = ((1 to 10).map(i => (s"a$i", "da", "x y z")) ++
      (1 to 10).map(i => (s"b$i", "db", "x y z"))).toDF("id", "domain", "text")
    val w = SampleOps.excessLossWeights(same, "domain", "text", eta = 0.5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    w.values.foreach { case (excess, share, weight, boost) =>
      assert(excess == 0L, s"identical domains must have zero excess, got $excess")
      assert(math.abs(weight - share) < 1e-6)
      assert(math.abs(boost - 1.0) < 1e-3)
    }
  }

  test("excess loss: eta=0 reduces to the natural shares") {
    val mixed = ((1 to 10).map(i => (s"a$i", "da", "p q r")) ++
      (1 to 5).map(i => (s"b$i", "db", "s t"))).toDF("id", "domain", "text")
    val w = SampleOps.excessLossWeights(mixed, "domain", "text", eta = 0.0)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(5), r.getDouble(6)))).toMap
    w.values.foreach { case (share, weight) =>
      assert(math.abs(weight - share) < 1e-6) }
    assert(math.abs(w.values.map(_._2).sum - 1.0) < 1e-5)
  }

  test("excess loss: hand-computed micronat NLLs on a 2-domain corpus") {
    // da: tokens x x y (Td=3); db: z (Td=1). V=3, T=4.
    val df2 = Seq(("1", "da", "x x y"), ("2", "db", "z"))
      .toDF("id", "domain", "text")
    def mnat(p: Double): Long = math.round(-math.log(p) * 1e6)
    val v = 3L; val t = 4L
    // corpus counts: x=2, y=1, z=1
    val nx = mnat(3.0 / (t + v)); val ny = mnat(2.0 / (t + v))
    val nz = mnat(2.0 / (t + v))
    def halfUp(a: Long, b: Long): Long = (2 * a + b) / (2 * b)
    val expCorpusA = halfUp(2 * nx + 1 * ny, 3)
    val expCorpusB = halfUp(1 * nz, 1)
    // own models: da: x=2,y=1 over Td+V=6; db: z=1 over 1+3=4
    val expOwnA = halfUp(2 * mnat(3.0 / 6) + mnat(2.0 / 6), 3)
    val expOwnB = halfUp(mnat(2.0 / 4), 1)
    val got = SampleOps.excessLossWeights(df2, "domain", "text", eta = 0.5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("da") == ((expCorpusA, expOwnA,
      math.max(0L, expCorpusA - expOwnA))))
    assert(got("db") == ((expCorpusB, expOwnB,
      math.max(0L, expCorpusB - expOwnB))))
  }
}
