package graft.core

import graft.ops.{EventOps, ProfileOps, SampleOps, TextOps}
import org.apache.spark.sql.functions._

/** Hand cases for the AIPW estimator, capture-recapture, Chao1,
  * Spiegelhalter Z, and split-conformal coverage.
  */
class EstimatorSpec extends SparkSpec {
  import spark.implicits._

  test("doubly robust: on-policy logs reduce to the model mean") {
    // every user logs its own target action -> matched everywhere;
    // with a constant reward the correction term is 0 and dm = dr
    val d2 = (0L until 60L).map(u =>
      (u, if (u % 2 == 0) "a" else "b", 10.0))
      .toDF("user_id", "event_type", "value")
    val r = EventOps.doublyRobustValue(d2, "user_id", "event_type",
      "value", Seq("a", "b")).collect().head
    assert(r.getAs[Long]("n_matched") == 60L)
    assert(r.getAs[Double]("dm") == 10.0)
    assert(r.getAs[Double]("dr") == 10.0)
  }

  test("chapman: formula replay and sane bounds") {
    val df = (0L until 400L).toDF("k")
    val r = SampleOps.chapmanEstimate(df, "k", 0.5, "sA", "sB")
      .collect().head
    val (n1, n2, m) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"),
      r.getAs[Long]("n_overlap"))
    val exp = math.rint(((n1 + 1).toDouble * (n2 + 1) / (m + 1) - 1.0)
      * 100) / 100
    assert(r.getAs[Double]("chapman") == exp)
    assert(r.getAs[Long]("n_true") == 400L)
    assert(m <= math.min(n1, n2) && r.getAs[Double]("chapman") > 0)
  }

  test("chao1: singleton/doubleton closed forms") {
    val one = Seq("a a b").toDF("text") // f1=1(b), f2=1(a)
    val r1 = TextOps.chao1Vocab(one, "text").collect().head
    assert(r1.getLong(0) == 2L && r1.getLong(1) == 1L &&
      r1.getLong(2) == 1L && r1.getDouble(3) == 2.0)
    val two = Seq("a b").toDF("text") // f1=2, f2=0 -> 2 + 2*1/2 = 3
    val r2 = TextOps.chao1Vocab(two, "text").collect().head
    assert(r2.getDouble(3) == 3.0)
  }

  test("spiegelhalter: calibrated quarters score z = 0; miscalibrated rejects") {
    val cal = (0 until 40).map(i => (0.25, if (i % 4 == 0) 1 else 0))
      .toDF("s", "y")
    val z = ProfileOps.spiegelhalterZ(cal, "s", "y").collect().head
    assert(z.getAs[Double]("z") == 0.0 && z.getAs[Int]("reject_5pct") == 0)
    // p = 0.25 but everything is positive -> strongly miscalibrated
    val bad = (0 until 40).map(_ => (0.25, 1)).toDF("s", "y")
    val zb = ProfileOps.spiegelhalterZ(bad, "s", "y").collect().head
    assert(zb.getAs[Int]("reject_5pct") == 1)
    // degenerate 0/1 scores: statistic undefined -> NULL
    val dg = (0 until 10).map(i => (if (i < 5) 1.0 else 0.0,
      if (i < 5) 1 else 0)).toDF("s", "y")
    assert(ProfileOps.spiegelhalterZ(dg, "s", "y").collect().head.isNullAt(1))
  }

  test("decile gains: perfect ranker front-loads, last decile gain is 1") {
    val df = (0L until 100L).map(i =>
      (i, 1.0 - i / 100.0, if (i < 30) 1 else 0)).toDF("id", "s", "y")
    val g = ProfileOps.decileGains(df, "id", "s", "y")
      .orderBy("decile").collect()
    // positives are exactly the top 3 deciles
    assert(g(2).getAs[Double]("cum_gain") == 1.0)
    assert(g(0).getAs[Double]("lift") == math.rint(10.0 / 3 * 1e6) / 1e6)
    assert(g(9).getAs[Double]("cum_gain") == 1.0)
    assert(g(9).getAs[Double]("lift") == 1.0)
  }

  test("brier decomposition: identity holds; perfect scores have zero reliability") {
    val mixed = (0L until 200L).map(i =>
      (if (i % 4 == 0) 0.9 else 0.2, if (i % 3 == 0) 1 else 0))
      .toDF("s", "y")
    val r = ProfileOps.brierDecomposition(mixed, "s", "y").collect().head
    val (b, rel, res, unc) = (r.getAs[Double]("brier"),
      r.getAs[Double]("reliability"), r.getAs[Double]("resolution"),
      r.getAs[Double]("uncertainty"))
    assert(math.abs(b - (rel - res + unc)) < 1e-5, s"$b vs ${rel - res + unc}")
    // oracle-sharp scores: p equals the cell outcome rate exactly
    val sharp = (0L until 100L).map(i =>
      (if (i % 2 == 0) 1.0 else 0.0, if (i % 2 == 0) 1 else 0))
      .toDF("s", "y")
    val rs = ProfileOps.brierDecomposition(sharp, "s", "y").collect().head
    assert(rs.getAs[Double]("reliability") == 0.0)
    assert(rs.getAs[Double]("brier") == 0.0)
    assert(rs.getAs[Double]("resolution") == rs.getAs[Double]("uncertainty"))
  }

  test("conformal: exact linear data gives qhat 0 and full coverage") {
    val df = (1L to 100L).map(x => (x, x, 2000000L * x))
      .toDF("id", "x", "ym")
    val r = ProfileOps.splitConformal(df, "x", "ym",
      pmod(col("id"), lit(2L)) === 0).collect().head
    assert(r.getAs[Double]("qhat") == 0.0)
    assert(r.getAs[Double]("coverage") == 1.0)
    assert(r.getAs[Double]("slope") == 2000000.0)
  }
}
