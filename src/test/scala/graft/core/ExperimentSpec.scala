package graft.core

import graft.ops.EventOps
import org.apache.spark.sql.functions._

/** Hand cases for the causal/resampling readouts (DiD, IPS,
  * Poisson bootstrap, randomization test).
  */
class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String, Double)*) =
    rows.toSeq.toDF("user_id", "tss", "event_type", "value")
      .select(col("user_id"), to_timestamp(col("tss")).as("ts"),
        col("event_type"), col("value"))

  test("did: hand-computed 2x2 panel") {
    // control u=0: pre 10, post 12; u=2: pre 20, post 20
    // treated u=1: pre 10, post 30; u=3 only noise (zero-filled)
    val df = ev(
      (0L, "2024-01-02 00:00:00", "purchase", 10.0),
      (0L, "2024-01-20 00:00:00", "purchase", 12.0),
      (2L, "2024-01-03 00:00:00", "purchase", 20.0),
      (2L, "2024-01-21 00:00:00", "purchase", 20.0),
      (1L, "2024-01-04 00:00:00", "purchase", 10.0),
      (1L, "2024-01-22 00:00:00", "purchase", 30.0),
      (3L, "2024-01-05 00:00:00", "view", 99.0))
    val r = EventOps.didEstimate(df, "user_id", "ts", "event_type",
      "value", "purchase", "2024-01-16 00:00:00").collect().head
    // means: c_pre 15, c_post 16, t_pre 5, t_post 15 -> did = 10 - 1
    assert(r.getAs[Double]("m_c_pre") == 15.0)
    assert(r.getAs[Double]("m_c_post") == 16.0)
    assert(r.getAs[Double]("m_t_pre") == 5.0)
    assert(r.getAs[Double]("m_t_post") == 15.0)
    assert(r.getAs[Double]("did") == 9.0)
  }

  test("ips: exact weights and self-normalization") {
    // actions sorted: a,b ; target(u) = actions(u % 2)
    // u=0 logs 'a' (match, e=(0+0)%3=0 -> w=2, r=1.00)
    // u=1 logs 'b' (match, e=(1+1)%3=2 -> w=8, r=2.00)
    // u=2 logs 'b' (no match: target a)
    val df = ev(
      (0L, "2024-01-02 00:00:00", "a", 1.0),
      (1L, "2024-01-02 00:00:00", "b", 2.0),
      (2L, "2024-01-02 00:00:00", "b", 5.0))
    val r = EventOps.ipsPolicyValue(df, "user_id", "event_type",
      "value", Seq("a", "b")).collect().head
    // swr = 2*100 + 8*200 = 1800 cents; n=3 -> ips = 6.0
    // sw = 10 -> snips = 1800/1000 = 1.8
    assert(r.getAs[Long]("n_matched") == 2L)
    assert(r.getAs[Double]("ips") == 6.0)
    assert(r.getAs[Double]("snips") == 1.8)
  }

  test("bootstrap: exact point estimate, ordered CI, determinism") {
    val rows = (0L until 60L).map(u =>
      (u, "2024-01-02 00:00:00", "purchase", (u % 7 + 1).toDouble))
    val df = ev(rows: _*)
    val r = EventOps.poissonBootstrapMean(df, "user_id", "event_type",
      "value", "purchase", b = 50).collect().head
    val xs = (0L until 60L).map(u => (u % 7 + 1) * 100)
    val exp = math.rint(xs.sum.toDouble * 1e4 / 60) / 1e6
    assert(r.getAs[Double]("obs_mean") == exp)
    assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("boot_avg"))
    assert(r.getAs[Double]("boot_avg") <= r.getAs[Double]("ci_hi"))
    val r2 = EventOps.poissonBootstrapMean(df.repartition(7),
      "user_id", "event_type", "value", "purchase", b = 50)
      .collect().head
    assert(r.toSeq == r2.toSeq)
  }

  test("randomization test: sharp null gives large p, shift gives small") {
    // identical outcomes in both arms -> every reassignment ties obs
    val same = ev((0L until 40L).map(u =>
      (u, "2024-01-02 00:00:00", "purchase", 5.0)): _*)
    val rNull = EventOps.randomizationTest(same, "user_id",
      "event_type", "value", "purchase", b = 99).collect().head
    assert(rNull.getAs[Double]("d_obs") == 0.0)
    assert(rNull.getAs[Double]("p_value") == 1.0)
    // strong shift: odd users earn 100x -> |obs| should be extreme
    val shift = ev((0L until 40L).map(u =>
      (u, "2024-01-02 00:00:00", "purchase",
        if (u % 2 == 1) 500.0 else 5.0)): _*)
    val rS = EventOps.randomizationTest(shift, "user_id",
      "event_type", "value", "purchase", b = 99).collect().head
    assert(rS.getAs[Double]("p_value") < 0.1)
  }
}
