package graft.core

import graft.ops.{EventOps, ProfileOps, TimeSeriesOps}
import org.apache.spark.sql.functions._

/** Hand cases for Holt smoothing, post-stratified ATE, CMH pooled
  * odds, and empirical-Bayes rate shrinkage.
  */
class CausalTrendSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String, Double)*) =
    rows.toSeq.toDF("user_id", "tss", "event_type", "value")
      .select(col("user_id"), to_timestamp(col("tss")).as("ts"),
        col("event_type"), col("value"))

  test("holt: level/trend recurrence by hand, incl. the trend state") {
    val df = ev(
      (1L, "2024-01-01 06:00:00", "m", 10.0),
      (1L, "2024-01-02 06:00:00", "m", 20.0),
      (1L, "2024-01-03 06:00:00", "m", 30.0))
    val r = TimeSeriesOps.holtTrend(df, "event_type", "ts", "value")
      .orderBy("day").collect()
    // day1: l=10, b=0; day2: l=(20+10)/2=15, b=(5+0)/2=2.5, fcst=10
    // day3: l=(30+17.5)/2=23.75, b=(8.75+2.5)/2=5.625, fcst=17.5
    assert(r(0).getAs[Double]("level") == 10.0)
    assert(r(1).getAs[Double]("level") == 15.0)
    assert(r(1).getAs[Double]("trend") == 2.5)
    assert(r(1).getAs[Double]("fcst") == 10.0)
    assert(r(1).getAs[Double]("err") == 10.0)
    assert(r(2).getAs[Double]("level") == 23.75)
    assert(r(2).getAs[Double]("trend") == 5.625)
    assert(r(2).getAs[Double]("fcst") == 17.5)
  }

  test("holt: declining series drives the trend negative, sign-safe") {
    val df = ev((1 to 6).map(i =>
      (1L, s"2024-01-0$i 06:00:00", "m", 100.0 - 10 * i)): _*)
    val r = TimeSeriesOps.holtTrend(df, "event_type", "ts", "value")
      .orderBy("day").collect()
    assert(r.last.getAs[Double]("trend") < 0.0)
    // one-step forecasts must sit above the falling observations
    assert(r.last.getAs[Double]("err") <= 0.0)
  }

  test("post-stratified ATE: hand panel with the weighted ALL row") {
    // users 0..9, strata u%5 = {u, u+5} (one arm each), revenue = u
    val df = ev((0L until 10L).map(u =>
      (u, "2024-01-02 00:00:00", "purchase", u.toDouble)): _*)
    val out = EventOps.postStratifiedAte(df, "user_id", "event_type",
      "value", "purchase").collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("diff")).toMap
    // even stratum: treated u+5 vs control u -> +5; odd: u vs u+5 -> -5
    assert(out(0L) == 5.0 && out(1L) == -5.0 && out(4L) == 5.0)
    assert(out(-1L) == 1.0) // (3*5 - 2*5) * 2 / 10
  }

  test("cmh: two identical strata pool to the single-stratum OR") {
    // default nStrata=5; per stratum a=4, b=1, c=1, d=2 over n=8 ->
    // ad/n and bc/n land EXACTLY on the micro grid, OR = 8
    def stratum(base: Long) = Seq(
      (base + 5L, "purchase"), (base + 15L, "purchase"),
      (base + 25L, "purchase"), (base + 35L, "purchase"),
      (base + 45L, "view"),                                // treated
      (base + 0L, "purchase"), (base + 10L, "view"),
      (base + 20L, "view"))                                // control
    // second stratum at base 2 (even base keeps user-parity = arm)
    val df = ev((stratum(0L) ++ stratum(2L)).map { case (u, t) =>
      (u, "2024-01-02 00:00:00", t, 1.0) }: _*)
    val r = EventOps.cmhOddsRatio(df, "user_id", "event_type",
      "purchase").collect().head
    assert(r.getAs[Double]("or_cmh") == 8.0)
    assert(r.getAs[Long]("n_strata") == 2L)
  }

  test("eb shrinkage: pulls toward the pool, small n moves more") {
    // big group at its own rate, two small extreme groups
    val rows = (0 until 1000).map(i => ("big", i % 2 == 0)) ++
      (0 until 10).map(_ => ("hot", true)) ++
      (0 until 10).map(_ => ("cold", false))
    val df = rows.toDF("g", "f")
    val out = ProfileOps.ebShrunkRates(df, "g", col("f"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("raw_rate"),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    val (rawHot, Some(shrunkHot)) = out("hot")
    val (rawBig, Some(shrunkBig)) = out("big")
    assert(rawHot == 1.0 && shrunkHot < 1.0) // pulled down toward pool
    assert(math.abs(shrunkBig - rawBig) <
      math.abs(shrunkHot - rawHot)) // big group barely moves
    val (_, Some(shrunkCold)) = out("cold")
    assert(shrunkCold > 0.0)
  }
}
