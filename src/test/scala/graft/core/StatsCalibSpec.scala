package graft.core

import graft.ops.{ProfileOps, SimilarityOps}
import org.apache.spark.sql.functions._

/** Closed-form hand cases for the calibration/normalization/forensics
  * additions (q259–q263).
  */
class StatsCalibSpec extends SparkSpec {
  import spark.implicits._

  test("isotonic: PAV pools the violating prefix, keeps the tail") {
    // buckets (w, p): 0:(2,1)=0.5, 1:(2,0)=0.0, 2:(1,1)=1.0
    // PAV pools 0&1 -> 1/4; bucket 2 stays 1.0
    val df = Seq((0, 1), (0, 0), (1, 0), (1, 0), (2, 1))
      .toDF("bucket", "pos")
    val got = ProfileOps.isotonicCalibration(df, "bucket", "pos")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got(0L) == ((2L, 1L, 0.5, 0.25)))
    assert(got(1L) == ((2L, 0L, 0.0, 0.25)))
    assert(got(2L) == ((1L, 1L, 1.0, 1.0)))
  }

  test("isotonic: already-monotone rates are untouched") {
    val df = Seq((0, 0), (0, 0), (1, 0), (1, 1), (2, 1), (2, 1))
      .toDF("bucket", "pos")
    val got = ProfileOps.isotonicCalibration(df, "bucket", "pos")
      .collect().map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got.values.forall { case (raw, iso) => raw == iso })
  }

  test("theil's U: perfect dependence = 1 both ways, independence = 0") {
    val dep = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q"))
      .toDF("a", "b")
    val r1 = ProfileOps.theilsU(dep, "a", "b").collect()(0)
    assert(r1.getDouble(4) == 1.0 && r1.getDouble(5) == 1.0)
    assert(r1.getDouble(1) == r1.getDouble(2)) // MI = H(a) = ln 2
    val ind = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("a", "b")
    val r2 = ProfileOps.theilsU(ind, "a", "b").collect()(0)
    assert(r2.getDouble(1) == 0.0 && r2.getDouble(4) == 0.0)
    // constant column: H = 0 -> U null on that side
    val const = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    assert(ProfileOps.theilsU(const, "a", "b").collect()(0).isNullAt(4))
  }

  test("quantile normalization maps both groups onto the global grid") {
    // A = {1,2,3,4}, B = {101,102,103,104}; global order mixes them,
    // so rank 2-of-4 in either group lands on global position 4.
    val df = (Seq(1L, 2L, 3L, 4L).map(("A", _)) ++
      Seq(101L, 102L, 103L, 104L).map(("B", _)))
      .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "g", "v")
    val got = ProfileOps.quantileNormalize(df, "id", "g", "v")
      .collect().map(r => (r.getString(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(got(("A", 2L)) == ((500L, 4L)))
    assert(got(("B", 102L)) == ((500L, 4L))) // same quantile, same value
    assert(got(("A", 1L)) == ((250L, 2L)))
    assert(got(("A", 4L)) == ((1000L, 104L)))
    assert(got(("B", 104L)) == ((1000L, 104L)))
  }

  test("benford: uniform digits 1-9 give frac 1/9; literals present") {
    val df = (1L to 9L).toDF("v")
    val got = ProfileOps.benfordFirstDigit(df, "v")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.size == 9)
    assert(got.values.forall { case (n, f, _) => n == 1L && f == 0.111111 })
    assert(got(1)._3 == 0.30103 && got(9)._3 == 0.045757)
    // multi-digit values: first digit of the decimal string
    val big = Seq(1234L, 95L, 0L, -7L).toDF("v") // 0 and -7 dropped
    val got2 = ProfileOps.benfordFirstDigit(big, "v")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got2 == Map(1 -> 1L, 9 -> 1L))
  }

  test("mergeable stats: merged batches equal the full recompute") {
    val df = Seq(("g1", 1L), ("g1", 2L), ("g1", 3L), ("g1", 4L),
      ("g2", 10L), ("g2", 10L)).toDF("src", "x")
    val full = ProfileOps.deriveStats(
      ProfileOps.statsSketch(df, "src", "x"), "src")
    val merged = ProfileOps.deriveStats(ProfileOps.mergeStatsSketches(Seq(
      ProfileOps.statsSketch(df.where($"x" <= 2), "src", "x"),
      ProfileOps.statsSketch(df.where($"x" > 2), "src", "x"))), "src")
    assert(full.collect().toSet == merged.collect().toSet)
    val got = full.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3)))).toMap
    // g1: mean 2.5, var = (4*30 - 100)/12 = 1.666667 (half-up idiv)
    assert(got("g1") == ((4L, 2.5, 1.666667)))
    assert(got("g2") == ((2L, 10.0, 0.0)))
  }

  test("weighted percentiles: lower weighted median on hand weights") {
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 1L), ("a", 3.0, 8L),
      ("b", 1.0, 5L), ("b", 2.0, 5L)).toDF("g", "v", "w")
    val got = ProfileOps.weightedPercentiles(df, "g", "v", "w")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("a") == ((10L, 3.0, 3.0)))
    // W/2 reached exactly at the first value -> lower median = 1
    assert(got("b") == ((10L, 1.0, 2.0)))
  }

  test("basket pairs: counts once per basket, exact lift") {
    // b1={x,y,z}, b2={x,y,x}(dup collapses), b3={x}: (x,y) support 2,
    // lift = 2*3/(3*2) = 1.0
    val rows = Seq(("b1", "x"), ("b1", "y"), ("b1", "z"),
      ("b2", "x"), ("b2", "y"), ("b2", "x"), ("b3", "x"))
      .toDF("bk", "it")
    val got = graft.ops.CooccurOps.basketPairs(rows, "bk", "it", 2L)
      .collect()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getDouble(6)) ==
      (("x", "y", 2L, 3L, 2L, 3L, 1.0)))
  }

  test("attribution: within-window credited, stale/missing touch not") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "click", 1L),
      (1L, ts("2024-01-01 10:00:10"), "purchase", 2L), // lat 10s
      (2L, ts("2024-01-01 11:30:00"), "purchase", 3L), // no touch
      (3L, ts("2024-01-01 08:00:00"), "click", 4L),
      (3L, ts("2024-01-02 12:00:00"), "purchase", 5L)) // > 24h stale
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = graft.ops.EventOps.lastTouchAttribution(ev, "user_id",
        "ts", "event_type", "event_id", "purchase", "click", 86400L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) -1.0 else r.getDouble(4)))).toMap
    assert(got(10L) == ((1L, 1L, 1.0, 10.0)))
    assert(got(11L) == ((1L, 0L, 0.0, -1.0))) // never touched
    assert(got(12L) == ((1L, 0L, 0.0, -1.0))) // stale touch
  }

  test("simple good-turing: collinear Z gives slope exactly -1") {
    // counts: 8 words once, 6 words twice, 4 words four times ->
    // Z(1)=16/2=8, Z(2)=12/3=4, Z(4)=8/4=2: ln Z = ln 8 - ln r,
    // slope -1, r* = (r+1)*((r+1)/r)^-1 = r
    val words = (1 to 8).map(i => s"u$i") ++
      (1 to 6).flatMap(i => Seq(s"d$i", s"d$i")) ++
      (1 to 4).flatMap(i => Seq.fill(4)(s"q$i"))
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val got = graft.ops.LmOps.simpleGoodTuring(docs, "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got(1L) == ((8L, 8.0, -1.0, 1.0)))
    assert(got(2L) == ((6L, 4.0, -1.0, 2.0)))
    assert(got(4L) == ((4L, 2.0, -1.0, 4.0)))
  }

  test("kaplan-meier: censoring shrinks risk without an event step") {
    // (1,ev) (2,cens) (3,ev) (4,cens): S(1)=3/4, S(3)=3/4 * 1/2
    val subj = Seq((1L, 1), (2L, 0), (3L, 1), (4L, 0)).toDF("t", "ev")
    val got = graft.ops.EventOps.kaplanMeier(subj, "t", "ev")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(1L -> ((4L, 1L, 0.75)), 3L -> ((2L, 1L, 0.375))))
    // risk exhaustion drops the curve to exactly 0
    val all = Seq((1L, 1), (1L, 1)).toDF("t", "ev")
    assert(graft.ops.EventOps.kaplanMeier(all, "t", "ev")
      .collect()(0).getDouble(3) == 0.0)
  }

  test("best-F1: argmax over the threshold sweep, exact micro grid") {
    // (0.9,+) (0.8,-) (0.7,+): t=0.7 wins with F1 = 4/5
    val df = Seq((0.9, 1), (0.8, 0), (0.7, 1)).toDF("s", "pos")
    val r = ProfileOps.bestF1Threshold(df, "s", "pos").collect()(0)
    assert(r.getDouble(0) == 0.7)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((2L, 1L, 0L)))
    assert((r.getDouble(4), r.getDouble(5), r.getDouble(6)) ==
      ((0.666667, 1.0, 0.8)))
  }

  test("approx percentile gate holds on exact-regime input") {
    val df = (1 to 1000).map(_.toDouble).toDF("v")
    val r = ProfileOps.approxPercentileGate(df, "v").collect()(0)
    assert(r.getLong(0) == 1000L && r.getBoolean(1) && r.getBoolean(2))
  }

  test("cusum changepoint lands on the level shift, exact statistic") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // hourly counts 1,1,10,10 -> |S_k| = 18,36,18,0: shift after h2
    val rows =
      Seq.fill(1)(ts("2024-01-01 00:10:00")) ++
      Seq.fill(1)(ts("2024-01-01 01:10:00")) ++
      Seq.fill(10)(ts("2024-01-01 02:10:00")) ++
      Seq.fill(10)(ts("2024-01-01 03:10:00"))
    val df = rows.map(("a", _)).toDF("k", "ts")
    val r = graft.ops.TimeSeriesOps.cusumChangepoint(df, "k", "ts")
      .collect()(0)
    assert(r.getLong(1) == 4L && r.getLong(2) == 22L)
    assert(r.getTimestamp(3) == ts("2024-01-01 01:00:00"))
    assert(r.getLong(4) == 36L)
  }

  test("seasonal-naive backtest: previous-day same-hour errors") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // hour 9 counts: day1=2, day2=3, day3=3 -> errors 1, 0 -> mae 0.5
    val rows =
      Seq.fill(2)(ts("2024-01-01 09:05:00")) ++
      Seq.fill(3)(ts("2024-01-02 09:05:00")) ++
      Seq.fill(3)(ts("2024-01-03 09:05:00"))
    val df = rows.map(("a", _)).toDF("k", "ts")
    val r = graft.ops.TimeSeriesOps.seasonalNaiveBacktest(df, "k", "ts")
      .collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getDouble(3)) ==
      ((2L, 1L, 0.5)))
  }

  test("clustering coefficient: triangle plus pendant = 3/5") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 3L))
      .toDF("src", "dst") // (4,3) duplicate reversed, must collapse
    val r = graft.ops.GraphOps.clusteringCoefficient(edges, "src", "dst")
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4)) == ((4L, 4L, 5L, 1L, 0.6)))
  }

  test("trimmed mean: 10% per side drops exactly the rank tails") {
    val df = (1L to 10L).map(("g", _)).toDF("g", "v")
    val r = ProfileOps.trimmedMean(df, "g", "v", trimPermille = 100)
      .collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getDouble(3)) ==
      ((10L, 8L, 5.5)))
    // tie spanning the cut: values 1,1,1,9 with 25% trim (lo=1,hi=3)
    // keeps ranks 2..3 -> both are 1s -> mean 1.0
    val tie = Seq(("g", 1L), ("g", 1L), ("g", 1L), ("g", 9L))
      .toDF("g", "v")
    assert(ProfileOps.trimmedMean(tie, "g", "v", trimPermille = 250)
      .collect()(0).getDouble(3) == 1.0)
  }

  test("cuped: perfectly predictive covariate equalizes arm means") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user u: pre value (u+1), post value 2(u+1) -> theta = 2,
    // rho^2 = 1, adjusted means identical across arms (= 2 * x̄)
    val ev = (0L to 3L).flatMap { u =>
      Seq((u, ts("2024-01-10 00:00:00"), (u + 1).toDouble),
        (u, ts("2024-01-20 00:00:00"), 2.0 * (u + 1)))
    }.toDF("user_id", "ts", "value")
    val got = graft.ops.EventOps.cupedLift(ev, "user_id", "ts",
        "value", "2024-01-16 00:00:00")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(got(0L) == ((2L, 400.0, 500.0, 2.0, 1.0)))
    assert(got(1L) == ((2L, 600.0, 500.0, 2.0, 1.0)))
  }

  test("stratified split: Hamilton remainder, sums to n exactly") {
    val df = ((1 to 7).map(i => ("s1", "en", i)) ++
      (1 to 10).map(i => ("s2", "de", i))).toDF("source", "lang", "i")
    val got = graft.ops.SelectionOps.stratifiedSplitCounts(df,
        Seq("source", "lang"),
        Seq("train" -> 800, "val" -> 100, "test" -> 100))
      .collect().map(r => (r.getString(0), r.getString(2)) ->
        r.getLong(4)).toMap
    // n=7: base 5/0/0, remainders 600/700/700 -> val & test get the 2
    assert(got(("s1", "train")) == 5L)
    assert(got(("s1", "val")) == 1L && got(("s1", "test")) == 1L)
    // n=10: exact 8/1/1, no leftover
    assert(got(("s2", "train")) == 8L)
    assert(got(("s2", "val")) == 1L && got(("s2", "test")) == 1L)
  }

  test("skip-gram: forward pairs within the window, filtered positions") {
    // "a  b a" (double space collapses): tokens a(0) b(1) a(2);
    // window 2 -> (a,b), (a,a), (b,a) once each
    val docs = Seq((1L, "a  b a")).toDF("doc_id", "text")
    val got = graft.ops.CooccurOps.skipgramCounts(docs, "doc_id",
        "text", window = 2, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getLong(2)).toMap
    assert(got == Map(("a", "b") -> 1L, ("a", "a") -> 1L,
      ("b", "a") -> 1L))
  }

  test("mann-kendall: monotone counts give S = n(n-1)/2; ties null out") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // daily counts 1,2,3,4 -> S=6, var18 = 4*3*13 = 156
    val rows = (1 to 4).flatMap(d =>
      Seq.fill(d)(ts(f"2024-01-0$d 12:00:00")))
    val df = rows.map(("a", _)).toDF("k", "ts")
    val r = graft.ops.TimeSeriesOps.mannKendallTrend(df, "k", "ts")
      .collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 6L, 156L)))
    val expZ = BigDecimal(5.0 / math.sqrt(156.0 / 18.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) == expZ)
    // two tied days: var18 = 0 -> z null
    val tied = Seq(("b", ts("2024-01-01 10:00:00")),
      ("b", ts("2024-01-02 10:00:00"))).toDF("k", "ts")
    assert(graft.ops.TimeSeriesOps.mannKendallTrend(tied, "k", "ts")
      .collect()(0).isNullAt(4))
  }

  test("prefix jaccard: lossless at tau, boundary pair included") {
    // A="x y z w" (grams {xyz, yzw}), C="x y z w v" (+{zwv}):
    // J(A,C) = 2/3; B="x y z q": J(A,B) = 1/3 < tau, J(B,C) = 1/4
    val docs = Seq((1L, "x y z w"), (2L, "x y z q"), (3L, "x y z w v"))
      .toDF("doc_id", "text")
    val got = graft.ops.DedupOps.prefixJaccardPairs(
        graft.ops.DedupOps.wordShingles(docs, "doc_id", "text", 3),
        tauPermille = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(5)))).toMap
    assert(got == Map((1L, 3L) -> ((2L, 0.666667))))
    // identical docs: J = 1.0 survives any tau
    val dup = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    assert(graft.ops.DedupOps.prefixJaccardPairs(
        graft.ops.DedupOps.wordShingles(dup, "doc_id", "text", 3),
        tauPermille = 900)
      .collect()(0).getDouble(5) == 1.0)
  }

  test("pareto point: exact crossing inside a tied count block") {
    // counts: one user with 8, four users with 3 (N=20): 80% = 16;
    // top user gives 8, need ceil(8/3)=3 more -> k=4 of 5 users
    val rows = Seq.fill(8)(1L) ++
      (2L to 5L).flatMap(u => Seq.fill(3)(u))
    val df = rows.map(u => (u, 1)).toDF("user_id", "x")
    val r = graft.ops.EventOps.paretoPoint(df, "user_id", 800)
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ==
      ((5L, 20L, 4L, 0.8)))
    // uniform activity: 80% needs exactly 80% of keys
    val uni = (1L to 10L).flatMap(u => Seq.fill(2)(u))
      .map(u => (u, 1)).toDF("user_id", "x")
    assert(graft.ops.EventOps.paretoPoint(uni, "user_id", 800)
      .collect()(0).getLong(2) == 8L)
  }

  test("grouped OLS: exact line recovered; constant-x nulls") {
    val df = Seq(("g", 1L, 2L), ("g", 2L, 4L), ("g", 3L, 6L),
      ("c", 5L, 1L), ("c", 5L, 9L)).toDF("src", "x", "y")
    val got = ProfileOps.groupedOls(df, "src", "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    val g = got("g")
    assert((g.getDouble(2), g.getDouble(3), g.getDouble(4)) ==
      ((2.0, 0.0, 1.0)))
    assert(got("c").isNullAt(2) && got("c").isNullAt(4))
  }

  test("welch t: textbook two-sample case") {
    // A = {0,2} vs rest {10,14}: t = -11/sqrt(5), df = 25/17
    val df = Seq(("A", 0L), ("A", 2L), ("B", 10L), ("B", 14L))
      .toDF("g", "v")
    val got = ProfileOps.welchTAgainstRest(df, "g", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("A") == ((-4.91935, 1.470588)))
    assert(got("B") == ((4.91935, 1.470588))) // antisymmetric
  }

  test("cohort ltv: per-user cumulative revenue over cohort weeks") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // both users cohort at week of Mon 2024-01-01; u1 buys $100 in
    // week 0 and $50 in week 1, u2 never buys
    val ev = Seq(
      (1L, ts("2024-01-02 10:00:00"), "purchase", 100.0),
      (1L, ts("2024-01-09 10:00:00"), "purchase", 50.0),
      (2L, ts("2024-01-03 10:00:00"), "view", 0.0))
      .toDF("user_id", "ts", "event_type", "value")
    val got = graft.ops.EventOps.cohortLtv(ev, "user_id", "ts",
        "event_type", "value", "purchase")
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got == Map(0L -> ((2L, 10000L, 50.0)),
      1L -> ((2L, 15000L, 75.0))))
  }

  test("fd audit: g3 counts the minimal violating rows") {
    // a->b: group 1 sees {x:2, y:1} (violating, keep 2 of 3),
    // group 2 sees {z} -> g3 = 1/4; b->a holds exactly -> g3 = 0
    val df = Seq((1, "x"), (1, "x"), (1, "y"), (2, "z"))
      .toDF("a", "b")
    val got = ProfileOps.fdAudit(df, Seq("a" -> "b", "b" -> "a"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))).toMap
    assert(got(("a", "b")) == ((2L, 1L, 4L, 3L, 0.25)))
    assert(got(("b", "a")) == ((3L, 0L, 4L, 4L, 0.0)))
  }

  test("fd audit: typed slots — nulls and mixed integral/string candidates group exactly") {
    // nulls group as one value on both the integral and the string
    // slot (pre-slot behavior: cast-to-string of NULL was NULL); a
    // long candidate and a string candidate coexist in one audit
    val df = Seq(
      (Some(1L), Some("x")), (Some(1L), Some("x")), (Some(1L), None),
      (None, Some("x")), (None, Some("y")), (None, None))
      .toDF("a", "b")
    val got = ProfileOps.fdAudit(df, Seq("a" -> "b", "b" -> "a"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))).toMap
    // a->b: group a=1 -> {x:2, null:1} violating (keep 2); group
    // a=null -> {x,y,null} violating (keep 1) => keep 3 of 6
    assert(got(("a", "b")) == ((2L, 2L, 6L, 3L, 0.5)))
    // b->a: b=x -> {1:2, null:1} (keep 2); b=y -> {null} ok;
    // b=null -> {1, null} (keep 1) => keep 4 of 6
    // g3 at the 6dp half-up grid: (2e6*2+6) div 12 = 333333 -> 0.333333
    assert(got(("b", "a")) == ((3L, 2L, 6L, 4L, 0.333333)))
  }

  test("winsorized mean: tails clamp to boundary order stats") {
    // 1..9,100 at 10% per side: rank1 -> 2, rank10 -> 9; mean 5.5
    val df = ((1 to 9) :+ 100).map(v => ("g", v.toLong)).toDF("g", "v")
    val got = ProfileOps.winsorizedMean(df, "g", "v",
      trimPermille = 100).collect().head
    assert((got.getLong(1), got.getLong(2), got.getLong(3),
      got.getDouble(4)) == ((10L, 2L, 9L, 5.5)))
  }

  test("systematic pps: grid points land by cumulative weight") {
    val df = Seq(("A", 1L, 1L), ("A", 2L, 1L), ("A", 3L, 1L),
      ("A", 4L, 1L), ("B", 1L, 6L), ("B", 2L, 1L), ("B", 3L, 1L))
      .toDF("g", "id", "w")
    val got = graft.ops.SampleOps.systematicPps(df, "g", "id", "w", 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
      .toSet
    // A: uniform -> ids 1 and 3; B: heavy id1 takes BOTH grid points
    assert(got == Set(("A", 1L, 1L), ("A", 3L, 1L), ("B", 1L, 2L)))
  }

  test("shard skew plan: loads are consistent and deterministic") {
    val df = (1L to 100L).map(i => (i, i)).toDF("k", "w")
    val got = graft.ops.LayoutOps.shardSkewPlan(df, "k", "w", 4)
      .collect()
    assert(got.map(_.getLong(1)).sum == 100L)
    assert(got.map(_.getLong(2)).sum == 5050L)
    got.foreach { r =>
      val expSkew = math.floor(
        (2000000.0 * r.getLong(2) * 4 + 5050) / (2 * 5050)) / 1e6
      assert(r.getDouble(4) == expSkew)
    }
    val again = graft.ops.LayoutOps.shardSkewPlan(df, "k", "w", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == got.map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("mde power: pooled variance from one exact rational") {
    // arm0 cents {100,300} -> s²=20000/2=10000 pooled with arm1
    // {200,200} (s²=0): pv = 10000, mde = 2.801585*sqrt(10000)
    val ev = Seq((2L, "purchase", 1.0), (4L, "purchase", 3.0),
      (1L, "purchase", 2.0), (3L, "purchase", 2.0))
      .toDF("user_id", "event_type", "value")
    val got = graft.ops.EventOps.mdePower(ev, "user_id", "event_type",
      "value", "purchase").collect().head
    assert((got.getLong(0), got.getLong(1), got.getDouble(2),
      got.getDouble(3)) == ((2L, 2L, 10000.0, 280.1585)))
  }

  test("linear cka: proportional codes score exactly 1") {
    // all vectors share max|x| -> one global scale -> Y = cX -> 1.0
    val emb = Seq((0L, Array(0.5f, 0.0f)), (1L, Array(0.0f, 0.5f)),
      (2L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val got = SimilarityOps.linearCka(emb, "vec_id", "embedding")
      .collect()
    assert(got.map(r => (r.getLong(0), r.getInt(1),
      r.getDouble(2))).toSeq == Seq((3L, 2, 1.0)))
  }

  test("linear cka: per-vector scales break proportionality") {
    // third vector max|x|=0.25 gets scale 508 -> hand value 0.948683
    val emb = Seq((0L, Array(0.5f, 0.0f)), (1L, Array(0.0f, 0.5f)),
      (2L, Array(0.25f, 0.25f))).toDF("vec_id", "embedding")
    val got = SimilarityOps.linearCka(emb, "vec_id", "embedding")
      .collect()
    assert(got.head.getDouble(2) == 0.948683)
  }

  test("postings stats: delta-gap varint bytes are exact") {
    // a -> docs [0,1,200]: gaps 0,1,199 -> 1+1+2 bytes;
    // b -> docs [0,200]: gaps 0,200 -> 1+2 bytes
    val docs = Seq((0L, "a b a"), (1L, "a"), (200L, "a b"))
      .toDF("doc_id", "text")
    val got = graft.ops.RetrievalOps.postingsStats(docs, "doc_id",
        "text", minDf = 2L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getDouble(6)))).toMap
    assert(got("a") == ((3L, 4L, 199L, 4L, 24L, 0.166667)))
    assert(got("b") == ((2L, 2L, 200L, 3L, 16L, 0.1875)))
  }

  test("t-closeness: ordered EMD from integer cumulative sums") {
    // A=(3,1), B=(1,3) over 2 buckets; global (4,4) ->
    // both groups sit at EMD 0.25 from the global mix
    val df = Seq(("A", 0), ("A", 0), ("A", 0), ("A", 1),
      ("B", 0), ("B", 1), ("B", 1), ("B", 1)).toDF("g", "b")
    val got = ProfileOps.tCloseness(df, Seq("g" -> col("g")),
        col("b"), nBuckets = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got("A") == ((4L, 0.25)))
    assert(got("B") == ((4L, 0.25)))
  }

  test("ewma band: integer recurrence with anomaly flag") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // one series, three days, alpha=1/5, band=5.0: day2 jumps 10.0
    // over the level (flag), ewma moves to 12.0; day3 sits on it
    val ev = Seq(
      ("m", ts("2024-01-01 08:00:00"), 10.0),
      ("m", ts("2024-01-02 08:00:00"), 20.0),
      ("m", ts("2024-01-03 08:00:00"), 12.0))
      .toDF("event_type", "ts", "value")
    val got = graft.ops.TimeSeriesOps.ewmaBand(ev, "event_type", "ts",
        "value", 1, 5, bandMicro = 5000000L)
      .orderBy("day").collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getInt(4))).toSeq
    assert(got == Seq((10.0, 10.0, 0), (20.0, 12.0, 1),
      (12.0, 12.0, 0)))
  }

  test("jackknife ratio: loo variance from exact integer sums") {
    // arm0 (u2,u4): purchases 300+100 cents, 2 clicks each ->
    // loo ratios 50.0/150.0 c/click, se = 50; arm1 (u1,u3):
    // 200+0 cents, 1 click each -> loo 0/200, se = 100
    val ev = Seq(
      (1L, "purchase", 2.0), (1L, "click", 0.0), (3L, "click", 0.0),
      (2L, "purchase", 3.0), (2L, "click", 0.0), (2L, "click", 0.0),
      (4L, "purchase", 1.0), (4L, "click", 0.0), (4L, "click", 0.0))
      .toDF("user_id", "event_type", "value")
    val got = graft.ops.EventOps.jackknifeRatio(ev, "user_id",
        "event_type", "value", "purchase", "click")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7),
          r.getDouble(8)))).toMap
    assert(got(0L) == ((2L, 0L, 400L, 4L, 100.0, 50.0, 2.0, 198.0)))
    assert(got(1L) == ((2L, 0L, 200L, 2L, 100.0, 100.0, -96.0, 296.0)))
  }

  test("silhouette: points on their seeds score exactly 1") {
    val emb = Seq(
      (0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)),
      (2L, Array(1.0, 0.0)), (3L, Array(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val got = SimilarityOps.simplifiedSilhouette(
        emb, "vec_id", "embedding", col("vec_id") < 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got(0L) == ((2L, 1.0, 0.0, 1.0)))
    assert(got(1L) == ((2L, 1.0, 0.0, 1.0)))
  }
}
