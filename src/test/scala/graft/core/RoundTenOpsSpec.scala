package graft.core

import graft.ops.{ComplianceOps, CooccurOps, FuzzyOps, LayoutOps, ProfileOps, TimeSeriesOps}
import org.apache.spark.sql.functions._

/** Semantics pins for the round-10 operator families (the sf oracles
  * cover the synthetic tables; these pin behavior on hand-built
  * inputs: LOCF carry, exact interpolation, SymSpell exactness vs
  * brute force, Morton bit layout, MAD degeneracy, cascade counts).
  */
class RoundTenOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, Double)*) =
    rows.toSeq.toDF("user_id", "s", "value")
      .select(col("user_id"), to_timestamp(col("s")).as("ts"), col("value"))

  test("locfGapfill: dense grid, carry-forward, gap flags") {
    val e = ev(
      (1L, "2024-01-01 00:10:00", 10.0),
      (1L, "2024-01-01 00:50:00", 20.0), // same hour -> mean 15
      (1L, "2024-01-01 03:30:00", 40.0), // hours 1,2 are gaps
      (2L, "2024-01-01 05:00:00", 7.0)) // single-hour key: 1-row grid
    val got = TimeSeriesOps.locfGapfill(e, "user_id", "ts", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getInt(3))).toMap
    val h0 = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond
    assert(got((1L, h0)) === ((15.0, 0)))
    assert(got((1L, h0 + 3600)) === ((15.0, 1)))
    assert(got((1L, h0 + 7200)) === ((15.0, 1)))
    assert(got((1L, h0 + 10800)) === ((40.0, 0)))
    assert(got((2L, h0 + 18000)) === ((7.0, 0)))
    assert(got.size === 5)
  }

  test("interpolateGaps: exact micro-unit linear fill, half-up at midpoints") {
    // observations 10.0 @ h0 and 20.000001 @ h0+3h: the 1/3 and 2/3
    // points exercise the integer rounding (13333334 exact half-up of
    // 40000002/3... spelled (2n+d) div (2d)); a plain float spelling
    // disagrees with DuckDB at exactly these points.
    val e = ev(
      (1L, "2024-01-01 00:00:00", 10.0),
      (1L, "2024-01-01 03:00:00", 20.0))
    val got = TimeSeriesOps.interpolateGaps(e, "user_id", "ts", "value")
      .collect().map(r => r.getLong(1) -> (r.getDouble(2), r.getInt(3))).toMap
    val h0 = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond
    assert(got(h0) === ((10.0, 0)))
    assert(got(h0 + 3600) === ((13.333333, 1)))
    assert(got(h0 + 7200) === ((16.666667, 1))) // half-up at x.6666665
    assert(got(h0 + 10800) === ((20.0, 0)))
  }

  test("ohlcBars: open/close by (t, id) order, tie broken by id") {
    val e = Seq(
      ("a", "2024-01-01 00:00:05", 3L, 30.0),
      ("a", "2024-01-01 00:00:05", 2L, 20.0), // same ts: id 2 wins open
      ("a", "2024-01-01 00:59:59", 9L, 5.0),
      ("a", "2024-01-01 01:00:01", 1L, 50.0)) // next bar
      .toDF("series", "s", "event_id", "value")
      .select(col("series"), to_timestamp(col("s")).as("ts"),
        col("event_id"), col("value"))
    val got = TimeSeriesOps.ohlcBars(e, "series", "ts", "event_id", "value")
      .collect().map(r => r.getLong(1) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6), r.getLong(7))).toMap
    val h0 = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond
    assert(got(h0) === ((20.0, 30.0, 5.0, 5.0, 55.0, 3L)))
    assert(got(h0 + 3600) === ((50.0, 50.0, 50.0, 50.0, 50.0, 1L)))
  }

  test("editJoin1 is EXACT: equals brute-force levenshtein<=1 on a messy set") {
    val names = Seq("alpha", "alpa", "alphaa", "blpha", "gamma", "gamma",
      "delta", "dleta", "ab", "ba", "a", "", "xy")
    val df = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("k", "name")
    val got = FuzzyOps.editJoin1(df, "k", "name", df, "k", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = (for {
      (a, i) <- names.zipWithIndex
      (b, j) <- names.zipWithIndex
      if levenshteinDist(a, b) <= 1
    } yield (i.toLong, j.toLong)).toSet
    assert(got === brute)
    // sanity: the substitution case ("alpha"/"blpha") and the ed=2
    // shared-variant false candidate ("ab"/"ba") behave correctly
    assert(got.contains((0L, 3L)))
    assert(!got.contains((8L, 9L)))
  }

  private def levenshteinDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("zInterleave: bit layout and locality") {
    val df = Seq((3L, 0L), (0L, 3L), (1023L, 1023L)).toDF("x", "y")
    val z = df.select(LayoutOps.zInterleave(col("x"), col("y"), 10).as("z"))
      .collect().map(_.getLong(0))
    assert(z(0) === 5L) // x bits at even positions: 0b0101
    assert(z(1) === 10L) // y bits at odd positions: 0b1010
    assert(z(2) === (1L << 20) - 1)
  }

  test("zSkippingReport: clustered layout beats round-robin") {
    val df = spark.range(0, 4096).select(
      (col("id") % 1024).as("x"), (col("id") / 4).cast("long").as("y"),
      col("id"))
    val rep = LayoutOps.zSkippingReport(df, col("x"), col("y"), col("id"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(rep("zorder") < rep("roundrobin"))
  }

  test("madOutliers: flags the spike, MAD=0 degeneracy flags any deviation") {
    val df = (Seq.fill(9)(("a", 100L)) ++ Seq(("a", 10000L)) ++
      Seq.fill(5)(("b", 7L))).toDF("g", "v")
    val got = ProfileOps.madOutliers(df, "g", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    // group a: median 100, MAD 0 -> the 10000 spike is the only dev>0
    assert(got("a") === ((10L, 100.0, 0.0, 1L)))
    assert(got("b") === ((5L, 7.0, 0.0, 0L)))
  }

  test("cascadeDeleteAudit: transitive counts and exact ppm") {
    val cust = Seq((1L, "x"), (2L, "y"), (3L, "z"))
      .toDF("c_custkey", "c_name")
    val ord = Seq((10L, 1L), (11L, 1L), (12L, 2L))
      .toDF("o_orderkey", "o_custkey")
    val li = Seq((10L, 1), (10L, 2), (11L, 1), (12L, 1))
      .toDF("l_orderkey", "l_linenumber")
    val got = ComplianceOps.cascadeDeleteAudit(cust, ord, li,
        col("c_custkey") === 1)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("customer") === ((3L, 1L, 333333L))) // 1/3 half-up ppm
    assert(got("orders") === ((3L, 2L, 666667L)))
    assert(got("lineitem") === ((4L, 3L, 750000L)))
  }

  test("pageRank: driver fast path == distributed loop, bit-for-bit") {
    val edges = Seq(
      (1L, 2L, 3L), (2L, 1L, 1L), (1L, 3L, 1L), (3L, 1L, 2L),
      (4L, 1L, 5L), // 5 is dangling (inflow only)
      (2L, 5L, 2L)).toDF("src", "dst", "w")
    val fast = graft.ops.GraphOps.pageRank(edges, "src", "dst", "w")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = graft.ops.GraphOps.pageRank(edges, "src", "dst", "w",
        driverMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === dist)
    // hub 1 outranks the leaf 4 (teleport-only inflow)
    assert(fast(1L) > fast(4L))
    // base floor: every rank >= (100-85)*10^4
    assert(fast.values.forall(_ >= 150000L))
  }

  test("pageRank: symmetric ring is uniform (exact fixed point)") {
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val r = graft.ops.GraphOps.pageRank(edges, "src", "dst", "w")
      .collect().map(_.getLong(1)).toSet
    assert(r === Set(1000000L)) // 0.15 + 0.85 * 1.0 stays exactly 1.0
  }

  test("pmiPairs: bounded vocab, deterministic tie-break, ln formula") {
    val docs = Seq(
      (1L, "red blue"), (2L, "red blue"), (3L, "red blue"),
      (4L, "red green"), (5L, "zz")).toDF("doc_id", "text")
    val got = CooccurOps.pmiPairs(docs, "doc_id", "text",
        vocabSize = 3, minCo = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // vocab by (df desc, word asc): red(4), blue(3), green(1) — zz cut
    assert(got.keySet === Set(("blue", "red"), ("green", "red")))
    val n = 5.0
    assert(got(("blue", "red"))._1 === 3L)
    assert(got(("blue", "red"))._2 ===
      BigDecimal(math.log(3 * n / (3.0 * 4.0))).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
