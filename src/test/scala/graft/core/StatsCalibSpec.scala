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
