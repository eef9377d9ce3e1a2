package graft.core

import graft.ops.ProfileOps
import org.apache.spark.sql.functions._

/** Closed-form hand cases for the exact two-sample KS statistic
  * (q250): textbook ECDF gaps, identical-distribution zero, and the
  * exact-rational output contract.
  */
class KsDriftSpec extends SparkSpec {
  import spark.implicits._

  test("hand ECDFs: D = max |F_g - F_rest| exactly") {
    // A = {1, 2}, B = {1, 3} (A's rest is B and vice versa):
    // at v=2: F_A = 1, F_B = 1/2 -> D = 1/2 for both groups
    val df = Seq(("A", 1.0), ("A", 2.0), ("B", 1.0), ("B", 3.0))
      .toDF("g", "v")
    val got = ProfileOps.ksAgainstRest(df, "g", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    assert(got("A") == ((2L, 2L, 2L, 4L, 0.5)))
    assert(got("B") == ((2L, 2L, 2L, 4L, 0.5)))
  }

  test("identical distributions give D = 0; disjoint supports give D = 1") {
    val same = Seq(("A", 1.0), ("A", 2.0), ("B", 1.0), ("B", 2.0))
      .toDF("g", "v")
    assert(ProfileOps.ksAgainstRest(same, "g", "v")
      .collect().forall(_.getDouble(5) == 0.0))
    val disj = Seq(("A", 1.0), ("A", 2.0), ("B", 5.0), ("B", 6.0))
      .toDF("g", "v")
    assert(ProfileOps.ksAgainstRest(disj, "g", "v")
      .collect().forall(_.getDouble(5) == 1.0))
  }

  test("mann-whitney: midrank ties, textbook U and AUC") {
    // A = {1, 2}, B = {1, 3}: combined midranks 1.5, 1.5, 3, 4
    // R_A = 4.5 -> 2U_A = 2(4.5) - 2·3 = 3; AUC = 1.5/4 = 0.375
    val df = Seq(("A", 1.0), ("A", 2.0), ("B", 1.0), ("B", 3.0))
      .toDF("g", "v")
    val got = ProfileOps.mannWhitneyAgainstRest(df, "g", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got("A") == ((2L, 2L, 3L, 0.375)))
    // U_A + U_B = n_A·n_B (the complement identity, ties split)
    assert(got("A")._3 + got("B")._3 == 2 * 2 * 2)
    assert(got("B")._4 == 0.625)
    // identical distributions -> AUC exactly 1/2
    val same = Seq(("A", 1.0), ("A", 2.0), ("B", 1.0), ("B", 2.0))
      .toDF("g", "v")
    assert(ProfileOps.mannWhitneyAgainstRest(same, "g", "v")
      .collect().forall(_.getDouble(4) == 0.5))
  }

  test("spearman: monotone nonlinear is exactly 1, reversal exactly -1, ties by midrank") {
    val mono = Seq((1.0, 1.0), (2.0, 4.0), (3.0, 9.0), (4.0, 100.0))
      .toDF("x", "y")
    assert(ProfileOps.spearman(mono, "x", "y")
      .collect()(0).getDouble(3) == 1.0)
    val anti = Seq((1.0, 100.0), (2.0, 9.0), (3.0, 4.0), (4.0, 1.0))
      .toDF("x", "y")
    assert(ProfileOps.spearman(anti, "x", "y")
      .collect()(0).getDouble(3) == -1.0)
    // tied pairs share midranks on both sides -> still exactly 1
    val ties = Seq((1.0, 5.0), (1.0, 5.0), (2.0, 9.0)).toDF("x", "y")
    assert(ProfileOps.spearman(ties, "x", "y")
      .collect()(0).getDouble(3) == 1.0)
    // constant column -> NULL rho
    val const = Seq((1.0, 7.0), (2.0, 7.0)).toDF("x", "y")
    assert(ProfileOps.spearman(const, "x", "y").collect()(0).isNullAt(3))
  }

  test("exact rational: uneven sizes, common-denominator numerator") {
    // A = {1}, rest = {1, 2, 3}: at v=1 F_A=1, F_r=1/3 -> D=2/3
    val df = Seq(("A", 1.0), ("B", 1.0), ("B", 2.0), ("B", 3.0))
      .toDF("g", "v")
    val a = ProfileOps.ksAgainstRest(df, "g", "v")
      .where(col("g") === "A").collect()(0)
    assert(a.getLong(3) == 2L && a.getLong(4) == 3L) // 2/3 exactly
    assert(a.getDouble(5) == 0.666667)               // 6dp half-up
  }
}
