package graft.core

import graft.ops.{MultimodalOps, ProfileOps}

/** Closed-form hand cases for the round's categorical-drift /
  * concordance / scene-segmentation additions (q256–q258).
  */
class ChiKendallSceneSpec extends SparkSpec {
  import spark.implicits._

  test("chi-squared vs rest: textbook 2x2, symmetric for two groups") {
    // A: 10x + 10y, B: 20x + 0y. Direct (O-E)^2/E over the 2x2:
    // E = {15, 5, 15, 5} -> 25/15 + 25/5 + 25/15 + 25/5 = 40/3.
    val df = (Seq.fill(10)(("A", "x")) ++ Seq.fill(10)(("A", "y")) ++
      Seq.fill(20)(("B", "x"))).toDF("g", "k")
    val got = ProfileOps.chiSquaredAgainstRest(df, "g", "k")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got("A") == ((20L, 1L, 13.333333, 0.57735)))
    // two groups: A-vs-rest IS B-vs-rest — identical statistic
    assert(got("B")._3 == 13.333333 && got("B")._4 == 0.57735)
  }

  test("chi-squared: identical mixes give 0; single group gives null") {
    val same = (Seq.fill(6)(("A", "x")) ++ Seq.fill(2)(("A", "y")) ++
      Seq.fill(3)(("B", "x")) ++ Seq.fill(1)(("B", "y"))).toDF("g", "k")
    assert(ProfileOps.chiSquaredAgainstRest(same, "g", "k")
      .collect().forall(r => r.getDouble(3) == 0.0))
    val one = Seq(("A", "x"), ("A", "y")).toDF("g", "k")
    assert(ProfileOps.chiSquaredAgainstRest(one, "g", "k")
      .collect().forall(_.isNullAt(3)))
  }

  test("kendall tau-b: textbook no-tie and tie-corrected cases") {
    // x=1..4, y=(1,3,2,4): C=5, D=1 -> tau = 4/6
    val plain = Seq((1L, 1L), (2L, 3L), (3L, 2L), (4L, 4L)).toDF("x", "y")
    val r1 = ProfileOps.kendallTau(plain, "x", "y").collect()(0)
    assert((r1.getLong(2), r1.getLong(3), r1.getLong(4)) == ((4L, 4L, 4L)))
    assert(r1.getDouble(5) == 0.666667)
    // ties both sides: x=(1,1,2,2), y=(1,2,3,3):
    // S=4, u=12-4=8, v=12-2=10 -> 8/sqrt(80) = 0.894427
    val tied = Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 3L)).toDF("x", "y")
    val r2 = ProfileOps.kendallTau(tied, "x", "y").collect()(0)
    assert(r2.getLong(4) == 4L && r2.getDouble(5) == 0.894427)
    // perfect reversal: tau = -1
    val rev = Seq((1L, 3L), (2L, 2L), (3L, 1L)).toDF("x", "y")
    assert(ProfileOps.kendallTau(rev, "x", "y").collect()(0)
      .getDouble(5) == -1.0)
    // constant x: u = 0 -> null
    val const = Seq((1L, 1L), (1L, 2L)).toDF("x", "y")
    assert(ProfileOps.kendallTau(const, "x", "y").collect()(0).isNullAt(5))
  }

  test("scene segments: short, all-distinct, and one-cut payloads") {
    // doc 1: n=10 <= frame width -> every frame is the whole payload.
    // doc 2: "abcdefg" + 32 z's (n=39, offsets 0..7) -> all 8 distinct.
    // doc 3: "Q" + 38 w's -> frame 0 differs, frames 1..7 identical.
    val docs = Seq(
      (1L, "x" * 10),
      (2L, "abcdefg" + "z" * 32),
      (3L, "Q" + "w" * 38)).toDF("doc_id", "text")
    val got = MultimodalOps.sceneSegments(spark,
        MultimodalOps.withBinaryPayload(docs, "doc_id", "text"), 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) == ((8L, 0L, 1L, 1L)))
    assert(got(2L) == ((8L, 7L, 8L, 8L)))
    assert(got(3L) == ((8L, 1L, 2L, 2L)))

    // keyframes = first frame of each scene: doc 1 -> only frame 0;
    // doc 3 -> frames 0 and 1 (the single cut)
    val kf = MultimodalOps.keyframes(spark,
        MultimodalOps.withBinaryPayload(docs, "doc_id", "text"), 8)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(_.getInt(1)).sorted.toSeq }
    assert(kf(1L) == Seq(0))
    assert(kf(2L) == (0 to 7))
    assert(kf(3L) == Seq(0, 1))
  }
}
