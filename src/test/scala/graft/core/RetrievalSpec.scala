package graft.core

import graft.ops.{PreferenceOps, ProfileOps, RetrievalOps}
import org.apache.spark.sql.functions._

/** Hybrid-retrieval (RRF fusion, nDCG) and preference-fit
  * (Bradley–Terry) invariants, plus the k-anonymity audit.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- RRF

  private def run(rows: (Int, Int, Int)*) =
    rows.toSeq.toDF("query_id", "cand_id", "rank")

  test("rrfFuse: scores are exact reciprocal-rank sums, ranked desc") {
    val a = run((1, 10, 1), (1, 11, 2))
    val b = run((1, 11, 1), (1, 12, 2))
    val got = RetrievalOps.rrfFuse(Seq(a, b), k = 10)
      .orderBy("fused_rank")
      .collect().map(r => (r.getInt(1), r.getDouble(2), r.getLong(3), r.getInt(4)))
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    // cand 11 appears in both runs (ranks 2 and 1) and must win.
    assert(got.toSeq === Seq(
      (11, r6(1.0 / 62 + 1.0 / 61), 2L, 1),
      (10, r6(1.0 / 61), 1L, 2),
      (12, r6(1.0 / 62), 1L, 3)))
  }

  test("rrfFuse: score ties break on cand_id ascending") {
    val a = run((1, 20, 1), (1, 7, 2))
    val b = run((1, 7, 1), (1, 20, 2))
    val got = RetrievalOps.rrfFuse(Seq(a, b), k = 10)
      .orderBy("fused_rank").select("cand_id").as[Int].collect()
    assert(got.toSeq === Seq(7, 20))
  }

  test("rrfFuse: per-query top-k cut, queries independent") {
    val a = run((1 to 30).map(i => (1, i, i)) ++ Seq((2, 99, 1)): _*)
    val got = RetrievalOps.rrfFuse(Seq(a), k = 5)
    assert(got.filter($"query_id" === 1).count() === 5)
    assert(got.filter($"query_id" === 2).count() === 1)
  }

  // --------------------------------------------------------------- nDCG

  private def scored(rows: (Int, Int, Double)*) =
    rows.toSeq.toDF("query_id", "cand_id", "score")
  private def labels(rows: (Int, Int, Double)*) =
    rows.toSeq.toDF("query_id", "cand_id", "rel")

  test("ndcgAtK: ideal ranking scores exactly 1") {
    val r = scored((1, 10, 0.9), (1, 11, 0.8), (1, 12, 0.7))
    val l = labels((1, 10, 1.0), (1, 11, 1.0))
    val row = RetrievalOps.ndcgAtK(r, l, 10).collect().head
    assert(row.getLong(1) === 2L)       // n_rel
    assert(row.getDouble(4) === 1.0)    // ndcg
  }

  test("ndcgAtK: relevant item buried at rank 3 scores below 1, exact value") {
    val r = scored((1, 10, 0.9), (1, 11, 0.8), (1, 12, 0.7))
    val l = labels((1, 12, 1.0))
    val row = RetrievalOps.ndcgAtK(r, l, 10).collect().head
    val expect = (1.0 / (math.log(4) / math.log(2))) / 1.0
    assert(math.abs(row.getDouble(4) - math.round(expect * 1e6) / 1e6) < 1e-9)
  }

  test("ndcgAtK: no positive labels -> ndcg 0, not null") {
    val r = scored((1, 10, 0.9))
    val l = labels((2, 10, 1.0)) // other query only
    val row = RetrievalOps.ndcgAtK(r, l, 10).collect().head
    assert(row.getLong(1) === 0L && row.getDouble(4) === 0.0)
  }

  test("ndcgAtK: graded gains — higher-rel item first beats it second") {
    val good = scored((1, 10, 0.9), (1, 11, 0.8))
    val bad = scored((1, 10, 0.8), (1, 11, 0.9))
    val l = labels((1, 10, 3.0), (1, 11, 1.0))
    def ndcg(r: org.apache.spark.sql.DataFrame) =
      RetrievalOps.ndcgAtK(r, l, 10).collect().head.getDouble(4)
    assert(ndcg(good) === 1.0)
    assert(ndcg(bad) < 1.0)
  }

  test("jaccardRun agrees with a brute-force shingle jaccard") {
    val docs = Seq(
      (0, "a b c d e f"), (1, "a b c d e g"), (2, "x y z w v u"),
      (3, "a b c x y z"), (4, "q r s t u v")).toDF("doc_id", "text")
    val got = RetrievalOps.jaccardRun(docs, "doc_id", "text",
        col("id") < 2, k = 10)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    def sh(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val texts = Seq("a b c d e f", "a b c d e g", "x y z w v u",
      "a b c x y z", "q r s t u v")
    for (q <- 0 to 1; c <- texts.indices if c != q) {
      val (a, b) = (sh(texts(q)), sh(texts(c)))
      val j = a.intersect(b).size.toDouble / a.union(b).size
      if (j > 0)
        assert(math.abs(got((q, c)) - math.round(j * 1e6) / 1e6) < 1e-9,
          s"pair ($q,$c)")
      else assert(!got.contains((q, c)), s"pair ($q,$c) should be absent")
    }
  }

  // ------------------------------------------------------ Bradley–Terry

  test("bradleyTerry: dominance ordering and win/loss bookkeeping") {
    // A beats B 9:1, B beats C 9:1, A beats C 9:1 — strengths must
    // order A > B > C with ranks 1,2,3.
    val comps = (Seq.fill(9)(("A", "B")) ++ Seq.fill(1)(("B", "A")) ++
      Seq.fill(9)(("B", "C")) ++ Seq.fill(1)(("C", "B")) ++
      Seq.fill(9)(("A", "C")) ++ Seq.fill(1)(("C", "A")))
      .toDF("w", "l")
    val rows = PreferenceOps.bradleyTerry(comps, "w", "l")
      .orderBy("rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4)))
    assert(rows.map(_._1).toSeq === Seq("A", "B", "C"))
    assert(rows.map(_._4).toSeq.sliding(2).forall { case Seq(x, y) => x > y })
    val a = rows.find(_._1 == "A").get
    assert(a._2 === 18L && a._3 === 2L) // 9+9 wins, 1+1 losses
  }

  test("bradleyTerry: symmetric record -> equal strengths at mean 1") {
    val comps = (Seq.fill(5)(("A", "B")) ++ Seq.fill(5)(("B", "A"))).toDF("w", "l")
    val rows = PreferenceOps.bradleyTerry(comps, "w", "l")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(rows("A") === 1.0 && rows("B") === 1.0)
  }

  test("bradleyTerry: partition-invariant (same bits under repartition)") {
    val comps = Seq.tabulate(200)(i =>
      (s"s${i % 7}", s"s${(i * 3 + 1) % 7}")).filter(p => p._1 != p._2)
      .toDF("w", "l")
    val one = PreferenceOps.bradleyTerry(comps.repartition(1), "w", "l")
      .orderBy("item").collect().toSeq
    val many = PreferenceOps.bradleyTerry(comps.repartition(13), "w", "l")
      .orderBy("item").collect().toSeq
    assert(one === many)
  }

  test("bradleyTerry: guards — one item, and data-scale item column") {
    val ok = Seq(("A", "A")).toDF("w", "l") // self-comparisons only
    intercept[IllegalArgumentException] {
      PreferenceOps.bradleyTerry(ok, "w", "l")
    }
    // high-cardinality (data-scale) item column must fail with
    // BOUNDED storage: the grouped frame is collected through
    // limit(maxItems²+1), so at most 101 model-scale rows ship here
    // (never the corpus), and the driver-side cardinality check
    // fires. 30 distinct pairs < the 101 cap, so the full frame is
    // collected and the reported count is exact.
    val big = Seq.tabulate(30)(i => (s"i$i", s"i${(i + 1) % 30}")).toDF("w", "l")
    val ex = intercept[IllegalArgumentException] {
      PreferenceOps.bradleyTerry(big, "w", "l", maxItems = 10)
    }
    assert(ex.getMessage.contains("30 distinct items"))
    assert(ex.getMessage.contains("model-scale"))
    // Cap-hit path: 60 items in a ring → 120 distinct ordered pairs
    // > 10²+1 = 101 cap; only ≤101 rows ship, yet the guard still
    // fires because any 101 distinct pairs need > 10 items
    // (k items admit ≤ k·(k−1) ordered pairs).
    val ring = Seq.tabulate(60)(i => (s"r$i", s"r${(i + 1) % 60}"))
    val both = (ring ++ ring.map(_.swap)).toDF("w", "l")
    val ex2 = intercept[IllegalArgumentException] {
      PreferenceOps.bradleyTerry(both, "w", "l", maxItems = 10)
    }
    assert(ex2.getMessage.contains("model-scale"))
  }

  // -------------------------------------------------------- k-anonymity

  test("kAnonymity: class sizes and at-risk flags; summary adds up") {
    val df = Seq(
      ("a", 1), ("a", 1), ("a", 1),   // class (a,1) n=3
      ("b", 1), ("b", 1),             // class (b,1) n=2
      ("c", 2)                        // class (c,2) n=1
    ).toDF("g", "v")
    val qi = Seq("g" -> col("g"), "v" -> col("v"))
    val det = ProfileOps.kAnonymity(df, qi, k = 3)
      .collect().map(r => ((r.getString(0), r.getInt(1)), (r.getLong(2), r.getBoolean(3)))).toMap
    assert(det(("a", 1)) === ((3L, false)))
    assert(det(("b", 1)) === ((2L, true)))
    assert(det(("c", 2)) === ((1L, true)))
    val s = ProfileOps.kAnonymitySummary(df, qi, k = 3).collect().head
    assert(s.getLong(0) === 3L && s.getLong(1) === 2L)
    assert(s.getLong(2) === 6L && s.getLong(3) === 3L)
    assert(s.getDouble(4) === 0.5)
  }

  test("rankAuc: perfect separation 1.0, constant score 0.5, ties by hand") {
    def auc(rows: (Double, Int)*): Option[Double] = {
      val r = ProfileOps.rankAuc(rows.toSeq.toDF("s", "y"), "s", "y")
        .collect().head
      if (r.isNullAt(2)) None else Some(r.getDouble(2))
    }
    assert(auc((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)) === Some(1.0))
    assert(auc((0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1)) === Some(0.0))
    assert(auc((0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)) === Some(0.5))
    // hand case with a tie straddling the classes:
    // scores: 0.1(neg) 0.5(pos) 0.5(neg) 0.9(pos)
    // midranks: 0.1->1, 0.5->2.5, 0.9->4; sum pos ranks = 2.5+4 = 6.5
    // AUC = (6.5 - 2*3/2) / (2*2) = 3.5/4 = 0.875
    assert(auc((0.1, 0), (0.5, 1), (0.5, 0), (0.9, 1)) === Some(0.875))
    assert(auc((0.3, 1), (0.7, 1)) === None) // no negatives
  }

  test("calibrationBuckets: bucket edges, clamp, and rates") {
    val df = Seq((0.05, 0), (0.08, 1), (0.55, 1), (0.52, 1), (1.0, 1))
      .toDF("s", "y")
    val got = ProfileOps.calibrationBuckets(df, "s", "y")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(4))).toMap
    assert(got(0) === ((2L, 1L, 0.5)))
    assert(got(5) === ((2L, 2L, 1.0)))
    assert(got(9) === ((1L, 1L, 1.0))) // 1.0 clamps into the top bucket
  }

  test("lDiversity: homogeneous class flagged, diverse class clean") {
    val df = Seq(
      ("a", "en"), ("a", "en"), ("a", "en"),  // k-safe but homogeneous
      ("b", "en"), ("b", "fr"), ("b", "de"),  // diverse
      ("c", "en")                              // singleton: l=1 but n=1
    ).toDF("g", "lang")
    val got = ProfileOps.lDiversity(df, Seq("g" -> col("g")),
        col("lang"), l = 3)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    assert(got("a") === ((3L, 1L, true, true)))
    assert(got("b") === ((3L, 3L, false, false)))
    assert(got("c") === ((1L, 1L, true, false)))
  }

  test("tClosenessCategorical: hand-computed TVD, global-mirror class at 0, " +
      "absent-value mass folded, partition-invariant") {
    // global: en 6/10, fr 3/10, de 1/10
    // class a (6 rows): en 4, fr 2        -> TVD = 1/2(|4/6-6/10| +
    //   |2/6-3/10| + 1/10) = 1/2(1/15 + 1/30 + 1/10) = 0.1
    // class b (4 rows): en 2, fr 1, de 1  -> TVD = 1/2(|1/2-6/10| +
    //   |1/4-3/10| + |1/4-1/10|) = 1/2(0.1+0.05+0.15) = 0.15
    val rows = Seq.fill(4)(("a", "en")) ++ Seq.fill(2)(("a", "fr")) ++
      Seq.fill(2)(("b", "en")) ++ Seq(("b", "fr"), ("b", "de"))
    val df = rows.toDF("g", "lang")
    def run(d: org.apache.spark.sql.DataFrame) =
      ProfileOps.tClosenessCategorical(d, Seq("g" -> col("g")), col("lang"), t = 0.12)
        .collect().map(r => (r.getString(0),
          (r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    val got = run(df)
    assert(got("a") === ((6L, 0.1, false)))
    assert(got("b") === ((4L, 0.15, true)))
    assert(got === run(df.repartition(7)), "partition-invariant")
    // a class whose distribution mirrors the global exactly sits at 0
    val mirror = (Seq.fill(6)(("m", "en")) ++ Seq.fill(3)(("m", "fr")) ++
      Seq(("m", "de"))).toDF("g", "lang")
    assert(run(mirror)("m") === ((10L, 0.0, false)))
    intercept[IllegalArgumentException] {
      ProfileOps.tClosenessCategorical(df, Seq.empty, col("lang"), t = 0.1)
    }
    intercept[IllegalArgumentException] {
      ProfileOps.tClosenessCategorical(df, Seq("g" -> col("g")), col("lang"), t = 1.5)
    }
    // null sensitive values are excluded from class sizes, the global
    // distribution AND the grand total (the r15 advisory bug dropped
    // null cells from the per-class terms but left their mass in the
    // grand total, adding the null fraction to every class's TVD).
    // Non-null global: en 9/13, fr 3/13, de 1/13 (N = 13).
    // m (10 non-null rows, en 6 fr 3 de 1):
    //   1/2(|6/10-9/13| + |3/10-3/13| + |1/10-1/13|) = 12/130
    // o (3 non-null rows, all en): 1/2(|1-9/13| + 3/13 + 1/13) = 4/13
    val withNulls = (Seq.fill(6)(("m", "en")) ++ Seq.fill(3)(("m", "fr")) ++
      Seq(("m", "de")) ++ Seq.fill(10)(("m", null: String)) ++
      Seq.fill(3)(("o", "en")) ++ Seq.fill(5)(("o", null: String)))
      .toDF("g", "lang")
    val gotN = run(withNulls)
    assert(gotN("m") === ((10L, 0.092308, false)),
      "m: n counts only non-null rows; TVD vs the 13-row non-null global")
    assert(gotN("o") === ((3L, 0.307692, true)))
    // a class mirroring the non-null global exactly sits at 0 even
    // when half the corpus is null
    val mirrorN = (Seq.fill(6)(("m", "en")) ++ Seq.fill(3)(("m", "fr")) ++
      Seq(("m", "de")) ++ Seq.fill(10)(("m", null: String))).toDF("g", "lang")
    assert(run(mirrorN)("m") === ((10L, 0.0, false)))
    // all-null input trips the non-empty require, not an NPE
    intercept[IllegalArgumentException] {
      ProfileOps.tClosenessCategorical(
        Seq(("a", null: String)).toDF("g", "lang"),
        Seq("g" -> col("g")), col("lang"), t = 0.1)
    }
  }
}
