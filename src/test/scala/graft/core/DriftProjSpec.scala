package graft.core

import graft.ops.{EventOps, SimilarityOps, TextOps}
import java.sql.Timestamp

/** Centroid confusion, JL random projection, PSI drift, vocab coverage. */
class DriftProjSpec extends SparkSpec {
  import spark.implicits._

  test("centroidConfusion: off-diagonal for a vector nearer the other centroid") {
    // label 0 clusters at (0,0); label 1 at (10,10); vec 4 is labeled 0
    // but sits at (9,9) -> predicted 1
    val emb = Seq(
      (1L, Array(0.0f, 0.0f), 0), (2L, Array(0.5f, 0.0f), 0),
      (3L, Array(0.0f, 0.5f), 0), (4L, Array(9.0f, 9.0f), 0),
      (5L, Array(10.0f, 10.0f), 1), (6L, Array(10.0f, 11.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.centroidConfusion(emb, "vec_id", "embedding", "label")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out((0, 0)) == 3L)
    assert(out((0, 1)) == 1L)
    assert(out((1, 1)) == 2L)
    assert(!out.contains((1, 0)))
  }

  test("randomProjection: deterministic, linear, norm-preserving on average") {
    val vecs = (1L to 40L).map { i =>
      (i, Array.tabulate(64)(j => (math.sin(i * 64 + j) * 0.5).toFloat))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val out = SimilarityOps.randomProjection(emb, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (1 to 8).map(c => r.getDouble(c)).toVector).toMap
    // deterministic across invocations
    val out2 = SimilarityOps.randomProjection(emb, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (1 to 8).map(c => r.getDouble(c)).toVector).toMap
    assert(out == out2)
    // JL: projected norm within [0.4, 1.9] of the original for these
    // benign (non-adversarial) vectors, and centered near 1 on average
    val ratios = vecs.map { case (i, v) =>
      val on = math.sqrt(v.map(x => x.toDouble * x).sum)
      val pn = math.sqrt(out(i).map(x => x * x).sum)
      pn / on
    }
    assert(ratios.forall(r => r > 0.4 && r < 1.9), s"ratios out of band: $ratios")
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2)
    // linearity: scaling the input scales the projection (up to 5dp rounding)
    val scaled = vecs.map { case (i, v) => (i, v.map(_ * 2.0f)) }
      .toDF("vec_id", "embedding")
    val outS = SimilarityOps.randomProjection(scaled, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (1 to 8).map(c => r.getDouble(c)).toVector).toMap
    vecs.foreach { case (i, _) =>
      out(i).zip(outS(i)).foreach { case (p, p2) =>
        assert(math.abs(p2 - 2 * p) < 2e-5) }
    }
  }

  test("psiDrift: zero for identical halves, positive for a shift") {
    def ev(ts: String, v: Double, id: Long) =
      (id, Timestamp.valueOf(ts), v)
    // halves with IDENTICAL value multisets -> every bin has p == q
    // -> psi exactly 0
    val same = (0 until 10).map(i =>
      ev(s"2024-01-01 00:0$i:00", (i % 5).toDouble, i.toLong)) ++
      (0 until 10).map(i =>
        ev(s"2024-01-02 00:0$i:00", (i % 5).toDouble, 100L + i))
    val sameDf = same.toDF("event_id", "ts", "value")
    val r0 = EventOps.psiDrift(sameDf, "ts", "value").collect()(0)
    assert(r0.getLong(0) == 10L && r0.getLong(1) == 10L)
    assert(r0.getDouble(2) == 0.0)
    // second half shifted far out of the reference range -> large psi
    val shifted = (0 until 10).map(i =>
      ev(s"2024-01-01 00:0$i:00", i.toDouble, i.toLong)) ++
      (0 until 10).map(i =>
        ev(s"2024-01-02 00:0$i:00", 1000.0 + i, 100L + i))
    val r1 = EventOps.psiDrift(shifted.toDF("event_id", "ts", "value"),
      "ts", "value").collect()(0)
    assert(r1.getDouble(2) > 0.5)
  }

  test("cohenKappa: hand-computed 2x2 table, degenerate-table NULL") {
    import graft.ops.ProfileOps
    // cells: n11=3, n10=1, n01=2, n00=4 -> po=.7, pe=(4*5+6*5)/100=.5,
    // kappa=(.7-.5)/.5=.4
    val a = Seq(1L -> true, 2L -> true, 3L -> true, 4L -> true,
      5L -> false, 6L -> false, 7L -> false, 8L -> false, 9L -> false,
      10L -> false).toDF("id", "flag")
    val b = Seq(1L -> true, 2L -> true, 3L -> true, 4L -> false,
      5L -> true, 6L -> true, 7L -> false, 8L -> false, 9L -> false,
      10L -> false).toDF("id", "flag")
    val r = ProfileOps.cohenKappa(a, b).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((10L, 3L, 1L, 2L, 4L)))
    assert(r.getDouble(5) == 0.7 && r.getDouble(6) == 0.5 && r.getDouble(7) == 0.4)
    // all four cells in one corner -> pe = 1 -> kappa NULL
    val c = Seq(1L -> true, 2L -> true).toDF("id", "flag")
    assert(ProfileOps.cohenKappa(c, c).collect()(0).isNullAt(7))
  }

  test("containmentPairs: flags the embedded quote that Jaccard misses") {
    import graft.ops.WinnowOps
    val quote = "the verbatim reproduced passage appears in full inside the larger digest"
    val host = quote + " plus a much longer surrounding body of completely " +
      "unrelated commentary analysis and discussion that dilutes the " +
      "symmetric similarity measure down to a small value indeed " +
      "with even more filler words appended here to lengthen it further"
    val docs = Seq((1L, quote), (2L, host)).toDF("doc_id", "text")
    val cont = WinnowOps.containmentPairs(docs, "doc_id", "text",
        minShared = 1, minContainment = 0.7)
      .collect()
    assert(cont.length == 1)
    assert(cont(0).getDouble(3) == 1.0)       // cont_a: quote fully inside host
    assert(cont(0).getDouble(4) < 0.7)        // cont_b: host not inside quote
    // the same pair fails symmetric-Jaccard verification
    assert(WinnowOps.verifiedPairs(docs, "doc_id", "text",
      minShared = 1, minJaccard = 0.5).count() == 0)
  }

  test("vocabCoverage: hand-computed curve") {
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val r = TextOps.vocabCoverage(docs, "text", ks = Seq(1, 2, 100)).collect()(0)
    assert(r.getLong(0) == 3L)       // vocab: a b c
    assert(r.getLong(1) == 6L)       // tokens
    assert(r.getDouble(2) == 0.5)    // top-1 = a: 3/6
    assert(r.getDouble(3) == BigDecimal(5.0 / 6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getDouble(4) == 1.0)
  }
}
