package graft.core

import graft.ops.LmOps
import org.apache.spark.sql.functions._

/** Kneser–Ney LM invariants: hand-computed probabilities, per-head
  * mass conservation, and the CCNet discrimination property (reference-
  * like docs score lower perplexity than outliers).
  */
class LmSpec extends SparkSpec {
  import spark.implicits._

  private val ref = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the rug"),
    (3L, "a cat and a dog")).toDF("id", "text")

  test("model matches hand-computed interpolated KN") {
    val m = LmOps.model(ref, "id", "text", discount = 0.75)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    // Corpus bigrams: the→cat, cat→sat, sat→on, on→the, the→mat,
    // the→dog, dog→sat, the→rug, a→cat, cat→and, and→a, a→dog.
    // c(the·)=4 (cat,mat,dog,rug each once), N1+(the·)=4.
    // B = 12 distinct bigram types (the→{cat,mat,dog,rug}, cat→{sat,and},
    // sat→on ×2 collapses to 1, on→the, dog→sat, a→{cat,dog}, and→a) = 11
    // types +? count: the-cat, the-mat, the-dog, the-rug, cat-sat,
    // cat-and, sat-on, on-the, dog-sat, a-cat, a-dog, and-a = 12.
    // Vc (distinct tails) = cat,mat,dog,rug,sat,and,on,the,a = 9.
    // Pc(cat) = (N1+(.cat)+1)/(B+Vc+1) = (2+1)/(12+9+1) = 3/22.
    // P(cat|the) = (1-.75)/4 + .75*4/4 * 3/22
    val want = 0.25 / 4.0 + 0.75 * 4.0 / 4.0 * (3.0 / 22.0)
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    assert(m(("the", "cat")) === r6(want), s"got ${m(("the", "cat"))}")
    // sat→on has c_ab=2 (the only repeated bigram), c(sat·)=2, N1+(sat·)=1,
    // Pc(on) = (1+1)/22.
    val wantSatOn = (2.0 - 0.75) / 2.0 + 0.75 * 1.0 / 2.0 * (2.0 / 22.0)
    assert(m(("sat", "on")) === r6(wantSatOn))
    assert(m.size === 12)
  }

  test("per-head probability mass is conserved (sums to < 1 with backoff room)") {
    val m = LmOps.model(ref, "id", "text", discount = 0.75)
      .groupBy("a").agg(sum("p_kn").as("mass")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // Seen-pair mass per head stays under 1; the gap is exactly the
    // backoff mass routed to unseen tails (plus the +1 smoothing leak).
    m.foreach { case (a, mass) =>
      assert(mass > 0.0 && mass < 1.0, s"head $a mass $mass")
    }
    // 'sat' has one successor covering c=2 of 2: mass should be high.
    assert(m("sat") > 0.6)
  }

  test("trigram model matches hand-computed Chen-Goodman interpolation") {
    val ref3 = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ran on the rug")).toDF("id", "text")
    val m = LmOps.model3(ref3, "id", "text", discount = 0.75)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getDouble(4)).toMap
    assert(m.size === 8, s"8 trigram types, got ${m.size}")
    // By hand: B2=7 (b,c) types, V=6 tails, (on,the) has nbc=2.
    // P1(mat) = (1+1)/(7+6+1) = 1/7
    // P2(mat|the) = (1-.75)/2 + .75*2/2 * 1/7
    // P3(mat|on,the) = (1-.75)/2 + .75*2/2 * P2
    val p1 = 2.0 / 14.0
    val p2 = 0.25 / 2.0 + 0.75 * 2.0 / 2.0 * p1
    val p3 = 0.25 / 2.0 + 0.75 * 2.0 / 2.0 * p2
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    assert(m(("on", "the", "mat")) === r6(p3), s"got ${m(("on", "the", "mat"))}")
    // symmetric twin (rug) must score identically
    assert(m(("on", "the", "rug")) === m(("on", "the", "mat")))
  }

  test("trigram scoring: full backoff chain ranks OOV worst, training corpus has zero unseen") {
    val ref3 = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ran on the rug")).toDF("id", "text")
    val target = ref3.union(Seq(
      (10L, "zzz yyy xxx www"),         // all-unseen: pure P1 floor
      (11L, "the cat sat zzz"),          // seen context, unseen tail: P2 path
      (12L, "a b")).toDF("id", "text"))  // <3 tokens: NULL
    val got = LmOps.score3(target, ref3, "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    Seq(1L, 2L).foreach(id => assert(got(id)._1._2 === 0L))
    // pure-floor doc: every trigram scores P1 = 1/14 -> nll = ln 14
    assert(got(10L)._1 === ((2L, 2L)))
    assert(math.abs(got(10L)._2.get - math.log(14.0)) < 1e-4)
    val refMax = Seq(1L, 2L).map(got(_)._2.get).max
    assert(got(10L)._2.get > refMax && got(11L)._2.get > refMax)
    assert(got(11L)._1 === ((2L, 1L)))   // (the,cat,sat) seen; (cat,sat,zzz) unseen
    assert(got(12L)._1 === ((0L, 0L)) && got(12L)._2.isEmpty)
  }

  test("incremental counts merge: batch model == merged-batches model, bit for bit") {
    val batchA = ref.where($"id" <= 2)
    val batchB = ref.where($"id" === 3)
    val merged = LmOps.modelFromCounts(
      LmOps.mergeCounts(
        LmOps.counts(batchA, "id", "text"),
        LmOps.counts(batchB, "id", "text")))
    val direct = LmOps.model(ref, "id", "text")
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(m(merged) === m(direct))
  }

  test("score: zero unseen on the training corpus; OOV docs rank worse") {
    val target = ref.union(Seq(
      (10L, "zebra quark flux zebra quark"),
      (11L, "x")).toDF("id", "text"))
    val got = LmOps.score(target, ref, "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // Training docs: every bigram seen.
    Seq(1L, 2L, 3L).foreach { id =>
      assert(got(id)._1._2 === 0L, s"doc $id unseen=${got(id)._1._2}")
    }
    // The OOV doc: all 4 bigrams unseen, and worse ppl than any ref doc.
    assert(got(10L)._1 === ((4L, 4L)))
    val refMax = Seq(1L, 2L, 3L).map(got(_)._2.get).max
    assert(got(10L)._2.get > refMax,
      s"OOV ${got(10L)._2.get} vs ref max $refMax")
    // Single-token doc: no bigrams, NULL score.
    assert(got(11L)._1 === ((0L, 0L)) && got(11L)._2.isEmpty)
  }
}
