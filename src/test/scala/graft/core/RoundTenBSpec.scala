package graft.core

import graft.ops.{EventOps, LayoutOps, ProfileOps, SelectionOps, SnapshotOps, TextOps}
import org.apache.spark.sql.functions._

/** Hand-case semantics pins for the q214–q230 operator families (the
  * oracles cover the synthetic tables; these pin closed forms and
  * invariants on constructed inputs).
  */
class RoundTenBSpec extends SparkSpec {
  import spark.implicits._

  test("largestRemainderAlloc: sums to budget exactly, remainder ties break by group") {
    val w = Seq(("a", 1L), ("b", 1L), ("c", 1L)).toDF("grp", "w")
    // 100 over equal thirds: floor 33 each, 1 extra by remainder —
    // all remainders equal (100 mod 3 applies to each) → tie by grp asc
    val got = SelectionOps.largestRemainderAlloc(w, "grp", "w", 100L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got.values.sum === 100L)
    assert(got("a") === 34L && got("b") === 33L && got("c") === 33L)
    // proportionality: heavy group gets its share
    val w2 = Seq(("x", 3L), ("y", 1L)).toDF("grp", "w")
    val g2 = SelectionOps.largestRemainderAlloc(w2, "grp", "w", 10L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(g2 === Map("x" -> 8L, "y" -> 2L)) // 7.5 -> 8 by remainder
  }

  test("cdcApply: latest op wins by (t, id), terminal delete removes the key") {
    val log = Seq(
      (1L, "I", 10.0, 1.0, 1L), (1L, "U", 11.0, 2.0, 2L),
      (2L, "I", 20.0, 1.0, 3L), (2L, "D", 0.0, 2.0, 4L),
      (3L, "I", 30.0, 5.0, 5L), (3L, "U", 31.0, 5.0, 6L) // same-t: id wins
    ).toDF("k", "op", "value", "t", "id")
    val got = SnapshotOps.cdcApply(log, "k", "op", "value", "t", "id")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getString(3)))
      .toMap
    assert(got === Map(1L -> ((11.0, "U")), 3L -> ((31.0, "U"))))
  }

  test("fkIntegrity: orphan counts and exact ppm") {
    val child = Seq((1L, 10L), (2L, 10L), (3L, 99L)).toDF("id", "fk")
    val parent = Seq(10L).toDF("pk")
    val got = ProfileOps.fkIntegrity(Seq(("c->p", child, "fk", parent, "pk")))
      .collect()(0)
    assert(got.getLong(1) === 3L && got.getLong(2) === 1L)
    assert(got.getLong(3) === 333333L)
  }

  test("compactionPlan: sequential fill, oversized input claims its own bin") {
    val files = Seq((1L, 60L), (2L, 30L), (3L, 250L), (4L, 10L))
      .toDF("id", "bytes")
    // cum-before: 0, 60, 90, 340 with target 100 -> bins 0,0,0,3
    val got = LayoutOps.compactionPlan(files, "id", "bytes", 100L)
      .collect()(0)
    assert(got.getLong(0) === 4L) // n_input
    assert(got.getLong(1) === 350L) // total
    assert(got.getLong(2) === 2L) // bins 0 and 3
    assert(got.getLong(4) === 340L) // max bin bytes (60+30+250)
  }

  test("abLift: closed-form z on constructed conversions") {
    // arm 0 (even u): 1 of 2 converts; arm 1 (odd u): 2 of 2
    val e = Seq(
      (0L, "purchase", 800.0), (2L, "purchase", 1.0),
      (1L, "purchase", 900.0), (3L, "purchase", 850.0))
      .toDF("user_id", "event_type", "value")
    val r = EventOps.abLift(e, "user_id", "event_type", "value", "purchase",
      70000L).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 1L, 2L, 2L)))
    val (p0, p1, pp) = (0.5, 1.0, 0.75)
    val z = (p1 - p0) / math.sqrt(pp * (1 - pp) * (1.0 / 2 + 1.0 / 2))
    assert(r.getDouble(5) === BigDecimal(z).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("mutualInformation: zero for independent, ln k for identical columns") {
    val ind = (for { a <- Seq("x", "y"); b <- Seq("p", "q") }
      yield (a, b)).toDF("a", "b")
    val mi0 = ProfileOps.mutualInformation(ind, "a", "b").collect()(0)
    assert(mi0.getDouble(1) === 0.0)
    val same = Seq(("x", "x"), ("y", "y"), ("z", "z")).toDF("a", "b")
    val mi1 = ProfileOps.mutualInformation(same, "a", "b").collect()(0)
    assert(mi1.getDouble(1) === BigDecimal(math.log(3.0)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("simpsonDiversity: uniform k categories -> k; single category -> 1") {
    val df = (Seq.fill(4)(("g1", "a")) ++ Seq.fill(4)(("g1", "b")) ++
      Seq.fill(5)(("g2", "only"))).toDF("grp", "cat")
    val got = ProfileOps.simpsonDiversity(df, "grp", "cat")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got("g1") === 2.0 && got("g2") === 1.0)
  }

  test("tokenGini: uniform counts -> 0; extreme skew -> high") {
    val uni = Seq("a b c d").toDF("text")
    assert(TextOps.tokenGini(uni, "text").collect()(0).getDouble(2) === 0.0)
    val skew = (Seq.fill(99)("the") :+ "rare").mkString(" ")
    val g = TextOps.tokenGini(Seq(skew).toDF("text"), "text")
      .collect()(0).getDouble(2)
    // counts (1, 99): (2·(1·1 + 2·99) − 3·100) / (2·100) = 0.49
    assert(g === 0.49)
  }

  test("nextTokenAccuracy: majority follower scores count-weighted") {
    // "a b" x3, "a c" x1 -> best(a)=b; plus "b a" x2 -> best(b)=a
    val docs = Seq("a b a b a b a c", "b a b a").toDF("text")
    val r = TextOps.nextTokenAccuracy(docs, "text").collect()(0)
    // doc1 bigrams: ab,ba,ab,ba,ab,ba,ac ; doc2: ba,ab,ba
    // counts: ab=4, ba=5, ac=1 ; best(a)=b (4>1), best(b)=a
    // correct = 4 + 5 = 9 of 10
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ===
      ((10L, 9L, 900000L)))
  }

  test("burstiness: constant per-minute counts -> Fano 0") {
    val e = (0 until 10).flatMap(m => Seq.tabulate(3)(i =>
      ("t", new java.sql.Timestamp((m * 60L + i) * 1000L))))
      .toDF("event_type", "ts")
    val r = EventOps.burstiness(e, "ts", "event_type").collect()(0)
    assert(r.getLong(1) === 10L && r.getLong(2) === 30L)
    assert(r.getDouble(3) === 0.0)
  }

  test("merkleManifest: layout-independent; a one-doc edit flips " +
      "exactly the root path; n_docs conserves") {
    val docs = (0L until 200L).map(i => (i, s"content $i"))
      .toDF("doc_id", "text")
    val m1 = SnapshotOps.merkleManifest(docs, "doc_id", "text",
        leafSpan = 8, fanout = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(3)))).toMap
    val m2 = SnapshotOps.merkleManifest(docs.repartition(13),
        "doc_id", "text", leafSpan = 8, fanout = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(3)))).toMap
    assert(m1 == m2, "manifest must ignore partition layout")
    assert(m1((3, 0L))._1 == 200L, "root must count every doc")
    // edit doc 37: leaf 37/8=4, l1 4/4=1, l2 0, root 0 change;
    // every other node digest stays identical
    val edited = docs.withColumn("text",
      when(col("doc_id") === 37L, lit("EDITED")).otherwise(col("text")))
    val m3 = SnapshotOps.merkleManifest(edited, "doc_id", "text",
        leafSpan = 8, fanout = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(3)))).toMap
    val changed = m1.keySet.filter(k => m1(k)._2 != m3(k)._2)
    assert(changed == Set((0, 4L), (1, 1L), (2, 0L), (3, 0L)),
      s"changed path was $changed")
  }
}
