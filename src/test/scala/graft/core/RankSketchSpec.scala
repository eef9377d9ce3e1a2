package graft.core

import graft.ops.{GraphOps, SketchOps}
import org.apache.spark.sql.functions._

/** Hand cases for the HITS driver fast path and the count-min audit. */
class RankSketchSpec extends SparkSpec {
  import spark.implicits._

  test("hits: driver fast path is bit-identical to the loop") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
      ("a", "c"), ("b", "e")).toDF("s", "t")
    val hFast = GraphOps.hits(edges, "s", "t").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2))
    val hLoop = GraphOps.hits(edges, "s", "t", driverMaxEdges = 0)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2))
    assert(hFast.toSeq == hLoop.toSeq)
  }

  test("cms: estimates never under-count; wide sketch is exact") {
    val df = (0L until 500L).map(i => i % 37).toDF("k")
    val audit = SketchOps.cmsHeavyHitters(df, "k", w = 64, k = 10)
      .collect()
    audit.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("exact"))
      assert(r.getAs[Long]("overest") ==
        r.getAs[Long]("est") - r.getAs[Long]("exact"))
    }
    // 37 distinct keys in a 4096-wide sketch: collisions essentially
    // impossible for the fixed hash family -> exact
    val wide = SketchOps.cmsHeavyHitters(df, "k", w = 4096, k = 10)
      .collect()
    wide.foreach(r => assert(r.getAs[Long]("overest") == 0L))
  }

  test("cms: sketch counters are mergeable (sum of shard sketches)") {
    val df = (0L until 300L).map(i => i % 11).toDF("k")
    val whole = SketchOps.cmsSketch(df, "k", 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val h1 = SketchOps.cmsSketch(df.limit(150), "k", 64)
    val h2 = SketchOps.cmsSketch(df.offset(150), "k", 64)
    val merged = h1.unionByName(h2).groupBy("r", "c")
      .agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("cms store: appended batch deltas serve the identical audit; " +
      "sidecar pins the width") {
    import graft.ops.IndexStore
    val df = (0L until 400L).map(i => (i, i % 13)).toDF("id", "k")
    val store = java.nio.file.Files
      .createTempDirectory("graft_cms_store").toString + "/cms"
    Seq(1, 2, 0).foreach { b =>
      IndexStore.appendCmsSketch(
        SketchOps.cmsSketch(df.where(col("id") % 3 === b), "k", 64),
        store, w = 64)
    }
    def audit(sk: org.apache.spark.sql.DataFrame) =
      SketchOps.cmsHeavyHittersFromSketch(df, sk, "k", 64, 5)
        .collect().map(r => (r.getLong(0),
          (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val served = audit(IndexStore.readCmsSketch(spark, store, expectW = 64))
    val scratch = audit(SketchOps.cmsSketch(df, "k", 64))
    assert(served == scratch, "merge-on-read must equal from-scratch")
    intercept[IllegalArgumentException] {
      IndexStore.appendCmsSketch(
        SketchOps.cmsSketch(df, "k", 128), store, w = 128)
    }
    intercept[IllegalArgumentException] {
      IndexStore.readCmsSketch(spark, store, expectW = 32).collect()
    }
  }

  test("kCore: cascading peel — a node whose degree only drops below " +
      "k after round 1 is removed in round 2") {
    // 4-clique {a,b,c,d}; e joined to a,b and to leaves f,g.
    // e starts at degree 4; f,g peel in round 1, e drops to 2 and
    // peels in round 2; the clique survives with core_deg 3.
    val edges = (Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d"), ("e", "a"), ("e", "b"), ("e", "f"),
      ("e", "g"))).toDF("s", "t")
    val got = GraphOps.kCore(edges, "s", "t", k = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
    // k above the densest core empties the graph
    assert(GraphOps.kCore(edges, "s", "t", k = 4).count() == 0)
    // k=1 keeps everything (no isolated nodes in an edge list)
    assert(GraphOps.kCore(edges, "s", "t", k = 1).count() == 7)
  }

  test("trustRank: hand trajectory on a seed->sink edge; fast path " +
      "bit-identical to the distributed loop") {
    val edges = Seq(("a", "b", 1L)).toDF("s", "t", "w")
    val seeds = Seq("a").toDF("n")
    // n=2, k=1, seedBase=300000; iter1: r=(300000, 1700000);
    // iter2: sdg=halfup(85*1700000,100)=1445000 -> a=1745000, b=255000
    val got = GraphOps.trustRank(edges, "s", "t", "w", seeds, "n",
        iterations = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1745000L, "b" -> 255000L), s"got $got")
    val fast = GraphOps.trustRank(edges, "s", "t", "w", seeds, "n",
        iterations = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val loop = GraphOps.trustRank(edges, "s", "t", "w", seeds, "n",
        iterations = 5, driverMaxEdges = 0)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(fast == loop, "fast path diverges from the loop")
  }

  test("modularity: two bridged triangles score the textbook 5/14") {
    val edges = Seq(("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
      ("b1", "b2"), ("b2", "b3"), ("b3", "b1"), ("a1", "b1"))
      .toDF("s", "t")
    val labels = Seq(("a1", "A"), ("a2", "A"), ("a3", "A"),
      ("b1", "B"), ("b2", "B"), ("b3", "B")).toDF("node", "lbl")
    val got = GraphOps.modularityByCommunity(edges, "s", "t",
        labels, "node", "lbl")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // per community: e_c2=6, d_c=7, m2=14 -> (6*14-49)*1e6/196 = 178571
    assert(got("A") == ((3L, 7L, 3L, 178571L)))
    assert(got("B") == ((3L, 7L, 3L, 178571L)))
    // Q = 357142/1e6 ~ 5/14
    assert(math.abs(got.values.map(_._4).sum - 5.0 / 14 * 1e6) <= 1)
  }

  test("degreeMixing: star is exactly -1 assortative; clique is " +
      "null-variance; rich-club density closed form") {
    val star = Seq(("h", "l1"), ("h", "l2"), ("h", "l3")).toDF("s", "t")
    val rs = GraphOps.degreeMixing(star, "s", "t", kRich = 1L)
      .collect().head
    assert(rs.getLong(0) == 4 && rs.getLong(1) == 3)
    assert(rs.getDouble(2) == -1.0, s"star must be -1, got ${rs.get(2)}")
    assert(rs.getLong(4) == 1 && rs.isNullAt(6),
      "one-node club has no density")
    val k4 = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d")).toDF("s", "t")
    val rk = GraphOps.degreeMixing(k4, "s", "t", kRich = 2L)
      .collect().head
    assert(rk.isNullAt(2), "regular graph has null assortativity")
    // all 4 nodes have deg 3 > 2: club = whole clique, phi = 1
    assert(rk.getLong(4) == 4 && rk.getLong(5) == 6 &&
      rk.getDouble(6) == 1.0)
  }

  test("cms join size: never undercounts; wide sketch is exact; " +
      "exact side matches the closed form") {
    val a = (0L until 600L).map(_ % 10).toDF("k") // 60 each of 0..9
    val b = (0L until 150L).map(_ % 15).toDF("k") // 10 each of 0..14
    // exact |A join B| = 10 shared keys x 60 x 10
    val wide = SketchOps.cmsJoinSize(a, "k", b, "k", w = 4096)
      .collect().head
    assert(wide.getLong(1) == 6000L)
    assert(wide.getLong(0) == 6000L, "wide sketch must be exact")
    assert(wide.getLong(2) == 0L && wide.getDouble(3) == 1.0)
    val narrow = SketchOps.cmsJoinSize(a, "k", b, "k", w = 16)
      .collect().head
    assert(narrow.getLong(0) >= narrow.getLong(1),
      "CMS inner product never undercounts")
  }

  // ---- durable quantile-histogram store (q390) ----

  test("quantile store: batch-appended buckets re-derive the " +
      "from-scratch histogram in a fresh session; cell width pinned") {
    import graft.ops.IndexStore
    val vals = (1 to 2000).map(i => (i.toLong, i * 0.731 - 300.0))
    val df = vals.toDF("id", "v")
    val path = java.nio.file.Files
      .createTempDirectory("graft_quant_spec").toString + "/quant"
    (0 until 3).foreach { b =>
      IndexStore.appendQuantHist(SketchOps.quantHistDelta(
        df.where(pmod(col("id"), lit(3)) === b), "v", 2000000L),
        path, 2000000L)
    }
    val stored = IndexStore.readQuantHist(spark.newSession(), path,
        expectCellMicro = 2000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val whole = SketchOps.quantHistDelta(df, "v", 2000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stored == whole, "merge-on-read must equal from-scratch")
    intercept[IllegalArgumentException] {
      IndexStore.appendQuantHist(SketchOps.quantHistDelta(
        df, "v", 1000000L), path, 1000000L)
    }
  }

  test("quantile audit: estimate bounds the exact order statistic " +
      "within one cell; exact matches an in-memory rank") {
    val vals = (1 to 999).map(i => ((i * 37 % 1000) + 0.25))
    val df = vals.toDF("v")
    val cell = 5000000L
    val hist = SketchOps.quantHistDelta(df, "v", cell)
    val qs = Seq(250000L, 500000L, 900000L)
    val got = SketchOps.quantileAuditFromHist(df, "v", hist, cell, qs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val sortedMicro = vals.map(v => math.round(v * 1e6)).sorted
    qs.foreach { q =>
      val (rank, estHi, exact, err) = got(q)
      val expRank = (q * vals.size + 999999L) / 1000000L
      assert(rank == expRank)
      assert(exact == sortedMicro((expRank - 1).toInt),
        s"q=$q exact mismatch")
      assert(err > 0 && err <= cell, s"q=$q err $err outside (0, cell]")
      assert(estHi == exact + err)
    }
  }
}
