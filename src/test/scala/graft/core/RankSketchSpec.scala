package graft.core

import graft.ops.{GraphOps, SketchOps}
import org.apache.spark.sql.functions._

/** Hand cases for integer PageRank and the count-min audit. */
class RankSketchSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank: 3-node path, one exact integer iteration") {
    // a-b, b-c: degrees a=1, b=2, c=1; n=3, unit=333333333
    // after 1 iter: pr(a) = (15u + 85*(u div 2) + 50) div 100
    //   = (4999999995 + 14166666610 + 50) div 100 = 191666666 (x2 ends)
    // pr(b) = (15u + 85*(u + u) ... contribs a->b u, c->b u
    //   = (4999999995 + 85*666666666 + 50) div 100 = 616666666
    val edges = Seq(("a", "b"), ("b", "c")).toDF("s", "t")
    val r = GraphOps.pagerank(edges, "s", "t", iters = 1).collect()
      .map(x => x.getString(0) -> x.getLong(2)).toMap
    val u = 1000000000L / 3
    val end = (15 * u + 85 * (u / 2) + 50) / 100
    val mid = (15 * u + 85 * (2 * u) + 50) / 100
    assert(r("a") == end && r("c") == end && r("b") == mid)
  }

  test("pagerank: symmetric graph keeps symmetric ranks; mass conserved") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
      .toDF("s", "t") // 4-cycle: all nodes equivalent
    val rows = GraphOps.pagerank(edges, "s", "t").collect()
    val prs = rows.map(_.getLong(2)).distinct
    assert(prs.length == 1) // identical by symmetry
    assert(prs.head * 4 <= 1000000000L && prs.head * 4 > 999999000L)
  }

  test("pagerank/hits: driver fast path is bit-identical to the loop") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
      ("a", "c"), ("b", "e")).toDF("s", "t")
    val fast = GraphOps.pagerank(edges, "s", "t").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val loop = GraphOps.pagerank(edges, "s", "t", driverMaxEdges = 0)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(fast.toSeq == loop.toSeq)
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
}
