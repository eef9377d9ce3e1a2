package graft.core

import graft.ops.SimilarityOps
import org.apache.spark.sql.functions._

/** Hand case for MMR diversified top-3 (q245): a near-duplicate of
  * the top hit must be displaced by a diverse candidate even though
  * the duplicate has strictly higher relevance — the defining MMR
  * behavior a pure-relevance ranking cannot produce.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  test("near-duplicate of rank-1 is demoted below the diverse candidate") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),      // the query
      (1L, Seq(0.9f, 0.0f, 0.436f)),    // relevant, diverse axis z
      (2L, Seq(0.9005f, 0.0005f, 0.4349f)), // near-dup of 1, highest rel
      (3L, Seq(0.9f, 0.436f, 0.0f))     // equally relevant, diverse axis y
    ).toDF("vec_id", "embedding")
    val got = SimilarityOps.mmrTop3(emb, "vec_id", "embedding",
        col("vec_id") === 0, lambda = 0.7, nCand = 3)
      .orderBy("rank").collect().map(r => r.getLong(2)).toSeq
    // pure relevance would rank (2, 1, 3): 1 is a near-dup of 2 and
    // only microscopically less relevant than it. MMR's redundancy
    // penalty (sim(1,2) ≈ 1.0) pushes 1 below the diverse 3.
    assert(got == Seq(2L, 3L, 1L), s"got $got")
  }

  test("farthestPointSample: greedy max-min picks, shrinking radii, " +
      "partition invariance") {
    // three tight clusters far apart + the singletons inside them
    val pts = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(0.1f, 0.0f)), (3L, Seq(0.0f, 0.1f)),
      (4L, Seq(10.0f, 0.0f)), (5L, Seq(10.1f, 0.0f)),
      (6L, Seq(0.0f, 10.0f)), (7L, Seq(0.0f, 10.1f))
    ).toDF("vec_id", "embedding")
    val got = SimilarityOps.farthestPointSample(pts, "vec_id",
        "embedding", k = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.map(_._2).distinct.length == 4, "picks must be distinct")
    // radii (dist at selection) never grow with rank
    val radii = got.drop(1).map(_._3)
    assert(radii.sameElements(radii.sorted.reverse),
      s"radii must be non-increasing: ${radii.toSeq}")
    // after 3 picks the three clusters are covered, so pick 4's
    // radius is an intra-cluster distance (~0.1), far below pick 2/3
    assert(radii(0) > 900000L && radii(1) > 900000L,
      "picks 2-3 must cross clusters")
    assert(radii(2) <= 20000L, s"pick 4 must be intra-cluster: ${radii(2)}")
    // the first three picks hit three DIFFERENT clusters
    val cluster = Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 1, 5L -> 1,
       6L -> 2, 7L -> 2)
    assert(got.take(3).map(x => cluster(x._2)).distinct.length == 3)
    val again = SimilarityOps.farthestPointSample(pts.repartition(5),
        "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.sameElements(again), "selection must be layout-invariant")
  }
}
