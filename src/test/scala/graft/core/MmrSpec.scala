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
}
