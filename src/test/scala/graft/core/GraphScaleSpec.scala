package graft.core

import graft.ops.GraphOps
import org.apache.spark.sql.functions._

/** Scale/shape stress for connected components: dedup-realistic star
  * clusters at 10⁵-edge volume (the pair generators emit near-cliques;
  * a star is their sparsest spanning shape, i.e. the worst case that
  * still has diameter 2), plus one long chain to prove multi-round
  * propagation converges and the per-round localCheckpoint keeps the
  * loop flat (round k must not replay rounds 1..k-1 — quadratic
  * blowup would time this out, not just fail it).
  */
class GraphScaleSpec extends SparkSpec {

  test("180k-edge star graph resolves every cluster in bounded rounds") {
    // 20k blocks of 10 nodes: hub b*10, members b*10+1 .. b*10+9
    val edges = spark.range(0, 200000).toDF("id")
      .filter(col("id") % 10 =!= 0)
      .select((col("id") - (col("id") % 10)).as("src"), col("id").as("dst"))
    val t0 = System.nanoTime()
    val cc = GraphOps.connectedComponents(edges, "src", "dst")
    val wrong = cc.filter(col("comp") =!= col("id") - (col("id") % 10)).count()
    val n = cc.count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(wrong == 0, s"$wrong nodes with a wrong component")
    assert(n == 200000, s"expected 200000 labeled nodes, got $n")
    // stars converge in ~2 rounds; generous bound so only a broken
    // loop (quadratic replay / no convergence) fails it
    assert(secs < 60.0, s"star graph took ${secs}s")
  }

  test("diameter-16 chain fully merges (multi-round propagation)") {
    val base = 10000000L
    val chain = spark.range(0, 16).toDF("i")
      .select((col("i") + base).as("src"), (col("i") + base + 1).as("dst"))
    val comps = GraphOps.connectedComponents(chain, "src", "dst")
      .select("comp").distinct().collect().map(_.getLong(0)).toSeq
    assert(comps == Seq(base), s"chain should collapse to $base, got $comps")
  }
}
