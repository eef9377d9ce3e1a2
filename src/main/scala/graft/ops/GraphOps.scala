package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Small graph toolkit for the dedup pipeline: near-duplicate PAIRS
  * (MinHash/LSH, n-gram Jaccard, embedding buckets — all emit (a, b)
  * edges) become actionable only as CLUSTERS — "these 17 documents are
  * one duplicate group, keep one". That closure is connected
  * components.
  *
  * Scale design (100 TB corpora):
  *  - min-label propagation: every node repeatedly adopts the smallest
  *    component id among itself and its neighbors. Each round is one
  *    equi-join (labels onto edge endpoints) + one min-aggregation —
  *    both shuffle on the node id, both map-side combinable. Rounds
  *    needed = graph diameter; dedup graphs are near-cliques with tiny
  *    diameters (a transitive near-dup chain longer than ~10 hops is
  *    pathological), so the loop converges in a handful of rounds.
  *    For adversarial long-path graphs the known fix is alternating
  *    large-star/small-star (Kiveris et al., "Connected Components in
  *    MapReduce and Beyond", SoCC'14) at O(log n) rounds — same
  *    per-round shape, so it can replace the loop body without
  *    touching callers if ever needed.
  *  - each round ends in `localCheckpoint`: iterative DataFrame loops
  *    otherwise stack plans (round k replays rounds 1..k-1 — quadratic
  *    work and an eventually-OOM driver plan). Checkpointing pins the
  *    round's result as concrete partitions and truncates lineage, so
  *    every round costs the same. Superseded checkpoints are
  *    unpersisted eagerly.
  *  - convergence is detected with a changed-row probe (`isEmpty` on
  *    the improved-label set), not a fixed round count — no wasted
  *    passes once stable.
  */
object GraphOps {

  /** Connected components of the undirected graph given by an edge
    * list. Returns one row per distinct endpoint: (id, component),
    * where component = the smallest node id reachable from `id`
    * (a canonical, deterministic cluster representative).
    *
    * `maxIter` bounds the propagation rounds (diameter guard); the
    * labels returned after a cap are still a valid refinement (every
    * node maps to SOME reachable id), just possibly not fully merged.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    // Symmetrize once: propagation reads neighbors in both directions.
    // Distinct also collapses duplicate input pairs so a dup-heavy
    // pair generator doesn't multiply join output.
    val sym = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Init fuses the first propagation round for free: the label
    // starts at min(self, direct neighbors) straight off the grouped
    // edge list, so near-clique dedup graphs need one fewer round.
    var labels = sym.groupBy("u").agg(min("v").as("_mv"))
      .select(col("u").as("id"), least(col("u"), col("_mv")).as("comp"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // Each node hears its neighbors' current labels, then keeps the
      // min of (own label, heard labels). Union + one aggregation —
      // no outer join needed, and the combine happens map-side. The
      // node's PREVIOUS label rides through the same aggregation
      // (min over own-tagged rows only), so convergence — "did any
      // label strictly decrease?" — is a LOCAL scan of the
      // checkpointed result, not a join job per round.
      val heard = sym.join(labels.withColumnRenamed("id", "v"), "v")
        .select(col("u").as("id"), col("comp"), lit(false).as("own"))
      val next = labels.withColumn("own", lit(true)).union(heard)
        .groupBy("id").agg(
          min("comp").as("comp"),
          min(when(col("own"), col("comp"))).as("prev"))
        .localCheckpoint()
      converged = next.filter(col("comp") < col("prev")).isEmpty
      labels.unpersist()
      labels = next.select("id", "comp")
      iter += 1
    }
    sym.unpersist()
    labels
  }

  /** Near-duplicate cluster dedup decision: given documents and a
    * near-dup PAIR list over them, pick one survivor per connected
    * cluster (highest score, ties to lowest id) and return the
    * documents that survive curation — cluster losers dropped,
    * untouched documents (no near-dup edges) kept as-is.
    *
    * Composition: connectedComponents (above) + DedupOps.keepBest on
    * the cluster id + one broadcast-friendly anti join of the loser
    * set against the corpus. The corpus itself is never shuffled —
    * only the (tiny, cluster-member-sized) label/loser tables move.
    */
  def nearDupSurvivors(docs: DataFrame, idCol: String, scoreCol: String,
      pairs: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val cc = connectedComponents(pairs, srcCol, dstCol)
    val members = docs.join(cc, docs(idCol) === cc("id"))
      .select(cc("id"), cc("comp"), docs(scoreCol).as("_score"))
    val keep = DedupOps.keepBest(members, "id", col("comp"), col("_score"))
      .select(col("keep_id").as("id"))
    val losers = members.select("id").join(keep, Seq("id"), "left_anti")
    docs.join(losers, docs(idCol) === losers("id"), "left_anti")
  }
}
