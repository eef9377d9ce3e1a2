package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  *    For adversarial long-path graphs use
  *    `connectedComponentsStars` (same contract, O(log n) rounds).
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

  /** Superseded iteration rounds are released eagerly inside the
    * loops below; the RETURNED frame is itself checkpoint-backed —
    * callers that are done with it free its storage via
    * [[Checkpoints.release]] (plain unpersist() is a no-op there).
    */
  private def releaseCheckpoint(df: DataFrame): Unit =
    Checkpoints.release(df)

  /** Connected components of the undirected graph given by an edge
    * list. Returns one row per distinct endpoint: (id, component),
    * where component = the smallest node id reachable from `id`
    * (a canonical, deterministic cluster representative).
    *
    * `maxIter` bounds the propagation rounds (diameter guard); the
    * labels returned after a cap are still a valid refinement (every
    * node maps to SOME reachable id), just possibly not fully merged.
    *
    * Driver fast path: the pair graph is usually MUCH smaller than
    * the corpus (only near-duplicates produce edges), and the
    * distributed loop's cost at that size is pure per-round scheduler
    * overhead — so when the symmetrized edge set (already persisted
    * for the loop, so the count is one cheap action) has at most
    * `driverMaxEdges` rows, it is collected and union-found on the
    * driver in milliseconds, producing IDENTICAL labels. Same
    * bounded-collect contract as the SIT fold and the IVF sample fit;
    * the default bound is 1M edges ≈ tens of MB. Pass
    * `driverMaxEdges = 0` to force the distributed loop (the 100-TB
    * path, which stays the semantics reference in the specs). The
    * fast path always returns FULLY merged labels; `maxIter` is a
    * distributed-loop knob only — callers that want to observe a
    * capped partial refinement must also force the loop.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50, driverMaxEdges: Long = 1000000L): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    // Symmetrize once: propagation reads neighbors in both directions.
    // Distinct also collapses duplicate input pairs so a dup-heavy
    // pair generator doesn't multiply join output.
    val sym = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // NULL ids are rejected LOUDLY in both paths: the distributed
    // loop's propagation equi-join drops null keys, so a null node
    // would receive labels but never relay them — a null BRIDGING two
    // subgraphs silently under-merges (and the driver comparator
    // cannot order null at all). One aggregate doubles as the
    // fast-path size gate: count(col) skips nulls, so any gap vs
    // count(*) is a null id.
    val probe = sym.agg(count(lit(1)), count(col("u")), count(col("v")))
      .head()
    val symCount = probe.getLong(0)
    require(probe.getLong(1) == symCount && probe.getLong(2) == symCount,
      s"connectedComponents: edge list contains NULL ids " +
        s"(${symCount - math.min(probe.getLong(1), probe.getLong(2))}+ rows)" +
        " — filter them out first")
    // the union coerces src/dst to their common type — that (not
    // srcCol's declared type) is what collected values actually carry
    val idType = sym.schema("u").dataType
    // fast path only for id types whose driver-side ordering provably
    // matches Spark's (long/int numeric order, string binary order);
    // anything else takes the distributed loop rather than risk a
    // wrong "minimum member" representative
    val orderableOnDriver = idType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.StringType => true
      case _ => false
    }
    if (driverMaxEdges > 0 && orderableOnDriver && symCount <= driverMaxEdges) {
      val rows = sym.collect()
      sym.unpersist()
      // generic union-find (ids can be any orderable key type); the
      // component representative is the minimum member, matching the
      // distributed loop exactly
      val parent = scala.collection.mutable.HashMap.empty[Any, Any]
      def find(x: Any): Any = {
        var r = x
        while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
        r
      }
      rows.foreach { r =>
        val (u, v) = (r.get(0), r.get(1))
        parent.getOrElseUpdate(u, u); parent.getOrElseUpdate(v, v)
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) parent(ru) = rv
      }
      implicit val ord: Ordering[Any] =
        (a: Any, b: Any) => (a, b) match {
          case (x: Long, y: Long) => java.lang.Long.compare(x, y)
          case (x: Int, y: Int) => java.lang.Integer.compare(x, y)
          case (x: String, y: String) =>
            // Spark compares strings in UTF-8 BINARY order; Java
            // String order differs on supplementary-plane characters
            org.apache.spark.unsafe.types.UTF8String.fromString(x)
              .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y))
          case (x, y) => sys.error(
            s"unreachable: fast path gated to non-null long/int/string ids, got $x/$y")
        }
      val minOf = scala.collection.mutable.HashMap.empty[Any, Any]
      parent.keys.foreach { id =>
        val r = find(id)
        minOf.update(r, minOf.get(r).fold(id)(m => ord.min(m, id)))
      }
      val spark = edges.sparkSession
      val outRows = parent.keys.toSeq.map { id =>
        org.apache.spark.sql.Row(id, minOf(find(id)))
      }
      // id nullability mirrors the coerced union column (what the
      // distributed loop's groupBy key carries); comp stays nullable
      // like the distributed loop's min-aggregate output. Spread the
      // result over defaultParallelism slices: labels are consumed by
      // joins downstream (survivor anti-joins), and a single-partition
      // frame at the 1M-edge upper end would serialize that work onto
      // one task. Labels are deterministic regardless of partitioning.
      return spark.createDataFrame(
        spark.sparkContext.parallelize(outRows,
          math.max(1, spark.sparkContext.defaultParallelism)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", idType,
            nullable = sym.schema("u").nullable),
          org.apache.spark.sql.types.StructField("comp", idType))))
    }
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
      releaseCheckpoint(labels) // superseded round's blocks freed NOW
      labels = next.select("id", "comp")
      iter += 1
    }
    sym.unpersist()
    labels
  }

  /** Connected components in O(log n) rounds via alternating
    * large-star / small-star (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14) — the adversarial-diameter path.
    * Min-label propagation (above) needs diameter-many rounds: right
    * for near-clique dedup graphs, wrong for a million-hop chain. The
    * star operations instead rewire edges toward each neighborhood's
    * minimum, provably halving component height per round pair.
    *
    * Per round: two (groupBy-min + join-back) passes over a SHRINKING
    * edge set. The neighborhood minimum is computed with an
    * aggregation, never by collecting neighbor lists — a hub with 10⁸
    * neighbors stays map-side combinable instead of materializing one
    * giant row. Same localCheckpoint lineage-truncation discipline and
    * the same output contract as `connectedComponents`.
    *
    * Convergence: the edge set is a fixed point of both stars iff it
    * is a disjoint union of min-rooted stars; detected by an
    * (edge-count, bit_xor of edge hashes) signature going stable —
    * one cheap aggregation on data each round already materializes.
    * A signature match is then CONFIRMED by an exact set compare
    * (count-equal + empty except ⇒ equal): the exact probe costs a
    * join-shaped pass but runs only on candidate-convergence rounds
    * (typically once), so a 2⁻⁶⁴-ish signature collision between two
    * different successive edge sets can never terminate the loop with
    * incompletely merged components.
    */
  def connectedComponentsStars(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    // same NULL-id contract as [[connectedComponents]]: the canonical
    // a =!= b filter would silently DROP null edges here (null
    // predicate), diverging from the min-label variant — reject loudly
    val nullProbe = edges
      .agg(count(lit(1)), count(col(srcCol)), count(col(dstCol))).head()
    require(nullProbe.getLong(1) == nullProbe.getLong(0) &&
        nullProbe.getLong(2) == nullProbe.getLong(0),
      "connectedComponentsStars: edge list contains NULL ids — filter them out first")
    val allNodes = edges.select(col(srcCol).as("id"))
      .union(edges.select(col(dstCol).as("id"))).distinct()
      .localCheckpoint()
    // canonical (u < v) edge set; self-loops carry no connectivity
    var e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint()
    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var sig = signature(e)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // LARGE-STAR at every node n: each strictly-larger neighbor is
      // rewired to m = min(N(n) ∪ {n}). Each canonical edge is
      // processed once, at its smaller endpoint (m <= n < v keeps the
      // output canonical).
      val nbrs = e.union(e.select(col("v"), col("u")))
      val minN = nbrs.groupBy("u").agg(min("v").as("_mv"))
        .select(col("u"), least(col("u"), col("_mv")).as("_m"))
      val ls = nbrs.join(minN, "u").filter(col("v") > col("u"))
        .select(col("_m").as("u"), col("v")).distinct()
      // SMALL-STAR at every node n over its SMALLER neighbors N⁻
      // (canonical edges already point large -> small when read as
      // (v, u)): all of N⁻ ∪ {n} except the minimum m attach to m.
      val minS = ls.groupBy("v").agg(min("u").as("_m"))
      val ss = ls.join(minS, "v")
        .filter(col("u") =!= col("_m"))
        .select(col("_m").as("u"), col("u").as("v"))
        .union(minS.select(col("_m").as("u"), col("v")))
        .distinct()
        .localCheckpoint()
      val nextSig = signature(ss)
      // exact confirmation only when the cheap signature says "same":
      // equal counts + empty (ss \ e) on canonical distinct sets is
      // set equality, immune to hash collisions
      converged = nextSig == sig && ss.except(e).isEmpty
      sig = nextSig
      releaseCheckpoint(e) // superseded round's blocks freed NOW
      e = ss
      iter += 1
    }
    // fixed point = min-rooted stars: leaves label to their root,
    // roots and edge-less nodes to themselves. The min-reduction (not
    // a plain distinct) keeps the one-row-per-node contract even when
    // maxIter capped the loop before a true fixed point — each node
    // then maps to SOME reachable smaller id, a valid refinement,
    // exactly like the capped min-label variant.
    val labeled = e.select(col("v").as("id"), col("u").as("comp"))
      .union(e.select(col("u").as("id"), col("u").as("comp")))
      .groupBy("id").agg(min("comp").as("comp"))
    val isolated = allNodes.join(labeled, Seq("id"), "left_anti")
      .select(col("id"), col("id").as("comp"))
    labeled.union(isolated)
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

  /** Exact half-up integer division of non-negative longs (column
    * form): num/den with .5 rounding up, spelled so every step is
    * exact — (a − a mod b)/b is an exact multiple divided out, and
    * the IEEE division of exactly-representable operands with an
    * exactly-representable quotient is exact. The division runs in
    * decimal(38,*) so exactness holds for the FULL long range, not
    * just 2^53 (rank·weight products at corpus scale live in that
    * gap); a numerator past 2^63 errors loudly under ANSI instead of
    * drifting.
    */
  private def halfDiv(num: org.apache.spark.sql.Column,
      den: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ExactArith.halfUpDiv(num, den)

  /** Weighted PageRank in EXACT integer micro-units — bit-identical
    * on any engine and partitioning, so a DuckDB oracle can replay
    * the full trajectory (the Bradley–Terry/IRLS determinism
    * discipline applied to an iterative graph algorithm).
    *
    * Per iteration, with ranks r in micro-units (node value 1.0 =
    * 1,000,000) and d = dampingPct/100:
    *
    *   contrib(u→v) = halfup(r_u · w_uv / W_u)   (W_u = Σ_v w_uv)
    *   r'_v = (100−d)·10^4 + halfup(d · (inflow_v + dangling/N) / 100)
    *
    * Every quantity is a long; each rounding is the deterministic
    * half-up spelling above, so sub-ulp float drift cannot exist at
    * all (unlike a float PageRank, where per-partition sum order
    * changes low bits every run).
    *
    * Scale shape: the edge table is aggregated once ((src,dst) sums,
    * map-side combined), out-weights join once, and both persist;
    * each iteration is ONE equi-join (ranks onto edge sources) + ONE
    * map-side-combinable sum by dst + a scalar dangling aggregate —
    * all shuffles keyed on node ids, nothing global, nothing
    * quadratic. Rounds end in localCheckpoint (lineage truncation,
    * constant per-round cost — the CC loop discipline).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iterations: Int = 10,
      dampingPct: Int = 85, driverMaxEdges: Long = 1000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 100,
      s"iterations must be in [1, 100], got $iterations")
    require(dampingPct >= 1 && dampingPct <= 99,
      s"dampingPct must be in [1, 99], got $dampingPct")
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).cast("long").as("w"))
      .filter(col("w") > 0)
      .groupBy("src", "dst").agg(sum("w").as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val eCount = e.count()
    require(eCount > 0, "pageRank: empty graph")
    val base = (100L - dampingPct) * 10000L

    // Driver fast path (the connectedComponents bounded-collect
    // contract): below `driverMaxEdges` aggregated edges the graph is
    // model-sized and the distributed loop's cost is pure per-round
    // scheduler overhead — run the IDENTICAL integer trajectory on
    // driver arrays (per-dst long sums are associative, so any
    // accumulation order yields the same bits). The distributed loop
    // below stays the 100 TB path and the semantics reference
    // (spec-pinned equal).
    if (driverMaxEdges > 0 && eCount <= driverMaxEdges) {
      val rows = e.collect()
      e.unpersist()
      def halfUp(num: Long, den: Long): Long = (2 * num + den) / (2 * den)
      val ow = scala.collection.mutable.HashMap.empty[Any, Long]
      val nodeSet = scala.collection.mutable.LinkedHashSet.empty[Any]
      rows.foreach { r =>
        val (s0, d0, w) = (r.get(0), r.get(1), r.getLong(2))
        ow.update(s0, ow.getOrElse(s0, 0L) + w)
        nodeSet += s0; nodeSet += d0
      }
      val n = nodeSet.size.toLong
      var r = nodeSet.iterator.map(_ -> 1000000L).toMap
      for (_ <- 1 to iterations) {
        val inflow = scala.collection.mutable.HashMap.empty[Any, Long]
        rows.foreach { row =>
          val (s0, d0, w) = (row.get(0), row.get(1), row.getLong(2))
          inflow.update(d0,
            inflow.getOrElse(d0, 0L) + halfUp(r(s0) * w, ow(s0)))
        }
        val dm = nodeSet.iterator.filterNot(ow.contains).map(r).sum
        val dshare = (2 * dm + n) / (2 * n)
        r = nodeSet.iterator.map(nd => nd ->
          (base + halfUp(dampingPct * (inflow.getOrElse(nd, 0L) + dshare),
            100L))).toMap
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node",
          e.schema("src").dataType),
        org.apache.spark.sql.types.StructField("rank_micro",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.DoubleType, nullable = false)))
      val out = nodeSet.iterator.map(nd =>
        org.apache.spark.sql.Row(nd, r(nd), r(nd) / 1000000.0)).toSeq
      return spark.createDataFrame(
        spark.sparkContext.parallelize(out,
          math.max(1, spark.sparkContext.defaultParallelism)), schema)
    }

    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    val ow = e.groupBy("src").agg(sum("w").as("ow"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val e2 = e.join(ow, "src")
      .select(col("src"), col("dst"), col("w"), col("ow"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // dangling node set is FIXED across iterations — compute once
    val dangling = nodes.join(ow.select(col("src").as("node")),
        Seq("node"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = nodes.select(col("node"), lit(1000000L).as("r"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val contrib = e2.join(ranks, e2("src") === ranks("node"))
        .select(col("dst"), halfDiv(col("r") * col("w"), col("ow")).as("c"))
      val inflow = contrib.groupBy("dst").agg(sum("c").as("inflow"))
      // dangling mass rides the SAME job as the rank update (1-row
      // broadcast cross join) — no separate per-iteration action
      val dmf = dangling.join(ranks, Seq("node"))
        .agg(coalesce(sum("r"), lit(0L)).as("dm"))
        .select(halfDiv(col("dm"), lit(n)).as("dshare"))
      val prev = ranks
      ranks = nodes.join(inflow, nodes("node") === inflow("dst"), "left")
        .crossJoin(broadcast(dmf))
        .select(col("node"),
          (lit(base) + halfDiv(lit(dampingPct.toLong) *
            (coalesce(col("inflow"), lit(0L)) + col("dshare")),
            lit(100L))).as("r"))
        .localCheckpoint()
      releaseCheckpoint(prev)
    }
    e.unpersist(); e2.unpersist(); nodes.unpersist(); ow.unpersist()
    dangling.unpersist()
    ranks.select(col("node"), col("r").as("rank_micro"),
      (col("r") / lit(1000000.0)).as("rank"))
  }

  /** TrustRank (Gyöngyi, Garcia-Molina & Pedersen 2004) — PageRank
    * personalized to a TRUSTED seed set: teleport mass (and dangling
    * mass) flows only to seeds, so scores measure proximity to
    * trust — the crawl-quality propagator that separates organically
    * linked content from spam farms, run before domain-level
    * sampling. Same integer micro-grid discipline as [[pageRank]]
    * (every quantity a long, every division the deterministic
    * half-up spelling), so the trajectory is bit-stable and
    * SQL-replayable:
    *
    *   seedBase        = halfup((100−d)·N·10⁴, |S|)
    *   seedDangling_t  = halfup(d·danglingMass_t, 100·|S|)
    *   r'_v = halfup(d·inflow_v, 100) + [v∈S]·(seedBase + seedDangling)
    *
    * Non-seed nodes with no inflow decay to 0 — the point of the
    * algorithm. Scale shape identical to [[pageRank]]: per iteration
    * one equi-join + one map-combined sum + a broadcast scalar;
    * driver fast path below `driverMaxEdges` (bit-identical — the
    * pageRank fast-path contract, RankSketchSpec-pinned).
    *
    * @param seeds one-column frame of trusted node ids
    * @return (node, trust_micro, trust)
    */
  def trustRank(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, seeds: DataFrame, seedCol: String,
      iterations: Int = 10, dampingPct: Int = 85,
      driverMaxEdges: Long = 1000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 100,
      s"iterations must be in [1, 100], got $iterations")
    require(dampingPct >= 1 && dampingPct <= 99,
      s"dampingPct must be in [1, 99], got $dampingPct")
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).cast("long").as("w"))
      .filter(col("w") > 0)
      .groupBy("src", "dst").agg(sum("w").as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val eCount = e.count()
    require(eCount > 0, "trustRank: empty graph")
    val sd = seeds.select(col(seedCol).as("node")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    if (driverMaxEdges > 0 && eCount <= driverMaxEdges) {
      val rows = e.collect()
      val seedSet = sd.collect().map(_.get(0)).toSet
      e.unpersist(); sd.unpersist()
      require(seedSet.nonEmpty, "trustRank: empty seed set")
      def halfUp(num: Long, den: Long): Long = (2 * num + den) / (2 * den)
      val ow = scala.collection.mutable.HashMap.empty[Any, Long]
      val nodeSet = scala.collection.mutable.LinkedHashSet.empty[Any]
      rows.foreach { r =>
        val (s0, d0, w) = (r.get(0), r.get(1), r.getLong(2))
        ow.update(s0, ow.getOrElse(s0, 0L) + w)
        nodeSet += s0; nodeSet += d0
      }
      val inSeeds = nodeSet.iterator.filter(seedSet.contains).toSet
      require(inSeeds.nonEmpty, "trustRank: no seed appears in the graph")
      val n = nodeSet.size.toLong
      val k = inSeeds.size.toLong
      val seedBase = halfUp((100L - dampingPct) * n * 10000L, k)
      var r = nodeSet.iterator
        .map(nd => nd -> (if (inSeeds(nd)) halfUp(n * 1000000L, k) else 0L))
        .toMap
      for (_ <- 1 to iterations) {
        val inflow = scala.collection.mutable.HashMap.empty[Any, Long]
        rows.foreach { row =>
          val (s0, d0, w) = (row.get(0), row.get(1), row.getLong(2))
          inflow.update(d0,
            inflow.getOrElse(d0, 0L) + halfUp(r(s0) * w, ow(s0)))
        }
        val dm = nodeSet.iterator.filterNot(ow.contains).map(r).sum
        val sdg = halfUp(dampingPct * dm, 100L * k)
        r = nodeSet.iterator.map(nd => nd ->
          (halfUp(dampingPct * inflow.getOrElse(nd, 0L), 100L) +
            (if (inSeeds(nd)) seedBase + sdg else 0L))).toMap
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node",
          e.schema("src").dataType),
        org.apache.spark.sql.types.StructField("trust_micro",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("trust",
          org.apache.spark.sql.types.DoubleType, nullable = false)))
      val out = nodeSet.iterator.map(nd =>
        org.apache.spark.sql.Row(nd, r(nd), r(nd) / 1000000.0)).toSeq
      return spark.createDataFrame(
        spark.sparkContext.parallelize(out,
          math.max(1, spark.sparkContext.defaultParallelism)), schema)
    }

    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    val seedNodes = nodes.join(sd, "node")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val k = seedNodes.count()
    require(k > 0, "trustRank: no seed appears in the graph")
    val seedBase = ((100L - dampingPct) * n * 10000L * 2 + k) / (2 * k)
    val ow = e.groupBy("src").agg(sum("w").as("ow"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val e2 = e.join(ow, "src")
      .select(col("src"), col("dst"), col("w"), col("ow"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dangling = nodes.join(ow.select(col("src").as("node")),
        Seq("node"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val isSeed = seedNodes.select(col("node"), lit(1).as("_s"))
    var ranks = nodes.join(isSeed, Seq("node"), "left")
      .select(col("node"),
        when(col("_s").isNotNull,
          halfDiv(lit(n * 1000000L), lit(k))).otherwise(lit(0L)).as("r"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val contrib = e2.join(ranks, e2("src") === ranks("node"))
        .select(col("dst"), halfDiv(col("r") * col("w"), col("ow")).as("c"))
      val inflow = contrib.groupBy("dst").agg(sum("c").as("inflow"))
      val dmf = dangling.join(ranks, Seq("node"))
        .agg(coalesce(sum("r"), lit(0L)).as("dm"))
        .select(halfDiv(lit(dampingPct.toLong) * col("dm"),
          lit(100L * k)).as("sdg"))
      val prev = ranks
      ranks = nodes.join(inflow, nodes("node") === inflow("dst"), "left")
        .join(isSeed, Seq("node"), "left")
        .crossJoin(broadcast(dmf))
        .select(col("node"),
          (halfDiv(lit(dampingPct.toLong) *
              coalesce(col("inflow"), lit(0L)), lit(100L)) +
            when(col("_s").isNotNull, lit(seedBase) + col("sdg"))
              .otherwise(lit(0L))).as("r"))
        .localCheckpoint()
      releaseCheckpoint(prev)
    }
    e.unpersist(); e2.unpersist(); nodes.unpersist(); ow.unpersist()
    dangling.unpersist(); sd.unpersist(); seedNodes.unpersist()
    ranks.select(col("node"), col("r").as("trust_micro"),
      (col("r") / lit(1000000.0)).as("trust"))
  }

  /** DuckDB replay of [[trustRank]]: identical integer trajectory,
    * unrolled per iteration. `edgesSql` yields (src, dst, w);
    * `seedsSql` yields (node).
    */
  def trustRankOracleSql(edgesSql: String, seedsSql: String,
      iterations: Int = 10, dampingPct: Int = 85): String = {
    val iters = (1 to iterations).map { kk =>
      val p = kk - 1
      s"""c$kk AS MATERIALIZED (
         | SELECT e.dst, sum((r$p.r * e.w * 2 + e.ow) // (e.ow * 2)) AS inflow
         | FROM e2 e JOIN r$p ON e.src = r$p.node GROUP BY e.dst),
         |d$kk AS MATERIALIZED (
         | SELECT (2 * $dampingPct * coalesce((SELECT sum(r) FROM r$p
         |   WHERE node NOT IN (SELECT src FROM ow)), 0)
         |   + 100 * (SELECT k FROM kk)) // (2 * 100 * (SELECT k FROM kk))
         |   AS sdg),
         |r$kk AS MATERIALIZED (
         | SELECT nodes.node,
         |   ($dampingPct * coalesce(c$kk.inflow, 0) * 2 + 100) // 200
         |   + CASE WHEN sn.node IS NOT NULL
         |       THEN (SELECT sb FROM sb) + (SELECT sdg FROM d$kk)
         |       ELSE 0 END AS r
         | FROM nodes LEFT JOIN c$kk ON nodes.node = c$kk.dst
         | LEFT JOIN sn ON nodes.node = sn.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH eraw AS (__EDGES__),
       |e AS MATERIALIZED (SELECT src, dst, CAST(sum(w) AS BIGINT) AS w FROM eraw
       |  WHERE w > 0 GROUP BY src, dst),
       |nodes AS MATERIALIZED (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       |sn AS MATERIALIZED (SELECT DISTINCT nodes.node
       |  FROM nodes JOIN (__SEEDS__) s0 ON nodes.node = s0.node),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
       |kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM sn),
       |sb AS (SELECT ((100 - $dampingPct) * (SELECT n FROM nn) * 10000 * 2
       |  + (SELECT k FROM kk)) // (2 * (SELECT k FROM kk)) AS sb),
       |ow AS MATERIALIZED (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM e GROUP BY src),
       |e2 AS MATERIALIZED (SELECT e.src, e.dst, e.w, ow.ow FROM e JOIN ow ON e.src = ow.src),
       |r0 AS MATERIALIZED (SELECT nodes.node,
       |  CASE WHEN sn.node IS NOT NULL THEN
       |    ((SELECT n FROM nn) * 1000000 * 2 + (SELECT k FROM kk))
       |      // (2 * (SELECT k FROM kk))
       |  ELSE 0 END AS r
       |  FROM nodes LEFT JOIN sn ON nodes.node = sn.node),
       |$iters
       |SELECT node, CAST(r AS BIGINT) AS trust_micro,
       |  CAST(r AS BIGINT) / 1000000.0 AS trust
       |FROM r$iterations""".stripMargin
      .replace("__EDGES__", edgesSql).replace("__SEEDS__", seedsSql)
  }

  /** DuckDB twin of [[pageRank]]: the identical integer trajectory,
    * unrolled one CTE pair per iteration. `edgesSql` must yield
    * (src, dst, w) rows.
    */
  def pageRankOracleSql(edgesSql: String, iterations: Int = 10,
      dampingPct: Int = 85): String = {
    val base = (100L - dampingPct) * 10000L
    val iters = (1 to iterations).map { k =>
      val p = k - 1
      s"""c$k AS MATERIALIZED (
         | SELECT e.dst, sum((r$p.r * e.w * 2 + e.ow) // (e.ow * 2)) AS inflow
         | FROM e2 e JOIN r$p ON e.src = r$p.node GROUP BY e.dst),
         |d$k AS MATERIALIZED (
         | SELECT (2 * coalesce((SELECT sum(r) FROM r$p
         |   WHERE node NOT IN (SELECT src FROM ow)), 0)
         |   + (SELECT n FROM nn)) // (2 * (SELECT n FROM nn)) AS dshare),
         |r$k AS MATERIALIZED (
         | SELECT nodes.node,
         |   $base + ($dampingPct * (coalesce(c$k.inflow, 0)
         |     + (SELECT dshare FROM d$k)) * 2 + 100) // 200 AS r
         | FROM nodes LEFT JOIN c$k ON nodes.node = c$k.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH eraw AS (__EDGES__),
       |e AS MATERIALIZED (SELECT src, dst, CAST(sum(w) AS BIGINT) AS w FROM eraw
       |  WHERE w > 0 GROUP BY src, dst),
       |nodes AS MATERIALIZED (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       |nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
       |ow AS MATERIALIZED (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM e GROUP BY src),
       |e2 AS MATERIALIZED (SELECT e.src, e.dst, e.w, ow.ow FROM e JOIN ow ON e.src = ow.src),
       |r0 AS MATERIALIZED (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
       |$iters
       |SELECT node, CAST(r AS BIGINT) AS rank_micro,
       |  CAST(r AS BIGINT) / 1000000.0 AS rank
       |FROM r$iterations""".stripMargin.replace("__EDGES__", edgesSql)
  }

  /** Exact triangle count + global clustering coefficient over an
    * undirected edge list — the graph-cohesion scoreboard beside
    * [[pageRank]] (centrality) and [[connectedComponents]]
    * (reachability): C = 3·triangles / wedges, wedges = Σ d(d−1)/2.
    * Triangles count by the oriented two-path join: edges normalize
    * to a<b, paths (a<b, b<c) close against the (a, c) edge — each
    * triangle counted exactly once, the standard distributed
    * formulation (at full scale, orient by DEGREE instead of id so
    * high-degree hubs don't fan the path join; id-orientation keeps
    * the oracle replayable here).
    *
    * @return one row: (n_nodes, n_edges, n_wedges, n_triangles,
    *         global_cc); cc null on a wedge-free graph
    */
  def clusteringCoefficient(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    // e feeds SIX reads (degrees, edge census, all three legs of the
    // oriented two-path triangle join) — one checkpoint instead of
    // re-deriving the normalized edge list per leg
    val e = edges.select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b")).distinct().localCheckpoint()
    val deg = e.select(col("a").as("v"))
      .unionByName(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val nodes = deg.agg(count(lit(1)).as("n_nodes"),
      (sum(col("d") * (col("d") - 1)) / 2).cast("long").as("n_wedges"))
    val ne = e.agg(count(lit(1)).as("n_edges"))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"), col("e1.a") === col("e3.a") &&
        col("e2.b") === col("e3.b"))
      .agg(count(lit(1)).as("n_triangles"))
    nodes.crossJoin(ne).crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") === 0, lit(null).cast("double"))
          .otherwise(
            expr("(2000000 * 3 * n_triangles + n_wedges)" +
              " div (2 * n_wedges)").cast("double") / 1e6)
          .as("global_cc"))
  }

  /** Hierarchy resolution by POINTER DOUBLING: every node's root and
    * depth in O(log depth) self-joins instead of O(depth) sequential
    * steps — the scale technique for org charts / category trees /
    * thread ancestry, where a naive iterative join walks the longest
    * chain one hop per shuffle. Each round composes the "jump
    * table" with itself (anc ↦ anc∘anc, depths add); roots are
    * self-loops with depth 0, so composition is stable at the root.
    *
    * `iters` rounds resolve depth up to 2^iters. Each round is one
    * self-equi-join on the node frame + a localCheckpoint plan cut.
    *
    * @param nodes (node, parent) — roots point at THEMSELVES
    * @return (node, root, depth)
    */
  def resolveAncestors(nodes: DataFrame, nodeCol: String,
      parentCol: String, iters: Int = 6): DataFrame = {
    require(iters >= 1 && iters <= 12, s"iters in [1,12], got $iters")
    var f = nodes.select(col(nodeCol).as("u"),
        col(parentCol).as("anc"),
        when(col(nodeCol) === col(parentCol), 0L).otherwise(1L).as("d"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      f = f.as("a")
        .join(f.as("b").withColumnRenamed("u", "bu"),
          col("a.anc") === col("bu"))
        .select(col("a.u").as("u"), col("b.anc").as("anc"),
          (col("a.d") + col("b.d")).as("d"))
        .localCheckpoint()
    }
    f.select(col("u").as("node"), col("anc").as("root"),
      col("d").as("depth"))
  }

  /** DuckDB replay of [[resolveAncestors]] (recursive parent walk —
    * the sequential ground truth the doubling must equal). */
  def resolveAncestorsOracleSql(nodesSql: String): String =
    s"""WITH RECURSIVE n AS ($nodesSql),
       |walk AS (
       |  SELECT node AS u, node AS cur, parent, CAST(0 AS BIGINT) AS d
       |  FROM n
       |  UNION ALL
       |  SELECT w.u, n2.node, n2.parent, w.d + 1
       |  FROM walk w JOIN n n2 ON n2.node = w.parent
       |  WHERE w.cur <> w.parent),
       |fin AS (SELECT u, cur AS root, d,
       |    row_number() OVER (PARTITION BY u ORDER BY d DESC) AS rk
       |  FROM walk)
       |SELECT u AS node, root, d AS depth FROM fin WHERE rk = 1"""
      .stripMargin

  /** Fixed-iteration HITS (Kleinberg 1999) over a BIPARTITE edge set
    * (left = hubs, right = authorities), on an exact integer grid:
    * scores live on a 0..10^6 scale, each half-step is
    * `new = Σ partner-scores`, and normalization divides by the MAX
    * (truncating integer division — max-normalization is the
    * convergent HITS variant whose division stays in exact longs:
    * sum-normalization would need 128-bit intermediates). Two
    * full (hub, authority) rounds; every sum is order-free exact.
    *
    * Scale shape: like [[pagerank]] — one shuffle per half-step
    * (join scores to edges, re-aggregate on the other side).
    *
    * @return (side 'hub'|'auth', node, score_units, score)
    */
  def hits(edges: DataFrame, hubCol: String, authCol: String,
      iters: Int = 2, driverMaxEdges: Long = 1000000L): DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters in [1,8], got $iters")
    // localCheckpoint: same rationale as [[pagerank]] — the edge
    // frame is referenced by every half-step's join
    val e = edges.select(col(hubCol).cast("string").as("h"),
      col(authCol).cast("string").as("a")).distinct()
      .localCheckpoint()
    // bounded driver fast path — see [[pagerank]]; long arithmetic
    // (sums, one truncating division by the max) is order-free, so
    // the in-process recurrence is bit-identical to the loop
    if (driverMaxEdges > 0 && e.count() <= driverMaxEdges) {
      val spark = edges.sparkSession
      val rows = e.collect().map(r => (r.getString(0), r.getString(1)))
      val hubs = rows.map(_._1).distinct
      val auths = rows.map(_._2).distinct
      val M = 1000000L
      var hub = hubs.map(_ -> M).toMap
      var auth = auths.map(_ -> M).toMap
      for (_ <- 1 to iters) {
        val aRaw = scala.collection.mutable.HashMap.empty[String, Long]
          .withDefaultValue(0L)
        rows.foreach { case (h, a) => aRaw(a) += hub(h) }
        val aMx = aRaw.values.max
        auth = auths.map(a => a -> (aRaw(a) * M) / aMx).toMap
        val hRaw = scala.collection.mutable.HashMap.empty[String, Long]
          .withDefaultValue(0L)
        rows.foreach { case (h, a) => hRaw(h) += auth(a) }
        val hMx = hRaw.values.max
        hub = hubs.map(h => h -> (hRaw(h) * M) / hMx).toMap
      }
      import spark.implicits._
      return (hubs.map(h => ("hub", h, hub(h), hub(h).toDouble / 1e6))
        ++ auths.map(a => ("auth", a, auth(a), auth(a).toDouble / 1e6)))
        .toSeq.toDF("side", "node", "score_units", "score")
    }
    def idiv(x: Column, b: Column): Column = ExactArith.floorDiv(x, b)
    val M = 1000000L
    var hub = e.select(col("h").as("v")).distinct()
      .select(col("v"), lit(M).as("s"))
    var auth = e.select(col("a").as("v")).distinct()
      .select(col("v"), lit(M).as("s"))
    // each half-step's state is checkpointed: the hub/auth frames
    // reference EACH OTHER, so without a plan cut the final union
    // re-evaluates the alternating chain ~2^iters times (node-scale
    // frames — the cut is cheap, the re-evaluation is not)
    for (_ <- 1 to iters) {
      val aRaw = e.join(hub.withColumnRenamed("v", "h"), Seq("h"))
        .groupBy(col("a").as("v")).agg(sum("s").as("raw"))
      val aMax = aRaw.agg(max("raw").as("mx"))
      auth = aRaw.crossJoin(broadcast(aMax))
        .select(col("v"), idiv(col("raw") * M, col("mx")).as("s"))
        .localCheckpoint()
      val hRaw = e.join(auth.withColumnRenamed("v", "a"), Seq("a"))
        .groupBy(col("h").as("v")).agg(sum("s").as("raw"))
      val hMax = hRaw.agg(max("raw").as("mx"))
      hub = hRaw.crossJoin(broadcast(hMax))
        .select(col("v"), idiv(col("raw") * M, col("mx")).as("s"))
        .localCheckpoint()
    }
    hub.select(lit("hub").as("side"), col("v").as("node"),
        col("s").as("score_units"),
        (col("s").cast("double") / 1e6).as("score"))
      .unionByName(auth.select(lit("auth").as("side"),
        col("v").as("node"), col("s").as("score_units"),
        (col("s").cast("double") / 1e6).as("score")))
  }

  /** DuckDB replay of [[hits]]; `edgesSql` yields (h, a) rows. */
  def hitsOracleSql(edgesSql: String, iters: Int = 2): String = {
    val steps = (1 to iters).map { k =>
      val ph = if (k == 1) "h0" else s"h${k - 1}"
      s"""a${k}r AS (SELECT e.a AS v, sum(p.s) AS raw
         |  FROM e JOIN $ph p ON p.v = e.h GROUP BY e.a),
         |a$k AS (SELECT v, (raw * 1000000) // (SELECT max(raw)
         |    FROM a${k}r) AS s FROM a${k}r),
         |h${k}r AS (SELECT e.h AS v, sum(p.s) AS raw
         |  FROM e JOIN a$k p ON p.v = e.a GROUP BY e.h),
         |h$k AS (SELECT v, (raw * 1000000) // (SELECT max(raw)
         |    FROM h${k}r) AS s FROM h${k}r)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT DISTINCT CAST(h AS VARCHAR) AS h,
       |    CAST(a AS VARCHAR) AS a FROM ($edgesSql) src0),
       |h0 AS (SELECT DISTINCT h AS v, 1000000 AS s FROM e),
       |$steps
       |SELECT 'hub' AS side, v AS node, CAST(s AS BIGINT)
       |    AS score_units, CAST(s AS DOUBLE) / 1e6 AS score
       |  FROM h$iters
       |UNION ALL
       |SELECT 'auth' AS side, v AS node, CAST(s AS BIGINT)
       |    AS score_units, CAST(s AS DOUBLE) / 1e6 AS score
       |  FROM a$iters""".stripMargin
  }

  /** DuckDB replay of [[clusteringCoefficient]]; `edgesSql` yields
    * (src, dst) rows.
    */
  def clusteringCoefficientOracleSql(edgesSql: String): String =
    s"""WITH e AS (SELECT DISTINCT least(src, dst) AS a,
       |    greatest(src, dst) AS b
       |  FROM ($edgesSql) src0 WHERE src <> dst),
       |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
       |    SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) t
       |  GROUP BY v),
       |nodes AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
       |    CAST(sum(d * (d - 1)) // 2 AS BIGINT) AS n_wedges FROM deg),
       |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
       |tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
       |  FROM e e1 JOIN e e2 ON e1.b = e2.a
       |  JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b)
       |SELECT n_nodes, n_edges, n_wedges, n_triangles,
       |  CASE WHEN n_wedges = 0 THEN NULL
       |    ELSE CAST((2000000 * 3 * n_triangles + n_wedges)
       |      // (2 * n_wedges) AS DOUBLE) / 1e6 END AS global_cc
       |FROM nodes CROSS JOIN ne CROSS JOIN tri""".stripMargin

  /** Deterministic DeepWalk/node2vec-style random walks over the
    * undirected graph — the walk-corpus generator for graph-embedding
    * training (walks in, skip-gram pairs out, [[skipGramPairs]]).
    *
    * Randomness is md5-derived, not seeded RNG: step `t` of walk
    * (start, w) picks neighbor index
    * `word1(md5("salt:start/w:t")) mod degree(cur)` — so the walk
    * corpus is partition-invariant, rerun-stable, and REPLAYABLE IN
    * SQL ([[walkPairsOracleSql]] unrolls one CTE per step with the
    * '0x'-cast idiom every md5-twin oracle uses).
    *
    * Scale shape: adjacency (node, idx, nbr) and degree tables build
    * once (one exchange each, keyed on node) and persist; each step is
    * TWO equi-joins — frontier onto the degree table to compute the
    * chosen index, then onto adjacency on (node, idx) — so a step
    * costs O(frontier), never O(frontier · degree): the hub-fanout of
    * the join-then-filter spelling is designed out. Frontier rows are
    * (start, walk, cur) triples — O(1) state per walk; `walkLen` is
    * bounded so lineage stays shallow, and the returned walk table is
    * localCheckpoint-materialized (callers self-join it for pairs;
    * release via [[Checkpoints.release]]).
    *
    * Dead ends cannot occur: symmetrization gives every edge-touching
    * node degree >= 1; isolated nodes have no adjacency row and are
    * never started.
    *
    * Below `driverMaxEdges` symmetrized edges (and String/integral
    * node ids) the IDENTICAL trajectory runs on driver arrays — the
    * pageRank fast-path contract; the distributed loop remains the
    * 100 TB path and the semantics reference (WalkSpec pins
    * bit-equality).
    *
    * @return (start, walk, step, node), steps 0..walkLen
    */
  def randomWalks(edges: DataFrame, srcCol: String, dstCol: String,
      walkLen: Int = 4, walksPerNode: Int = 2,
      salt: String = "walk", driverMaxEdges: Long = 1000000L): DataFrame = {
    require(walkLen >= 1 && walkLen <= 16,
      s"walkLen must be in [1, 16], got $walkLen")
    require(walksPerNode >= 1 && walksPerNode <= 64,
      s"walksPerNode must be in [1, 64], got $walksPerNode")
    val e0 = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .where(col("a") =!= col("b"))
    val und = e0.unionByName(e0.select(col("b").as("a"), col("a").as("b")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val nodeType = und.schema("a").dataType
    if (driverMaxEdges > 0 && walkFastEligible(nodeType)) {
      val cap = math.min(driverMaxEdges + 1, Int.MaxValue.toLong).toInt
      val probe = und.limit(cap).collect()
      if (probe.length <= driverMaxEdges) {
        und.unpersist()
        return walkFast(edges.sparkSession, probe, nodeType,
          walkLen, walksPerNode, salt, biased = None)
      }
    }
    val adj = und.withColumn("idx", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("a").orderBy("b")) - 1)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = und.groupBy("a").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var cur = deg.select(col("a").as("start"),
        explode(sequence(lit(0), lit(walksPerNode - 1))).as("walk"))
      .select(col("start"), col("walk"), col("start").as("node"))
    val steps = scala.collection.mutable.ArrayBuffer(
      cur.withColumn("step", lit(0)))
    for (t <- 1 to walkLen) {
      // word1 of md5("salt:start/w:t") — 32-bit, so the long is
      // non-negative and pmod == % on both engines.
      val r = conv(substring(md5(concat(lit(s"$salt:"),
          col("start").cast("string"), lit("/"),
          col("walk").cast("string"), lit(s":$t")).cast("binary")),
        1, 8), 16, 10).cast("long")
      cur = cur.join(deg.select(col("a").as("_dn"), col("deg")),
          col("node") === col("_dn"))
        .select(col("start"), col("walk"), col("node"),
          pmod(r, col("deg")).as("_idx"))
        .join(adj.select(col("a").as("_an"), col("idx").as("_ai"),
            col("b").as("_nb")),
          col("node") === col("_an") && col("_idx") === col("_ai"))
        .select(col("start"), col("walk"), col("_nb").as("node"))
      steps += cur.withColumn("step", lit(t))
    }
    val out = steps.reduce(_ unionByName _)
      .select(col("start"), col("walk"), col("step"), col("node"))
      .localCheckpoint()
    und.unpersist(); adj.unpersist(); deg.unpersist()
    out
  }

  /** Driver fast-path walk engine shared by [[randomWalks]] /
    * [[biasedWalks]] (the pageRank driverMaxEdges contract): below
    * the edge bound the graph is model-sized and the distributed
    * loop's cost is pure per-step scheduler overhead, so the
    * IDENTICAL md5 trajectory runs on driver arrays. Only taken for
    * String / integral node ids, where `toString` matches Spark's
    * cast-to-string used in the hash key and the natural ordering
    * matches the adjacency sort; anything else falls through to the
    * distributed loop (the semantics reference, spec-pinned equal).
    */
  private def walkFast(spark: org.apache.spark.sql.SparkSession,
      undRows: Array[org.apache.spark.sql.Row],
      nodeType: org.apache.spark.sql.types.DataType, walkLen: Int,
      walksPerNode: Int, salt: String,
      biased: Option[(Long, Long)]): DataFrame = {
    def word(s: String, i: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      ((d(4 * i) & 0xffL) << 24) | ((d(4 * i + 1) & 0xffL) << 16) |
        ((d(4 * i + 2) & 0xffL) << 8) | (d(4 * i + 3) & 0xffL)
    }
    val und = undRows.iterator.map(r => (r.get(0), r.get(1))).toSet
    val cmp: Ordering[Any] = new Ordering[Any] {
      def compare(x: Any, y: Any): Int = (x, y) match {
        case (a: String, b: String) => a.compareTo(b)
        case (a: Number, b: Number) =>
          java.lang.Long.compare(a.longValue(), b.longValue())
        case _ => throw new IllegalStateException("unsupported node type")
      }
    }
    val adj: Map[Any, IndexedSeq[Any]] = und.groupBy(_._1)
      .map { case (a, es) => a -> es.map(_._2).toIndexedSeq.sorted(cmp) }
    val rows = for {
      start <- adj.keys.toSeq
      w <- 0 until walksPerNode
    } yield {
      val ss = start.toString
      var prev: Any = null
      var cur = start
      val path = scala.collection.mutable.ArrayBuffer[Any](start)
      for (t <- 1 to walkLen) {
        val nbrs = adj(cur)
        val next = (if (t == 1 || biased.isEmpty) {
          nbrs((word(s"$salt:$ss/$w:$t", 0) % nbrs.size).toInt)
        } else {
          val (retW, outW) = biased.get
          val wgts = nbrs.map { x =>
            if (x == prev) retW
            else if (und.contains(prev -> x)) 1000000L
            else outW
          }
          val r = (word(s"$salt:$ss/$w:$t", 0) % 1073741824L) *
            4294967296L + word(s"$salt:$ss/$w:$t", 1)
          val rm = r % wgts.sum
          var cum = 0L; var pick = nbrs.head
          nbrs.zip(wgts).foreach { case (x, wg) =>
            if (cum <= rm && rm < cum + wg) pick = x
            cum += wg
          }
          pick
        })
        prev = cur; cur = next
        path += cur
      }
      (start, w, path.toSeq)
    }
    val out = rows.flatMap { case (start, w, path) =>
      path.zipWithIndex.map { case (n, t) =>
        org.apache.spark.sql.Row(start, w, t, n)
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("start", nodeType),
      org.apache.spark.sql.types.StructField("walk",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("step",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("node", nodeType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out,
        math.max(1, spark.sparkContext.defaultParallelism)), schema)
  }

  private def walkFastEligible(dt: org.apache.spark.sql.types.DataType)
      : Boolean = dt match {
    case org.apache.spark.sql.types.StringType |
         org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.LongType => true
    case _ => false
  }

  /** Degree assortativity (Newman 2002) + rich-club coefficient
    * (Zhou & Mondragón 2004) — the mixing-pattern scoreboard beside
    * [[clusteringCoefficient]]: assortativity is the Pearson
    * correlation of endpoint degrees over the SYMMETRIZED edge list
    * (each undirected edge contributes both orderings — Newman's
    * convention, which makes the two marginals identical);
    * rich-club φ(k) is the edge density among nodes of degree > k.
    * Crawl/interaction graphs are typically disassortative (hubs
    * link to leaves); a dedup graph drifting assortative with a
    * dense rich club is template mass.
    *
    * Exactness: degrees are longs; every Pearson moment is an exact
    * integer sum (Σjk, Σj, Σj² over the edge list — ANSI-loud past
    * 2^63); the two final divisions run in doubles with a fixed
    * order, rounded 6dp at publication exactly as the oracle
    * replays. φ's numerator/denominator are published as exact
    * integers beside the 6dp ratio.
    *
    * Scale shape: one degree aggregation, one edge⋈degree equi-join
    * per endpoint (shuffles keyed on node ids), then a single
    * global aggregate — nothing quadratic; the rich-club filter
    * reuses the joined frame.
    *
    * @return one row: (n_nodes, n_edges, assortativity, k_rich,
    *         n_rich, e_rich, phi_rich)
    */
  def degreeMixing(edges: DataFrame, srcCol: String, dstCol: String,
      kRich: Long): DataFrame = {
    require(kRich >= 1, s"kRich must be >= 1, got $kRich")
    val e0 = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .where(col("a") =!= col("b"))
    val und = e0.unionByName(e0.select(col("b").as("a"), col("a").as("b")))
      .distinct()
    val deg = und.groupBy("a").agg(count(lit(1)).as("deg"))
    val j = und
      .join(deg.select(col("a").as("_da"), col("deg").as("ja")),
        col("a") === col("_da"))
      .join(deg.select(col("a").as("_db"), col("deg").as("jb")),
        col("b") === col("_db"))
      .select(col("a"), col("b"), col("ja"), col("jb"))
    val stats = j.agg(
      count(lit(1)).as("m"),
      sum(col("ja") * col("jb")).as("sjk"),
      sum(col("ja")).as("sj"),
      sum(col("ja") * col("ja")).as("sj2"),
      sum(when(col("ja") > kRich && col("jb") > kRich, 1L)
        .otherwise(0L)).as("e_rich2"))
    val nn = deg.agg(count(lit(1)).as("n_nodes"),
      sum(when(col("deg") > kRich, 1L).otherwise(0L)).as("n_rich"))
    // Pearson over the symmetric list: marginals of ja and jb are
    // identical, so one set of (Σj, Σj²) moments serves both sides.
    stats.crossJoin(broadcast(nn))
      .select(col("n_nodes"),
        expr("m div 2").as("n_edges"),
        // a REGULAR graph (all degrees equal) has zero variance —
        // null, not NaN (cliques are a real dedup shape)
        when(col("m") * col("sj2") - col("sj") * col("sj") === 0L,
            lit(null).cast("double"))
          .otherwise(round((col("m").cast("double") * col("sjk") -
              col("sj").cast("double") * col("sj")) /
            (col("m").cast("double") * col("sj2") -
              col("sj").cast("double") * col("sj")), 6))
          .as("assortativity"),
        lit(kRich).as("k_rich"), col("n_rich"),
        expr("e_rich2 div 2").as("e_rich"),
        when(col("n_rich") < 2, lit(null).cast("double"))
          .otherwise(round(col("e_rich2").cast("double") /
            (col("n_rich") * (col("n_rich") - 1)), 6))
          .as("phi_rich"))
  }

  /** Newman modularity of a GIVEN node partition (Newman & Girvan
    * 2004): Q = Σ_c (e_c/m − (d_c/2m)²) over communities c — the
    * community-quality audit for any labeling the pipeline already
    * owns (connected dup components, domain labels, geographic
    * partitions). Q > 0 means denser-than-chance within labels.
    *
    * Exactness: e_c (intra-community edge endpoints), d_c (degree
    * mass) and 2m are exact longs; each community's contribution is
    * (e_c2·2m − d_c²)·1e6 / (2m)² with every product double-FIRST in
    * a fixed order (IEEE mult/div are correctly rounded, so both
    * engines compute identical bits; long-first products would
    * ANSI-fail past 2^63 at crawl-graph scale), micro-rounded once
    * per community — any later total is an order-free long sum.
    *
    * Scale shape: one degree agg, one labels⋈edges join per
    * endpoint (shuffles on node ids), one |communities|-row
    * aggregate. Labels for both endpoints join from the same
    * broadcast-or-shuffled label frame; nothing quadratic.
    *
    * Contract: edges whose endpoint is MISSING from `labels` drop
    * from the graph (inner label join — 2m counts labeled endpoints
    * only), and `n_nodes` counts the LABELS frame per community,
    * including nodes that touch no edge.
    *
    * @return one row per community: (lbl, n_nodes, d_c, e_c,
    *         q_contrib_micro); Q = Σ q_contrib_micro / 1e6
    */
  def modularityByCommunity(edges: DataFrame, srcCol: String,
      dstCol: String, labels: DataFrame, nodeCol: String,
      labelCol: String): DataFrame = {
    val e0 = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .where(col("a") =!= col("b"))
    val und = e0.unionByName(e0.select(col("b").as("a"), col("a").as("b")))
      .distinct()
    val lab = labels.select(col(nodeCol).as("_n"), col(labelCol).as("lbl"))
    val j = und
      .join(lab.select(col("_n").as("_na"), col("lbl").as("la")),
        col("a") === col("_na"))
      .join(lab.select(col("_n").as("_nb"), col("lbl").as("lb")),
        col("b") === col("_nb"))
    val m2 = j.agg(count(lit(1)).as("m2")) // = 2m directed endpoints
    val deg = j.groupBy(col("la").as("lbl"))
      .agg(count(lit(1)).as("d_c"),
        sum(when(col("la") === col("lb"), 1L).otherwise(0L)).as("e_c2"))
    val nodes = lab.groupBy("lbl").agg(count(lit(1)).as("n_nodes"))
    deg.join(nodes, "lbl").crossJoin(broadcast(m2))
      .select(col("lbl"), col("n_nodes"), col("d_c"),
        expr("e_c2 div 2").as("e_c"),
        // q_c = e_c2/m2 − (d_c/m2)² on the micro grid. Products run
        // DOUBLE-first (IEEE mult is correctly rounded, so both
        // engines compute identical bits; long-first would ANSI-fail
        // past 2^63 at crawl-graph scale).
        round((col("e_c2").cast("double") * col("m2").cast("double") -
            col("d_c").cast("double") * col("d_c").cast("double")) * 1e6 /
          (col("m2").cast("double") * col("m2").cast("double")), 0)
          .cast("long").as("q_contrib_micro"))
      .orderBy("lbl")
  }

  /** DuckDB replay of [[modularityByCommunity]]; `edgesSql` yields
    * (src, dst), `labelsSql` yields (node, lbl). */
  def modularityOracleSql(edgesSql: String, labelsSql: String): String =
    s"""WITH e00 AS (SELECT src AS a, dst AS b FROM ($edgesSql) eraw
       |  WHERE src <> dst),
       |e AS MATERIALIZED (SELECT DISTINCT a, b FROM
       |  (SELECT a, b FROM e00 UNION ALL SELECT b AS a, a AS b FROM e00) u),
       |lab AS (SELECT node AS n, lbl FROM ($labelsSql) ls),
       |j AS (SELECT e.a, e.b, la.lbl AS la, lb.lbl AS lb
       |  FROM e JOIN lab la ON e.a = la.n JOIN lab lb ON e.b = lb.n),
       |m2 AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM j),
       |dc AS (SELECT la AS lbl, CAST(count(*) AS BIGINT) AS d_c,
       |    CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
       |      AS e_c2
       |  FROM j GROUP BY 1),
       |nn AS (SELECT lbl, CAST(count(*) AS BIGINT) AS n_nodes
       |  FROM lab GROUP BY lbl)
       |SELECT dc.lbl, n_nodes, d_c, e_c2 // 2 AS e_c,
       |  CAST(round((CAST(e_c2 AS DOUBLE) * CAST(m2 AS DOUBLE)
       |      - CAST(d_c AS DOUBLE) * CAST(d_c AS DOUBLE)) * 1e6 /
       |    (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)), 0) AS BIGINT)
       |    AS q_contrib_micro
       |FROM dc JOIN nn ON dc.lbl = nn.lbl CROSS JOIN m2
       |ORDER BY dc.lbl""".stripMargin

  /** DuckDB replay of [[degreeMixing]]. */
  def degreeMixingOracleSql(edgesSql: String, kRich: Long): String =
    s"""WITH e00 AS (SELECT src AS a, dst AS b FROM ($edgesSql) eraw
       |  WHERE src <> dst),
       |e AS MATERIALIZED (SELECT DISTINCT a, b FROM
       |  (SELECT a, b FROM e00 UNION ALL SELECT b AS a, a AS b FROM e00) u),
       |deg AS (SELECT a, CAST(count(*) AS BIGINT) AS deg
       |  FROM e GROUP BY a),
       |j AS (SELECT e.a, e.b, da.deg AS ja, db.deg AS jb
       |  FROM e JOIN deg da ON e.a = da.a JOIN deg db ON e.b = db.a),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS m,
       |    CAST(sum(ja * jb) AS BIGINT) AS sjk,
       |    CAST(sum(ja) AS BIGINT) AS sj,
       |    CAST(sum(ja * ja) AS BIGINT) AS sj2,
       |    CAST(sum(CASE WHEN ja > $kRich AND jb > $kRich
       |      THEN 1 ELSE 0 END) AS BIGINT) AS e_rich2
       |  FROM j),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
       |    CAST(sum(CASE WHEN deg > $kRich THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_rich FROM deg)
       |SELECT n_nodes, m // 2 AS n_edges,
       |  CASE WHEN m * sj2 - sj * sj = 0 THEN NULL
       |    ELSE round((CAST(m AS DOUBLE) * sjk - CAST(sj AS DOUBLE) * sj)
       |      / (CAST(m AS DOUBLE) * sj2 - CAST(sj AS DOUBLE) * sj), 6)
       |    END AS assortativity,
       |  CAST($kRich AS BIGINT) AS k_rich, n_rich,
       |  e_rich2 // 2 AS e_rich,
       |  CASE WHEN n_rich < 2 THEN NULL
       |    ELSE round(CAST(e_rich2 AS DOUBLE) /
       |      (n_rich * (n_rich - 1)), 6) END AS phi_rich
       |FROM st CROSS JOIN nn""".stripMargin

  /** k-core decomposition for a fixed k (Seidman 1983): repeatedly
    * peel nodes of degree < k until the survivor subgraph is stable —
    * the dense-cluster extractor beside [[connectedComponents]]
    * (reachability) and [[clusteringCoefficient]] (cohesion): in a
    * dedup graph the k-core isolates template families too dense to
    * be organic; in an interaction graph it isolates the loyal core.
    *
    * Scale shape: each peel round is ONE degree aggregation (map-side
    * combined, keyed on node) and two anti joins removing peeled
    * endpoints — all shuffles on node ids, nothing global; rounds end
    * in localCheckpoint (the CC loop discipline — constant per-round
    * cost) and stop via the changed-row probe, so a graph that peels
    * in 3 rounds pays 3, not a fixed budget. Peel depth is the
    * degeneracy ordering's round count — small for the near-clique
    * graphs dedup emits; `maxRounds` fails loudly on adversarial
    * chains rather than looping.
    *
    * @return (node, core_deg): k-core members with their degree
    *         INSIDE the core subgraph
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxRounds: Int = 100): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val e0 = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .where(col("a") =!= col("b"))
    var e = e0.unionByName(e0.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint()
    var rounds = 0
    var done = false
    while (!done) {
      rounds += 1
      require(rounds <= maxRounds,
        s"kCore did not converge within $maxRounds rounds")
      val deg = e.groupBy("a").agg(count(lit(1)).as("deg"))
      val bad = deg.where(col("deg") < k).select(col("a").as("_bad"))
        .localCheckpoint()
      if (bad.isEmpty) done = true
      else {
        val prev = e
        e = e.join(bad, col("a") === col("_bad"), "left_anti")
          .join(bad, col("b") === col("_bad"), "left_anti")
          .localCheckpoint()
        releaseCheckpoint(prev); releaseCheckpoint(bad)
      }
    }
    e.groupBy(col("a").as("node")).agg(count(lit(1)).as("core_deg"))
      .orderBy("node")
  }

  /** DuckDB replay of [[kCore]]: `unrollRounds` peel rounds unrolled
    * as CTE pairs. Correct whenever the graph converges within the
    * unroll (extra rounds are no-ops once stable); a graph needing
    * more rounds hash-MISMATCHES loudly instead of silently passing —
    * size the unroll generously for the corpus.
    */
  def kCoreOracleSql(edgesSql: String, k: Int,
      unrollRounds: Int = 8): String = {
    val rounds = (1 to unrollRounds).map { i =>
      val p = i - 1
      s"""e$i AS MATERIALIZED (
         | SELECT a, b FROM e$p
         | WHERE a NOT IN (SELECT a FROM (SELECT a, count(*) AS d
         |     FROM e$p GROUP BY a) dd WHERE d < $k)
         |   AND b NOT IN (SELECT a FROM (SELECT a, count(*) AS d
         |     FROM e$p GROUP BY a) dd WHERE d < $k))""".stripMargin
    }.mkString(",\n")
    s"""WITH e00 AS (SELECT src AS a, dst AS b FROM ($edgesSql) eraw
       |  WHERE src <> dst),
       |e0 AS MATERIALIZED (SELECT DISTINCT a, b FROM
       |  (SELECT a, b FROM e00 UNION ALL SELECT b AS a, a AS b FROM e00) u),
       |$rounds
       |SELECT a AS node, CAST(count(*) AS BIGINT) AS core_deg
       |FROM e$unrollRounds GROUP BY a ORDER BY node""".stripMargin
  }

  /** Second-order (p, q)-biased walks — node2vec proper (Grover &
    * Leskovec 2016) beside [[randomWalks]]' uniform DeepWalk: from
    * edge (prev → cur), neighbor x of cur weighs 1/p when x = prev
    * (return), 1 when x is also prev's neighbor (BFS-ish stay), 1/q
    * otherwise (DFS-ish explore). Weights live on the integer micro
    * grid (round(1e6/p) etc.), the walk key draws a 62-bit
    * md5-derived integer, and the pick is the first neighbor whose
    * cumulative weight exceeds key mod total — deterministic,
    * partition-invariant, SQL-replayable ([[biasedWalksOracleSql]]).
    * Step 1 has no prev and is uniform, exactly [[randomWalks]]' rule.
    *
    * Scale shape: a second-order walk must CLASSIFY every neighbor of
    * cur against prev, so a step inherently costs O(Σ deg(cur)) — the
    * candidate fan-out is the algorithm, not a spelling accident
    * (the alias-table preprocessing of the reference implementation
    * trades it for O(Σ_(u,v) deg(v)) memory, strictly worse at
    * crawl-graph scale). Each step is: one equi-join onto adjacency,
    * one LEFT equi-join onto the edge set for the BFS flag, one
    * per-walk window (shuffles keyed on the walk id). State per walk
    * is (prev, cur) — O(1); the returned table is checkpoint-
    * materialized like [[randomWalks]].
    *
    * @return (start, walk, step, node), steps 0..walkLen
    */
  def biasedWalks(edges: DataFrame, srcCol: String, dstCol: String,
      walkLen: Int = 4, walksPerNode: Int = 2, p: Double = 1.0,
      q: Double = 1.0, salt: String = "walk",
      driverMaxEdges: Long = 1000000L): DataFrame = {
    require(walkLen >= 1 && walkLen <= 16,
      s"walkLen must be in [1, 16], got $walkLen")
    require(walksPerNode >= 1 && walksPerNode <= 64,
      s"walksPerNode must be in [1, 64], got $walksPerNode")
    require(p > 0.0 && q > 0.0, s"p/q must be positive, got $p/$q")
    val retW = math.round(1e6 / p); val outW = math.round(1e6 / q)
    require(retW >= 1 && outW >= 1, s"p/q too large: micro weights 0")
    val wWin = org.apache.spark.sql.expressions.Window
      .partitionBy("start", "walk")
    val e0 = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .where(col("a") =!= col("b"))
    val und = e0.unionByName(e0.select(col("b").as("a"), col("a").as("b")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val nodeType = und.schema("a").dataType
    if (driverMaxEdges > 0 && walkFastEligible(nodeType)) {
      val cap = math.min(driverMaxEdges + 1, Int.MaxValue.toLong).toInt
      val probe = und.limit(cap).collect()
      if (probe.length <= driverMaxEdges) {
        und.unpersist()
        return walkFast(edges.sparkSession, probe, nodeType,
          walkLen, walksPerNode, salt, biased = Some((retW, outW)))
      }
    }
    val adj = und.withColumn("idx", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("a").orderBy("b")) - 1)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = und.groupBy("a").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    def hx(t: Int) = md5(concat(lit(s"$salt:"),
      col("start").cast("string"), lit("/"),
      col("walk").cast("string"), lit(s":$t")).cast("binary"))
    // step 0 + uniform step 1 (no prev yet — the randomWalks rule)
    val s0 = deg.select(col("a").as("start"),
        explode(sequence(lit(0), lit(walksPerNode - 1))).as("walk"))
      .select(col("start"), col("walk"), col("start").as("node"))
    val r1 = conv(substring(hx(1), 1, 8), 16, 10).cast("long")
    var cur = s0.join(deg.select(col("a").as("_dn"), col("deg")),
        col("node") === col("_dn"))
      .select(col("start"), col("walk"), col("node"),
        pmod(r1, col("deg")).as("_idx"))
      .join(adj.select(col("a").as("_an"), col("idx").as("_ai"),
          col("b").as("_nb")),
        col("node") === col("_an") && col("_idx") === col("_ai"))
      .select(col("start"), col("walk"), col("node").as("prev"),
        col("_nb").as("node"))
    val steps = scala.collection.mutable.ArrayBuffer(
      s0.withColumn("step", lit(0)).select("start", "walk", "step", "node"),
      cur.withColumn("step", lit(1)).select("start", "walk", "step", "node"))
    for (t <- 2 to walkLen) {
      // 62-bit key: (word1 mod 2^30)·2^32 + word2 — long-safe, and
      // the identical spelling replays in SQL.
      val r = (pmod(conv(substring(hx(t), 1, 8), 16, 10).cast("long"),
          lit(1073741824L)) * 4294967296L +
        conv(substring(hx(t), 9, 8), 16, 10).cast("long")).as("_r")
      val cand = cur.join(adj.select(col("a").as("_ca"),
            col("b").as("_x")), col("node") === col("_ca"))
        .join(und.select(col("a").as("_ma"), col("b").as("_mbf"),
            lit(1).as("_isn")),
          col("prev") === col("_ma") && col("_x") === col("_mbf"),
          "left")
        .select(col("start"), col("walk"), col("node"), col("_x"),
          when(col("_x") === col("prev"), lit(retW))
            .when(col("_isn").isNotNull, lit(1000000L))
            .otherwise(lit(outW)).as("_wgt"), r)
      val cumd = cand
        .withColumn("_cum", sum("_wgt").over(
          wWin.orderBy("_x").rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
        .withColumn("_tot", sum("_wgt").over(wWin))
      cur = cumd
        .where(col("_cum") - col("_wgt") <= pmod(col("_r"), col("_tot")) &&
          pmod(col("_r"), col("_tot")) < col("_cum"))
        .select(col("start"), col("walk"), col("node").as("prev"),
          col("_x").as("node"))
      steps += cur.withColumn("step", lit(t))
        .select("start", "walk", "step", "node")
    }
    val out = steps.reduce(_ unionByName _).localCheckpoint()
    und.unpersist(); adj.unpersist(); deg.unpersist()
    out
  }

  /** DuckDB replay of [[biasedWalks]]: identical uniform first step,
    * per-step candidate classification (return / BFS-neighbor /
    * explore), micro cumulative weights, 62-bit key pick.
    */
  def biasedWalksOracleSql(edgesSql: String, walkLen: Int,
      walksPerNode: Int, p: Double, q: Double,
      salt: String = "walk"): String = {
    val retW = math.round(1e6 / p); val outW = math.round(1e6 / q)
    def h(t: Int) =
      s"md5('$salt:' || CAST(s.start AS VARCHAR) || '/' || " +
        s"CAST(s.walk AS VARCHAR) || ':$t')"
    val stepCtes = (2 to walkLen).map { t =>
      val pp = t - 1
      s"""c$t AS MATERIALIZED (
         | SELECT s.start, s.walk, s.node AS cur, adj.b AS x,
         |   CASE WHEN adj.b = s.prev THEN $retW
         |     WHEN m.a IS NOT NULL THEN 1000000
         |     ELSE $outW END AS wgt,
         |   (CAST('0x' || substr(${h(t)}, 1, 8) AS BIGINT) % 1073741824)
         |     * 4294967296 + CAST('0x' || substr(${h(t)}, 9, 8) AS BIGINT)
         |     AS r
         | FROM s$pp s
         | JOIN adj ON adj.a = s.node
         | LEFT JOIN e m ON m.a = s.prev AND m.b = adj.b),
         |w$t AS MATERIALIZED (
         | SELECT start, walk, cur, x, wgt, r,
         |   sum(wgt) OVER (PARTITION BY start, walk ORDER BY x
         |     ROWS UNBOUNDED PRECEDING) AS cum,
         |   sum(wgt) OVER (PARTITION BY start, walk) AS tot
         | FROM c$t),
         |s$t AS MATERIALIZED (
         | SELECT start, walk, cur AS prev, x AS node
         | FROM w$t WHERE cum - wgt <= r % tot AND r % tot < cum)""".stripMargin
    }.mkString(",\n")
    val tail = if (walkLen >= 2) ",\n" + stepCtes else ""
    val unions = (s"SELECT start, walk, 0 AS step, start AS node FROM s0d" +:
      (1 to walkLen).map(t =>
        s"SELECT start, walk, $t AS step, node FROM s$t"))
      .mkString("\n  UNION ALL ")
    s"""WITH e0 AS (SELECT src AS a, dst AS b FROM ($edgesSql) eraw
       |  WHERE src <> dst),
       |e AS MATERIALIZED (SELECT DISTINCT a, b FROM
       |  (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0) u),
       |adj AS MATERIALIZED (SELECT a, b,
       |  row_number() OVER (PARTITION BY a ORDER BY b) - 1 AS idx FROM e),
       |deg AS MATERIALIZED (SELECT a, CAST(count(*) AS BIGINT) AS deg
       |  FROM e GROUP BY a),
       |s0d AS MATERIALIZED (SELECT deg.a AS start, w.walk
       |  FROM deg CROSS JOIN
       |    (SELECT unnest(range(0, $walksPerNode)) AS walk) w),
       |s1 AS MATERIALIZED (
       | SELECT s.start, s.walk, s.start AS prev, adj.b AS node
       | FROM s0d s
       | JOIN deg ON deg.a = s.start
       | JOIN adj ON adj.a = s.start AND adj.idx = CAST('0x' ||
       |   substr(md5('$salt:' || CAST(s.start AS VARCHAR) || '/' ||
       |   CAST(s.walk AS VARCHAR) || ':1'), 1, 8) AS BIGINT) % deg.deg)$tail
       |SELECT start, walk, step, node FROM (
       |  $unions) walks
       |ORDER BY start, walk, step""".stripMargin
  }

  /** Skip-gram co-occurrence pairs from a [[randomWalks]] table: for
    * every walk, all ordered (center, context) position pairs within
    * `window` steps, counted. The self-join is EQUI on the walk id
    * (start, walk) — per-walk fan-out is the fixed (walkLen+1)² grid,
    * so cost is linear in walks, and the count map-side combines.
    *
    * @return (center, context, pair_n) ordered (pair_n desc, center,
    *         context)
    */
  def skipGramPairs(walks: DataFrame, window: Int = 2): DataFrame = {
    require(window >= 1 && window <= 16,
      s"window must be in [1, 16], got $window")
    val l = walks.select(col("start").as("_s"), col("walk").as("_w"),
      col("step").as("_i"), col("node").as("center"))
    val r = walks.select(col("start").as("_s2"), col("walk").as("_w2"),
      col("step").as("_j"), col("node").as("context"))
    l.join(r, col("_s") === col("_s2") && col("_w") === col("_w2") &&
        col("_i") =!= col("_j") &&
        abs(col("_i") - col("_j")) <= window)
      .groupBy("center", "context").agg(count(lit(1)).as("pair_n"))
      .orderBy(col("pair_n").desc, col("center"), col("context"))
  }

  /** DuckDB replay of [[randomWalks]] + [[skipGramPairs]]: identical
    * symmetrization, md5-indexed neighbor choice unrolled one CTE per
    * step, identical pair grid. `edgesSql` must yield (src, dst).
    */
  def walkPairsOracleSql(edgesSql: String, walkLen: Int,
      walksPerNode: Int, window: Int, salt: String = "walk"): String = {
    val stepCtes = (1 to walkLen).map { t =>
      val p = t - 1
      // no continuation line may START with '|': this text is embedded
      // in the outer template and stripMargin runs over it a second
      // time there (the double-strip trap).
      s"""s$t AS MATERIALIZED (
         | SELECT s.start, s.walk, adj.b AS node
         | FROM s$p s
         | JOIN deg ON deg.a = s.node
         | JOIN adj ON adj.a = s.node AND adj.idx = CAST('0x' ||
         |   substr(md5('$salt:' || CAST(s.start AS VARCHAR) || '/' ||
         |   CAST(s.walk AS VARCHAR) || ':$t'), 1, 8) AS BIGINT) % deg.deg)""".stripMargin
    }.mkString(",\n")
    val unions = (0 to walkLen).map(t =>
      s"SELECT start, walk, $t AS step, node FROM s$t")
      .mkString("\n  UNION ALL ")
    s"""WITH e0 AS (SELECT src AS a, dst AS b FROM ($edgesSql) eraw
       |  WHERE src <> dst),
       |e AS MATERIALIZED (SELECT DISTINCT a, b FROM
       |  (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0) u),
       |adj AS MATERIALIZED (SELECT a, b,
       |  row_number() OVER (PARTITION BY a ORDER BY b) - 1 AS idx FROM e),
       |deg AS MATERIALIZED (SELECT a, CAST(count(*) AS BIGINT) AS deg
       |  FROM e GROUP BY a),
       |s0 AS MATERIALIZED (SELECT deg.a AS start, w.walk, deg.a AS node
       |  FROM deg CROSS JOIN
       |    (SELECT unnest(range(0, $walksPerNode)) AS walk) w),
       |$stepCtes,
       |walks AS MATERIALIZED (
       |  $unions)
       |SELECT l.node AS center, r.node AS context,
       |  CAST(count(*) AS BIGINT) AS pair_n
       |FROM walks l JOIN walks r ON l.start = r.start AND l.walk = r.walk
       |  AND l.step <> r.step AND abs(l.step - r.step) <= $window
       |GROUP BY 1, 2
       |ORDER BY pair_n DESC, center, context""".stripMargin
  }
}
