package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale notes (100 TB design):
  *  - brute-force top-k broadcasts the (small) query set against the
  *    candidate corpus — one scan, no shuffle for the dot products, a
  *    single top-k-per-query window at the end (partial top-k happens
  *    map-side via the rank window's sort within partitions after a
  *    shuffle keyed by query — at 1000 executors the corpus scan is the
  *    dominant, perfectly parallel cost).
  *  - the LSH variant buckets the corpus by deterministic random-
  *    hyperplane sign bits so each query only meets its bucket; recall
  *    is tuned by `nbits` (fewer bits = bigger buckets = higher recall).
  *  - all math is done in double (exact float->double widening) so
  *    results are reproducible across engines.
  */
object SimilarityOps {

  /** Dot product of two array<double> columns (sequential fold — the
    * same associativity every engine's simple loop uses).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0d), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Composed-built-ins cosine (reference form; bit-identical to the
    * native expression below, which fuses the three passes).
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Native fused cosine (graft.functions.CosineSimilarity, codegen'd):
    * no intermediate array allocation, one pass per input. Registered
    * on demand in the DataFrame's session.
    */
  private def nativeCosine(df: DataFrame)(a: Column, b: Column): Column = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    call_function("graft_cosine", a, b)
  }

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact brute-force cosine top-k: for each query vector, the k most
    * similar corpus vectors (excluding itself). Ties broken by id.
    */
  def knnBrute(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int): DataFrame = {
    // parallelism floor: the O(n·q) cosine scan below happens on the
    // streamed side of a broadcast join — a single-split input would
    // run the whole thing on one core (guide §2.5)
    val base = SkewOps.parallelismFloor(
      emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v")))
    val q = base.filter(queryPred).select(col("id").as("query_id"), col("v").as("qv"))
    // Rank on the ROUNDED similarity (ties broken by id) so sub-ulp
    // engine differences in the dot-product fold can't flip the top-k
    // membership vs the oracle.
    val sims = base.join(broadcast(q), col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("cand_id"),
        round(nativeCosine(emb)(col("qv"), col("v")), 6).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
    sims.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"))
  }

  /** Farthest-point (k-center greedy, Gonzalez 1985) coreset — the
    * diversity-first data selector beside [[mmrTop3]]'s
    * relevance-diversity re-ranking: pick the md5-min seed, then k−1 times the
    * vector FARTHEST from everything chosen (max min-distance, the
    * 2-approximation to the k-center cover). The selected set is a
    * geometric skeleton of the corpus — finetuning-subset /
    * eval-probe / codebook-seed construction.
    *
    * Determinism: distances round to 5dp before every comparison
    * (the IVF assignment contract), argmax ties break id-ASC, and
    * the seed is the md5-smallest id — partition-invariant and
    * replayable in SQL ([[farthestPointOracleSql]] unrolls one CTE
    * pair per pick).
    *
    * Scale shape: the state is ONE (id, v, dmin) frame; each round
    * is a narrow map against the single broadcast new center
    * (dmin = least(dmin, d(v, c))) plus a 1-row max-struct aggregate
    * — no joins, no windows, no shuffle of the corpus; rounds end in
    * localCheckpoint (the CC loop discipline), and only k rows ever
    * reach the driver. k is bounded (≤ 64).
    *
    * @return (rank, id, dist_units): dist_units = the 5dp min-dist
    *         ·1e5 at selection time (0 for the seed)
    */
  def farthestPointSample(emb: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    require(k >= 2 && k <= 64, s"k must be in [2, 64], got $k")
    val spark = emb.sparkSession
    import spark.implicits._
    val base = emb.select(col(idCol).cast("long").as("id"),
      asDouble(col(vecCol)).as("v"))
    val seedRow = base
      .withColumn("_c", md5(concat(lit("fps:"), col("id").cast("string"))))
      .orderBy(col("_c"), col("id")).limit(1)
      .select(col("id"), col("v")).collect().head
    val picked = scala.collection.mutable.ArrayBuffer(
      (1, seedRow.getLong(0), 0L))
    var cur = seedRow.getSeq[Double](1)
    var st = base.select(col("id"), col("v"),
      lit(Long.MaxValue).as("dmin")).localCheckpoint()
    for (r <- 2 to k) {
      val cArr = typedlit(cur)
      val d = round(sqrt(aggregate(zip_with(col("v"), cArr,
          (a, b) => (a - b) * (a - b)), lit(0.0), _ + _)) * 1e5, 0)
        .cast("long")
      val prev = st
      st = st.select(col("id"), col("v"),
        least(col("dmin"), d).as("dmin")).localCheckpoint()
      releaseCheckpoint(prev)
      // max dmin, ties id-asc: max of (dmin, -id) structs
      val top = st.agg(max(struct(col("dmin"), (-col("id")).as("ni"),
        col("v"))).as("t")).select(col("t.*")).collect().head
      val id = -top.getLong(1)
      picked += ((r, id, top.getLong(0)))
      cur = top.getSeq[Double](2)
    }
    releaseCheckpoint(st)
    picked.toSeq.toDF("rank", "id", "dist_units")
  }

  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false); ()
      case _ => ()
    }

  /** DuckDB replay of [[farthestPointSample]]: identical seed rule,
    * 5dp distance grid, max-min picks with id-asc ties, unrolled one
    * CTE pair per round.
    */
  def farthestPointOracleSql(table: String, idCol: String,
      vecCol: String, k: Int): String = {
    val rounds = (2 to k).map { r =>
      val p = r - 1
      s"""d$r AS MATERIALIZED (
         | SELECT s.id, s.v, least(s.dmin, CAST(round(sqrt(list_sum(
         |     list_transform(generate_series(1, len(s.v)),
         |       j -> (s.v[j] - c$p.v[j]) * (s.v[j] - c$p.v[j]))))
         |     * 1e5, 0) AS BIGINT)) AS dmin
         | FROM d$p s CROSS JOIN c$p),
         |c$r AS MATERIALIZED (
         | SELECT id, v, dmin FROM d$r
         | ORDER BY dmin DESC, id ASC LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val outs = (s"SELECT 1 AS rank, id, CAST(0 AS BIGINT) AS dist_units" +
      " FROM c1") +:
      (2 to k).map(r =>
        s"SELECT $r AS rank, id, dmin AS dist_units FROM c$r")
    s"""WITH base AS (SELECT CAST($idCol AS BIGINT) AS id,
       |    CAST($vecCol AS DOUBLE[]) AS v FROM $table),
       |c1 AS MATERIALIZED (SELECT id, v FROM base
       |  ORDER BY md5('fps:' || CAST(id AS VARCHAR)), id LIMIT 1),
       |d1 AS MATERIALIZED (SELECT id, v,
       |  CAST(9223372036854775807 AS BIGINT) AS dmin FROM base),
       |$rounds
       |${outs.mkString("\n  UNION ALL ")}
       |ORDER BY rank""".stripMargin
  }

  /** Grid DBSCAN over 2-D coordinates (Ester et al. 1996) — the
    * DENSITY clustering family beside the centroid one
    * ([[kmeansAssign]]/[[simplifiedSilhouette]]): arbitrary-shape
    * clusters plus an explicit NOISE class, the outlier-aware
    * grouping a quality/embedding scatter needs where k-means forces
    * every point into a ball.
    *
    * Exactness is TOTAL — there is no float gate anywhere: points
    * land on the micro grid, the eps test is the integer comparison
    * dx² + dy² ≤ eps² (coordinate magnitudes bounded by the micro
    * grid to ±~10⁹, squares to 2^63 ANSI-loud), cells are exact
    * floor divisions, and cluster labels are min-reachable-id
    * components.
    *
    * Scale shape: the neighbor search is the classic eps-grid
    * spatial join — one side fans to its 9 neighbor cells (constant
    * factor), then ONE equi-join on the cell key; no cartesian, no
    * windows. Core flags are a map-combined count; the component
    * step runs on the CORE-CORE edge set only
    * ([[GraphOps.connectedComponents]], min-label,
    * localCheckpoint-bounded rounds); border points attach by one
    * more bounded join. Density caps: a pathological all-points-in-
    * one-cell input degrades to that cell's pair count — eps chosen
    * sanely keeps cells O(minPts)-sized.
    *
    * @return (id, n_nbrs, role core/border/noise, cluster — NULL
    *         for noise) ordered by id
    */
  def dbscan2d(df: DataFrame, idCol: String, xCol: String,
      yCol: String, epsMicro: Long, minPts: Int): DataFrame = {
    require(epsMicro >= 1, s"epsMicro must be >= 1, got $epsMicro")
    require(minPts >= 1, s"minPts must be >= 1, got $minPts")
    val pts = df.select(col(idCol).cast("long").as("id"),
        round(col(xCol).cast("double") * 1e6, 0).cast("long").as("xm"),
        round(col(yCol).cast("double") * 1e6, 0).cast("long").as("ym"))
      .select(col("id"), col("xm"), col("ym"),
        ExactArith.floorDiv(col("xm"), lit(epsMicro)).as("cx"),
        ExactArith.floorDiv(col("ym"), lit(epsMicro)).as("cy"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Half-plane cell enumeration (the standard grid-join halving):
    // instead of fanning every point to all 9 neighbor cells and
    // producing both (a,b) and (b,a), probe only the 5 offsets
    // {(0,0),(1,0),(0,1),(1,1),(1,−1)} — one of each ± offset pair —
    // so every unordered CELL pair is enumerated exactly once, and
    // same-cell pairs keep ia ≤ ib. The expensive part (candidate
    // generation + the integer eps test) halves; the full directed
    // neighbor list is recovered afterwards by a cheap 2-way explode
    // of the surviving pairs. Self-pairs (ia = ib) appear exactly
    // once, from the (0,0) offset.
    val five = Seq((0, 0), (1, 0), (0, 1), (1, 1), (1, -1)).map {
      case (dx, dy) => struct((col("cx") + dx).as("cx"),
        (col("cy") + dy).as("cy"), lit(dx == 0 && dy == 0).as("same"))
    }
    val probe = pts.select(col("id").as("ia"), col("xm").as("xa"),
        col("ym").as("ya"), explode(array(five: _*)).as("nc"))
      .select(col("ia"), col("xa"), col("ya"),
        col("nc.cx").as("cx"), col("nc.cy").as("cy"),
        col("nc.same").as("same"))
    // half: one row per unordered in-eps pair (lo <= hi; lo = hi is
    // the self-pair). Cross-cell rows may arrive with ids in either
    // order — normalize with least/greatest.
    val half = probe.join(pts.select(col("id").as("ib"),
          col("xm").as("xb"), col("ym").as("yb"), col("cx"), col("cy")),
        Seq("cx", "cy"))
      .where((!col("same") || col("ia") <= col("ib")) &&
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
        (col("ya") - col("yb")) * (col("ya") - col("yb")) <=
        lit(epsMicro) * lit(epsMicro))
      .select(least(col("ia"), col("ib")).as("lo"),
        greatest(col("ia"), col("ib")).as("hi"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // full directed neighbor list (self once) — a narrow explode over
    // the cached half set, recomputed per consumer for free
    val nbrs = half.select(explode(when(col("lo") === col("hi"),
        array(struct(col("lo").as("ia"), col("hi").as("ib"))))
      .otherwise(array(struct(col("lo").as("ia"), col("hi").as("ib")),
        struct(col("hi").as("ia"), col("lo").as("ib"))))).as("p"))
      .select(col("p.ia").as("ia"), col("p.ib").as("ib"))
    // ncount feeds THREE consumers (core gate, border restriction,
    // the final report) — checkpoint it once instead of re-running
    // the explode+aggregate subtree per consumer and dragging each
    // consumer's AQE chain through it (the query was measured at
    // 74+ serial jobs, nearly all sub-second AQE stage
    // materializations — stage-chain latency, not compute)
    val ncount = nbrs.groupBy("ia").agg(count(lit(1)).as("n_nbrs"))
      .localCheckpoint()
    val core = ncount.where(col("n_nbrs") >= minPts)
      .select(col("ia").as("cid"))
    // Fine-grid contraction (the published grid-DBSCAN merge step):
    // on a SECOND grid of width fw chosen so 2·(fw−1)² ≤ eps², any
    // two points in the same fine cell are provably within eps — so
    // all core points of a fine cell share one cluster by direct
    // density-connection. Contract each fine cell's cores to one
    // super-node keyed by the cell's MIN core id and run components
    // on the cell graph: the component step's edge count drops from
    // O(core-pair count) — quadratic in per-region density, the term
    // that explodes exactly when clusters are dense — to O(occupied
    // cell pairs), while labels stay EXACTLY min-reachable-core-id
    // (contraction preserves reachability in both directions, and the
    // min over a component of per-cell min ids IS the component's min
    // core id). A dense 2k-point blob here went from 1.5M CC input
    // edges (distributed min-label loop) to O(100) super-edges
    // (driver union-find) with byte-identical output.
    val fw = math.floor(epsMicro / math.sqrt(2.0)).toLong + 1
    // one grouped pass instead of groupBy + join-back: the member
    // list per fine cell is bounded by the cell density cap (same
    // bound as the grid join itself), and exploding it reproduces
    // exactly the (cid, cmin) map the join produced. Checkpointed:
    // it feeds the two superEdges probes AND the core labeling.
    val fm = pts.select(col("id").as("cid"),
        ExactArith.floorDiv(col("xm"), lit(fw)).as("fx"),
        ExactArith.floorDiv(col("ym"), lit(fw)).as("fy"))
      .join(core, Seq("cid"))
      .groupBy("fx", "fy")
      .agg(min("cid").as("cmin"), collect_list("cid").as("_cids"))
      .select(explode(col("_cids")).as("cid"), col("cmin"))
      .localCheckpoint()
    val superEdges = half.where(col("lo") < col("hi"))
      .select(col("lo").as("ia"), col("hi").as("ib"))
      .join(fm.select(col("cid").as("ia"), col("cmin").as("ca")), "ia")
      .join(fm.select(col("cid").as("ib"), col("cmin").as("cb")), "ib")
      .where(col("ca") =!= col("cb"))
      .select(col("ca"), col("cb")).distinct()
    val comps = GraphOps.connectedComponents(superEdges, "ca", "cb")
      .select(col("id").as("cmin2"), col("comp"))
    // cells with no inter-cell edge self-label at their min core id
    // (covers the isolated-core case: alone in its cell, no edges).
    // Checkpointed once: read by border labeling AND the final join.
    val coreLabeled = fm.join(comps, col("cmin") === col("cmin2"), "left")
      .select(col("cid"), coalesce(col("comp"), col("cmin")).as("cluster"))
      .localCheckpoint()
    // border labels are only ever read for NON-core points (core rows
    // take their own cluster) — restrict the aggregation to them
    val borderLab = nbrs.where(col("ia") =!= col("ib"))
      .join(ncount.where(col("n_nbrs") < minPts).select(col("ia")), "ia")
      .join(coreLabeled.select(col("cid").as("ib"),
        col("cluster").as("bcl")), "ib")
      .groupBy(col("ia")).agg(min(col("bcl")).as("bcluster"))
    val out = ncount
      .join(coreLabeled, col("ia") === col("cid"), "left")
      .join(borderLab.select(col("ia").as("_ba"),
        col("bcluster")), col("ia") === col("_ba"), "left")
      .select(col("ia").as("id"), col("n_nbrs"),
        when(col("cid").isNotNull, lit("core"))
          .when(col("bcluster").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        when(col("cid").isNotNull, col("cluster"))
          .otherwise(col("bcluster")).as("cluster"))
      .orderBy("id")
    out
  }

  /** DuckDB replay of [[dbscan2d]]: identical grid join, integer eps
    * test, recursive-CTE min-label components (the q66 discipline),
    * border attachment.
    */
  def dbscan2dOracleSql(table: String, idExpr: String, xExpr: String,
      yExpr: String, epsMicro: Long, minPts: Int): String =
    s"""WITH RECURSIVE pts AS (
       | SELECT CAST($idExpr AS BIGINT) AS id,
       |   CAST(round(CAST($xExpr AS DOUBLE) * 1e6, 0) AS BIGINT) AS xm,
       |   CAST(round(CAST($yExpr AS DOUBLE) * 1e6, 0) AS BIGINT) AS ym
       | FROM $table),
       |pc AS (SELECT id, xm, ym,
       |   CASE WHEN xm >= 0 THEN xm // $epsMicro
       |     ELSE -((-xm + $epsMicro - 1) // $epsMicro) END AS cx,
       |   CASE WHEN ym >= 0 THEN ym // $epsMicro
       |     ELSE -((-ym + $epsMicro - 1) // $epsMicro) END AS cy
       | FROM pts),
       |probe AS (SELECT id AS ia, xm AS xa, ym AS ya,
       |   cx + d0.dx AS cx, cy + d1.dy AS cy
       | FROM pc CROSS JOIN (SELECT unnest(range(-1, 2)) AS dx) d0
       |  CROSS JOIN (SELECT unnest(range(-1, 2)) AS dy) d1),
       |nbrs AS (SELECT probe.ia, b.id AS ib
       | FROM probe JOIN pc b ON probe.cx = b.cx AND probe.cy = b.cy
       | WHERE (probe.xa - b.xm) * (probe.xa - b.xm)
       |     + (probe.ya - b.ym) * (probe.ya - b.ym)
       |     <= CAST($epsMicro AS BIGINT) * $epsMicro),
       |nc AS (SELECT ia, CAST(count(*) AS BIGINT) AS n_nbrs
       | FROM nbrs GROUP BY ia),
       |core AS (SELECT ia AS cid FROM nc WHERE n_nbrs >= $minPts),
       |ce AS (SELECT n.ia, n.ib FROM nbrs n
       | JOIN core a ON n.ia = a.cid JOIN core b ON n.ib = b.cid
       | WHERE n.ia < n.ib),
       |bi AS (SELECT ia AS u, ib AS v FROM ce
       |       UNION SELECT ib, ia FROM ce),
       |reach(u, v) AS (
       | SELECT u, u FROM (SELECT DISTINCT u FROM bi) nodes
       | UNION
       | SELECT r.u, b.v FROM reach r JOIN bi b ON r.v = b.u),
       |comps AS (SELECT u AS id, min(v) AS comp FROM reach GROUP BY u),
       |corelab AS (SELECT core.cid, coalesce(comps.comp, core.cid)
       |   AS cluster
       | FROM core LEFT JOIN comps ON core.cid = comps.id),
       |blab AS (SELECT n.ia, min(cl.cluster) AS bcluster
       | FROM nbrs n JOIN corelab cl ON n.ib = cl.cid
       | WHERE n.ia <> n.ib GROUP BY n.ia)
       |SELECT nc.ia AS id, nc.n_nbrs,
       | CASE WHEN cl.cid IS NOT NULL THEN 'core'
       |   WHEN blab.bcluster IS NOT NULL THEN 'border'
       |   ELSE 'noise' END AS role,
       | CASE WHEN cl.cid IS NOT NULL THEN cl.cluster
       |   ELSE blab.bcluster END AS cluster
       |FROM nc LEFT JOIN corelab cl ON nc.ia = cl.cid
       |LEFT JOIN blab ON nc.ia = blab.ia
       |ORDER BY id""".stripMargin

  /** Triplet mining for metric learning: per anchor, the HARD
    * POSITIVE (same label, LOWEST similarity — the pair the encoder
    * is failing to pull together) and the HARD NEGATIVE (different
    * label, HIGHEST similarity — [[hardNegatives]]' top-1), plus the
    * triplet margin pos_sim − neg_sim and a violation flag at
    * `alpha`. The complement of q131's negative-only mining: a
    * triplet loss needs both ends. Determinism: 6dp-rounded cosines,
    * id-asc ties (min-sim positives tie id-asc too); anchors
    * broadcast; at scale swap the brute scans for the LSH/IVF
    * candidate path and keep the argmin/argmax math.
    */
  def tripletMining(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, queryPred: Column, alpha: Double): DataFrame = {
    val base = emb.select(col(idCol).as("id"),
      asDouble(col(vecCol)).as("v"), col(labelCol).as("lbl"))
    val q = base.filter(queryPred).select(col("id").as("anchor_id"),
      col("v").as("qv"), col("lbl").as("a_label"))
    val sims = base.join(broadcast(q), col("id") =!= col("anchor_id"))
      .select(col("anchor_id"), col("a_label"),
        col("id").as("cand_id"), (col("lbl") === col("a_label")).as("same"),
        round(nativeCosine(emb)(col("qv"), col("v")), 6).as("sim"))
    // one bounded aggregation per anchor: argmin over positives via
    // min(struct(sim, id)), argmax over negatives via min of the
    // NEGATED 6dp grid (exact integer micro units, so negation is
    // lossless and ties still break id-asc)
    val neg6 = (-round(col("sim") * 1e6, 0).cast("long")).as("ns")
    sims.groupBy("anchor_id", "a_label")
      .agg(
        min(when(col("same"), struct(col("sim"), col("cand_id"))))
          .as("pos"),
        min(when(!col("same"), struct(neg6, col("cand_id")))).as("neg"))
      .where(col("pos").isNotNull && col("neg").isNotNull)
      .select(col("anchor_id"), col("a_label"),
        col("pos.cand_id").as("pos_id"), col("pos.sim").as("pos_sim"),
        col("neg.cand_id").as("neg_id"),
        (-col("neg.ns").cast("double") / 1e6).as("neg_sim"),
        round(col("pos.sim") + col("neg.ns").cast("double") / 1e6, 6)
          .as("margin"),
        (round(col("pos.sim") + col("neg.ns").cast("double") / 1e6, 6)
          < alpha).cast("int").as("violates"))
  }

  /** DuckDB replay of [[tripletMining]]. */
  def tripletMiningOracleSql(table: String, idCol: String,
      vecCol: String, labelCol: String, queryPredSql: String,
      alpha: Double): String =
    s"""WITH s AS (
       | SELECT q.$idCol AS anchor_id, q.$labelCol AS a_label,
       |  c.$idCol AS cand_id, c.$labelCol = q.$labelCol AS same,
       |  round(list_cosine_similarity(CAST(q.$vecCol AS DOUBLE[]),
       |                               CAST(c.$vecCol AS DOUBLE[])), 6)
       |    AS sim
       | FROM $table q JOIN $table c ON q.$idCol <> c.$idCol
       | WHERE $queryPredSql),
       |p AS (SELECT anchor_id, a_label, cand_id AS pos_id,
       |    sim AS pos_sim, row_number() OVER (PARTITION BY anchor_id
       |      ORDER BY sim ASC, cand_id ASC) AS rn
       |  FROM s WHERE same),
       |n AS (SELECT anchor_id, cand_id AS neg_id,
       |    -CAST(round(sim * 1e6) AS BIGINT) AS neg6,
       |    row_number() OVER (PARTITION BY anchor_id
       |      ORDER BY round(sim * 1e6) DESC, cand_id ASC) AS rn
       |  FROM s WHERE NOT same)
       |SELECT p.anchor_id, a_label, pos_id, pos_sim, neg_id,
       |  -CAST(neg6 AS DOUBLE) / 1e6 AS neg_sim,
       |  round(pos_sim + CAST(neg6 AS DOUBLE) / 1e6, 6) AS margin,
       |  CAST(round(pos_sim + CAST(neg6 AS DOUBLE) / 1e6, 6) < $alpha
       |    AS INT) AS violates
       |FROM p JOIN n ON p.anchor_id = n.anchor_id
       |WHERE p.rn = 1 AND n.rn = 1""".stripMargin

  /** Simplified (centroid-based) silhouette — the cluster-quality
    * scoreboard (Rousseeuw's silhouette with the O(n²) pairwise
    * distances replaced by centroid distances, the standard
    * large-scale variant): per point, a = distance to its own
    * centroid, b = distance to the nearest OTHER centroid,
    * s = (b−a)/max(a,b) ∈ [−1, 1]; per cluster the mean s says how
    * separated that cluster is. Centroids come from a deterministic
    * predicate (e.g. pinned seed vectors), so the whole scoreboard is
    * DuckDB-replayable — unlike the seeded k-means fits it audits.
    *
    * Determinism discipline: cosine distances land on the integer
    * MICRO grid (round(cos·1e6), the knnBrute 6dp rule), per-point s
    * is shifted to s+1 ∈ [0,2] and half-up micro-quantized with
    * integer division (negative `div` floors differently across
    * engines — the shift keeps every division non-negative), and the
    * cluster means are exact integer divisions of micro sums — no
    * partition-order double summation anywhere.
    *
    * Scale shape: one broadcast of the K seed vectors, one narrow
    * distance scan, one id-partitioned window over K rows per point,
    * one aggregation. The corpus never self-joins.
    *
    * @return per cluster: (cluster, n, mean_sil, mean_a, mean_b)
    */
  def simplifiedSilhouette(emb: DataFrame, idCol: String, vecCol: String,
      seedPred: Column): DataFrame = {
    val base = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val seeds = base.filter(seedPred)
      .select(col("id").as("seed_id"), col("v").as("sv"))
    val dm = base.crossJoin(broadcast(seeds))
      .select(col("id"), col("seed_id"),
        (lit(1000000L) -
          round(nativeCosine(emb)(col("v"), col("sv")) * 1e6, 0)
            .cast("long")).as("dmicro"))
    // both nearest seeds from ONE bounded aggregation (K structs per
    // point) — a rank-window + self-join on rn would re-shuffle the
    // corpus and plan as a sort-merge join for nothing
    val top2 = dm.groupBy("id")
      .agg(slice(array_sort(collect_list(
        struct(col("dmicro"), col("seed_id")))), 1, 2).as("t2"))
      .select(col("t2")(0)("seed_id").as("cluster"),
        col("t2")(0)("dmicro").as("da"),
        col("t2")(1)("dmicro").as("db"))
    top2
      .select(col("cluster"), col("da"), col("db"),
        when(greatest(col("da"), col("db")) === 0, lit(1000000L))
          .otherwise(
          expr("(2000000 * (db - da + greatest(da, db))" +
            " + greatest(da, db)) div (2 * greatest(da, db))"))
          .as("smicro"))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n"), sum("smicro").as("ss"),
        sum("da").as("sa"), sum("db").as("sb"))
      .select(col("cluster"), col("n"),
        (expr("(2 * ss + n) div (2 * n)").cast("double") / 1e6 - 1.0)
          .as("mean_sil"),
        (expr("(2 * sa + n) div (2 * n)").cast("double") / 1e6)
          .as("mean_a"),
        (expr("(2 * sb + n) div (2 * n)").cast("double") / 1e6)
          .as("mean_b"))
  }

  /** DuckDB replay of [[simplifiedSilhouette]]; `seedWhere` filters
    * the seed rows of `table`.
    */
  def silhouetteOracleSql(table: String, idCol: String, vecCol: String,
      seedWhere: String): String =
    s"""WITH base AS (SELECT $idCol AS id,
       |    CAST($vecCol AS DOUBLE[]) AS v FROM $table),
       |seeds AS (SELECT $idCol AS seed_id,
       |    CAST($vecCol AS DOUBLE[]) AS sv FROM $table
       |  WHERE $seedWhere),
       |dm AS (SELECT id, seed_id, 1000000 -
       |    CAST(round(list_cosine_similarity(v, sv) * 1e6) AS BIGINT)
       |    AS dmicro
       |  FROM base CROSS JOIN seeds),
       |r AS (SELECT id, seed_id, dmicro, row_number()
       |    OVER (PARTITION BY id ORDER BY dmicro, seed_id) AS rn
       |  FROM dm),
       |j AS (SELECT a.cluster, a.da, b.db,
       |    CASE WHEN greatest(a.da, b.db) = 0 THEN 1000000
       |      ELSE (2000000 * (b.db - a.da + greatest(a.da, b.db))
       |        + greatest(a.da, b.db)) // (2 * greatest(a.da, b.db))
       |    END AS smicro
       |  FROM (SELECT id, seed_id AS cluster, dmicro AS da FROM r
       |        WHERE rn = 1) a
       |  JOIN (SELECT id, dmicro AS db FROM r WHERE rn = 2) b
       |  USING (id)),
       |agg AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n,
       |    sum(smicro) AS ss, sum(da) AS sa, sum(db) AS sb
       |  FROM j GROUP BY cluster)
       |SELECT cluster, n,
       |  CAST((2 * ss + n) // (2 * n) AS DOUBLE) / 1e6 - 1.0 AS mean_sil,
       |  CAST((2 * sa + n) // (2 * n) AS DOUBLE) / 1e6 AS mean_a,
       |  CAST((2 * sb + n) // (2 * n) AS DOUBLE) / 1e6 AS mean_b
       |FROM agg""".stripMargin

  /** Margin-based bitext mining (Artetxe & Schwenk 2019 — the
    * LASER/CCMatrix parallel-corpus miner): absolute cosine is a bad
    * mining signal (hub vectors score high against everything), so
    * each candidate pair is scored by its cosine RELATIVE to both
    * endpoints' neighborhood densities:
    *
    *   margin(x, y) = cos(x, y) / ((nn_k(x) + nn_k(y)) / 2)
    *
    * with nn_k(v) = mean cosine of v's k nearest neighbors on the
    * OTHER side. Emitted: the best other-side candidate per query
    * with its margin (≫1 = much closer than either side's typical
    * neighbor — a translation/paraphrase pair; ~1 = hub noise).
    *
    * Determinism discipline: cosines round to 6dp BEFORE ranking and
    * neighborhood averaging (knnBrute's rule), neighborhood means and
    * margins round too — the oracle replays every step. Physical
    * shape at test scale is the exact all-pairs baseline (query side
    * and src side broadcast); at 100 TB swap the pair generator for
    * the LSH/IVF candidate path (q38/q48) and keep the margin math —
    * neighborhoods only need the candidates' cosines.
    */
  def marginMining(src: DataFrame, tgt: DataFrame, idCol: String,
      vecCol: String, queryPred: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val s = src.select(col(idCol).as("src_id"), asDouble(col(vecCol)).as("sv"))
    // floor the STREAMED side of the all-pairs broadcast join: a
    // single-split tgt scan runs the entire O(|s|·|t|) cosine pass in
    // one task (measured 1.45 s of q138's 2.9 s warm in one task);
    // no-op at real scale where the scan arrives pre-split
    val t = SkewOps.parallelismFloor(
      tgt.select(col(idCol).as("tgt_id"), asDouble(col(vecCol)).as("tv")))
    // full pair table, cosine rounded once, reused by all three parts
    // (localCheckpoint so the nn-mean windows and the query join all
    // read one materialization; caller frees via Checkpoints.release)
    val pairs = t.join(broadcast(s), lit(true))
      .select(col("src_id"), col("tgt_id"),
        round(nativeCosine(src)(col("sv"), col("tv")), 6).as("sim"))
      .localCheckpoint()
    def nnMean(in: DataFrame, side: String): DataFrame = {
      val w = Window.partitionBy(side)
        .orderBy(col("sim").desc, col(if (side == "src_id") "tgt_id" else "src_id"))
      in.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .groupBy(side).agg(round(avg("sim"), 6).as(s"nn_$side"))
    }
    val qs = s.filter(queryPred).select(col("src_id"))
    // the src-side neighborhood mean is consumed ONLY for query src
    // ids (the scored join filters to qs) — rank just those
    // partitions instead of every src vector's. Per-src_id window
    // results are unaffected by dropping other partitions, so the
    // surviving values are identical; the tgt side genuinely needs
    // every tgt's neighborhood (any tgt can be a candidate).
    val scored = pairs
      .join(broadcast(qs), Seq("src_id"))
      .join(broadcast(
        nnMean(pairs.join(broadcast(qs), Seq("src_id")), "src_id")),
        Seq("src_id"))
      .join(broadcast(nnMean(pairs, "tgt_id")), Seq("tgt_id"))
      .select(col("src_id"), col("tgt_id"), col("sim"),
        round(col("sim") / ((col("nn_src_id") + col("nn_tgt_id")) / 2.0), 6)
          .as("margin"))
    val w = Window.partitionBy("src_id")
      .orderBy(col("margin").desc, col("tgt_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("src_id"), col("tgt_id"), col("sim"), col("margin"))
  }

  /** THE at-scale candidate path for [[marginMining]] — the swap the
    * exact operator's scaladoc names: candidate pairs come from a
    * sign-plane LSH bucket equi-join (the q47 family) instead of the
    * cartesian, and the margin math is UNCHANGED — neighborhood
    * means only need the candidates' cosines (Artetxe & Schwenk's
    * own retrieval step is approximate in production CCMatrix).
    *
    * Semantics vs the exact baseline: nn_k means and the best-match
    * search run over the CANDIDATE set, so a query whose true match
    * hashes to an unprobed bucket can miss (the recall trade every
    * ANN path prices); a query with zero candidates emits nothing.
    * Exactness of what IS emitted: same 6dp rounding discipline at
    * every step, deterministic (margin desc, tgt_id) tie-break.
    *
    * Scale shape: one bucket-keyed shuffle joins the two sides (no
    * cartesian, no broadcast needed on either side — both may be
    * huge); multi-probe explodes only the src side by `probes`; the
    * nn windows partition on the pair endpoints. The pair frame is
    * localCheckpointed once and feeds all three reads (the exact
    * operator's discipline; caller frees via Checkpoints.release).
    *
    * The ONE broadcast is the query-id set, and `maxQueries`
    * (default 2^20 ≈ 8 MB of longs) makes its smallness an enforced
    * contract: the operator counts the predicate matches first and
    * throws above the cap instead of letting a too-broad predicate
    * OOM the driver — raise it EXPLICITLY when you mean it.
    */
  def marginMiningLsh(src: DataFrame, tgt: DataFrame, idCol: String,
      vecCol: String, queryPred: Column, k: Int, nbits: Int = 8,
      probes: Int = 1,
      bucketExpr: (Column, Int) => Column = lshBucket,
      maxQueries: Long = 1L << 20): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(probes >= 1 && probes <= nbits + 1,
      s"probes must be in [1, nbits+1], got $probes for nbits=$nbits")
    require(maxQueries >= 1, s"maxQueries must be >= 1, got $maxQueries")
    graft.functions.GraftFunctions.register(src.sparkSession)
    val s = src.select(col(idCol).as("src_id"), asDouble(col(vecCol)).as("sv"))
      .withColumn("bucket", bucketExpr(col("sv"), nbits))
    // The query-id set is broadcast (it rides into every pair
    // partition), so "queryPred is small" is a CONTRACT, not a hope:
    // probe the cardinality and fail loudly above maxQueries rather
    // than OOM the driver building a 100 TB-wide broadcast (the
    // PreferenceOps bounded-shipment discipline). limit(cap+1).count
    // bounds BOTH paths: the scan stops as soon as cap+1 matches are
    // seen (a wildly over-cap predicate fails after ~cap rows, not
    // after scanning 100 TB), and an under-cap predicate pays at most
    // one bounded extra job. Runs BEFORE the candidate-pair
    // checkpoint, so an over-cap call fails without materializing
    // (and leaking) the expensive pair frame.
    val qs = s.filter(queryPred).select(col("src_id"))
    val nq = qs.limit((maxQueries + 1).min(Int.MaxValue).toInt).count()
    require(nq <= maxQueries,
      s"marginMiningLsh: queryPred matches more than the broadcast " +
        s"cap maxQueries=$maxQueries — tighten the predicate or raise " +
        "the cap explicitly (the query-id set is collected to the " +
        "driver and broadcast to every executor)")
    val pairs = lshCandidatePairs(src, tgt, idCol, vecCol, nbits, probes,
      bucketExpr).localCheckpoint()
    def nnMean(in: DataFrame, side: String): DataFrame = {
      val w = Window.partitionBy(side)
        .orderBy(col("sim").desc, col(if (side == "src_id") "tgt_id" else "src_id"))
      in.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .groupBy(side).agg(round(avg("sim"), 6).as(s"nn_$side"))
    }
    // src-side neighborhoods are consumed only for query src ids —
    // see [[marginMining]]: per-src_id window results are unchanged
    // by dropping the non-query partitions
    val scored = pairs
      .join(broadcast(qs), Seq("src_id"))
      .join(nnMean(pairs.join(broadcast(qs), Seq("src_id")), "src_id"),
        Seq("src_id"))
      .join(nnMean(pairs, "tgt_id"), Seq("tgt_id"))
      .select(col("src_id"), col("tgt_id"), col("sim"),
        round(col("sim") / ((col("nn_src_id") + col("nn_tgt_id")) / 2.0), 6)
          .as("margin"))
    val w = Window.partitionBy("src_id")
      .orderBy(col("margin").desc, col("tgt_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("src_id"), col("tgt_id"), col("sim"), col("margin"))
  }

  /** The candidate frame [[marginMiningLsh]] checkpoints: src×tgt
    * pairs meeting on the bucket key (Hamming-1 multi-probe from the
    * src side), cosine rounded once. Exposed pre-checkpoint so
    * PlanSpec can pin the no-cartesian / bucket-equi-join shape the
    * checkpoint would otherwise hide.
    */
  private[graft] def lshCandidatePairs(src: DataFrame, tgt: DataFrame,
      idCol: String, vecCol: String, nbits: Int, probes: Int,
      bucketExpr: (Column, Int) => Column): DataFrame = {
    val s = src.select(col(idCol).as("src_id"), asDouble(col(vecCol)).as("sv"))
      .withColumn("bucket", bucketExpr(col("sv"), nbits))
    val t = tgt.select(col(idCol).as("tgt_id"), asDouble(col(vecCol)).as("tv"))
      .withColumn("bucket", bucketExpr(col("tv"), nbits))
    val probeBuckets = array((0 until probes).map {
      case 0 => col("bucket")
      case p => col("bucket").bitwiseXOR(lit(1L << (p - 1)))
    }: _*)
    val sp = s.select(col("src_id"), col("sv"),
      explode(probeBuckets).as("bucket"))
    // a (src, tgt) pair matches at most one probe row (tgt has ONE
    // bucket; a src's probed buckets are pairwise distinct) — no dedup
    t.join(sp, Seq("bucket"))
      .select(col("src_id"), col("tgt_id"),
        round(nativeCosine(src)(col("sv"), col("tv")), 6).as("sim"))
  }

  /** DuckDB replay of [[marginMiningLsh]] under the [[lshBucketMd5]]
    * plane family: same bucket literals, Hamming-1 multi-probe, 6dp
    * cosine/mean/margin grid, same tie-breaks.
    */
  def marginMiningLshOracleSql(table: String, idCol: String,
      vecCol: String, srcPredSql: String, tgtPredSql: String,
      queryPredSql: String, k: Int, nbits: Int, probes: Int,
      d: Int): String = {
    val sb = lshBucketMd5Sql("sv", nbits, d)
    val tb = lshBucketMd5Sql("tv", nbits, d)
    val probeList = ("bucket" +: (1 until probes)
      .map(p => s"xor(bucket, ${1L << (p - 1)})")).mkString("[", ", ", "]")
    s"""WITH s0 AS (SELECT $idCol AS src_id, CAST($vecCol AS DOUBLE[]) AS sv
       |  FROM $table WHERE $srcPredSql),
       |t0 AS (SELECT $idCol AS tgt_id, CAST($vecCol AS DOUBLE[]) AS tv
       |  FROM $table WHERE $tgtPredSql),
       |s AS (SELECT src_id, sv, $sb AS bucket FROM s0),
       |t AS (SELECT tgt_id, tv, $tb AS bucket FROM t0),
       |sp AS (SELECT src_id, sv, unnest($probeList) AS bucket FROM s),
       |p AS (SELECT src_id, tgt_id,
       |   round(list_cosine_similarity(sv, tv), 6) AS sim
       |  FROM t JOIN sp USING (bucket)),
       |nns AS (SELECT src_id, round(avg(sim), 6) AS nn_s FROM (
       |   SELECT src_id, sim, row_number() OVER (PARTITION BY src_id
       |     ORDER BY sim DESC, tgt_id) AS rn FROM p) x
       |  WHERE rn <= $k GROUP BY src_id),
       |nnt AS (SELECT tgt_id, round(avg(sim), 6) AS nn_t FROM (
       |   SELECT tgt_id, sim, row_number() OVER (PARTITION BY tgt_id
       |     ORDER BY sim DESC, src_id) AS rn FROM p) x
       |  WHERE rn <= $k GROUP BY tgt_id),
       |sc AS (SELECT p.src_id, p.tgt_id, sim,
       |    round(sim / ((nn_s + nn_t) / 2.0), 6) AS margin
       |  FROM p JOIN nns USING (src_id) JOIN nnt USING (tgt_id)
       |  WHERE $queryPredSql)
       |SELECT src_id, tgt_id, sim, margin FROM (
       | SELECT *, row_number() OVER (PARTITION BY src_id
       |   ORDER BY margin DESC, tgt_id) AS rn FROM sc) f
       |WHERE rn = 1""".stripMargin
  }

  /** Hard-negative mining for contrastive training: for each query
    * vector, the k most-similar corpus vectors with a DIFFERENT
    * label — maximally confusable negatives, the pairs a contrastive
    * loss learns most from. Same exact-cosine machinery as
    * [[knnBrute]] (rounded-sim ranking, id tie-break, broadcast query
    * side); the label-mismatch predicate rides the join condition so
    * same-label candidates never enter the ranking window. The at-
    * scale path is the same as q36→q38/q48: swap the brute scan for
    * the LSH/IVF candidate generator, keep the label filter.
    */
  def hardNegatives(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, queryPred: Column, k: Int): DataFrame = {
    val base = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"),
      col(labelCol).as("lbl"))
    val q = base.filter(queryPred).select(col("id").as("query_id"),
      col("v").as("qv"), col("lbl").as("qlbl"))
    val sims = base.join(broadcast(q),
        col("id") =!= col("query_id") && col("lbl") =!= col("qlbl"))
      .select(col("query_id"), col("qlbl").as("query_label"),
        col("id").as("cand_id"), col("lbl").as("cand_label"),
        round(nativeCosine(emb)(col("qv"), col("v")), 6).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
    sims.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("query_label"), col("cand_id"),
        col("cand_label"), col("sim"))
  }

  /** [[hardNegatives]]' documented at-scale swap, exercised: the
    * brute label-mismatch join is replaced by the sign-plane bucket
    * equi-join (Hamming-1 multi-probe from the query side) and the
    * label filter rides the SAME join — same-label candidates never
    * enter the ranking window, exactly the exact path's contract.
    * One bucket-keyed shuffle, no cartesian, neither side broadcast.
    * Approximation is recall-shaped only: a hard negative hashing to
    * an unprobed bucket is missed; everything emitted carries the
    * exact 6dp cosine and deterministic (sim desc, cand_id) order.
    */
  def hardNegativesLsh(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, queryPred: Column, k: Int, nbits: Int = 8,
      probes: Int = 1,
      bucketExpr: (Column, Int) => Column = lshBucket): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(probes >= 1 && probes <= nbits + 1,
      s"probes must be in [1, nbits+1], got $probes for nbits=$nbits")
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val base = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"),
        col(labelCol).as("lbl"))
      .withColumn("bucket", bucketExpr(col("v"), nbits))
    val probeBuckets = array((0 until probes).map {
      case 0 => col("bucket")
      case p => col("bucket").bitwiseXOR(lit(1L << (p - 1)))
    }: _*)
    val q = base.filter(queryPred)
      .select(col("id").as("query_id"), col("v").as("qv"),
        col("lbl").as("qlbl"), explode(probeBuckets).as("bucket"))
    val sims = base.join(q,
        Seq("bucket"))
      .filter(col("id") =!= col("query_id") && col("lbl") =!= col("qlbl"))
      .select(col("query_id"), col("qlbl").as("query_label"),
        col("id").as("cand_id"), col("lbl").as("cand_label"),
        round(nativeCosine(emb)(col("qv"), col("v")), 6).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
    sims.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("query_label"), col("cand_id"),
        col("cand_label"), col("sim"))
  }

  /** DuckDB replay of [[hardNegativesLsh]] under [[lshBucketMd5]]:
    * same plane literals, probes, label filter, 6dp grid, tie-break.
    */
  def hardNegativesLshOracleSql(table: String, idCol: String,
      vecCol: String, labelCol: String, queryPredSql: String, k: Int,
      nbits: Int, probes: Int, d: Int): String = {
    val bucket = lshBucketMd5Sql("v", nbits, d)
    val probeList = ("bucket" +: (1 until probes)
      .map(p => s"xor(bucket, ${1L << (p - 1)})")).mkString("[", ", ", "]")
    s"""WITH base AS (
       | SELECT $idCol AS id, CAST($vecCol AS DOUBLE[]) AS v,
       |  $labelCol AS lbl FROM $table),
       |bk AS (SELECT id, v, lbl, $bucket AS bucket FROM base),
       |q AS (SELECT id AS query_id, v AS qv, lbl AS qlbl,
       |   unnest($probeList) AS bucket
       |  FROM bk WHERE $queryPredSql),
       |s AS (SELECT query_id, qlbl AS query_label, bk.id AS cand_id,
       |   bk.lbl AS cand_label,
       |   round(list_cosine_similarity(qv, bk.v), 6) AS sim
       |  FROM bk JOIN q USING (bucket)
       |  WHERE bk.id <> q.query_id AND bk.lbl <> q.qlbl)
       |SELECT query_id, query_label, cand_id, cand_label, sim FROM (
       | SELECT *, row_number() OVER (PARTITION BY query_id
       |   ORDER BY sim DESC, cand_id) AS rn FROM s) t
       |WHERE rn <= $k""".stripMargin
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * xxhash64 mapped to [-1, 1]. No RNG state — same planes everywhere.
    */
  private def planeComponent(p: Int, d: Column): Column =
    (xxhash64(lit(p), d).cast("double") / lit(Long.MaxValue.toDouble))

  /** Sign-bit bucket key from `nbits` hyperplanes, via the native
    * `graft_lsh_bits` expression (plane matrix cached per task, one
    * tight dot-product loop per plane). Callers must have
    * [[graft.functions.GraftFunctions.register]]ed the session.
    */
  def lshBucket(vec: Column, nbits: Int): Column =
    call_function("graft_lsh_bits", vec, lit(nbits))

  /** The composed-built-ins twin of [[lshBucket]] — the differential
    * reference that pins the native expression bit-identical
    * (SimilaritySpec); nbits×dims xxhash64 evals per row through
    * interpreted lambdas, so never the production path.
    */
  private[graft] def composedLshBucket(vec: Column, nbits: Int): Column = {
    val dims = sequence(lit(0), size(vec) - 1)
    (0 until nbits).map { p =>
      val proj = aggregate(
        zip_with(vec, dims, (x, i) => x * planeComponent(p, i)),
        lit(0.0d), _ + _)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** md5-derived ±1.0 sign planes for the oracle-replayable LSH
    * bucket family: plane p, dim i = +1 iff the top bit of
    * md5("lshp:p:i") is clear ([[projectionSigns]] discipline, its
    * own salt). Generated driver-side, embedded as plan literals AND
    * as SQL literals by [[lshBucketMd5Sql]] — same constants on both
    * engines by construction.
    */
  private[graft] def lshPlaneSigns(d: Int, nbits: Int): IndexedSeq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until nbits).map { p =>
      (0 until d).map { i =>
        val h = md.digest(s"lshp:$p:$i".getBytes("UTF-8"))
        if ((h(0) & 0x80) == 0) 1.0 else -1.0
      }
    }
  }

  /** Oracle-replayable sign-plane bucket — [[lshBucket]]'s md5 twin:
    * ±1 planes from [[lshPlaneSigns]], each projection summed on the
    * exact integer MICRO grid (round(x·sign·1e6) as long — order-
    * independent, so the sign decision replays bit-for-bit in SQL;
    * a raw double fold's sub-ulp order sensitivity could flip a
    * near-zero projection's sign between engines), bit p set iff the
    * micro-sum is >= 0. Same hyperplane-LSH family as production
    * (sign random projections); `d` must equal the vector dimension
    * (zip_with would null-pad a mismatch — guarded by the micro-sum
    * turning null and the caller's oracle failing loudly).
    */
  def lshBucketMd5(vec: Column, nbits: Int, d: Int): Column = {
    require(nbits >= 1 && nbits <= 62, s"nbits must be in [1,62], got $nbits")
    // native kernel — one plan node vs nbits nested HOF trees;
    // bit-identical to the composed form (SimilaritySpec
    // differential), callers (knnLsh/embeddingNearDupPairs) register
    // graft functions before applying the bucketExpr
    call_function("graft_micro_plane_bits", vec,
      typedlit(lshPlaneSigns(d, nbits).map(_.toSeq)))
  }

  /** The composed-HOF twin of [[lshBucketMd5]] — kept as the
    * differential reference the native kernel is spec-pinned against.
    */
  private[graft] def lshBucketMd5Composed(vec: Column, nbits: Int,
      d: Int): Column = {
    val planes = lshPlaneSigns(d, nbits)
    (0 until nbits).map { p =>
      val micro = aggregate(
        zip_with(vec, typedlit(planes(p)),
          (x, sg) => round(x * sg * 1e6, 0).cast("long")),
        lit(0L), _ + _)
      when(micro >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** DuckDB expression computing [[lshBucketMd5]] over list column
    * `vecSql` — sign literals embedded from the same Scala generator.
    */
  private[graft] def lshBucketMd5Sql(vecSql: String, nbits: Int,
      d: Int): String = {
    val planes = lshPlaneSigns(d, nbits)
    (0 until nbits).map { p =>
      val lst = planes(p).map(s => if (s > 0) "1.0" else "-1.0")
        .mkString("[", ", ", "]")
      s"(CASE WHEN list_sum(list_transform(generate_series(1, $d), " +
        s"i -> CAST(round($vecSql[i] * ($lst::DOUBLE[])[i] * 1e6) " +
        s"AS BIGINT))) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }

  /** Embedding-cosine near-duplicate pairs: bucket by hyperplane sign
    * bits, generate pairs only within a bucket, keep pairs above the
    * cosine threshold. Bucketing replaces the all-pairs cross product;
    * recall is tuned by nbits (fewer bits → bigger buckets → higher
    * recall, more work).
    *
    * Physical form matches the other posting-list expanders: ONE
    * shuffle groups each bucket's (id, vector) members, then
    * `graft_ordered_pairs` lazily emits the i<j pairs — no self-join,
    * no second exchange. Buckets are the skew contract: a bucket of f
    * members costs O(f²) pairs AND an aggregation row holding f full
    * vectors, so the cap is enforced INSIDE the aggregation
    * (graft_bounded_collect): the moment a bucket exceeds
    * `maxBucketSize` its members are released and only a running count
    * survives — no task ever materializes a hot bucket (the pre-r7
    * form OOMed on one ~N/2^nbits-vector row at scale), and unlike the
    * r7 count-then-anti-join shape the vectors are hashed and scanned
    * ONCE. Dropped buckets trade recall for boundedness and the trade
    * is OBSERVABLE: DropGuard reports dropped-member counts and warns
    * loudly when most members (or all — zero pairs returned) fall in
    * over-capacity buckets, the cliff a growing corpus hits once
    * N/2^nbits passes the cap. Size nbits so expected f = N/2^nbits
    * stays well under `maxBucketSize` (see [[lshBucketStats]] for the
    * actual distribution; at 10⁹ rows nbits=8 is wrong — use 16+).
    */
  def embeddingNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, nbits: Int = 8,
      maxBucketSize: Int = 4096,
      bucketExpr: (Column, Int) => Column = lshBucket): DataFrame = {
    require(nbits >= 1 && nbits <= 62, s"nbits must be in [1,62], got $nbits")
    require(maxBucketSize > 1, s"maxBucketSize must be > 1, got $maxBucketSize")
    graft.functions.GraftFunctions.register(emb.sparkSession)
    // floor before the per-row bucket hash (md5-heavy for the
    // sign-plane variants) feeding the bounded-collect aggregation
    val base = SkewOps.parallelismFloor(
        emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v")))
      .withColumn("bucket", bucketExpr(col("v"), nbits))
    DropGuard.observed(
      base.groupBy("bucket")
        .agg(call_function("graft_bounded_collect",
          struct(col("id"), col("v")), lit(maxBucketSize)).as("c")),
      "embeddingNearDupPairs")
      .filter(col("c.ms").isNotNull && size(col("c.ms")) > 1)
      .select(call_function("graft_ordered_pairs", col("c.ms")).as(Seq("x", "y")))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        round(nativeCosine(emb)(col("x.v"), col("y.v")), 6).as("cos"))
      .filter(col("cos") >= minCosine)
  }

  /** Symmetric int8 quantization of an embedding column — the
    * standard 4× storage/bandwidth cut applied before vectors are
    * indexed or shipped: per-vector scale = 127 / max|x| (zero-point
    * free, sign-symmetric), codes = round(x·scale) ∈ [-127, 127].
    * All math is double (exact float widening) with half-away-from-
    * zero rounding — both replayable by an external engine, so the
    * emitted summary (dims, code min/max/sum, scale) has an exact
    * oracle. Pure projection: zero shuffle at any corpus size.
    * All-zero vectors quantize to all-zero codes at scale 1.
    */
  def quantizeInt8(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("ma", array_max(transform(col("v"), x => abs(x))))
      .withColumn("scale",
        when(col("ma") > 0, lit(127.0d) / col("ma")).otherwise(lit(1.0d)))
      .withColumn("q", transform(col("v"),
        x => round(x * col("scale")).cast("int")))
      .select(col("vec_id"),
        size(col("q")).as("n_dims"),
        array_min(col("q")).as("q_min"),
        array_max(col("q")).as("q_max"),
        aggregate(col("q"), lit(0L), (acc, x) => acc + x).as("sum_q"),
        col("scale"))

  /** Per-bucket population under [[lshBucket]] — the tuning probe for
    * `nbits`/`maxBucketSize` on [[embeddingNearDupPairs]]: run once on
    * a sample, look at the max/percentile bucket size, pick nbits so
    * the cap never triggers on benign data. At most 2^nbits rows.
    */
  def lshBucketStats(emb: DataFrame, idCol: String, vecCol: String,
      nbits: Int): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    emb.select(asDouble(col(vecCol)).as("v"))
      .select(lshBucket(col("v"), nbits).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("f"))
  }

  /** Exact all-pairs cosine pairs above a threshold — the BASELINE-ONLY
    * twin of [[embeddingNearDupPairs]] (O(n²); for recall measurement
    * and small corpora, never the scale path).
    */
  def exactCosinePairs(emb: DataFrame, idCol: String, vecCol: String,
      minCosine: Double): DataFrame = {
    // the O(n²) work happens in the nested-loop join's STREAMED side;
    // a small parquet input arrives as 1-2 partitions, which would
    // run the whole quadratic scan on as many cores — spread it first
    val par = emb.sparkSession.sparkContext.defaultParallelism
    val a = emb.select(col(idCol).as("a_id"), asDouble(col(vecCol)).as("av"))
      .repartition(par)
    val b = emb.select(col(idCol).as("b_id"), asDouble(col(vecCol)).as("bv"))
    a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(nativeCosine(emb)(col("av"), col("bv")), 6).as("cos"))
      .filter(col("cos") >= minCosine)
  }

  /** One recall row: |approx ∩ exact| / |exact| over `keyCols`. ONE
    * pass over the exact set (left join + conditional count) — the
    * earlier two-aggregate crossJoin planned the expensive exact
    * subtree twice. An EMPTY exact baseline yields NULL recall (there
    * was nothing to find — reporting 0 would read as total failure).
    */
  private def recallRow(exact: DataFrame, approx: DataFrame,
      keyCols: Seq[String], method: String, k: Int): DataFrame = {
    val e = exact.select(keyCols.map(col): _*).distinct()
    val a = approx.select(keyCols.map(col): _*).distinct()
      .withColumn("_hit", lit(1))
    e.join(a, keyCols, "left")
      .agg(count(lit(1)).as("n_exact"), count(col("_hit")).as("n_hit"))
      .select(lit(method).as("method"), lit(k).as("k"),
        col("n_exact"), col("n_hit"),
        when(col("n_exact") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_hit").cast("double") / col("n_exact"), 4))
          .as("recall"))
  }

  /** ANN quality as a harness-visible NUMBER: recall of the LSH and
    * IVF top-k paths and the bucketed near-dup pairs against their
    * exact baselines ([[knnBrute]], [[exactCosinePairs]]), one row per
    * method — a quantified quality signal at bench scale (thresholds
    * pinned in SimilaritySpec; k is 0 on the pair row, where top-k
    * doesn't apply). Under the md5 plane family (injected
    * `bucketExprKnn`/`bucketExprPairs`) and the deterministic IVF
    * fits, the ENTIRE scoreboard replays in SQL
    * ([[annRecallMd5OracleSql]]); the xxhash64 defaults keep their
    * spec floors.
    *
    * `sampleFraction` is the AT-SCALE path: the exact baselines are
    * O(n²) in the corpus, so beyond bench scale the scoreboard must
    * run on a corpus sample — recall measured on a uniform sample is
    * an unbiased estimate of full-corpus recall, and sampling the
    * CORPUS (not the result) keeps baseline and approximate paths
    * answering the same question on the same frame. The sample is
    * deterministic (hash of the id, fixed salt — partition-invariant,
    * re-evaluation-safe, so the six independently-checkpointed
    * subtrees all see the identical sample). Size it so n·fraction is
    * a few thousand rows: the quadratic baseline cost drops by
    * fraction², the recall estimate's variance is governed only by
    * the sampled result-set size.
    */
  def annRecallReport(spark: org.apache.spark.sql.SparkSession,
      emb: DataFrame, idCol: String, vecCol: String, queryPred: Column,
      k: Int, nbitsKnn: Int, probes: Int, minCosine: Double,
      nbitsPairs: Int, sampleFraction: Double = 1.0,
      bucketExprKnn: (Column, Int) => Column = lshBucket,
      bucketExprPairs: (Column, Int) => Column = lshBucket): DataFrame = {
    require(sampleFraction > 0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    // floor + checkpoint the (id, vec) base ONCE: all six subtrees
    // below re-read it (before, each re-ran the scan — and the md5
    // sample filter — itself, and each op's internal parallelism
    // floor would re-shuffle it per subtree). One materialization,
    // zero per-subtree exchanges: the ops' own floors see >= cores
    // partitions and no-op.
    val emb0 = SkewOps.parallelismFloor(
      (if (sampleFraction >= 1.0) emb
       else SampleOps.deterministicSample(emb, idCol, sampleFraction,
         salt = "ann_recall"))
        .select(col(idCol), col(vecCol))).localCheckpoint()
    // each result set is small (top-k rows / thresholded pairs) but
    // expensive to produce, and the exact baseline feeds TWO recall
    // rows — localCheckpoint pins each once instead of replanning the
    // similarity subtrees per consuming aggregate. The six
    // materializations are INDEPENDENT jobs, so they checkpoint
    // concurrently (Spark's scheduler interleaves jobs from multiple
    // threads): the cheap approximate paths ride along with the O(n²)
    // exact baseline instead of queueing behind it. Plans are built
    // on this thread; only the blocking checkpoint action forks.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val frames = Seq(
      knnBrute(emb0, idCol, vecCol, queryPred, k),
      knnLsh(emb0, idCol, vecCol, queryPred, k, nbitsKnn, probes,
        bucketExpr = bucketExprKnn),
      knnIvf(spark, emb0, idCol, vecCol, queryPred, k),
      // PQ scoreboard params pinned with the q105 harness entry
      // (measured 0.78 sf0.01 / 0.64 sf0.1; defaults land ~0.3)
      knnIvfPq(spark, emb0, idCol, vecCol, queryPred, k,
        nprobe = 8, m = 16, refine = 8),
      exactCosinePairs(emb0, idCol, vecCol, minCosine),
      embeddingNearDupPairs(emb0, idCol, vecCol, minCosine, nbitsPairs,
        bucketExpr = bucketExprPairs))
    // each result set is a handful of rows on the driver scale —
    // COLLECT the key columns concurrently instead of checkpointing
    // the frames and re-joining them: the recall arithmetic
    // (distinct exact keys, distinct approx keys, left-join hit
    // count) is set arithmetic the driver replays exactly, and the
    // whole report subtree (4 recallRow joins + their AQE planning
    // jobs + the block release round) disappears from the job chain
    val keyColsOf = Seq(
      Seq("query_id", "cand_id"), Seq("query_id", "cand_id"),
      Seq("query_id", "cand_id"), Seq("query_id", "cand_id"),
      Seq("a_id", "b_id"), Seq("a_id", "b_id"))
    val keyFuts = frames.zip(keyColsOf).map { case (f, kc) =>
      Future(f.select(kc.map(col): _*).collect()
        .map(r => (r.get(0), r.get(1))).toSet)
    }
    val Seq(exactTopK, lsh, ivf, ivfpq, exactPairs, lshPairs) =
      try Await.result(Future.sequence(keyFuts), Duration.Inf)
      finally Checkpoints.release(emb0)
    // recallRow replayed on the driver: n_exact = |distinct exact
    // keys|, n_hit = |exact ∩ approx|, recall = round(hit/exact, 4)
    // with Spark Round's HALF_UP-on-BigDecimal semantics; n_exact=0
    // yields a NULL recall exactly as the SQL form did
    def recallVals(exact: Set[(Any, Any)], approx: Set[(Any, Any)],
        method: String, kk: Int): org.apache.spark.sql.Row = {
      val nExact = exact.size.toLong
      val nHit = exact.count(approx.contains).toLong
      val recall = if (nExact == 0L) null
        else java.lang.Double.valueOf(BigDecimal(nHit.toDouble / nExact)
          .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
      org.apache.spark.sql.Row(method, kk, nExact, nHit, recall)
    }
    // schema from the UNEXECUTED SQL report (analysis only, no jobs)
    // so the emitted frame is column-for-column the old one
    val schema = recallRow(frames(0), frames(1),
      Seq("query_id", "cand_id"), "knn_lsh", k).schema
    val rows = Seq(
      recallVals(exactTopK, lsh, "knn_lsh", k),
      recallVals(exactTopK, ivf, "knn_ivf", k),
      recallVals(exactTopK, ivfpq, "knn_ivfpq", k),
      recallVals(exactPairs, lshPairs, "neardup_pairs", 0))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
    * partitions the corpus into cells; each query searches only its
    * `nprobe` nearest cells. The scale path for billion-row corpora:
    * the quantizer trains on a seeded SAMPLE (`fitFraction`, sized so
    * ~10-100k vectors reach the driver regardless of corpus size —
    * never a full-data ML fit), assignment is one narrow map, and the
    * query join touches ~nprobe/nCells of the data. Deterministic via
    * fixed seed.
    *
    * The centers travel as ONE 2-D array literal evaluated once per
    * row (`scored` holds all cell distances sorted): a per-cell
    * `array(lit,…)` repeated per use put nCells×dims literal NODES in
    * the plan ×3 and bloated task binaries to tens of MiB.
    *
    * Sizing (defaults assume a ≤10⁶-row corpus): pick nCells ≈ √N (10⁹
    * rows → ~32k cells; the center literal is then nCells×dims doubles
    * — at 32k×768 that is ~200 MB, the point where the centers should
    * move to a broadcast join instead of a literal) and fitFraction so
    * nCells×50 … 10⁵ sample vectors reach the driver. nprobe is the
    * recall dial: recall plateaus near nprobe/nCells ≈ 1/4 of the
    * default; raising nCells without raising nprobe trades recall for
    * speed silently — hence the guard below.
    */
  /** Lloyd's iterations over an in-memory sample. A 16-cell
    * coarse quantizer needs only a bounded sample (the caller sizes
    * `fitFraction` so ~10-100k vectors land here); running the
    * iterations on the driver costs milliseconds and zero Spark jobs,
    * where a distributed ML fit costs dozens of scheduler round-trips
    * per iteration — the wrong trade at ANY corpus size once the
    * sample is driver-bounded anyway. Empty clusters keep their old
    * center.
    *
    * Init: the first `nCells` DISTINCT points in input order — the
    * input is already content-hash-ordered ([[fitSample]]), so this
    * is [[kmeansCore]]'s md5 seeding discipline without an RNG.
    * Portable by construction: the old `Random(seed).shuffle` init
    * was deterministic only per Scala shuffle implementation, which
    * pinned the fit to one library version and made the whole IVF
    * family un-oracleable; first-distinct-in-order replays in ANSI
    * SQL (`seed` still salts the sample's hash coordinates). The
    * early convergence exit is safe for unrolled replays: if no
    * assignment changed, the center update recomputes the same
    * centers, so running the remaining iterations is a no-op.
    */
  private[ops] def lloydFit(points: Array[Array[Double]], nCells: Int,
      maxIter: Int, seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "kmeans fit sample is empty")
    val seen = scala.collection.mutable.LinkedHashSet.empty[Seq[Double]]
    val pit = points.iterator
    while (seen.size < nCells && pit.hasNext) seen += pit.next().toSeq
    val centers = seen.iterator.map(_.toArray).toArray
    val kEff = centers.length
    val assign = new Array[Int](points.length)
    var iter = 0
    while (iter < maxIter) {
      var changed = false
      var p = 0
      while (p < points.length) {
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < kEff) {
          var d = 0.0; var j = 0
          val pv = points(p); val cv = centers(c)
          while (j < pv.length) { val t = pv(j) - cv(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        if (assign(p) != best) { assign(p) = best; changed = true }
        p += 1
      }
      if (!changed && iter > 0) iter = maxIter
      else {
        val sums = Array.fill(kEff)(new Array[Double](points(0).length))
        val counts = new Array[Int](kEff)
        var i = 0
        while (i < points.length) {
          val a = assign(i); counts(a) += 1
          val pv = points(i); val sv = sums(a)
          var j = 0
          while (j < pv.length) { sv(j) += pv(j); j += 1 }
          i += 1
        }
        var c = 0
        while (c < kEff) {
          if (counts(c) > 0) {
            var j = 0
            while (j < sums(c).length) { centers(c)(j) = sums(c)(j) / counts(c); j += 1 }
          }
          c += 1
        }
        iter += 1
      }
    }
    centers
  }

  /** Driver-bounded k-means fit sample: a CONTENT-KEYED sample capped
    * at an ABSOLUTE `maxFitRows` before anything is collected. The
    * fraction alone is NOT a cap — at 100× corpus a 10% sample
    * collects 100× more vectors; at 100 TB of embeddings that is
    * terabytes on the driver — and `maxFitRows` bounds the collect
    * above it: quantizer quality needs only O(nCells·50…10⁵) vectors
    * regardless of corpus size, and the recall floors in Verify gate
    * the result either way.
    *
    * Determinism: membership is [[SampleOps.hashCoord]] over the
    * vector content (salted by `seed`) against
    * [[SampleOps.thresholdHex]], and rows land in md5-coordinate
    * order (TakeOrdered — per-partition top-k, never a full sort) —
    * so the collected sample is a pure function of corpus CONTENT,
    * identical across runs, partitionings and cluster layouts, below
    * or above the cap (the [[IvfIndexOps.initCenters]] discipline; a
    * seeded Bernoulli sample + bare `limit` was layout-dependent).
    * Equal vectors share a coordinate; their mutual order is
    * irrelevant to any fit (interchangeable points).
    *
    * The hash coordinate is md5 over an ENGINE-PORTABLE rendering of
    * the vector — comma-joined floor(x·10⁷) micro-units — rather
    * than Spark's array-to-string cast (whose scientific-notation
    * cutoffs are Java-specific: 1.0E-4 vs 0.0001), so an oracle can
    * replay sample membership and order exactly ([[knnIvfOracleSql]]).
    */
  private[graft] def fitVecKey(vec: Column, seed: Long): Column =
    substring(md5(concat(lit(s"fit:$seed:"),
      concat_ws(",", transform(vec,
        x => floor(x * lit(1e7)).cast("long")))).cast("binary")),
      1, SampleOps.Width)

  private[graft] def fitSample(base: DataFrame, vecCol: String,
      fitFraction: Double, maxFitRows: Int, seed: Long,
      minRows: Int): Array[Array[Double]] = {
    import base.sparkSession.implicits._
    // floor: the md5 content key renders every vector to a string —
    // real per-row work that a single-split scan serializes
    val keyed = SkewOps.parallelismFloor(base.select(col(vecCol).as("_v")))
      .select(col("_v"), fitVecKey(col("_v"), seed).as("_k"))
    // (_k, _v) sort key: _k alone is a QUANTIZED content hash
    // (floor(x·10⁷) micro-units), so two genuinely different vectors
    // float-spaced below 1e-7 per coordinate share a key and their
    // relative order would be engine-dependent — which can flip
    // first-distinct init and desynchronize the oracle at larger
    // corpora. Appending the vector itself (arrays order
    // lexicographically element-wise, identically in Spark and
    // DuckDB) makes the sample order TOTAL up to true vector
    // equality, where order is irrelevant (interchangeable points).
    var sample = keyed
      .where(col("_k") < lit(SampleOps.thresholdHex(fitFraction)))
      .orderBy(col("_k"), col("_v")).limit(maxFitRows)
      .select("_v").as[Seq[Double]].collect().map(_.toArray)
    if (sample.isEmpty) // tiny-corpus guard
      sample = keyed.orderBy(col("_k"), col("_v")).limit(minRows)
        .select("_v").as[Seq[Double]].collect().map(_.toArray)
    sample
  }

  def knnIvf(spark: org.apache.spark.sql.SparkSession, emb: DataFrame,
      idCol: String, vecCol: String, queryPred: Column, k: Int,
      nCells: Int = 16, nprobe: Int = 4, seed: Long = 42L,
      fitFraction: Double = 0.1, maxFitRows: Int = 100000): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nCells >= 2, s"nCells must be >= 2, got $nCells")
    require(nprobe >= 1 && nprobe <= nCells,
      s"nprobe must be in [1, nCells], got $nprobe for nCells=$nCells")
    require(fitFraction > 0.0 && fitFraction <= 1.0,
      s"fitFraction must be in (0, 1], got $fitFraction")
    require(maxFitRows >= nCells,
      s"maxFitRows must be >= nCells, got $maxFitRows for nCells=$nCells")
    if (nCells > 64 && nprobe.toDouble / nCells < 0.01)
      System.err.println(s"[graft] knnIvf: nprobe=$nprobe of nCells=$nCells " +
        "searches <1% of the corpus — recall will be poor; raise nprobe")
    import spark.implicits._
    // NO floor or checkpoint here (unlike [[knnIvfPq]]): the cell
    // ranking is one native call per row and the probe join
    // broadcasts the small query side — both the r18 floor attempt
    // (0.42→0.65 s warm) and a floor+checkpoint attempt (→0.95 s)
    // measured SLOWER than the plain projection at sf0.1
    val base = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val sample = fitSample(base, "v", fitFraction, maxFitRows, seed,
      minRows = nCells * 8)
    val centers2d: Seq[Seq[Double]] =
      lloydFit(sample, nCells, maxIter = 10, seed).map(_.toSeq).toSeq

    // native cell ranking (graft.functions.NearestCells): one plan
    // node; the composed HOF form cost ~2s of codegen per fresh plan
    graft.functions.GraftFunctions.register(spark)
    val ranked = call_function("graft_nearest_cells", col("v"), typedlit(centers2d))
    val assigned = base.withColumn("ranked", ranked)
      .withColumn("cell", element_at(col("ranked"), 1))
    val q = assigned.filter(queryPred)
      .select(col("id").as("query_id"), col("v").as("qv"),
        explode(slice(col("ranked"), 1, nprobe)).as("cell"))

    val sims = assigned.drop("scored").join(broadcast(q), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("cand_id"),
        round(nativeCosine(emb)(col("qv"), col("v")), 6).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
    sims.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"))
  }

  /** Per-subspace PQ codebook fit on the driver sample: residuals vs
    * the nearest coarse center, split into `m` contiguous subvectors,
    * each clustered independently ([[lloydFit]], seeded per
    * subspace). Driver cost is sample_size × m small fits —
    * milliseconds for the 10-100k-vector samples [[knnIvf]] already
    * bounds; the result is m × nCodes × (dim/m) doubles, the same
    * size as ONE codebook of nCodes full-dim centers.
    */
  private[ops] def pqFit(sample: Array[Array[Double]],
      coarse: Array[Array[Double]], m: Int, nCodes: Int,
      seed: Long): Array[Array[Array[Double]]] = {
    val dim = sample(0).length
    require(dim % m == 0,
      s"embedding dim $dim must be divisible by m=$m subspaces")
    val ds = dim / m
    val resids = sample.map { p =>
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < coarse.length) {
        val cv = coarse(c)
        var d = 0.0; var j = 0
        while (j < dim) { val t = p(j) - cv(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      val cv = coarse(best)
      Array.tabulate(dim)(j => p(j) - cv(j))
    }
    Array.tabulate(m) { j =>
      val sub = resids.map(r =>
        java.util.Arrays.copyOfRange(r, j * ds, (j + 1) * ds))
      lloydFit(sub, nCodes, maxIter = 10, seed + 1 + j)
    }
  }

  /** IVF-PQ approximate top-k — the canonical billion-row ANN shape:
    * an IVF coarse quantizer restricts each query to `nprobe` cells,
    * and within them candidates are scored against PRODUCT-QUANTIZED
    * codes (m sub-codes of ⌈log2 nCodes⌉ bits each) by asymmetric
    * distance (ADC), not full vectors. At 100 TB this is the
    * difference between scanning m bytes and 4·d bytes per candidate
    * — the compressed `codes` frame (id, cell, array<int> — the
    * persisted "index" in a real deployment, built once per corpus
    * snapshot) is ~d·4/m× smaller than the embeddings, so the probe
    * scan is memory-bandwidth-cheap; full vectors are touched only to
    * re-rank the ADC shortlist (`refine`·k rows per query, a
    * broadcast-join fetch).
    *
    * Cosine is served by unit-normalizing up front: for unit vectors
    * argmin L2 = argmax cosine, so the L2 PQ machinery ranks
    * correctly and the refine step reports exact cosine (scale-
    * invariant, so it uses the RAW vectors — bit-identical to
    * [[knnBrute]]'s similarity, which makes recall directly
    * measurable).
    *
    * The ADC table is computed ONCE per (query, probed cell) by the
    * native `graft_pq_adc_table` (the composed HOF form — m nested
    * transform/aggregate trees over codebook literals — costs seconds
    * of whole-stage codegen, the NearestCells lesson); per candidate
    * the cost is m table lookups (`zip_with` over the m-element codes
    * array) + a sum. Encoding is `graft_pq_encode`, one plan node.
    *
    * Sizing: defaults (nCells=16, m=8, nCodes=16 → 4-bit codes)
    * assume the ≤10⁶-row bench corpus with its small fit sample; at
    * 10⁹ rows use nCells ≈ √N, nCodes=256 (byte codes, the FAISS
    * convention) and a fitFraction that still lands 10-100k sample
    * vectors on the driver. Deterministic via fixed seed; a vector
    * lands in exactly one cell and a query's probed cells are
    * distinct, so no candidate dedup is needed.
    */
  def knnIvfPq(spark: org.apache.spark.sql.SparkSession, emb: DataFrame,
      idCol: String, vecCol: String, queryPred: Column, k: Int,
      nCells: Int = 16, nprobe: Int = 4, m: Int = 8, nCodes: Int = 16,
      refine: Int = 4, seed: Long = 42L,
      fitFraction: Double = 0.1, maxFitRows: Int = 100000): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nCells >= 2, s"nCells must be >= 2, got $nCells")
    require(nprobe >= 1 && nprobe <= nCells,
      s"nprobe must be in [1, nCells], got $nprobe for nCells=$nCells")
    require(m >= 1, s"m must be >= 1, got $m")
    require(nCodes >= 2, s"nCodes must be >= 2, got $nCodes")
    require(refine >= 1, s"refine must be >= 1, got $refine")
    require(fitFraction > 0.0 && fitFraction <= 1.0,
      s"fitFraction must be in (0, 1], got $fitFraction")
    require(maxFitRows >= math.max(nCells, nCodes),
      s"maxFitRows must be >= max(nCells, nCodes), got $maxFitRows")
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // floor before the normalize + assign + PQ-encode per-row passes,
    // then pin the narrow (id, rv) rows ONCE: the frame feeds the fit
    // sample collect, the codes/query subtrees AND both refine legs —
    // without the checkpoint each of those re-reads the source and
    // re-runs the floor exchange per subtree. queryPred is evaluated
    // INTO the frame first: a checkpoint severs lineage, so the
    // caller's predicate (written against the source columns) could
    // not resolve afterwards.
    val raw = SkewOps.parallelismFloor(
      emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("rv"),
        queryPred.as("_q")))
      .localCheckpoint()
    // unit-normalize once into the row (norm materialized first: a
    // lambda referencing the aggregate directly would inline — and
    // recompute — it per element)
    val base = raw
      .withColumn("nrm", sqrt(aggregate(col("rv"), lit(0.0d), (acc, x) => acc + x * x)))
      .withColumn("v", when(col("nrm") > 0,
        transform(col("rv"), x => x / col("nrm"))).otherwise(col("rv")))
      .drop("nrm")

    val sample = fitSample(base, "v", fitFraction, maxFitRows, seed,
      minRows = nCells * 8)
    val coarse = lloydFit(sample, nCells, maxIter = 10, seed)
    val books = pqFit(sample, coarse, m, nCodes, seed)
    val centersLit = typedlit(coarse.map(_.toSeq).toSeq)
    val booksLit = typedlit(books.map(_.map(_.toSeq).toSeq).toSeq)

    val assigned = base
      .withColumn("ranked", call_function("graft_nearest_cells", col("v"), centersLit))
      .withColumn("cell", element_at(col("ranked"), 1))
      .withColumn("resid",
        zip_with(col("v"), element_at(centersLit, col("cell") + 1), _ - _))
    // the compressed index frame: all the probe scan ever reads
    val codes = assigned.select(col("id"), col("cell"),
      call_function("graft_pq_encode", col("resid"), booksLit).as("codes"))

    val q = assigned.filter(col("_q"))
      .select(col("id").as("query_id"),
        explode(slice(col("ranked"), 1, nprobe)).as("cell"), col("v"))
      .withColumn("qresid",
        zip_with(col("v"), element_at(centersLit, col("cell") + 1), _ - _))
      .select(col("query_id"), col("cell"),
        call_function("graft_pq_adc_table", col("qresid"), booksLit).as("tbl"))

    val shortW = Window.partitionBy("query_id")
      .orderBy(col("adc").asc, col("cand_id").asc)
    val shortlist = codes.join(broadcast(q), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("cand_id"),
        aggregate(zip_with(col("codes"), col("tbl"),
          (c, row) => element_at(row, c + 1)), lit(0.0d), _ + _).as("adc"))
      .withColumn("rn", row_number().over(shortW))
      .filter(col("rn") <= refine * k)
      .select("query_id", "cand_id")

    // refine: fetch full vectors for the tiny shortlist only, exact
    // cosine on RAW vectors (scale-invariant ⇒ identical to knnBrute)
    val qvecs = raw.filter(col("_q"))
      .select(col("id").as("query_id"), col("rv").as("qv"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
    raw.select(col("id").as("cand_id"), col("rv").as("cv"))
      .join(broadcast(shortlist), Seq("cand_id"))
      .join(broadcast(qvecs), Seq("query_id"))
      .select(col("query_id"), col("cand_id"),
        round(nativeCosine(emb)(col("qv"), col("cv")), 6).as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"))
  }

  /** Approximate top-k: candidates restricted to the query's LSH
    * bucket, plus `probes − 1` MULTI-PROBE variants — the query also
    * searches the buckets at Hamming distance 1 (one sign bit
    * flipped), in bit order. A near neighbor that falls just on the
    * other side of one hyperplane is recovered at (probes/2^nbits) of
    * the corpus cost, the standard recall/latency dial for
    * sign-bucket LSH.
    *
    * Bucketing the corpus is one projection; the join is an equi-join
    * on the bucket key against the (probes×) exploded, broadcast query
    * side — the corpus is never replicated or re-shuffled.
    *
    * Sizing: expected candidates per query ≈ probes × N/2^nbits — keep
    * that in the 10³–10⁵ band (10⁹ rows → nbits ≈ 16–20, probes 4–8;
    * the nbits=8 default assumes ≤10⁶ rows). More nbits cuts cost and
    * recall; more probes buys recall back linearly in cost.
    */
  def knnLsh(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, nbits: Int = 8, probes: Int = 1,
      bucketExpr: (Column, Int) => Column = lshBucket): DataFrame = {
    require(probes >= 1 && probes <= nbits + 1,
      s"probes must be in [1, nbits+1], got $probes for nbits=$nbits")
    graft.functions.GraftFunctions.register(emb.sparkSession)
    // floor before the per-row bucket hash + candidate cosine scan
    val base = SkewOps.parallelismFloor(
        emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v")))
      .withColumn("bucket", bucketExpr(col("v"), nbits))
    val probeBuckets = array((0 until probes).map {
      case 0 => col("bucket")
      case p => col("bucket").bitwiseXOR(lit(1L << (p - 1)))
    }: _*)
    val q = base.filter(queryPred)
      .select(col("id").as("query_id"), col("v").as("qv"),
        explode(probeBuckets).as("bucket"))
    val sims = base.join(broadcast(q), Seq("bucket"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("cand_id"),
        round(nativeCosine(emb)(col("qv"), col("v")), 6).as("sim"))
    // no dedup needed: each candidate has exactly ONE bucket and a
    // query's probed buckets are pairwise distinct, so a (query,
    // candidate) pair can match at most one probe row
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
    sims.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"))
  }

  /** DuckDB replay of [[knnLsh]] under the [[lshBucketMd5]] family:
    * sign-plane buckets (literal planes from the same generator),
    * Hamming-1 multi-probe via xor, 6dp cosine, per-query top-k.
    */
  def knnLshMd5OracleSql(table: String, idCol: String, vecCol: String,
      queryPredSql: String, k: Int, nbits: Int, probes: Int,
      d: Int): String = {
    val bucket = lshBucketMd5Sql("v", nbits, d)
    val probeList = ("bucket" +: (1 until probes)
      .map(p => s"xor(bucket, ${1L << (p - 1)})")).mkString("[", ", ", "]")
    s"""WITH base AS (
       | SELECT $idCol AS id, CAST($vecCol AS DOUBLE[]) AS v FROM $table),
       |bk AS (SELECT id, v, $bucket AS bucket FROM base),
       |q AS (SELECT id AS query_id, v AS qv,
       |   unnest($probeList) AS bucket
       |  FROM bk WHERE $queryPredSql),
       |s AS (SELECT query_id, bk.id AS cand_id,
       |   round(list_cosine_similarity(qv, bk.v), 6) AS sim
       |  FROM bk JOIN q USING (bucket) WHERE bk.id <> q.query_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |   ORDER BY sim DESC, cand_id) AS rn FROM s)
       |SELECT query_id, cand_id, sim FROM r WHERE rn <= $k""".stripMargin
  }

  /** DuckDB replay of [[knnIvf]] — the WHOLE pipeline, fit included:
    * sample membership/order from [[fitVecKey]] (portable micro-unit
    * rendering), [[lloydFit]]'s first-distinct-in-order init, every
    * Lloyd iteration unrolled into CTEs (the q113 discipline applied
    * to the sampled fit), then corpus assignment, multi-probe and the
    * 6dp-cosine top-k. Exactness rests on defined float order at
    * every step: the left-associated distance chain matches the
    * kernel's sequential accumulation, and center updates replay the
    * driver loop's point-order double sums via `list_sum(list(x ORDER
    * BY rn))` (DuckDB's list_sum folds left-to-right). The early
    * convergence exit needs no modelling — at a fixed point the
    * remaining unrolled iterations recompute identical centers. The
    * tiny-corpus fallback (empty sample) is not modelled: oracle-SF
    * corpora put hundreds of vectors under the fraction threshold.
    */
  def knnIvfOracleSql(table: String, idCol: String, vecCol: String,
      queryPredSql: String, k: Int, nCells: Int, nprobe: Int,
      seed: Long, fitFraction: Double, maxFitRows: Int, d: Int,
      maxIter: Int = 10): String = {
    val thr = SampleOps.thresholdHex(fitFraction)
    val keySql = s"substring(md5('fit:$seed:' || list_aggregate(" +
      s"list_transform(v, x -> CAST(floor(x * 10000000.0) AS BIGINT))" +
      s", 'string_agg', ',')), 1, 13)"
    val seedCtes =
      s"""base AS MATERIALIZED (SELECT $idCol AS id,
         |    CAST($vecCol AS DOUBLE[]) AS v FROM $table),
         |samp AS MATERIALIZED (SELECT v,
         |    row_number() OVER (ORDER BY fk, v) AS rn
         |  FROM (SELECT v, $keySql AS fk FROM base)
         |  WHERE fk < '$thr' ORDER BY fk, v LIMIT $maxFitRows),
         |c0 AS MATERIALIZED (SELECT
         |    CAST(row_number() OVER (ORDER BY mn) - 1 AS INT) AS cell, v
         |  FROM (SELECT v, min(rn) AS mn FROM samp GROUP BY v)
         |  ORDER BY mn LIMIT $nCells)""".stripMargin
    val iters = (1 to maxIter).map { t =>
      val p = t - 1
      s"""a$t AS MATERIALIZED (SELECT rn, v, cell FROM (
         |  SELECT s.rn, s.v, c.cell, row_number() OVER (PARTITION BY s.rn
         |      ORDER BY ${sqDistSql("s.v", "c.v", d)}, c.cell) AS rnk
         |    FROM samp s CROSS JOIN c$p c) WHERE rnk = 1),
         |s$t AS MATERIALIZED (SELECT cell, pos,
         |    list_sum(list(x ORDER BY rn)) / count(*) AS m
         |  FROM (SELECT rn, cell, unnest(v) AS x,
         |      unnest(range(1, ${d + 1})) AS pos FROM a$t)
         |  GROUP BY cell, pos),
         |c$t AS MATERIALIZED (SELECT cell,
         |    list(coalesce(m, x) ORDER BY pos) AS v
         |  FROM (SELECT cell, unnest(v) AS x,
         |      unnest(range(1, ${d + 1})) AS pos FROM c$p) pc
         |  LEFT JOIN s$t USING (cell, pos) GROUP BY cell)""".stripMargin
    }
    val serve =
      s"""rkd AS MATERIALIZED (SELECT b.id, b.v, c.cell,
         |    row_number() OVER (PARTITION BY b.id
         |    ORDER BY ${sqDistSql("b.v", "c.v", d)}, c.cell) AS rnk
         |  FROM base b CROSS JOIN c$maxIter c),
         |cells AS (SELECT id, v, cell FROM rkd WHERE rnk = 1),
         |probe AS (SELECT id AS query_id, v AS qv, cell FROM rkd
         |  WHERE rnk <= $nprobe AND $queryPredSql),
         |sims AS (SELECT query_id, cells.id AS cand_id,
         |    round(list_cosine_similarity(qv, cells.v), 6) AS sim
         |  FROM cells JOIN probe USING (cell)
         |  WHERE cells.id <> probe.query_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY sim DESC, cand_id) AS rn FROM sims)
         |SELECT query_id, cand_id, sim FROM r WHERE rn <= $k""".stripMargin
    "WITH " + ((seedCtes +: iters).mkString(",\n")) + ",\n" + serve
  }

  /** DuckDB replay of [[knnIvfPq]] — the [[knnIvfOracleSql]]
    * discipline extended through product quantization: unit
    * normalization (ordered square-sum chain), the coarse Lloyd fit,
    * per-sample residuals, `m` per-subspace codebook fits (each its
    * own unrolled Lloyd chain over `d/m`-dim slices, first-distinct
    * init in sample order), PQ encoding and the ADC shortlist
    * (per-subspace distance terms summed in subspace order — the
    * kernel's fold), then the exact-cosine refine on RAW vectors.
    * Every kernel ([[graft.functions.PqCodec]], NearestCells) is a
    * sequential fold with ties to the lower index, so the replay is
    * bit-exact. ~500 CTEs at m=16 — all MATERIALIZED (inlining the
    * chain re-evaluates it exponentially).
    */
  def knnIvfPqOracleSql(table: String, idCol: String, vecCol: String,
      queryPredSql: String, k: Int, nCells: Int, nprobe: Int,
      m: Int, nCodes: Int, refine: Int, seed: Long,
      fitFraction: Double, maxFitRows: Int, d: Int,
      maxIter: Int = 10): String = {
    require(d % m == 0, s"d=$d must be divisible by m=$m")
    val ds = d / m
    val thr = SampleOps.thresholdHex(fitFraction)
    val keySql = s"substring(md5('fit:$seed:' || list_aggregate(" +
      s"list_transform(v, x -> CAST(floor(x * 10000000.0) AS BIGINT))" +
      s", 'string_agg', ',')), 1, 13)"
    val nrmChain = "(0.0 + " +
      (1 to d).map(j => s"rv[$j]*rv[$j]").mkString(" + ") + ")"
    // one Lloyd chain: first-distinct-in-order init + maxIter unrolled
    // iterations over (rn, v) rows of `sampCte`, dims `dd`, k `kk`
    def lloydChain(pfx: String, sampCte: String, kk: Int,
        dd: Int): Seq[String] = {
      val c0 =
        s"""${pfx}c0 AS MATERIALIZED (SELECT
           |    CAST(row_number() OVER (ORDER BY mn) - 1 AS INT) AS cell, v
           |  FROM (SELECT v, min(rn) AS mn FROM $sampCte GROUP BY v)
           |  ORDER BY mn LIMIT $kk)""".stripMargin
      val its = (1 to maxIter).map { t =>
        val p = t - 1
        s"""${pfx}a$t AS MATERIALIZED (SELECT rn, v, cell FROM (
           |  SELECT s.rn, s.v, c.cell, row_number() OVER (PARTITION BY s.rn
           |      ORDER BY ${sqDistSql("s.v", "c.v", dd)}, c.cell) AS rnk
           |    FROM $sampCte s CROSS JOIN ${pfx}c$p c) WHERE rnk = 1),
           |${pfx}s$t AS MATERIALIZED (SELECT cell, pos,
           |    list_sum(list(x ORDER BY rn)) / count(*) AS mm
           |  FROM (SELECT rn, cell, unnest(v) AS x,
           |      unnest(range(1, ${dd + 1})) AS pos FROM ${pfx}a$t)
           |  GROUP BY cell, pos),
           |${pfx}c$t AS MATERIALIZED (SELECT cell,
           |    list(coalesce(mm, x) ORDER BY pos) AS v
           |  FROM (SELECT cell, unnest(v) AS x,
           |      unnest(range(1, ${dd + 1})) AS pos FROM ${pfx}c$p) pc
           |  LEFT JOIN ${pfx}s$t USING (cell, pos) GROUP BY cell)""".stripMargin
      }
      c0 +: its
    }
    val head =
      s"""raw AS MATERIALIZED (SELECT $idCol AS id,
         |    CAST($vecCol AS DOUBLE[]) AS rv FROM $table),
         |base AS MATERIALIZED (SELECT id, rv,
         |    CASE WHEN nrm > 0 THEN list_transform(rv, x -> x / nrm)
         |    ELSE rv END AS v
         |  FROM (SELECT id, rv, sqrt($nrmChain) AS nrm FROM raw)),
         |samp AS MATERIALIZED (SELECT v,
         |    row_number() OVER (ORDER BY fk, v) AS rn
         |  FROM (SELECT v, $keySql AS fk FROM base)
         |  WHERE fk < '$thr' ORDER BY fk, v LIMIT $maxFitRows)""".stripMargin
    val coarse = lloydChain("", "samp", nCells, d)
    val resids =
      s"""sasg AS MATERIALIZED (SELECT rn, v, cell FROM (
         |  SELECT s.rn, s.v, c.cell, row_number() OVER (PARTITION BY s.rn
         |      ORDER BY ${sqDistSql("s.v", "c.v", d)}, c.cell) AS rnk
         |    FROM samp s CROSS JOIN c$maxIter c) WHERE rnk = 1),
         |sres AS MATERIALIZED (SELECT a.rn,
         |    list_transform(range(1, ${d + 1}), i -> a.v[i] - c.v[i]) AS r
         |  FROM sasg a JOIN c$maxIter c USING (cell))""".stripMargin
    // all m subspace fits run as ONE sub-keyed chain (a column, not
    // m separate CTE chains — 10x fewer materializations, identical
    // per-sub arithmetic)
    val subDist4 = (1 to ds).map(i =>
      s"(s.v[$i]-c.v[$i])*(s.v[$i]-c.v[$i])").mkString(" + ")
    val subSeed =
      s"""psamp AS MATERIALIZED (SELECT CAST(t.sub AS INT) AS sub, rn,
         |    list_slice(r, t.sub*$ds + 1, t.sub*$ds + $ds) AS v
         |  FROM sres, range(0, $m) t(sub)),
         |pc0 AS MATERIALIZED (SELECT sub, CAST(rnk - 1 AS INT) AS cell, v
         |  FROM (SELECT sub, v, row_number() OVER (PARTITION BY sub
         |      ORDER BY mn) AS rnk
         |    FROM (SELECT sub, v, min(rn) AS mn FROM psamp
         |      GROUP BY sub, v)) WHERE rnk <= $nCodes)""".stripMargin
    val subIters = (1 to maxIter).map { t =>
      val p = t - 1
      s"""pa$t AS MATERIALIZED (SELECT sub, rn, v, cell FROM (
         |  SELECT s.sub, s.rn, s.v, c.cell,
         |      row_number() OVER (PARTITION BY s.sub, s.rn
         |        ORDER BY $subDist4, c.cell) AS rnk
         |    FROM psamp s JOIN pc$p c USING (sub)) WHERE rnk = 1),
         |ps$t AS MATERIALIZED (SELECT sub, cell, pos,
         |    list_sum(list(x ORDER BY rn)) / count(*) AS mm
         |  FROM (SELECT sub, rn, cell, unnest(v) AS x,
         |      unnest(range(1, ${ds + 1})) AS pos FROM pa$t)
         |  GROUP BY sub, cell, pos),
         |pc$t AS MATERIALIZED (SELECT sub, cell,
         |    list(coalesce(mm, x) ORDER BY pos) AS v
         |  FROM (SELECT sub, cell, unnest(v) AS x,
         |      unnest(range(1, ${ds + 1})) AS pos FROM pc$p) pcq
         |  LEFT JOIN ps$t USING (sub, cell, pos) GROUP BY sub, cell)""".stripMargin
    }
    val subFits = subSeed +: subIters
    val books =
      s"books AS MATERIALIZED (SELECT sub, cell AS code, v FROM pc$maxIter)"
    // per-subspace distance between a full-resid slice and a book
    // entry, offset by the (qualified) `sub` COLUMN (1-based indexing)
    def subDist(rCol: String, bCol: String, subRef: String): String =
      (1 to ds).map(i =>
        s"($rCol[$subRef*$ds + $i] - $bCol[$i])" +
          s"*($rCol[$subRef*$ds + $i] - $bCol[$i])")
        .mkString(" + ")
    val serve =
      s"""rkd AS MATERIALIZED (SELECT b.id, b.v, c.cell,
         |    row_number() OVER (PARTITION BY b.id
         |    ORDER BY ${sqDistSql("b.v", "c.v", d)}, c.cell) AS rnk
         |  FROM base b CROSS JOIN c$maxIter c),
         |cells AS MATERIALIZED (SELECT id, v, cell FROM rkd WHERE rnk = 1),
         |resid AS MATERIALIZED (SELECT t.id, t.cell,
         |    list_transform(range(1, ${d + 1}), i -> t.v[i] - c.v[i]) AS r
         |  FROM cells t JOIN c$maxIter c USING (cell)),
         |codes AS MATERIALIZED (SELECT id, cell, sub, code FROM (
         |  SELECT rr.id, rr.cell, b.sub, b.code,
         |      row_number() OVER (PARTITION BY rr.id, b.sub
         |        ORDER BY ${subDist("rr.r", "b.v", "b.sub")}, b.code) AS rnk
         |    FROM resid rr CROSS JOIN books b) WHERE rnk = 1),
         |qprobe AS MATERIALIZED (SELECT id AS query_id, v AS qv, cell
         |  FROM rkd WHERE rnk <= $nprobe AND $queryPredSql),
         |qres AS MATERIALIZED (SELECT q.query_id, q.cell,
         |    list_transform(range(1, ${d + 1}), i -> q.qv[i] - c.v[i]) AS r
         |  FROM qprobe q JOIN c$maxIter c USING (cell)),
         |adcterm AS MATERIALIZED (SELECT q.query_id, cd.id AS cand_id,
         |    cd.sub AS sub, ${subDist("q.r", "b.v", "b.sub")} AS term
         |  FROM qres q JOIN codes cd ON q.cell = cd.cell
         |  JOIN books b ON b.sub = cd.sub AND b.code = cd.code
         |  WHERE cd.id <> q.query_id),
         |adc AS MATERIALIZED (SELECT query_id, cand_id,
         |    list_sum(list(term ORDER BY sub)) AS adc
         |  FROM adcterm GROUP BY query_id, cand_id),
         |short AS MATERIALIZED (SELECT query_id, cand_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY adc ASC, cand_id ASC) AS rn FROM adc)
         |  WHERE rn <= ${refine * k}),
         |qv AS (SELECT id AS query_id, rv AS qvec FROM raw
         |  WHERE $queryPredSql),
         |fin AS (SELECT s.query_id, s.cand_id,
         |    round(list_cosine_similarity(q.qvec, c.rv), 6) AS sim
         |  FROM short s JOIN raw c ON c.id = s.cand_id
         |  JOIN qv q USING (query_id))
         |SELECT query_id, cand_id, sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, cand_id) AS rn FROM fin) WHERE rn <= $k""".stripMargin
    "WITH " + ((Seq(head) ++ coarse ++ Seq(resids) ++ subFits ++
      Seq(books)).mkString(",\n")) + ",\n" + serve
  }

  /** DuckDB replay of the WHOLE [[annRecallReport]] scoreboard under
    * the md5 plane family: both exact baselines ([[knnBrute]] top-k,
    * [[exactCosinePairs]]), all four approximate kernels (each its
    * own oracle generator nested as a CTE body), and the
    * [[recallRow]] arithmetic (distinct-key left join, NULL recall on
    * an empty baseline, 4dp round). Models sampleFraction = 1.0 only
    * (the registered q83 shape; the sampled path stays spec-covered).
    */
  def annRecallMd5OracleSql(table: String, idCol: String,
      vecCol: String, queryPredSql: String, k: Int, nbitsKnn: Int,
      probes: Int, minCosine: Double, nbitsPairs: Int, d: Int,
      nCells: Int = 16, nprobe: Int = 4, pqNprobe: Int = 8,
      m: Int = 16, nCodes: Int = 16, refine: Int = 8,
      seed: Long = 42L, fitFraction: Double = 0.1,
      maxFitRows: Int = 100000): String = {
    def recallSelect(exact: String, approx: String, keys: Seq[String],
        method: String, kOut: Int): String = {
      val ks = keys.mkString(", ")
      s"""SELECT '$method' AS method, CAST($kOut AS INT) AS k,
         |  CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(count(h) AS BIGINT) AS n_hit,
         |  CASE WHEN count(*) = 0 THEN CAST(NULL AS DOUBLE)
         |    ELSE round(CAST(count(h) AS DOUBLE) / count(*), 4)
         |  END AS recall
         |FROM (SELECT DISTINCT $ks FROM $exact) e
         |LEFT JOIN (SELECT DISTINCT $ks, 1 AS h FROM $approx) a
         |  USING ($ks)""".stripMargin
    }
    val knnKeys = Seq("query_id", "cand_id")
    s"""WITH bb AS MATERIALIZED (SELECT $idCol AS id,
       |    CAST($vecCol AS DOUBLE[]) AS v FROM $table),
       |bq AS (SELECT id AS query_id, v AS qv FROM bb
       |  WHERE $queryPredSql),
       |brute AS MATERIALIZED (SELECT query_id, cand_id FROM (
       |  SELECT query_id, bb.id AS cand_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY
       |      round(list_cosine_similarity(qv, bb.v), 6) DESC, bb.id) AS rn
       |    FROM bb, bq WHERE bb.id <> bq.query_id) WHERE rn <= $k),
       |pexact AS MATERIALIZED (SELECT a.id AS a_id, b.id AS b_id
       |  FROM bb a JOIN bb b ON a.id < b.id
       |  WHERE round(list_cosine_similarity(a.v, b.v), 6) >= $minCosine),
       |lshq AS MATERIALIZED (${knnLshMd5OracleSql(table, idCol, vecCol,
            queryPredSql, k, nbitsKnn, probes, d)}),
       |ivfq AS MATERIALIZED (${knnIvfOracleSql(table, idCol, vecCol,
            queryPredSql, k, nCells, nprobe, seed, fitFraction,
            maxFitRows, d)}),
       |pqq AS MATERIALIZED (${knnIvfPqOracleSql(table, idCol, vecCol,
            queryPredSql, k, nCells, pqNprobe, m, nCodes, refine, seed,
            fitFraction, maxFitRows, d)}),
       |ndp AS MATERIALIZED (${embeddingNearDupMd5OracleSql(table, idCol,
            vecCol, minCosine, nbitsPairs, d)})
       |${recallSelect("brute", "lshq", knnKeys, "knn_lsh", k)}
       |UNION ALL ${recallSelect("brute", "ivfq", knnKeys, "knn_ivf", k)}
       |UNION ALL ${recallSelect("brute", "pqq", knnKeys, "knn_ivfpq", k)}
       |UNION ALL ${recallSelect("pexact", "ndp", Seq("a_id", "b_id"),
            "neardup_pairs", 0)}""".stripMargin
  }

  /** DuckDB replay of [[embeddingNearDupPairs]] under the
    * [[lshBucketMd5]] family: same-bucket pairs (a < b), 6dp cosine
    * threshold. Like every banded-family oracle this does not model
    * the `maxBucketSize` cap (DropGuard makes a cap drop loud on the
    * Spark side; oracle-SF corpora sit far below it).
    */
  def embeddingNearDupMd5OracleSql(table: String, idCol: String,
      vecCol: String, minCosine: Double, nbits: Int, d: Int): String = {
    val bucket = lshBucketMd5Sql("v", nbits, d)
    s"""WITH base AS (
       | SELECT $idCol AS id, CAST($vecCol AS DOUBLE[]) AS v FROM $table),
       |bk AS (SELECT id, v, $bucket AS bucket FROM base)
       |SELECT a.id AS a_id, b.id AS b_id,
       |  round(list_cosine_similarity(a.v, b.v), 6) AS cos
       |FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.id < b.id
       |WHERE round(list_cosine_similarity(a.v, b.v), 6) >= $minCosine""".stripMargin
  }

  /** Distributed Lloyd's k-means over the FULL corpus — the semantic
    * clustering primitive behind cluster-balanced sampling, SemDeDup
    * cluster-then-dedup, and mixture design. [[lloydFit]] (the IVF
    * coarse quantizer) trains on a driver-bounded SAMPLE; this one is
    * for when the cluster structure must reflect every vector: each
    * iteration is ONE corpus pass — a narrow nearest-center map
    * (native graft_nearest_cells against a center literal, the knnIvf
    * idiom) feeding a (cell, dim)-keyed decimal sum that map-side
    * combines to at most k·d rows per partition — and only k·d
    * numbers ever reach the driver.
    *
    * Deterministic by construction, not by luck: init picks the k
    * lexicographically-smallest md5-coordinate vectors (partition-
    * invariant, no RNG), iteration count is FIXED (no convergence
    * test, so the result cannot depend on scheduling), and every sum
    * is decimal(38,18) — associative, so bit-identical under any
    * partitioning. Empty cells keep their previous center (the
    * lloydFit contract).
    *
    * Returns (finalCenters, assignment frame (id, cluster)); the
    * assignment is lazily recomputed from the final centers — callers
    * that persist it pay one extra scan, never a wide shuffle.
    */
  private def kmeansCore(spark: org.apache.spark.sql.SparkSession,
      emb: DataFrame, idCol: String, vecCol: String, k: Int,
      maxIter: Int): (Seq[Seq[Double]], DataFrame) = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val base = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    // ONE corpus materialization for the whole Lloyd loop: the seed
    // fetch plus maxIter assignment+aggregate jobs all read this
    // executor-cached projection (the GraphOps localCheckpoint loop
    // discipline) — without it each of those 1+maxIter jobs re-scans
    // the raw corpus (7 full reads at the defaults, the r13 plan
    // audit's one efficiency anti-pattern). Released after the loop;
    // the returned assignment is built on the UNCACHED base so it
    // stays valid for callers after the release (its lazy-recompute
    // contract is one scan per downstream action, unchanged).
    val baseC = base.localCheckpoint()
    try {
    // deterministic seeding: k distinct vectors in md5-coordinate
    // order. The 8k-row candidate fetch is driver-bounded (TakeOrdered)
    // and the overfetch absorbs duplicate vectors.
    val cand = baseC
      .withColumn("_c", md5(concat(lit("kmeans:"), col("id").cast("string"))))
      .orderBy("_c").limit(math.max(k * 8, 64))
      .select("v").as[Seq[Double]].collect()
    val init = cand.distinct.take(k)
    require(init.length == k,
      s"corpus has only ${init.length} distinct vectors in the seed " +
        s"window, need k=$k")
    var centers: Seq[Seq[Double]] = init.toIndexedSeq.map(_.toSeq)
    val sumT = "decimal(38,18)"
    for (_ <- 1 to maxIter) {
      val assigned = baseC.withColumn("cell",
        element_at(call_function("graft_nearest_cells",
          col("v"), typedlit(centers)), 1))
      val sums = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(sum(col("x").cast(sumT)).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = centers.map(_.toArray).toArray
      sums.groupBy(_.getInt(0)).foreach { case (cell, rows) =>
        val n = rows.head.getLong(3)
        if (n > 0) rows.foreach { r =>
          next(cell)(r.getInt(1)) = (r.getDecimal(2).doubleValue) / n
        }
      }
      centers = next.map(_.toSeq).toSeq
    }
    val assignment = base.withColumn("cluster",
      element_at(call_function("graft_nearest_cells",
        col("v"), typedlit(centers)), 1))
    (centers, assignment)
    } finally Checkpoints.release(baseC)
  }

  /** Per-vector cluster assignment: (id, cluster). */
  def kmeansAssign(spark: org.apache.spark.sql.SparkSession, emb: DataFrame,
      idCol: String, vecCol: String, k: Int = 16, maxIter: Int = 5): DataFrame =
    kmeansCore(spark, emb, idCol, vecCol, k, maxIter)._2.select("id", "cluster")

  /** Cluster-balanced deterministic sample: ~`targetPerCluster`
    * members from EACH semantic cluster — the "flatten the topic
    * distribution" curation move (dominant web clusters down-sampled,
    * rare technical clusters kept whole). Composition contract:
    * cluster structure from the full-corpus k-means, membership
    * decision from the content-hash sampler — so the sample is
    * reproducible row-for-row on any engine/partitioning, and
    * re-running with a different target only moves the per-cluster
    * thresholds, not the coordinate each document hashes to.
    *
    * Scale shape: the corpus never shuffles — assignment is a narrow
    * map, cluster sizes are a k-row aggregate collected as a control
    * table, and the per-cluster keep-threshold returns to the plan as
    * a CASE literal over [[SampleOps.thresholdHex]] strings feeding a
    * pure filter.
    */
  def clusterBalancedSample(spark: org.apache.spark.sql.SparkSession,
      emb: DataFrame, idCol: String, vecCol: String,
      targetPerCluster: Long, k: Int = 16, maxIter: Int = 5,
      salt: String = "cluster_balance"): DataFrame = {
    require(targetPerCluster >= 1,
      s"targetPerCluster must be >= 1, got $targetPerCluster")
    val (_, assigned) = kmeansCore(spark, emb, idCol, vecCol, k, maxIter)
    val keyed = assigned.select(col("id"), col("cluster"))
    val sizes = keyed.groupBy("cluster").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val thr = sizes.map { case (c, n) =>
      c -> SampleOps.thresholdHex(
        math.min(1.0, targetPerCluster.toDouble / n))
    }
    val thrCase = thr.foldLeft(lit(SampleOps.thresholdHex(0.0))) {
      case (acc, (c, t)) => when(col("cluster") === c, lit(t)).otherwise(acc)
    }
    keyed.filter(SampleOps.hashCoord(col("id"), salt) < thrCase)
  }

  /** Cluster exemplars: the `m` members nearest each final center
    * (ties to lowest id) — what a human reads to label a cluster
    * before weighting it, and the seed set for cluster-level audits.
    * One narrow map for distances + a per-cluster top-m window (k·m
    * rows out); the corpus never shuffles beyond the window's
    * cluster-keyed exchange.
    */
  def kmeansExemplars(spark: org.apache.spark.sql.SparkSession,
      emb: DataFrame, idCol: String, vecCol: String,
      k: Int = 16, maxIter: Int = 5, m: Int = 3): DataFrame = {
    require(m >= 1, s"m must be >= 1, got $m")
    val (centers, assigned) = kmeansCore(spark, emb, idCol, vecCol, k, maxIter)
    val centersDf = broadcast(
      spark.createDataFrame(centers.zipWithIndex.map { case (c, i) => (i, c) })
        .toDF("cluster", "_center"))
    val w = Window.partitionBy("cluster")
      .orderBy(col("_sq").asc, col("id").asc)
    assigned.join(centersDf, "cluster")
      .withColumn("_sq", aggregate(
        zip_with(col("v"), col("_center"), (a, b) => (a - b) * (a - b)),
        lit(0.0), _ + _))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= m)
      .select(col("cluster"), col("id"), col("rank"),
        round(col("_sq"), 6).as("sq_dist"))
  }

  /** Cluster profile: one row per cluster with member count and
    * decimal-exact inertia (sum of squared distances to the final
    * center) — the shape/balance diagnostic a mixture designer reads
    * before weighting clusters. k rows out; inertia sums are decimal
    * so the profile is bit-reproducible under any partitioning.
    */
  def kmeansClusterProfile(spark: org.apache.spark.sql.SparkSession,
      emb: DataFrame, idCol: String, vecCol: String,
      k: Int = 16, maxIter: Int = 5): DataFrame = {
    val (centers, assigned) = kmeansCore(spark, emb, idCol, vecCol, k, maxIter)
    val centersDf = broadcast(
      spark.createDataFrame(centers.zipWithIndex.map { case (c, i) => (i, c) })
        .toDF("cluster", "_center"))
    assigned.join(centersDf, "cluster")
      .withColumn("_sq", aggregate(
        zip_with(col("v"), col("_center"), (a, b) => (a - b) * (a - b)),
        lit(0.0), _ + _))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_members"),
        round(sum(col("_sq").cast("decimal(38,12)")).cast("double"), 6)
          .as("inertia"))
      .withColumn("mean_sq_dist",
        round(col("inertia") / col("n_members"), 6))
  }

  /** Explicit left-associated squared-L2 chain between two DOUBLE[]
    * columns — SQL's `a + b + c` parses left-assoc, so the chain
    * reproduces [[NearestCellsUtil.rank]]'s sequential double
    * accumulation term-for-term (the reason the kmeans family CAN be
    * oracled: every float op in the loop has a defined order). */
  private def sqDistSql(a: String, b: String, d: Int): String =
    (1 to d).map(j => s"($a[$j]-$b[$j])*($a[$j]-$b[$j])").mkString(" + ")

  /** ANSI-SQL replay of [[kmeansCore]] as a CTE chain — the md5-twin
    * discipline applied to ITERATION rather than hashing: the loop is
    * fixed-count with no convergence test, seeds are md5-ordered, and
    * every reduction is decimal or an ordered double fold, so each
    * Lloyd step is one more CTE and the whole fit replays bit-for-bit
    * (multiplying a double by 2^52, decimal(38,18) sums, and the
    * left-assoc distance chain are all exact on both engines).
    * Produces CTE bodies ending in `c<maxIter>` (cell, v) = final
    * centers and `fin` (id, v, cluster) = final assignment; callers
    * append their finishing SELECT.
    */
  private def kmeansOracleCtes(table: String, idCol: String,
      vecCol: String, k: Int, maxIter: Int, d: Int): String = {
    val candN = math.max(k * 8, 64)
    val seed =
      s"""base AS MATERIALIZED (SELECT $idCol AS id,
         |    CAST($vecCol AS DOUBLE[]) AS v FROM $table),
         |cand AS (SELECT v, row_number() OVER (
         |    ORDER BY md5('kmeans:' || CAST(id AS VARCHAR))) AS rn
         |  FROM base ORDER BY rn LIMIT $candN),
         |c0 AS MATERIALIZED (SELECT
         |    CAST(row_number() OVER (ORDER BY mn) - 1 AS INT) AS cell, v
         |  FROM (SELECT v, min(rn) AS mn FROM cand GROUP BY v)
         |  ORDER BY mn LIMIT $k)""".stripMargin
    val iters = (1 to maxIter).map { t =>
      val p = t - 1
      s"""a$t AS MATERIALIZED (SELECT id, v, cell FROM (
         |  SELECT b.id, b.v, c.cell, row_number() OVER (PARTITION BY b.id
         |      ORDER BY ${sqDistSql("b.v", "c.v", d)}, c.cell) AS rnk
         |    FROM base b CROSS JOIN c$p c) WHERE rnk = 1),
         |s$t AS MATERIALIZED (SELECT cell, pos,
         |    CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS m
         |  FROM (SELECT cell, unnest(v) AS x,
         |      unnest(range(1, ${d + 1})) AS pos FROM a$t)
         |  GROUP BY cell, pos),
         |c$t AS MATERIALIZED (SELECT cell,
         |    list(coalesce(m, x) ORDER BY pos) AS v
         |  FROM (SELECT cell, unnest(v) AS x,
         |      unnest(range(1, ${d + 1})) AS pos FROM c$p) pc
         |  LEFT JOIN s$t USING (cell, pos) GROUP BY cell)""".stripMargin
    }
    val fin =
      s"""fin AS MATERIALIZED (SELECT id, v, cell AS cluster FROM (
         |  SELECT b.id, b.v, c.cell, row_number() OVER (PARTITION BY b.id
         |      ORDER BY ${sqDistSql("b.v", "c.v", d)}, c.cell) AS rnk
         |    FROM base b CROSS JOIN c$maxIter c) WHERE rnk = 1)""".stripMargin
    (seed +: iters :+ fin).mkString(",\n")
  }

  /** DuckDB replay of [[kmeansClusterProfile]] (q113). */
  def kmeansProfileOracleSql(table: String, idCol: String, vecCol: String,
      k: Int, maxIter: Int, d: Int): String =
    s"""WITH ${kmeansOracleCtes(table, idCol, vecCol, k, maxIter, d)},
       |pr AS (SELECT f.cluster, count(*) AS n_members,
       |    round(CAST(sum(CAST((${sqDistSql("f.v", "c.v", d)})
       |      AS DECIMAL(38,12))) AS DOUBLE), 6) AS inertia
       |  FROM fin f JOIN c$maxIter c ON f.cluster = c.cell
       |  GROUP BY f.cluster)
       |SELECT cluster, n_members, inertia,
       |  round(inertia / n_members, 6) AS mean_sq_dist FROM pr""".stripMargin

  /** DuckDB replay of [[clusterBalancedSample]] (q115): the kmeans
    * CTE chain plus [[SampleOps.thresholdHex]] in SQL —
    * `floor((t/n) * 2^52)` is exact because scaling a double by a
    * power of two only shifts the exponent, so the printed hex
    * threshold matches the Scala BigDecimal truncation digit-for-
    * digit. */
  def clusterBalanceOracleSql(table: String, idCol: String,
      vecCol: String, k: Int, maxIter: Int, d: Int,
      targetPerCluster: Long, salt: String): String =
    s"""WITH ${kmeansOracleCtes(table, idCol, vecCol, k, maxIter, d)},
       |thr AS (SELECT cluster,
       |    CASE WHEN $targetPerCluster.0 / count(*) >= 1.0 THEN 'g'
       |    ELSE printf('%013x', CAST(floor(($targetPerCluster.0 / count(*))
       |      * 4503599627370496) AS BIGINT)) END AS t
       |  FROM fin GROUP BY cluster)
       |SELECT f.id, f.cluster FROM fin f JOIN thr USING (cluster)
       |WHERE substring(md5('$salt' || CAST(f.id AS VARCHAR)), 1, 13)
       |  < thr.t""".stripMargin

  /** DuckDB replay of [[kmeansExemplars]] (q122). */
  def kmeansExemplarsOracleSql(table: String, idCol: String,
      vecCol: String, k: Int, maxIter: Int, d: Int, m: Int): String =
    s"""WITH ${kmeansOracleCtes(table, idCol, vecCol, k, maxIter, d)},
       |dd AS (SELECT f.cluster, f.id,
       |    (${sqDistSql("f.v", "c.v", d)}) AS sq
       |  FROM fin f JOIN c$maxIter c ON f.cluster = c.cell),
       |rk AS (SELECT cluster, id, CAST(row_number() OVER (
       |    PARTITION BY cluster ORDER BY sq ASC, id ASC) AS INT) AS rank,
       |    round(sq, 6) AS sq_dist FROM dd)
       |SELECT cluster, id, rank, sq_dist FROM rk WHERE rank <= $m""".stripMargin

  /** Per-label centroid outliers: the `topK` vectors farthest (L2)
    * from their label's centroid — the embedding-space mislabel /
    * contamination audit (a far outlier is a doc that does not belong
    * to its class cluster).
    *
    * Exactness: per-dimension means use fixed-point DECIMAL(38,0)
    * sums of round(x·10⁷) (the PcaOps moment discipline) — exact,
    * order-independent, overflow-safe to ~10³⁰ rows — then round to
    * 7dp, so both engines compare vectors against bit-identical
    * centroids. The per-row distance is a deterministic left fold
    * (zip_with + aggregate), rounded to 5dp before the top-k window.
    *
    * Scale shape: one posexplode scan → (label, pos) agg for the
    * centroid table (labels × dim rows — broadcast), one corpus scan
    * for distances, one top-k window partitioned by label.
    *
    * @return (label, vec_id, dist, rn) — rn 1..topK by dist desc
    */
  /** Exact per-label centroid table (label, cv: array<double>) —
    * fixed-point DECIMAL(38,0) sums of round(x·10⁷), means rounded to
    * 7dp. Labels × dim rows: always broadcastable. */
  def labelCentroids(emb: DataFrame, vecCol: String, labelCol: String): DataFrame =
    emb.select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col("label"), col("pos"),
        round(col("x").cast("double") * 1e7, 0).cast("decimal(38,0)").as("xi"))
      .groupBy("label", "pos")
      .agg(sum(col("xi")).as("s"), count(lit(1)).as("n"))
      .select(col("label"), col("pos"),
        round(col("s").cast("double") / 1e7 / col("n"), 7).as("c"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("_pc"))
      .select(col("label"), transform(col("_pc"), _.getField("c")).as("cv"))

  def centroidOutliers(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, topK: Int = 5): DataFrame = {
    val cent = labelCentroids(emb, vecCol, labelCol)
    val dist = emb.select(col(idCol).as("vec_id"), col(labelCol).as("label"),
        transform(col(vecCol), _.cast("double")).as("v"))
      .join(broadcast(cent), Seq("label"))
      .select(col("label"), col("vec_id"),
        round(sqrt(aggregate(
          zip_with(col("v"), col("cv"), (a, b) => (a - b) * (a - b)),
          lit(0.0), _ + _)), 5).as("dist"))
    val w = Window.partitionBy("label").orderBy(col("dist").desc, col("vec_id").asc)
    dist.withColumn("rn", row_number().over(w)).where(col("rn") <= topK)
  }

  /** Nearest-centroid classification + confusion matrix: assign every
    * vector to its closest label centroid and cross-tabulate against
    * the given label — the embedding-space label-noise audit (an
    * off-diagonal cell is a cluster of suspect annotations).
    *
    * Scale shape: the centroid table (labels × dim) broadcasts; the
    * corpus meets it in ONE cross-join scan (|labels| distance folds
    * per row, all codegen), then a per-vector argmin window keyed by
    * id and a final small group-by. Distances are rounded to 5dp
    * before the argmin with label-asc tie-break, so the assignment is
    * deterministic and engine-portable.
    *
    * @return (label, pred_label, n_vecs)
    */
  def centroidConfusion(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val cent = labelCentroids(emb, vecCol, labelCol)
      .select(col("label").as("pred_label"), col("cv"))
    val d = emb.select(col(idCol).as("vec_id"), col(labelCol).as("label"),
        transform(col(vecCol), _.cast("double")).as("v"))
      .crossJoin(broadcast(cent))
      .select(col("vec_id"), col("label"), col("pred_label"),
        round(sqrt(aggregate(
          zip_with(col("v"), col("cv"), (a, b) => (a - b) * (a - b)),
          lit(0.0), _ + _)), 5).as("dist"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("dist").asc, col("pred_label").asc)
    d.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .groupBy("label", "pred_label")
      .agg(count(lit(1)).as("n_vecs"))
  }

  /** DuckDB replay of [[centroidConfusion]]. */
  def centroidConfusionOracleSql(table: String, idCol: String,
      vecCol: String, labelCol: String): String =
    s"""WITH e AS (SELECT $idCol AS vec_id, $labelCol AS label,
       |  CAST($vecCol AS DOUBLE[]) AS v FROM $table),
       |x AS (SELECT label, unnest(generate_series(1, len(v))) AS pos,
       |  unnest(list_transform(v,
       |    a -> CAST(round(a * 1e7, 0) AS DECIMAL(38,0)))) AS xi FROM e),
       |cp AS (SELECT label, pos,
       |  round(CAST(sum(xi) AS DOUBLE) / 1e7 / count(*), 7) AS c
       | FROM x GROUP BY label, pos),
       |cv AS (SELECT label AS pred_label, list(c ORDER BY pos) AS cv
       | FROM cp GROUP BY label),
       |d AS (SELECT e.vec_id, e.label, cv.pred_label,
       |  round(sqrt(list_sum(list_transform(generate_series(1, len(e.v)),
       |    i -> (e.v[i] - cv.cv[i]) * (e.v[i] - cv.cv[i])))), 5) AS dist
       | FROM e CROSS JOIN cv),
       |a AS (SELECT vec_id, label, pred_label, row_number() OVER (
       |   PARTITION BY vec_id ORDER BY dist ASC, pred_label ASC) AS rn FROM d)
       |SELECT label, pred_label, count(*) AS n_vecs
       |FROM a WHERE rn = 1 GROUP BY label, pred_label""".stripMargin

  /** Deterministic Achlioptas/JL random projection: y = S·v / √m with
    * S ∈ {±1}^{m×d}, the sign of entry (j,i) drawn from the first hex
    * digit of md5("rp:j:i") — a data-independent, seedless projection
    * both engines (and any future run) reproduce bit-for-bit. The
    * Johnson-Lindenstrauss workhorse for shrinking embedding storage
    * before ANN indexing: pairwise distances are preserved within
    * 1±ε with m = O(ln n / ε²).
    *
    * Scale shape: the sign matrix is a compile-time literal (m×d
    * ints, ~2 KB) folded into codegen — the projection is a pure
    * narrow map, no shuffle, no model table to broadcast.
    *
    * @return (id, p1..pm) — projected coords rounded to 5dp; vectors
    *         whose length ≠ d project to nulls (zip_with pads)
    */
  def randomProjection(emb: DataFrame, idCol: String, vecCol: String,
      d: Int = 64, m: Int = 8): DataFrame = {
    val signs = projectionSigns(d, m)
    val v = transform(col(vecCol), _.cast("double"))
    val cols = (0 until m).map { j =>
      val s = typedlit(signs(j))
      round(aggregate(zip_with(v, s, (x, sg) => x * sg),
        lit(0.0), _ + _) / math.sqrt(m), 5).as(s"p${j + 1}")
    }
    emb.select(col(idCol).as("id") +: cols: _*)
  }

  /** The deterministic ±1.0 sign matrix, row j = output component. */
  private[graft] def projectionSigns(d: Int, m: Int): IndexedSeq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until m).map { j =>
      (0 until d).map { i =>
        val h = md.digest(s"rp:$j:$i".getBytes("UTF-8"))
        // first hex digit < 8 <=> top bit of byte 0 is clear
        if ((h(0) & 0x80) == 0) 1.0 else -1.0
      }
    }
  }

  /** DuckDB replay of [[randomProjection]] — the sign matrix is
    * embedded as literal lists generated by the same Scala code. */
  def randomProjectionOracleSql(table: String, idCol: String,
      vecCol: String, d: Int = 64, m: Int = 8): String = {
    val signs = projectionSigns(d, m)
    val projCols = (0 until m).map { j =>
      val lst = signs(j).map(s => if (s > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
      s"round(list_sum(list_transform(generate_series(1, $d), " +
        s"i -> v[i] * ($lst::DOUBLE[])[i])) / sqrt(${m}.0), 5) AS p${j + 1}"
    }.mkString(",\n  ")
    s"""SELECT $idCol AS id,
       |  $projCols
       |FROM (SELECT $idCol, CAST($vecCol AS DOUBLE[]) AS v FROM $table) t""".stripMargin
  }

  /** Embedding-space benchmark DECONTAMINATION: flag corpus vectors
    * whose best cosine against a held-out benchmark set clears
    * `minSim` — the semantic companion to the n-gram contamination
    * detector (q60/q110), catching paraphrased eval leakage that
    * token overlap misses. Benchmark sets are eval-sized ⇒
    * broadcast; the corpus streams through ONE scan against it (the
    * q36 brute-force shape — swap in the LSH/IVF candidate path when
    * the benchmark itself outgrows a broadcast). Similarities round
    * to 6dp BEFORE the threshold and argmax (id tie-break), so
    * sub-ulp fold differences can't flip membership vs the oracle.
    *
    * @return (vec_id, bench_id, sim) — flagged corpus vectors only
    */
  def benchmarkContamination(emb: DataFrame, idCol: String, vecCol: String,
      benchPred: Column, minSim: Double): DataFrame = {
    val base = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"),
      benchPred.as("is_bench"))
    val bench = base.filter(col("is_bench"))
      .select(col("id").as("bench_id"), col("v").as("bv"))
    val corpus = base.filter(!col("is_bench"))
    val sims = corpus.crossJoin(broadcast(bench))
      .select(col("id").as("vec_id"), col("bench_id"),
        round(nativeCosine(emb)(col("v"), col("bv")), 6).as("sim"))
      .filter(col("sim") >= minSim)
    val w = Window.partitionBy("vec_id")
      .orderBy(col("sim").desc, col("bench_id").asc)
    sims.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("bench_id"), col("sim"))
  }

  /** DuckDB replay of [[benchmarkContamination]]. */
  def benchmarkContaminationOracleSql(table: String, idCol: String,
      vecCol: String, benchPred: String, minSim: Double): String =
    s"""WITH b AS (SELECT $idCol AS bench_id,
       |    CAST($vecCol AS DOUBLE[]) AS bv FROM $table WHERE $benchPred),
       |c AS (SELECT $idCol AS vec_id, CAST($vecCol AS DOUBLE[]) AS v
       |  FROM $table WHERE NOT ($benchPred)),
       |s AS (SELECT vec_id, bench_id,
       |    round(list_cosine_similarity(v, bv), 6) AS sim
       |  FROM c, b),
       |f AS (SELECT *, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY sim DESC, bench_id ASC) AS rn
       |  FROM s WHERE sim >= $minSim)
       |SELECT vec_id, bench_id, sim FROM f WHERE rn = 1""".stripMargin

  /** Per-label embedding-distribution DRIFT between two deterministic
    * halves of the corpus (even/odd `idCol`): centroid cosine and L2
    * shift per label. The "did my embedding space move between
    * snapshots" probe — near-1 cosine and ~0 shift for a stable
    * distribution; a drifted label pops out immediately.
    *
    * Same exact fixed-point centroid mechanics as
    * [[labelCentroids]] (decimal sums of round(x·10⁷), 7dp means), so
    * the centroids are bit-stable under partitioning; the comparison
    * folds run left-to-right over the rounded centroid arrays —
    * identical in the oracle.
    */
  def centroidDrift(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val half = pmod(col(idCol), lit(2L))
    val a = labelCentroids(emb.filter(half === 0), vecCol, labelCol)
      .select(col("label"), col("cv").as("cva"))
    val b = labelCentroids(emb.filter(half === 1), vecCol, labelCol)
      .select(col("label"), col("cv").as("cvb"))
    val counts = emb.groupBy(col(labelCol).as("label"))
      .agg(sum(when(half === 0, 1L).otherwise(0L)).as("n_even"),
        sum(when(half === 1, 1L).otherwise(0L)).as("n_odd"))
    val dot = aggregate(zip_with(col("cva"), col("cvb"), _ * _),
      lit(0.0), _ + _)
    val na = aggregate(transform(col("cva"), x => x * x), lit(0.0), _ + _)
    val nb = aggregate(transform(col("cvb"), x => x * x), lit(0.0), _ + _)
    val l2 = sqrt(aggregate(zip_with(col("cva"), col("cvb"),
      (x, y) => (x - y) * (x - y)), lit(0.0), _ + _))
    a.join(b, "label").join(counts, "label")
      .select(col("label"), col("n_even"), col("n_odd"),
        round(dot / (sqrt(na) * sqrt(nb)), 6).as("cos_sim"),
        round(l2, 6).as("l2_shift"))
  }

  /** DuckDB replay of [[centroidDrift]]. */
  def centroidDriftOracleSql(table: String, idCol: String, vecCol: String,
      labelCol: String): String =
    s"""WITH e AS (SELECT $idCol AS vec_id, $labelCol AS label,
       |  CAST($vecCol AS DOUBLE[]) AS v, $idCol % 2 AS half FROM $table),
       |x AS (SELECT label, half, unnest(generate_series(1, len(v))) AS pos,
       |  unnest(list_transform(v,
       |    a -> CAST(round(a * 1e7, 0) AS DECIMAL(38,0)))) AS xi FROM e),
       |cp AS (SELECT label, half, pos,
       |  round(CAST(sum(xi) AS DOUBLE) / 1e7 / count(*), 7) AS c
       | FROM x GROUP BY label, half, pos),
       |cv AS (SELECT label, half, list(c ORDER BY pos) AS cv
       | FROM cp GROUP BY label, half),
       |n AS (SELECT label,
       |  CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
       |  CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_odd
       | FROM e GROUP BY label),
       |j AS (SELECT a.label, a.cv AS cva, b.cv AS cvb
       | FROM cv a JOIN cv b ON a.label = b.label
       | WHERE a.half = 0 AND b.half = 1)
       |SELECT j.label, n.n_even, n.n_odd,
       |  round(list_sum(list_transform(generate_series(1, len(cva)),
       |      i -> cva[i] * cvb[i]))
       |    / (sqrt(list_sum(list_transform(generate_series(1, len(cva)),
       |      i -> cva[i] * cva[i])))
       |     * sqrt(list_sum(list_transform(generate_series(1, len(cvb)),
       |      i -> cvb[i] * cvb[i])))), 6) AS cos_sim,
       |  round(sqrt(list_sum(list_transform(generate_series(1, len(cva)),
       |      i -> (cva[i] - cvb[i]) * (cva[i] - cvb[i])))), 6) AS l2_shift
       |FROM j JOIN n ON j.label = n.label""".stripMargin

  /** DuckDB replay of [[centroidOutliers]] (parallel-unnest zip for
    * the position explode; list fold for the distance). */
  def centroidOutliersOracleSql(table: String, idCol: String, vecCol: String,
      labelCol: String, topK: Int = 5): String =
    s"""WITH e AS (SELECT $idCol AS vec_id, $labelCol AS label,
       |  CAST($vecCol AS DOUBLE[]) AS v FROM $table),
       |x AS (SELECT label, unnest(generate_series(1, len(v))) AS pos,
       |  unnest(list_transform(v,
       |    a -> CAST(round(a * 1e7, 0) AS DECIMAL(38,0)))) AS xi FROM e),
       |cp AS (SELECT label, pos,
       |  round(CAST(sum(xi) AS DOUBLE) / 1e7 / count(*), 7) AS c
       | FROM x GROUP BY label, pos),
       |cv AS (SELECT label, list(c ORDER BY pos) AS cv FROM cp GROUP BY label),
       |d AS (SELECT e.label, e.vec_id,
       |  round(sqrt(list_sum(list_transform(generate_series(1, len(e.v)),
       |    i -> (e.v[i] - cv.cv[i]) * (e.v[i] - cv.cv[i])))), 5) AS dist
       | FROM e JOIN cv USING (label)),
       |r AS (SELECT label, vec_id, dist, row_number() OVER (
       |   PARTITION BY label ORDER BY dist DESC, vec_id ASC) AS rn FROM d)
       |SELECT label, vec_id, dist, CAST(rn AS INT) AS rn
       |FROM r WHERE rn <= $topK""".stripMargin

  /** Maximal Marginal Relevance (Carbonell & Goldstein 1998):
    * diversified top-3 from each query's `nCand` nearest candidates —
    * the retrieval-stack move that keeps near-duplicate hits from
    * crowding a result page / RAG context window:
    *
    *   pick_t = argmax_c  λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)
    *
    * Greedy selection is inherently sequential, so the three steps
    * are UNROLLED into a static dataflow (candidates → argmax →
    * penalty join → argmax → …): every stage is a bounded join/window
    * over the nCand-per-query candidate frame, the whole plan has a
    * line-for-line DuckDB twin, and deeper k generalizes by chaining
    * more steps. Determinism: all similarities round to 6dp before
    * any comparison (the [[knnBrute]] rule), scores round to 6dp,
    * ties break by candidate id.
    *
    * Scale shape: candidates come from ANY top-N source (brute here;
    * swap in the LSH/IVF path at corpus scale — MMR only ever touches
    * N²-per-query pair sims, never the corpus).
    *
    * @return (query_id, rank 1..3, cand_id, mmr_score)
    */
  def mmrTop3(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, lambda: Double = 0.7, nCand: Int = 10): DataFrame = {
    require(lambda > 0.0 && lambda <= 1.0, s"lambda in (0,1], got $lambda")
    require(nCand >= 3, s"need nCand >= 3, got $nCand")
    val cand = knnBrute(emb, idCol, vecCol, queryPred, nCand)
    val vv = emb.select(col(idCol).as("_vid"),
      transform(col(vecCol), _.cast("double")).as("_v"))
    val cv = cand.join(vv, col("cand_id") === col("_vid"))
      .select(col("query_id"), col("cand_id"), col("sim"), col("_v"))
    // pairwise candidate sims within a query: nCand² rows per query
    val psim = cv.as("a").join(cv.as("b"),
        col("a.query_id") === col("b.query_id") &&
        col("a.cand_id") =!= col("b.cand_id"))
      .select(col("a.query_id").as("query_id"),
        col("a.cand_id").as("ca"), col("b.cand_id").as("cb"),
        round(nativeCosine(emb)(col("a._v"), col("b._v")), 6).as("ps"))
    def argmax(df: DataFrame, scoreCol: String): DataFrame = {
      val w = Window.partitionBy("query_id")
        .orderBy(col(scoreCol).desc, col("cand_id").asc)
      df.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
        .select(col("query_id"), col("cand_id").as("sel"),
          col(scoreCol).as("sel_score"))
    }
    val rel = cand.select(col("query_id"), col("cand_id"),
      col("sim"))
    // renamed pair-sim views so penalty joins are unambiguous
    val p1 = psim.select(col("query_id").as("q"), col("ca").as("c1"),
      col("cb").as("s1c"), col("ps").as("ps1"))
    val p2 = psim.select(col("query_id").as("q2"), col("ca").as("c2"),
      col("cb").as("s2c"), col("ps").as("ps2"))
    // Scores are computed in EXACT decimal, not rounded doubles: sim
    // and ps are exact 6dp values, λ is a 2dp literal, so λ·sim −
    // (1−λ)·ps is exact at 8dp in decimal — rounding a double product
    // instead hits half-way cases where Spark (shortest-decimal
    // HALF_UP) and DuckDB (binary-value round) disagree by 1 ulp of
    // the grid (seen at sf0.01: 0.2600395 → .260040 vs .260039).
    val lD = lit(lambda).cast("decimal(3,2)")
    val omD = lit(1 - lambda).cast("decimal(3,2)")
    def simD(c: Column) = c.cast("decimal(18,6)")
    val s1 = argmax(rel.withColumn("m1",
      (simD(col("sim")) * lD).cast("double")), "m1")
    val r2 = rel
      .join(s1.select(col("query_id"), col("sel").as("x1")), Seq("query_id"))
      .where(col("cand_id") =!= col("x1"))
      .join(p1, col("query_id") === col("q") && col("cand_id") === col("c1")
        && col("x1") === col("s1c"))
      .select(col("query_id"), col("cand_id"), col("sim"),
        (simD(col("sim")) * lD - omD * simD(col("ps1")))
          .cast("double").as("m2"))
    val s2 = argmax(r2, "m2")
    // step 3: penalty = max pair-sim vs BOTH selected
    val r3 = rel
      .join(s1.select(col("query_id"), col("sel").as("x1")), Seq("query_id"))
      .join(s2.select(col("query_id"), col("sel").as("x2")), Seq("query_id"))
      .where(col("cand_id") =!= col("x1") && col("cand_id") =!= col("x2"))
      .join(p1, col("query_id") === col("q") && col("cand_id") === col("c1")
        && col("x1") === col("s1c"))
      .join(p2, col("query_id") === col("q2") && col("cand_id") === col("c2")
        && col("x2") === col("s2c"))
      .select(col("query_id"), col("cand_id"), col("sim"),
        (simD(col("sim")) * lD
          - omD * greatest(simD(col("ps1")), simD(col("ps2"))))
          .cast("double").as("m3"))
    val s3 = argmax(r3, "m3")
    s1.select(col("query_id"), lit(1).as("rank"), col("sel").as("cand_id"),
        col("sel_score").as("mmr_score"))
      .unionByName(s2.select(col("query_id"), lit(2).as("rank"),
        col("sel").as("cand_id"), col("sel_score").as("mmr_score")))
      .unionByName(s3.select(col("query_id"), lit(3).as("rank"),
        col("sel").as("cand_id"), col("sel_score").as("mmr_score")))
  }

  /** DuckDB replay of [[mmrTop3]] — the identical unrolled dataflow. */
  def mmrOracleSql(table: String, idCol: String, vecCol: String,
      queryWhere: String, lambda: Double = 0.7, nCand: Int = 10): String = {
    val l = lambda
    val om = 1 - lambda
    s"""WITH cand AS (SELECT query_id, cand_id, sim FROM (
       | SELECT q.$idCol AS query_id, c.$idCol AS cand_id,
       |  round(list_cosine_similarity(CAST(q.$vecCol AS DOUBLE[]),
       |                               CAST(c.$vecCol AS DOUBLE[])), 6) AS sim,
       |  row_number() OVER (PARTITION BY q.$idCol ORDER BY
       |    round(list_cosine_similarity(CAST(q.$vecCol AS DOUBLE[]),
       |                                 CAST(c.$vecCol AS DOUBLE[])), 6) DESC,
       |    c.$idCol) AS rn
       | FROM $table q JOIN $table c ON q.$idCol <> c.$idCol
       | WHERE $queryWhere) t WHERE rn <= $nCand),
       |ps AS (SELECT a.query_id, a.cand_id AS ca, b.cand_id AS cb,
       |   round(list_cosine_similarity(CAST(va.$vecCol AS DOUBLE[]),
       |                                CAST(vb.$vecCol AS DOUBLE[])), 6) AS ps
       | FROM cand a JOIN cand b
       |   ON a.query_id = b.query_id AND a.cand_id <> b.cand_id
       | JOIN $table va ON va.$idCol = a.cand_id
       | JOIN $table vb ON vb.$idCol = b.cand_id),
       |s1 AS (SELECT query_id, cand_id AS sel, m AS sel_score FROM (
       |  SELECT query_id, cand_id,
       |    CAST(CAST(sim AS DECIMAL(18,6)) * CAST($l AS DECIMAL(3,2))
       |      AS DOUBLE) AS m,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY CAST(CAST(sim AS DECIMAL(18,6))
       |        * CAST($l AS DECIMAL(3,2)) AS DOUBLE) DESC, cand_id) AS rn
       |    FROM cand) t
       |  WHERE rn = 1),
       |r2 AS (SELECT c.query_id, c.cand_id,
       |   CAST(CAST(c.sim AS DECIMAL(18,6)) * CAST($l AS DECIMAL(3,2))
       |     - CAST($om AS DECIMAL(3,2)) * CAST(p.ps AS DECIMAL(18,6))
       |     AS DOUBLE) AS m
       | FROM cand c JOIN s1 ON c.query_id = s1.query_id
       |   AND c.cand_id <> s1.sel
       | JOIN ps p ON p.query_id = c.query_id AND p.ca = c.cand_id
       |   AND p.cb = s1.sel),
       |s2 AS (SELECT query_id, cand_id AS sel, m AS sel_score FROM (
       |  SELECT query_id, cand_id, m, row_number() OVER (
       |    PARTITION BY query_id ORDER BY m DESC, cand_id) AS rn FROM r2) t
       |  WHERE rn = 1),
       |r3 AS (SELECT c.query_id, c.cand_id,
       |   CAST(CAST(c.sim AS DECIMAL(18,6)) * CAST($l AS DECIMAL(3,2))
       |     - CAST($om AS DECIMAL(3,2))
       |       * greatest(CAST(pa.ps AS DECIMAL(18,6)),
       |                  CAST(pb.ps AS DECIMAL(18,6))) AS DOUBLE) AS m
       | FROM cand c JOIN s1 ON c.query_id = s1.query_id
       |   AND c.cand_id <> s1.sel
       | JOIN s2 ON c.query_id = s2.query_id AND c.cand_id <> s2.sel
       | JOIN ps pa ON pa.query_id = c.query_id AND pa.ca = c.cand_id
       |   AND pa.cb = s1.sel
       | JOIN ps pb ON pb.query_id = c.query_id AND pb.ca = c.cand_id
       |   AND pb.cb = s2.sel),
       |s3 AS (SELECT query_id, cand_id AS sel, m AS sel_score FROM (
       |  SELECT query_id, cand_id, m, row_number() OVER (
       |    PARTITION BY query_id ORDER BY m DESC, cand_id) AS rn FROM r3) t
       |  WHERE rn = 1)
       |SELECT query_id, 1 AS rank, sel AS cand_id, sel_score AS mmr_score
       |  FROM s1
       |UNION ALL SELECT query_id, 2, sel, sel_score FROM s2
       |UNION ALL SELECT query_id, 3, sel, sel_score FROM s3""".stripMargin
  }

  /** Linear CKA (centered kernel alignment, Kornblith et al. 2019)
    * between the embedding space and its per-vector int8-quantized
    * codes — the "did quantization keep the geometry" audit run
    * before shipping a compressed index. CKA = ‖C_xy‖²_F /
    * (‖C_xx‖_F · ‖C_yy‖_F) over d×d centered cross-covariances.
    *
    * EXACT to the last grid digit: vectors are gridded to integer
    * 1e4-units (round(x·10000) — exact for |x| < ~9e14/1e4), codes
    * are already integers, so every gram entry Σxᵢyⱼ and marginal Σx
    * is an exact integer sum (order-independent, fully distributed),
    * the centered entry A_jk = n·Σx_j y_k − Σx_j·Σy_k stays in
    * BIGINT, and its square lifts to decimal(38,0)/HUGEINT. The only
    * doubles are the final two casts, one sqrt, one divide.
    *
    * Scale shape: the d² per-row products explode to n·d² narrow
    * integer rows feeding ONE hash aggregation — no join, no window,
    * no collect; marginals are a d-row side agg joined broadcast.
    * O(n·d²) work is the honest cost of an exact d×d gram; at
    * billion-row corpora run it on a uniform sample (the statistic
    * concentrates) or swap the explode for a mapPartitions d×d
    * accumulator with this composed spelling as its differential
    * twin.
    *
    * @return one row: (n, d, cka)
    */
  def linearCka(emb: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val v = emb.select(asDouble(col(vecCol)).as("v"))
      .withColumn("x", transform(col("v"),
        e => round(e * 10000).cast("long")))
      .withColumn("ma", array_max(transform(col("v"), e => abs(e))))
      .withColumn("scale", when(col("ma") > 0, lit(127.0d) / col("ma"))
        .otherwise(lit(1.0d)))
      .withColumn("y", transform(col("v"),
        e => round(e * col("scale")).cast("long")))
      .select(col("x"), col("y"))
    val d = size(col("x"))
    // the three d×d gram matrices in ONE corpus pass via the native
    // graft_gram_agg buffer (long[3d²] per partition, additive merge)
    // — the composed explode twin ([[ckaGramsComposed]]) shuffles
    // n·d² product rows (245M at sf0.1) for the identical integer
    // sums; pinned bit-identical in SimilaritySpec
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val gram = v.agg(
      call_function("graft_gram_agg", col("x"), col("y")).as("g"),
      count(lit(1)).as("n"), max(d).as("dd"))
    val prods = gram.select(col("g"), col("dd"),
        explode(sequence(lit(0), col("dd") * col("dd") - 1)).as("i"))
      .select(
        ((col("i") - pmod(col("i"), col("dd"))) / col("dd"))
          .cast("int").+(1).as("j"),
        (pmod(col("i"), col("dd")) + 1).cast("int").as("k"),
        element_at(col("g"), col("i") + 1).as("sxy"),
        element_at(col("g"), col("dd") * col("dd") + col("i") + 1)
          .as("sxx"),
        element_at(col("g"), col("dd") * col("dd") * 2 + col("i") + 1)
          .as("syy"))
    val marg = v.select(explode(expr(
      """transform(sequence(1, size(x)), j -> named_struct('j', j,
        |  'xv', element_at(x, j), 'yv', element_at(y, j)))"""
        .stripMargin)).as("m"))
      .groupBy(col("m.j").as("j"))
      .agg(sum("m.xv").as("sx"), sum("m.yv").as("sy"))
    val nn = v.agg(count(lit(1)).as("n"), first(d).as("d"))
    val mj = marg.select(col("j").as("j1"), col("sx").as("sxj"),
      col("sy").as("syj"))
    val mk = marg.select(col("j").as("k1"), col("sx").as("sxk"),
      col("sy").as("syk"))
    val a = prods.join(broadcast(mj), col("j") === col("j1"))
      .join(broadcast(mk), col("k") === col("k1"))
      .crossJoin(broadcast(nn))
      .select(col("n"), col("d"),
        (col("n") * col("sxy") - col("sxj") * col("syk")).as("axy"),
        (col("n") * col("sxx") - col("sxj") * col("sxk")).as("axx"),
        (col("n") * col("syy") - col("syj") * col("syk")).as("ayy"))
    a.groupBy("n", "d")
      .agg(sum(col("axy").cast("decimal(38,0)") * col("axy"))
          .as("f_xy"),
        sum(col("axx").cast("decimal(38,0)") * col("axx")).as("f_xx"),
        sum(col("ayy").cast("decimal(38,0)") * col("ayy")).as("f_yy"))
      .select(col("n"), col("d"),
        round(col("f_xy").cast("double") /
          sqrt(col("f_xx").cast("double") * col("f_yy").cast("double")),
          6).as("cka"))
  }

  /** Composed differential twin of the native gram stage: explode
    * n·d² product structs → hash agg. Same (j, k, sxy, sxx, syy)
    * frame; used by SimilaritySpec to pin `graft_gram_agg`
    * bit-identical, never on the hot path.
    */
  private[graft] def ckaGramsComposed(v: DataFrame): DataFrame =
    v.select(explode(expr(
      """flatten(transform(sequence(1, size(x)), j ->
        |  transform(sequence(1, size(x)), k -> named_struct(
        |    'j', j, 'k', k,
        |    'pxy', element_at(x, j) * element_at(y, k),
        |    'pxx', element_at(x, j) * element_at(x, k),
        |    'pyy', element_at(y, j) * element_at(y, k)))))"""
        .stripMargin)).as("p"))
      .groupBy(col("p.j").as("j"), col("p.k").as("k"))
      .agg(sum("p.pxy").as("sxy"), sum("p.pxx").as("sxx"),
        sum("p.pyy").as("syy"))

  /** The (x, y) integer code frame [[linearCka]] runs on — exposed
    * for the gram differential spec. */
  private[graft] def ckaCodes(emb: DataFrame, vecCol: String): DataFrame =
    emb.select(asDouble(col(vecCol)).as("v"))
      .withColumn("x", transform(col("v"),
        e => round(e * 10000).cast("long")))
      .withColumn("ma", array_max(transform(col("v"), e => abs(e))))
      .withColumn("scale", when(col("ma") > 0, lit(127.0d) / col("ma"))
        .otherwise(lit(1.0d)))
      .withColumn("y", transform(col("v"),
        e => round(e * col("scale")).cast("long")))
      .select(col("x"), col("y"))

  /** DuckDB replay of [[linearCka]] (dims passed explicitly). */
  def linearCkaOracleSql(table: String, vecCol: String,
      dims: Int): String =
    s"""WITH v AS (SELECT
       |    list_transform($vecCol, e ->
       |      CAST(round(CAST(e AS DOUBLE) * 10000) AS BIGINT)) AS x,
       |    list_transform($vecCol, e -> CAST(round(CAST(e AS DOUBLE)
       |      * (CASE WHEN list_max(list_transform($vecCol,
       |          q -> abs(CAST(q AS DOUBLE)))) > 0
       |        THEN 127.0 / list_max(list_transform($vecCol,
       |          q -> abs(CAST(q AS DOUBLE)))) ELSE 1.0 END))
       |      AS BIGINT)) AS y
       |  FROM $table),
       |pr AS (SELECT unnest(flatten(list_transform(
       |    generate_series(1, $dims), j -> list_transform(
       |      generate_series(1, $dims), k -> {'j': j, 'k': k,
       |        'pxy': x[j] * y[k], 'pxx': x[j] * x[k],
       |        'pyy': y[j] * y[k]})))) AS p
       |  FROM v),
       |g AS (SELECT p.j AS j, p.k AS k,
       |    CAST(sum(p.pxy) AS BIGINT) AS sxy,
       |    CAST(sum(p.pxx) AS BIGINT) AS sxx,
       |    CAST(sum(p.pyy) AS BIGINT) AS syy
       |  FROM pr GROUP BY 1, 2),
       |mx AS (SELECT u.j AS j, CAST(sum(v.x[u.j]) AS BIGINT) AS sx,
       |    CAST(sum(v.y[u.j]) AS BIGINT) AS sy
       |  FROM v CROSS JOIN
       |    (SELECT unnest(generate_series(1, $dims)) AS j) u
       |  GROUP BY u.j),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
       |a AS (SELECT n, axy, axx, ayy FROM (SELECT
       |    CAST(n * sxy - mj.sx * mk.sy AS HUGEINT) AS axy,
       |    CAST(n * sxx - mj.sx * mk.sx AS HUGEINT) AS axx,
       |    CAST(n * syy - mj.sy * mk.sy AS HUGEINT) AS ayy, n
       |  FROM g JOIN mx mj ON g.j = mj.j JOIN mx mk ON g.k = mk.j
       |  CROSS JOIN nn) t),
       |s AS (SELECT any_value(n) AS n, sum(axy * axy) AS f_xy,
       |    sum(axx * axx) AS f_xx, sum(ayy * ayy) AS f_yy FROM a)
       |SELECT n, $dims AS d,
       |  round(CAST(f_xy AS DOUBLE)
       |    / sqrt(CAST(f_xx AS DOUBLE) * CAST(f_yy AS DOUBLE)), 6)
       |    AS cka
       |FROM s""".stripMargin
}
