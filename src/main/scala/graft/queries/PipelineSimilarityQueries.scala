package graft.queries

import graft.Tables
import graft.ops.{BlocklistOps, DedupOps, DsirOps, GraphOps, LmOps, MultimodalOps, PcaOps, PreferenceOps, ProfileOps, RetrievalOps, SampleOps, SelectionOps, SimilarityOps, TextOps, WinnowOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import PipelineShared._

/** embedding similarity / ANN / clustering queries — split from PipelineQueries (entries verbatim; the
  * aggregate map in PipelineQueries is unchanged).
  */
private[graft] object PipelineSimilarityQueries {
  val queries: Map[String, Q] = Map(

    // Incremental IVF index maintenance (IvfIndexOps): batches
    // indexed via additive sufficient-statistics merge must yield
    // the SAME refreshed centers — and therefore the same probe
    // assignments — as a from-scratch refresh over the union. Both
    // paths run in the engine AND are independently replayed by the
    // DuckDB oracle; the hash compare is exact by the fixed-point
    // discipline (decimal(38,0) sums of round(x·1e7), 7dp means,
    // 5dp distances, cell-asc ties).
    "q239_ivf_incremental" -> ((s, d) => {
      import graft.ops.IvfIndexOps
      val emb = Tables(s, d, "embeddings")
      val c0 = IvfIndexOps.initCenters(s, emb, "vec_id", "embedding", 8)
      // ONE assignment scan, checkpointed; batch deltas and the
      // from-scratch aggregate all derive from it (the stats-merge
      // equality is what's under test, not the scan)
      val asg = IvfIndexOps.assign(s, emb, "vec_id", "embedding", c0)
        .localCheckpoint()
      val statsA = IvfIndexOps.cellStatsFromAssigned(
        asg.where(col("id") % 2 === 0))
      val statsB = IvfIndexOps.cellStatsFromAssigned(
        asg.where(col("id") % 2 === 1))
      val cInc = IvfIndexOps.refresh(c0,
        IvfIndexOps.mergeStats(statsA, statsB))
      val cScr = IvfIndexOps.refresh(c0,
        IvfIndexOps.cellStatsFromAssigned(asg))
      val probes = emb.where(col("vec_id") % 7 === 0)
      val ai = IvfIndexOps.assign(s, probes, "vec_id", "embedding", cInc)
        .select(col("id").as("vec_id"), col("cell").cast("int").as("cell_incr"))
      val asx = IvfIndexOps.assign(s, probes, "vec_id", "embedding", cScr)
        .select(col("id").as("vec_id"), col("cell").cast("int").as("cell_scratch"))
      ai.join(asx, Seq("vec_id"))
        .select(col("vec_id"), col("cell_incr"), col("cell_scratch"),
          (col("cell_incr") === col("cell_scratch")).cast("int").as("agree"))
    }),

    // Linear CKA between raw embeddings and their int8 codes — the
    // "did quantization keep the geometry" audit; exact integer
    // grams, one n·d² explode into a single hash agg.
    "q295_cka_quant" -> ((s, d) =>
      SimilarityOps.linearCka(Tables(s, d, "embeddings"),
        "vec_id", "embedding")),

    // MRR + exact MAP@10 of the dense run vs same-source labels —
    // lcm-denominator integer AP, no float accumulation.
    "q319_map_mrr" -> ((s, d) => {
      val run = SimilarityOps.knnBrute(Tables(s, d, "embeddings"),
          "vec_id", "embedding", col("vec_id") < 20, 10)
        .select(col("query_id"), col("cand_id"), col("sim").as("score"))
      val docs = Tables(s, d, "documents").select(col("doc_id"), col("source"))
      val labels = docs.where(col("doc_id") < 20)
        .select(col("doc_id").as("query_id"), col("source").as("qs"))
        .join(docs.select(col("doc_id").as("cand_id"), col("source").as("cs")),
          col("qs") === col("cs") && col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"), lit(1.0).as("rel"))
      RetrievalOps.mapMrrAtK(run, labels, 10)
    }),

    // Triplet mining for metric learning: per anchor the hard
    // POSITIVE (same label, lowest sim) and hard NEGATIVE (other
    // label, highest sim — q131's top-1) with the margin and a
    // violation flag — the both-ends complement to q131.
    "q356_triplet_mining" -> ((s, d) =>
      SimilarityOps.tripletMining(Tables(s, d, "embeddings"),
        "vec_id", "embedding", "label", col("vec_id") % 19 === 0,
        alpha = 0.2)),

    // Global clustering coefficient of the brand co-purchase graph
    // (edges = q267's support>=20 pairs): oriented two-path triangle
    // join, wedge count from degrees.
    "q276_clustering_coeff" -> ((s, d) => {
      val li = Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val part = Tables(s, d, "part")
        .select(col("p_partkey"), col("p_brand"))
      val edges = graft.ops.CooccurOps.basketPairs(
        li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("basket"), col("p_brand").as("item")),
        "basket", "item", minSupport = 20L)
        .select(col("item_a"), col("item_b"))
      graft.ops.GraphOps.clusteringCoefficient(edges, "item_a", "item_b")
    }),

    // Deterministic DeepWalk-style walk corpus + skip-gram pairs over
    // the q276 brand co-purchase graph — the graph-embedding training
    // data generator. md5-indexed neighbor choice, two equi-joins per
    // step (degree then (node, idx) adjacency — no hub fan-out), pair
    // grid bounded by (walkLen+1)² per walk.
    "q387_walk_pairs" -> ((s, d) => {
      val li = Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val part = Tables(s, d, "part")
        .select(col("p_partkey"), col("p_brand"))
      val edges = graft.ops.CooccurOps.basketPairs(
        li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("basket"), col("p_brand").as("item")),
        "basket", "item", minSupport = 20L)
        .select(col("item_a"), col("item_b"))
      // NOTE: the walk table stays checkpoint-resident until session
      // end — releasing it here would drop the blocks BEFORE the
      // driver evaluates the returned (lazy) pair frame. It is
      // |V|·walksPerNode·(walkLen+1) rows — model-scale by contract.
      GraphOps.skipGramPairs(
        GraphOps.randomWalks(edges, "item_a", "item_b",
          walkLen = 4, walksPerNode = 2),
        window = 2)
    }),

    // Grid DBSCAN over the embedding scatter's first two dims: the
    // density-clustering family (arbitrary shapes + an explicit
    // noise class) — integer eps test end to end, 9-cell grid join,
    // min-label core components.
    "q400_dbscan" -> ((s, d) => {
      val pts = Tables(s, d, "embeddings").select(col("vec_id"),
        element_at(col("embedding"), 1).as("x"),
        element_at(col("embedding"), 2).as("y"))
      SimilarityOps.dbscan2d(pts, "vec_id", "x", "y",
        epsMicro = 300000L, minPts = 4)
    }),

    // Farthest-point (k-center greedy) coreset over the embedding
    // corpus: md5-min seed, then max-min-distance picks on the 5dp
    // grid — the diversity-first subset selector; state is one
    // (id, v, dmin) frame, one narrow pass + 1-row aggregate per
    // round.
    "q399_fps_coreset" -> ((s, d) =>
      SimilarityOps.farthestPointSample(
        Tables(s, d, "embeddings"), "vec_id", "embedding", k = 8)),

    // Second-order (p, q)-biased walks — node2vec proper over the
    // same brand graph (p=4: discourage backtracking, q=0.5: favor
    // exploration). Every trajectory step is pinned by the oracle's
    // unrolled replay of the candidate classification and the
    // 62-bit-key weighted pick.
    "q392_biased_walks" -> ((s, d) => {
      val li = Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val part = Tables(s, d, "part")
        .select(col("p_partkey"), col("p_brand"))
      val edges = graft.ops.CooccurOps.basketPairs(
        li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("basket"), col("p_brand").as("item")),
        "basket", "item", minSupport = 20L)
        .select(col("item_a"), col("item_b"))
      GraphOps.biasedWalks(edges, "item_a", "item_b",
          walkLen = 4, walksPerNode = 2, p = 4.0, q = 0.5)
        .orderBy("start", "walk", "step")
    }),

    // Simplified silhouette over pinned seed centroids — the
    // deterministic cluster-separation scoreboard beside the seeded
    // k-means fits (q113/q115).
    "q262_silhouette" -> ((s, d) =>
      SimilarityOps.simplifiedSilhouette(
        Tables(s, d, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 8)),

    // PQ-codebook incremental maintenance (q239's second half): per-
    // subspace codebook sufficient statistics merged across batches
    // must refresh to the SAME codebooks — probe encodes compared
    // per subspace, both paths independently replayed by the oracle.
    "q242_pq_incremental" -> ((s, d) => {
      import graft.ops.IvfIndexOps
      val emb = Tables(s, d, "embeddings")
      val c0 = IvfIndexOps.initCenters(s, emb, "vec_id", "embedding", 8)
      val b0 = IvfIndexOps.initCodebooks(s, emb, "vec_id", "embedding",
        c0, m = 4, nCodes = 4)
      // residuals scanned once (consumed by two batch deltas, the
      // from-scratch aggregate, and the probe encodes)
      val rAll = IvfIndexOps.residuals(s, emb, "vec_id", "embedding", c0)
        .localCheckpoint()
      // the incremental-merge refresh and the from-scratch refresh
      // are independent collects over the checkpointed residuals —
      // overlap their jobs (guide §2.6) instead of paying two serial
      // aggregation rounds
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val futInc = Future(IvfIndexOps.refreshCodebooks(b0,
        IvfIndexOps.mergeCodeStats(
          IvfIndexOps.codeStats(s, rAll.where(col("id") % 2 === 0), b0),
          IvfIndexOps.codeStats(s, rAll.where(col("id") % 2 === 1), b0))))
      val futScr = Future(IvfIndexOps.refreshCodebooks(b0,
        IvfIndexOps.codeStats(s, rAll, b0)))
      val bInc = Await.result(futInc, Duration.Inf)
      val bScr = Await.result(futScr, Duration.Inf)
      val probes = rAll.where(col("id") % 7 === 0)
      val ai = IvfIndexOps.codeAssign(s, probes, bInc)
        .select(col("id").as("vec_id"), col("j").cast("int").as("subspace"),
          col("code").cast("int").as("code_incr"))
      val a2 = IvfIndexOps.codeAssign(s, probes, bScr)
        .select(col("id").as("vec_id"), col("j").cast("int").as("subspace"),
          col("code").cast("int").as("code_scratch"))
      ai.join(a2, Seq("vec_id", "subspace"))
        .select(col("vec_id"), col("subspace"), col("code_incr"),
          col("code_scratch"),
          (col("code_incr") === col("code_scratch")).cast("int").as("agree"))
    }),

    // Per-label embedding drift between even/odd corpus halves:
    // centroid cosine + L2 shift (stability audit before reusing an
    // index or classifier across snapshots).
    "q209_centroid_drift" -> ((s, d) =>
      SimilarityOps.centroidDrift(Tables(s, d, "embeddings"),
        "vec_id", "embedding", "label")),

    // Hybrid retrieval: dense cosine top-20 + lexical 3-gram-jaccard
    // top-20 per query, fused with reciprocal-rank fusion (K=60) —
    // the production search stack's rank-merge step.
    "q169_rrf_fusion" -> ((s, d) => {
      val dense = SimilarityOps.knnBrute(Tables(s, d, "embeddings"),
          "vec_id", "embedding", col("vec_id") < 5, 20)
        .withColumn("rank", row_number().over(
          Window.partitionBy("query_id")
            .orderBy(col("sim").desc, col("cand_id"))))
        .select("query_id", "cand_id", "rank")
      val lex = RetrievalOps.jaccardRun(Tables(s, d, "documents"),
          "doc_id", "text", col("id") < 5, 20)
        .select("query_id", "cand_id", "rank")
      RetrievalOps.rrfFuse(Seq(dense, lex), k = 10)
    }),

    // Retrieval-quality eval: nDCG@10 of the dense cosine run against
    // same-source relevance labels (source = topical ground truth in
    // the synthetic corpus).
    "q170_ndcg" -> ((s, d) => {
      val run = SimilarityOps.knnBrute(Tables(s, d, "embeddings"),
          "vec_id", "embedding", col("vec_id") < 20, 10)
        .select(col("query_id"), col("cand_id"), col("sim").as("score"))
      val docs = Tables(s, d, "documents").select(col("doc_id"), col("source"))
      val labels = docs.where(col("doc_id") < 20)
        .select(col("doc_id").as("query_id"), col("source").as("qs"))
        .join(docs.select(col("doc_id").as("cand_id"), col("source").as("cs")),
          col("qs") === col("cs") && col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"), lit(1.0).as("rel"))
      RetrievalOps.ndcgAtK(run, labels, 10)
    }),

    // Nearest-centroid classification confusion matrix: embedding-
    // space label-noise audit (off-diagonal = suspect annotations).
    "q151_centroid_confusion" -> ((s, d) =>
      SimilarityOps.centroidConfusion(Tables(s, d, "embeddings"),
        "vec_id", "embedding", "label")),

    // Deterministic Achlioptas/JL random projection 64→8: the
    // storage-shrink step before ANN indexing; sign matrix is a
    // compile-time literal, the projection a pure codegen map.
    "q152_random_projection" -> ((s, d) =>
      SimilarityOps.randomProjection(Tables(s, d, "embeddings"),
        "vec_id", "embedding", d = 64, m = 8)
        .withColumnRenamed("id", "vec_id")),

    // Symmetric int8 embedding quantization (the 4x storage cut before
    // indexing): per-vector scale, exact integer code summary.
    "q108_embedding_quantize" -> ((s, d) =>
      SimilarityOps.quantizeInt8(Tables(s, d, "embeddings"),
        "vec_id", "embedding")),

    // Exact brute-force cosine top-10 for 5 query vectors (the exact
    // baseline; the scale path is q38's LSH variant).
    "q36_knn_brute" -> ((s, d) =>
      SimilarityOps.knnBrute(Tables(s, d, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 5, 10)),

    // Embedding-cosine near-dup pairs via hyperplane buckets —
    // registered under the md5 sign-plane family (lshBucketMd5), so
    // every stage replays in the DuckDB oracle; the xxhash64
    // production plane family (lshBucket) shares this exact pipeline
    // via the injected bucketExpr and stays spec/scoreboard-covered
    // (q83, SimilaritySpec).
    "q47_embedding_neardup" -> ((s, d) =>
      SimilarityOps.embeddingNearDupPairs(Tables(s, d, "embeddings"),
        "vec_id", "embedding", minCosine = 0.35, nbits = 4,
        bucketExpr = SimilarityOps.lshBucketMd5(_, _, d = 64))),

    // IVF approximate top-k (KMeans coarse quantizer) — FULLY oracled,
    // fit included: the sample is content-hash-ordered (fitVecKey),
    // init is first-distinct-in-order, and the Lloyd loop is fixed
    // arithmetic in defined order, so the whole pipeline (fit →
    // assign → multi-probe → top-k) replays as SQL
    // (knnIvfOracleSql); recall floors stay asserted in ScalaTest.
    "q48_knn_ivf" -> ((s, d) =>
      SimilarityOps.knnIvf(s, Tables(s, d, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 5, 10)),

    // IVF-PQ approximate top-k: coarse cells + product-quantized ADC
    // scan + exact re-rank of the shortlist — the billion-row ANN
    // shape (codes are ~32× smaller than the vectors). FULLY oracled
    // (knnIvfPqOracleSql replays coarse + 16 codebook fits + ADC +
    // refine); recall floor stays enforced via q83 + ScalaTest.
    "q105_knn_ivfpq" -> ((s, d) =>
      SimilarityOps.knnIvfPq(s, Tables(s, d, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 5, 10, nprobe = 8, m = 16, refine = 8)),

    // Cluster exemplars: the 3 members nearest each k-means center —
    // the human-readable cluster label seed. Oracled: the fixed-count
    // Lloyd loop unrolls into CTEs (kmeansExemplarsOracleSql).
    "q122_cluster_exemplars" -> ((s, d) =>
      SimilarityOps.kmeansExemplars(s, Tables(s, d, "embeddings"),
        "vec_id", "embedding", k = 8, maxIter = 4, m = 3)),

    // Hard-negative mining: top-3 most-similar DIFFERENT-label vectors
    // per query — contrastive-training pair generation (exact
    // baseline; LSH/IVF is the scale path, q38/q48).
    "q131_hard_negatives" -> ((s, d) =>
      SimilarityOps.hardNegatives(Tables(s, d, "embeddings"),
        "vec_id", "embedding", "label", col("vec_id") < 8, 3)),

    // q131's documented scale path, exercised and oracled (r16): the
    // label-mismatch candidates come from the md5 sign-plane bucket
    // join; the label filter rides the same join.
    "q383_hard_negatives_lsh" -> ((s, d) =>
      SimilarityOps.hardNegativesLsh(Tables(s, d, "embeddings"),
        "vec_id", "embedding", "label", col("vec_id") < 8, 3,
        nbits = 4, probes = 2,
        bucketExpr = SimilarityOps.lshBucketMd5(_, _, d = 64))),

    // Margin-based bitext mining (Artetxe-Schwenk / CCMatrix): best
    // other-side candidate per query scored by cosine relative to
    // both endpoints' k-NN neighborhood density (hub correction).
    // Sides = embedding label parity (demo split).
    "q138_margin_mining" -> ((s, d) => {
      val emb = Tables(s, d, "embeddings")
      SimilarityOps.marginMining(
        emb.where(col("label") % 2 === 0),
        emb.where(col("label") % 2 === 1),
        "vec_id", "embedding", col("vec_id") < 16, k = 4)
    }),

    // q138's documented at-scale swap, EXERCISED and oracled (r16):
    // candidate pairs from the md5 sign-plane bucket join (the q47
    // family, Hamming-1 multi-probe) instead of the cartesian; margin
    // math unchanged. One bucket-keyed shuffle joins the sides — no
    // cartesian, neither side broadcast, the shape that survives two
    // huge corpora.
    "q382_margin_mining_lsh" -> ((s, d) => {
      val emb = Tables(s, d, "embeddings")
      SimilarityOps.marginMiningLsh(
        emb.where(col("label") % 2 === 0),
        emb.where(col("label") % 2 === 1),
        "vec_id", "embedding", col("vec_id") < 16, k = 4,
        nbits = 4, probes = 2,
        bucketExpr = SimilarityOps.lshBucketMd5(_, _, d = 64))
    }),

    // Closed-form 2-feature PCA over (chars, tokens): integer-exact
    // moments, fixed-IEEE-order eigensystem — the one PCA shape whose
    // full eigensolve an ANSI oracle can replay bit-for-bit.
    "q123_pca2_eigen" -> ((s, d) =>
      PcaOps.eigen2(
        Tables(s, d, "documents").select(col("doc_id"),
          col("n_chars"), TextOps.tokenCount(col("text")).as("n_tokens")),
        "n_chars", "n_tokens")),

    // Full PCA on the embedding corpus: fit d=16 (decimal-exact
    // moments + driver Jacobi), project every vector onto the top-4
    // components. Oracled via the frozen-literal discipline (q174's):
    // Verify fits the same model on the target dir and embeds
    // means/rotation as Double.toString literals
    // (PcaOps.projectOracleSql) — DuckDB replays the per-row
    // projection bit-for-bit; PcaSpec pins the eigensolve kernel
    // (orthonormality, variance ordering, differential vs a
    // driver-side reference).
    "q124_pca_project" -> ((s, d) => {
      val emb = Tables(s, d, "embeddings")
      val m = PcaOps.fit(emb, "embedding", 16)
      PcaOps.project(emb, "vec_id", "embedding", m, 4)
        .withColumnRenamed("id", "vec_id")
    }),

    // Durable PCA moments store (incremental PCA, the q351/q352
    // discipline): the corpus split into 3 content-keyed batches,
    // each batch's (1 + d + d(d+1)/2)-row decimal moment delta
    // appended; the query serves the MERGE-ON-READ view. The oracle
    // recomputes the moments from scratch in DuckDB, so the hash
    // match proves batch-split + merge == single-pass, cross-engine.
    // Refits never rescan vectors — each new shard appends ~KBs.
    "q381_pca_moments_store" -> ((s, d) => {
      val store = graft.ops.IndexStore.pcaDemoStorePath(s, d, d = 16)
      graft.ops.IndexStore.readPcaMoments(s, store, expectD = 16)
        .select(col("pos"), col("s").cast("double").as("s"))
    }),

    // Cluster-balanced sample: ~target members from each q113 cluster
    // (flatten the topic distribution before mixing). Corpus never
    // shuffles: assignment map + k-row control table + CASE-literal
    // thresholds. Oracled (unrolled-Lloyd CTEs + thresholdHex in SQL);
    // KmeansSpec pins determinism and per-cluster bounds.
    "q115_cluster_balance" -> ((s, d) =>
      SimilarityOps.clusterBalancedSample(s, Tables(s, d, "embeddings"),
        "vec_id", "embedding", targetPerCluster = 40, k = 8, maxIter = 4)),

    // Distributed full-corpus k-means (cluster-balanced sampling /
    // SemDeDup / mixture-design primitive): fixed iterations, decimal
    // sums, hash-order init — bit-deterministic under any
    // partitioning, and THEREFORE fully oracleable: the loop unrolls
    // into one CTE per Lloyd step (kmeansProfileOracleSql). KmeansSpec
    // additionally pins a differential against the in-memory reference.
    "q113_kmeans_profile" -> ((s, d) =>
      SimilarityOps.kmeansClusterProfile(s, Tables(s, d, "embeddings"),
        "vec_id", "embedding", k = 8, maxIter = 4)),

    // ANN recall scoreboard — 4 rows of quantified quality. Fully
    // oracled: registered under the md5 plane family (q38/q47's
    // discipline) with the now-deterministic IVF/IVF-PQ fits, so the
    // oracle replays both exact baselines, all four approximate
    // kernels AND the recall arithmetic. Same parameters as
    // q36/q38/q47/q48/q105; xxhash64 plane recall stays covered by
    // SimilaritySpec's floor asserts.
    "q83_ann_recall" -> ((s, d) =>
      SimilarityOps.annRecallReport(s, Tables(s, d, "embeddings"),
        "vec_id", "embedding", col("vec_id") < 5, k = 10,
        bucketExprKnn = SimilarityOps.lshBucketMd5(_, _, d = 64),
        bucketExprPairs = SimilarityOps.lshBucketMd5(_, _, d = 64),
        nbitsKnn = 4, probes = 2, minCosine = 0.35, nbitsPairs = 4)),
  )

  val oracles: Map[String, String] = Map(
    // from-scratch moments replay: same term layout ([1] ++ vec ++
    // upper-triangle products in (i <= j) scan order), same
    // double -> DECIMAL(38,18) casts (the q113 parity precedent),
    // exact decimal sums; matching the Spark side's 3-batch-appended
    // merge-on-read proves the store discipline cross-engine
    "q381_pca_moments_store" ->
      """WITH e AS (SELECT list_transform(embedding[1:16],
        |    x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |t AS (SELECT ([1.0] || v || flatten(list_transform(
        |    generate_series(1, 16),
        |    i -> list_transform(v[i:16], y -> v[i] * y)))) AS terms
        |  FROM e),
        |u AS (SELECT terms[p1] AS term, p1 FROM t,
        |  LATERAL (SELECT unnest(generate_series(1, len(terms))) AS p1))
        |SELECT CAST(p1 - 1 AS INTEGER) AS pos,
        | CAST(sum(CAST(term AS DECIMAL(38,18))) AS DOUBLE) AS s
        |FROM u GROUP BY 1""".stripMargin,
    // candidate-path hard negatives: full replay incl. label filter
    "q383_hard_negatives_lsh" -> SimilarityOps.hardNegativesLshOracleSql(
      "embeddings", "vec_id", "embedding", "label",
      queryPredSql = "id < 8", k = 3, nbits = 4, probes = 2, d = 64),
    // candidate-path margin mining: same plane literals, probes,
    // 6dp grid and tie-breaks as the Spark side
    "q382_margin_mining_lsh" -> SimilarityOps.marginMiningLshOracleSql(
      "embeddings", "vec_id", "embedding",
      srcPredSql = "label % 2 = 0", tgtPredSql = "label % 2 = 1",
      queryPredSql = "p.src_id < 16", k = 4, nbits = 4, probes = 2,
      d = 64),
    // kmeans family: the fixed-iteration Lloyd loop replays as an
    // unrolled CTE chain (md5-ordered seeds, decimal sums, ordered
    // double folds — every reduction has a defined order, so the fit
    // is bit-identical cross-engine; validated at sf0.001 + sf0.01)
    "q113_kmeans_profile" -> SimilarityOps.kmeansProfileOracleSql(
      "embeddings", "vec_id", "embedding", k = 8, maxIter = 4, d = 64),
    "q115_cluster_balance" -> SimilarityOps.clusterBalanceOracleSql(
      "embeddings", "vec_id", "embedding", k = 8, maxIter = 4, d = 64,
      targetPerCluster = 40, salt = "cluster_balance"),
    "q122_cluster_exemplars" -> SimilarityOps.kmeansExemplarsOracleSql(
      "embeddings", "vec_id", "embedding", k = 8, maxIter = 4, d = 64,
      m = 3),
    // IVF end-to-end replay, FIT INCLUDED (portable sample key +
    // first-distinct init + unrolled sampled-Lloyd CTEs)
    "q48_knn_ivf" -> SimilarityOps.knnIvfOracleSql(
      "embeddings", "vec_id", "embedding", "id < 5", k = 10,
      nCells = 16, nprobe = 4, seed = 42L, fitFraction = 0.1,
      maxFitRows = 100000, d = 64),
    // IVF-PQ replay: coarse fit + 16 per-subspace codebook fits +
    // ADC shortlist + exact-cosine refine, all unrolled
    "q105_knn_ivfpq" -> SimilarityOps.knnIvfPqOracleSql(
      "embeddings", "vec_id", "embedding", "id < 5", k = 10,
      nCells = 16, nprobe = 8, m = 16, nCodes = 16, refine = 8,
      seed = 42L, fitFraction = 0.1, maxFitRows = 100000, d = 64),
    // the whole scoreboard: exact baselines + all four kernels +
    // recall arithmetic
    "q83_ann_recall" -> SimilarityOps.annRecallMd5OracleSql(
      "embeddings", "vec_id", "embedding", "id < 5", k = 10,
      nbitsKnn = 4, probes = 2, minCosine = 0.35, nbitsPairs = 4,
      d = 64),
    // md5 sign-plane family — full bucket + cosine replay; same-bucket
    // pairs only, so the hash match covers the banding itself
    "q47_embedding_neardup" -> SimilarityOps.embeddingNearDupMd5OracleSql(
      "embeddings", "vec_id", "embedding", minCosine = 0.35, nbits = 4,
      d = 64),
    "q239_ivf_incremental" -> graft.ops.IvfIndexOps
      .incrementalRefreshOracleSql("embeddings", "vec_id", "embedding",
        k = 8, probeMod = 7),
    "q242_pq_incremental" -> graft.ops.IvfIndexOps
      .incrementalPqOracleSql("embeddings", "vec_id", "embedding",
        k = 8, m = 4, nCodes = 4, dim = 64, probeMod = 7),

    "q295_cka_quant" -> SimilarityOps.linearCkaOracleSql(
      "embeddings", "embedding", dims = 64),

    "q319_map_mrr" -> RetrievalOps.mapMrrOracleSql(nQueries = 20, k = 10),
    "q356_triplet_mining" -> SimilarityOps.tripletMiningOracleSql(
      "embeddings", "vec_id", "embedding", "label",
      "q.vec_id % 19 = 0", alpha = 0.2),

    "q276_clustering_coeff" ->
      graft.ops.GraphOps.clusteringCoefficientOracleSql(
        s"""SELECT item_a AS src, item_b AS dst FROM (
           |${graft.ops.CooccurOps.basketPairsOracleSql(
              "SELECT l_orderkey AS bk, p_brand AS it FROM lineitem " +
                "JOIN part ON l_partkey = p_partkey",
              minSupport = 20L)}) pairs""".stripMargin),

    "q387_walk_pairs" ->
      graft.ops.GraphOps.walkPairsOracleSql(
        s"""SELECT item_a AS src, item_b AS dst FROM (
           |${graft.ops.CooccurOps.basketPairsOracleSql(
              "SELECT l_orderkey AS bk, p_brand AS it FROM lineitem " +
                "JOIN part ON l_partkey = p_partkey",
              minSupport = 20L)}) pairs""".stripMargin,
        walkLen = 4, walksPerNode = 2, window = 2),

    "q399_fps_coreset" -> SimilarityOps.farthestPointOracleSql(
      "embeddings", "vec_id", "embedding", k = 8),

    "q400_dbscan" -> SimilarityOps.dbscan2dOracleSql(
      "embeddings", "vec_id",
      "CAST(embedding AS DOUBLE[])[1]", "CAST(embedding AS DOUBLE[])[2]",
      epsMicro = 300000L, minPts = 4),

    "q392_biased_walks" ->
      graft.ops.GraphOps.biasedWalksOracleSql(
        s"""SELECT item_a AS src, item_b AS dst FROM (
           |${graft.ops.CooccurOps.basketPairsOracleSql(
              "SELECT l_orderkey AS bk, p_brand AS it FROM lineitem " +
                "JOIN part ON l_partkey = p_partkey",
              minSupport = 20L)}) pairs""".stripMargin,
        walkLen = 4, walksPerNode = 2, p = 4.0, q = 0.5),

    "q262_silhouette" -> SimilarityOps.silhouetteOracleSql(
      "embeddings", "vec_id", "embedding", "vec_id < 8"),
    "q209_centroid_drift" -> SimilarityOps.centroidDriftOracleSql(
      "embeddings", "vec_id", "embedding", "label"),
    "q169_rrf_fusion" ->
      RetrievalOps.rrfFusionOracleSql(nQueries = 5, runK = 20, k = 10),
    "q170_ndcg" -> RetrievalOps.ndcgOracleSql(nQueries = 20, k = 10),
    "q151_centroid_confusion" -> SimilarityOps.centroidConfusionOracleSql(
      "embeddings", "vec_id", "embedding", "label"),
    "q152_random_projection" -> SimilarityOps.randomProjectionOracleSql(
      "embeddings", "vec_id", "embedding", d = 64, m = 8)
      .replaceFirst("SELECT vec_id AS id", "SELECT vec_id AS vec_id"),
    "q123_pca2_eigen" -> PcaOps.eigen2OracleSql("documents",
      "n_chars", raw"len(regexp_extract_all(text, '\S+'))"),
    "q131_hard_negatives" ->
      """SELECT query_id, query_label, cand_id, cand_label, sim FROM (
        | SELECT q.vec_id AS query_id, q.label AS query_label,
        |  c.vec_id AS cand_id, c.label AS cand_label,
        |  round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                               CAST(c.embedding AS DOUBLE[])), 6) AS sim,
        |  row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                                 CAST(c.embedding AS DOUBLE[])), 6) DESC,
        |    c.vec_id) AS rn
        | FROM embeddings q JOIN embeddings c
        |   ON q.vec_id <> c.vec_id AND q.label <> c.label
        | WHERE q.vec_id < 8) t
        |WHERE rn <= 3""".stripMargin,
    "q138_margin_mining" ->
      """WITH s AS (SELECT vec_id AS src_id, CAST(embedding AS DOUBLE[]) AS sv
        |           FROM embeddings WHERE label % 2 = 0),
        |t AS (SELECT vec_id AS tgt_id, CAST(embedding AS DOUBLE[]) AS tv
        |      FROM embeddings WHERE label % 2 = 1),
        |p AS (SELECT src_id, tgt_id,
        |       round(list_cosine_similarity(sv, tv), 6) AS sim FROM s, t),
        |nns AS (SELECT src_id, round(avg(sim), 6) AS nn_s FROM (
        |   SELECT src_id, sim, row_number() OVER (PARTITION BY src_id
        |     ORDER BY sim DESC, tgt_id) AS rn FROM p) x
        |  WHERE rn <= 4 GROUP BY src_id),
        |nnt AS (SELECT tgt_id, round(avg(sim), 6) AS nn_t FROM (
        |   SELECT tgt_id, sim, row_number() OVER (PARTITION BY tgt_id
        |     ORDER BY sim DESC, src_id) AS rn FROM p) x
        |  WHERE rn <= 4 GROUP BY tgt_id),
        |sc AS (SELECT p.src_id, p.tgt_id, sim,
        |        round(sim / ((nn_s + nn_t) / 2.0), 6) AS margin
        |       FROM p JOIN nns USING (src_id) JOIN nnt USING (tgt_id)
        |       WHERE p.src_id < 16)
        |SELECT src_id, tgt_id, sim, margin FROM (
        | SELECT *, row_number() OVER (PARTITION BY src_id
        |   ORDER BY margin DESC, tgt_id) AS rn FROM sc) f
        |WHERE rn = 1""".stripMargin,
    "q108_embedding_quantize" ->
      """WITH m AS (SELECT vec_id, embedding,
        |  list_max(list_transform(embedding,
        |    x -> abs(CAST(x AS DOUBLE)))) AS ma FROM embeddings),
        |s AS (SELECT vec_id, embedding,
        |  CASE WHEN ma > 0 THEN 127.0 / ma ELSE 1.0 END AS scale FROM m),
        |q AS (SELECT vec_id, scale, list_transform(embedding,
        |  x -> CAST(round(CAST(x AS DOUBLE) * scale) AS INTEGER)) AS qs
        | FROM s)
        |SELECT vec_id, CAST(len(qs) AS INTEGER) AS n_dims,
        |  CAST(list_min(qs) AS INTEGER) AS q_min,
        |  CAST(list_max(qs) AS INTEGER) AS q_max,
        |  CAST(list_sum(qs) AS BIGINT) AS sum_q, scale
        |FROM q""".stripMargin,
    "q36_knn_brute" ->
      """SELECT query_id, cand_id, sim FROM (
        | SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |  round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                               CAST(c.embedding AS DOUBLE[])), 6) AS sim,
        |  row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                                 CAST(c.embedding AS DOUBLE[])), 6) DESC,
        |    c.vec_id) AS rn
        | FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        | WHERE q.vec_id < 5) t
        |WHERE rn <= 10""".stripMargin,
  )
}
