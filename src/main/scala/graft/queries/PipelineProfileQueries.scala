package graft.queries

import graft.Tables
import graft.ops.{BlocklistOps, DedupOps, DsirOps, GraphOps, LmOps, MultimodalOps, PcaOps, PreferenceOps, ProfileOps, RetrievalOps, SampleOps, SelectionOps, SimilarityOps, TextOps, WinnowOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import PipelineShared._

/** profiling, compliance, retrieval and graph queries — split from PipelineQueries (entries verbatim; the
  * aggregate map in PipelineQueries is unchanged).
  */
private[graft] object PipelineProfileQueries {
  val queries: Map[String, Q] = Map(

    // KMV distinct-token sketch per source, built as TWO per-batch
    // sketches (doc_id parity) merged with kmvMerge — the
    // deterministic, ORACLE-REPLAYABLE member of the sketch family
    // (HLL is engine-seeded → unoracleable; q51 uses KMV too). The oracle replays
    // sketch→estimate from scratch, so the hash match also proves the
    // k-min union/merge property that makes per-batch sketches
    // persistable bounded state.
    "q375_kmv_distinct" -> ((s, d) => {
      val toks = Tables(s, d, "documents")
        .select(col("source"), col("doc_id"),
          explode(TextOps.tokens(col("text"))).as("t"))
      val h1 = ProfileOps.kmvSketch(
        toks.where(col("doc_id") % 2 === 0), "source", "t")
      val h2 = ProfileOps.kmvSketch(
        toks.where(col("doc_id") % 2 === 1), "source", "t")
      ProfileOps.kmvEstimate(ProfileOps.kmvMerge(h1, h2))
    }),

    // Inverted-index sizing: delta-gap varint byte cost per frequent
    // term vs raw 64-bit postings — the shard planner's input; the
    // posting list is measured, never materialized.
    "q293_postings" -> ((s, d) =>
      graft.ops.RetrievalOps.postingsStats(Tables(s, d, "documents"),
        "doc_id", "text", minDf = 50L)),

    // Winsorized mean (5% per side) of line revenue cents per
    // returnflag — the tail-CLAMPING sibling of q277's trimmed mean;
    // boundary order statistics from the same cumulative frame.
    "q297_winsorized" -> ((s, d) =>
      ProfileOps.winsorizedMean(
        Tables(s, d, "lineitem").select(col("l_returnflag"),
          round(col("l_extendedprice") * 100, 0).cast("long")
            .as("cents")),
        "l_returnflag", "cents")),

    // Co-purchase-WEIGHTED brand PageRank: the q276 brand graph with
    // edge weight = co-basket count, through the exact-integer
    // weighted pageRank kernel (q201 ranks the supplier<->customer
    // order graph; this ranks brands by weighted co-purchase
    // centrality — same kernel, different graph and weighting).
    "q309_brand_pagerank" -> ((s, d) => {
      val li = Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val part = Tables(s, d, "part")
        .select(col("p_partkey"), col("p_brand"))
      val pairs = graft.ops.CooccurOps.basketPairs(
        li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("basket"), col("p_brand").as("item")),
        "basket", "item", minSupport = 20L)
        .select(col("item_a"), col("item_b"), col("n_ab"))
      val edges = pairs.select(col("item_a").as("src"),
          col("item_b").as("dst"), col("n_ab").as("w"))
        .unionByName(pairs.select(col("item_b").as("src"),
          col("item_a").as("dst"), col("n_ab").as("w")))
      graft.ops.GraphOps.pageRank(edges, "src", "dst", "w")
    }),

    // Herfindahl-Hirschman supplier concentration per nation over
    // lineitem revenue — decimal-exact share-of-squares.
    "q320_hhi" -> ((s, d) => {
      val li = Tables(s, d, "lineitem").select(col("l_suppkey"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
      val sup = Tables(s, d, "supplier").select(col("s_suppkey"),
        col("s_nationkey"))
      ProfileOps.hhiIndex(
        li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey")),
        "s_nationkey", "s_suppkey", "cents")
    }),

    // Empirical-Bayes beta-binomial shrinkage of per-brand return
    // rates — method-of-moments prior strength, rank-safe rates.
    "q326_eb_shrink" -> ((s, d) => {
      val li = Tables(s, d, "lineitem").select(col("l_partkey"),
        (col("l_returnflag") === "R").as("ret"))
      val part = Tables(s, d, "part").select(col("p_partkey"),
        col("p_brand"))
      ProfileOps.ebShrunkRates(
        li.join(broadcast(part), col("l_partkey") === col("p_partkey")),
        "p_brand", col("ret"))
    }),

    // Chapman capture-recapture corpus-size estimate from two md5
    // crawls, with the measured calibration error.
    "q328_capture_recapture" -> ((s, d) =>
      graft.ops.SampleOps.chapmanEstimate(Tables(s, d, "documents"),
        "doc_id", 0.5, "crawlA", "crawlB")),

    // Deterministic epsilon-DP Laplace count release per source —
    // the privacy family's release step, md5-uniform inverse CDF.
    "q332_dp_release" -> ((s, d) =>
      ProfileOps.dpLaplaceCounts(Tables(s, d, "documents"),
        "source", eps = 1.0, salt = "dp")),

    // Welch's unequal-variance t per source vs rest over document
    // length — the parametric mean-shift companion of Mann-Whitney
    // (q252); one pass, against-rest moments by subtraction.
    "q286_welch_t" -> ((s, d) =>
      ProfileOps.welchTAgainstRest(
        Tables(s, d, "documents"), "source", "n_chars")),

    // Exact 5%-trimmed mean of line-item price (cents grid) per
    // return flag — robust location via integer rank-interval
    // algebra, no corpus sort.
    "q277_trimmed_mean" -> ((s, d) =>
      ProfileOps.trimmedMean(
        Tables(s, d, "lineitem").select(col("l_returnflag"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("cents")),
        "l_returnflag", "cents")),

    // Approximate-percentile accuracy gate: GK sketch ranks hard-
    // checked against exact ranks (oracle pins TRUE — a sketch
    // collapse reds the row).
    "q271_approx_pctl_gate" -> ((s, d) =>
      ProfileOps.approxPercentileGate(
        Tables(s, d, "lineitem"), "l_extendedprice")),

    // Incremental stats maintenance: per-source moments from two
    // disjoint batches, merged in sufficient-statistic space, then
    // derived — the oracle recomputes DIRECTLY from the full table,
    // so a hash match proves sketch additivity end-to-end.
    "q264_merged_stats" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val even = ProfileOps.statsSketch(
        docs.where(col("doc_id") % 2 === 0), "source", "n_chars")
      val odd = ProfileOps.statsSketch(
        docs.where(col("doc_id") % 2 === 1), "source", "n_chars")
      ProfileOps.deriveStats(
        ProfileOps.mergeStatsSketches(Seq(even, odd)), "source")
    }),

    // Exact weighted percentiles (quantity-weighted price median/p90
    // per return flag) — integer threshold algebra over the value
    // grid, no quantile interpolation.
    "q266_weighted_pctl" -> ((s, d) =>
      ProfileOps.weightedPercentiles(Tables(s, d, "lineitem"),
        "l_returnflag", "l_extendedprice", "l_quantity")),

    // Quantile normalization of document length across sources — the
    // batch-effect repair that puts every source on the corpus-global
    // length distribution. Pure integer rank/grid arithmetic.
    "q260_quantile_norm" -> ((s, d) =>
      ProfileOps.quantileNormalize(
        Tables(s, d, "documents"), "doc_id", "source", "n_chars")),

    // Benford first-digit audit of line-item prices (cents grid) —
    // numeric-column forensics; first digit from the decimal string,
    // never libm log10.
    "q261_benford" -> ((s, d) =>
      ProfileOps.benfordFirstDigit(
        Tables(s, d, "lineitem").select(
          round(col("l_extendedprice") * 100, 0).cast("long").as("cents")),
        "cents")),

    // Referential-integrity audit across the TPC-H FK chain.
    "q221_fk_integrity" -> ((s, d) =>
      ProfileOps.fkIntegrity(Seq(
        ("lineitem->orders", Tables(s, d, "lineitem"), "l_orderkey",
          Tables(s, d, "orders"), "o_orderkey"),
        ("orders->customer", Tables(s, d, "orders"), "o_custkey",
          Tables(s, d, "customer"), "c_custkey"),
        ("customer->nation", Tables(s, d, "customer"), "c_nationkey",
          Tables(s, d, "nation"), "n_nationkey"),
        ("supplier->nation", Tables(s, d, "supplier"), "s_nationkey",
          Tables(s, d, "nation"), "n_nationkey")))),

    // Exact-integer PageRank over the supplier<->customer order graph
    // (one edge per order, both directions, weight = order count;
    // customer ids offset by 1e6 into the shared node space). The
    // 10-iteration micro-unit trajectory is bit-identical to the
    // DuckDB unrolled-CTE replay.
    "q201_pagerank" -> ((s, d) => {
      val l = Tables(s, d, "lineitem").filter(col("l_linenumber") === 1)
        .select(col("l_orderkey"), col("l_suppkey"))
      val o = Tables(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val p = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select(col("l_suppkey").cast("long").as("sn"),
          (col("o_custkey").cast("long") + 1000000L).as("cn"))
      val edges = p.select(col("sn").as("src"), col("cn").as("dst"))
        .unionByName(p.select(col("cn").as("src"), col("sn").as("dst")))
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      GraphOps.pageRank(edges, "src", "dst", "w")
    }),

    // k-core of the q201 supplier-customer purchase graph (k=3): the
    // loyal-core extractor — peel degree<3 nodes until stable; each
    // round one degree agg + two anti joins, convergence-probed.
    "q393_kcore" -> ((s, d) => {
      val l = Tables(s, d, "lineitem").filter(col("l_linenumber") === 1)
        .select(col("l_orderkey"), col("l_suppkey"))
      val o = Tables(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val p = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select(col("l_suppkey").cast("long").as("sn"),
          (col("o_custkey").cast("long") + 1000000L).as("cn"))
      GraphOps.kCore(p, "sn", "cn", k = 3)
    }),

    // TrustRank from nation-0 suppliers over the purchase graph:
    // teleport (and dangling mass) only to the trusted seed set —
    // proximity-to-trust scores, the spam-farm separator run before
    // domain sampling. Integer micro-grid trajectory, 6 iterations.
    "q397_trustrank" -> ((s, d) => {
      val l = Tables(s, d, "lineitem").filter(col("l_linenumber") === 1)
        .select(col("l_orderkey"), col("l_suppkey"))
      val o = Tables(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val p = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select(col("l_suppkey").cast("long").as("sn"),
          (col("o_custkey").cast("long") + 1000000L).as("cn"))
      val edges = p.select(col("sn").as("src"), col("cn").as("dst"))
        .unionByName(p.select(col("cn").as("src"), col("sn").as("dst")))
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      // seed rule must be non-empty at EVERY sf: the lowest nation
      // key present (a fixed nation id can be absent at sf0.001)
      val sup = Tables(s, d, "supplier")
      val minNation = sup.agg(min(col("s_nationkey")).as("_mn"))
      val seeds = sup.join(broadcast(minNation),
          col("s_nationkey") === col("_mn"))
        .select(col("s_suppkey").cast("long").as("node"))
      GraphOps.trustRank(edges, "src", "dst", "w", seeds, "node",
        iterations = 6)
    }),

    // Degree assortativity + rich-club density of the same purchase
    // graph: hub-to-leaf mixing (disassortative by construction —
    // suppliers are hubs) and the deg>10 club's edge density.
    "q394_degree_mixing" -> ((s, d) => {
      val l = Tables(s, d, "lineitem").filter(col("l_linenumber") === 1)
        .select(col("l_orderkey"), col("l_suppkey"))
      val o = Tables(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val p = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select(col("l_suppkey").cast("long").as("sn"),
          (col("o_custkey").cast("long") + 1000000L).as("cn"))
      GraphOps.degreeMixing(p, "sn", "cn", kRich = 10L)
    }),

    // Modularity of the NATION partition over the purchase graph:
    // is trade denser within nations than chance? One label join per
    // endpoint, per-nation q-contributions on the micro grid.
    "q396_nation_modularity" -> ((s, d) => {
      val l = Tables(s, d, "lineitem").filter(col("l_linenumber") === 1)
        .select(col("l_orderkey"), col("l_suppkey"))
      val o = Tables(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val p = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select(col("l_suppkey").cast("long").as("sn"),
          (col("o_custkey").cast("long") + 1000000L).as("cn"))
      val labels = Tables(s, d, "supplier")
        .select(col("s_suppkey").cast("long").as("node"),
          col("s_nationkey").cast("long").as("lbl"))
        .unionByName(Tables(s, d, "customer")
          .select((col("c_custkey").cast("long") + 1000000L).as("node"),
            col("c_nationkey").cast("long").as("lbl")))
      GraphOps.modularityByCommunity(p, "sn", "cn", labels, "node", "lbl")
    }),

    // Right-to-be-forgotten cascade audit: customer cohort (%101) ->
    // orders -> lineitem, exact-ppm manifest.
    "q200_rtbf_audit" -> ((s, d) =>
      graft.ops.ComplianceOps.cascadeDeleteAudit(
        Tables(s, d, "customer"), Tables(s, d, "orders"),
        Tables(s, d, "lineitem"), col("c_custkey") % 101 === 0)),

    // Robust per-source length outliers: median + MAD, count beyond
    // 3·MAD — the corruption probe a mean±σ rule can't survive.
    "q196_mad_outliers" -> ((s, d) =>
      graft.ops.ProfileOps.madOutliers(Tables(s, d, "documents"),
        "source", "n_chars")),

    // Curriculum quartile schedule: exact-percentile cutoffs (no
    // global sort), phase + deterministic shuffle key per doc.
    "q148_curriculum" -> ((s, d) =>
      SelectionOps.curriculumPhases(Tables(s, d, "documents"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")),

    // Bradley–Terry preference strengths per source from synthetic
    // pairwise comparisons (adjacent doc pairs, longer doc preferred,
    // even doc wins ties) — the RLHF judge-call aggregation.
    "q171_bradley_terry" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      val a = docs.where(col("doc_id") % 2 === 0)
        .select((col("doc_id") / 2).cast("long").as("pid"),
          col("source").as("sa"), col("n_chars").as("ca"))
      val b = docs.where(col("doc_id") % 2 === 1)
        .select((col("doc_id") / 2).cast("long").as("pid"),
          col("source").as("sb"), col("n_chars").as("cb"))
      val comps = a.join(b, "pid").where(col("sa") =!= col("sb"))
        .select(when(col("ca") >= col("cb"), col("sa")).otherwise(col("sb")).as("w"),
          when(col("ca") >= col("cb"), col("sb")).otherwise(col("sa")).as("l"))
      PreferenceOps.bradleyTerry(comps, "w", "l")
    }),

    // Deterministic domain-mixing sample: per-source keep fractions
    // decided by an md5-prefix coordinate — rerun/engine/partitioning
    //-stable, pure codegen filter (SampleOps scaladoc).
    "q68_mixture_sample" -> ((s, d) =>
      Tables(s, d, "documents")
        .filter(SampleOps.mixturePredicate(col("doc_id"), col("source"),
          MixtureFractions, default = 0.05, salt = "mix1"))
        .select(col("doc_id"), col("source"))),

    // Deterministic train/val/test split assignment on the same hash
    // coordinate scheme (independent salt).
    "q69_split_assign" -> ((s, d) =>
      Tables(s, d, "documents")
        .select(col("doc_id"),
          SampleOps.assignSplit(col("doc_id"), SplitSpec, salt = "split1")
            .as("split"))),

    // Exact-n per-stratum deterministic sample (eval-set construction):
    // 20 docs per source, stable across reruns/engines/partitionings.
    "q73_stratified_take" -> ((s, d) =>
      SampleOps.stratifiedTake(
        Tables(s, d, "documents").select(col("doc_id"), col("source")),
        "doc_id", "source", n = 20, salt = "strat1")),

    // Aho-Corasick phrase-blocklist tagging: every phrase counted in
    // ONE text pass via the native automaton expression (10k phrases
    // = still one scan; the regex alternative is one scan per
    // phrase). Spam/boilerplate tells are injected per doc_id residue
    // (the clean-corpus q112/q114 idiom), mirrored in the oracle.
    "q127_blocklist" -> ((s, d) => {
      val t =
        when(col("doc_id") % 6 === 0,
          concat(col("text"), lit(" Click here to BUY NOW and buy now again")))
        .when(col("doc_id") % 10 === 0,
          concat(lit("Lorem Ipsum dolor. "), col("text"),
            lit(" All Rights Reserved. Subscribe!")))
        .when(col("doc_id") % 17 === 0,
          concat(col("text"),
            lit(" This site uses cookies. Sign up for free shipping. Limited Time Offer!")))
        .otherwise(col("text"))
      BlocklistOps.tag(
        Tables(s, d, "documents").select(col("doc_id"), t.as("text")),
        "doc_id", "text")
    }),

    // Heaps' law vocabulary-growth fit across sources: V = k*N^beta;
    // the q129 Zipf probe's companion corpus-health number.
    "q144_heaps_fit" -> ((s, d) =>
      ProfileOps.heapsFit(Tables(s, d, "documents"), "text", "source")),

    // Log-normal length fit + 3-sigma outlier count: the one-row
    // length-distribution health probe (truncation/concat bugs bend
    // it before anything else shows).
    "q141_length_lognormal" -> ((s, d) =>
      ProfileOps.lengthLogNormal(Tables(s, d, "documents"), "text")),

    // One-pass Pearson correlation matrix over lineitem's numeric
    // columns (feature-redundancy probe): EXACT sums via the
    // fixed-point limb path (bit-identical to the decimal path and
    // to the unchanged decimal oracle, ~10x the throughput — these
    // are 2-decimal money columns, squarely in the contract).
    "q120_feature_corr" -> ((s, d) =>
      ProfileOps.corrMatrixFixedPoint(Tables(s, d, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        scale = 2)),
  )

  val oracles: Map[String, String] = Map(

    "q375_kmv_distinct" -> ProfileOps.kmvTokensOracleSql(
      "documents", "source", "text"),

    "q293_postings" -> graft.ops.RetrievalOps.postingsOracleSql(
      "documents", "doc_id", "text", 50L),

    "q297_winsorized" -> ProfileOps.winsorizedMeanOracleSql(
      "lineitem", "l_returnflag",
      "round(l_extendedprice * 100)"),

    "q309_brand_pagerank" -> graft.ops.GraphOps.pageRankOracleSql(
      s"""SELECT src, dst, w FROM (
         |  WITH pairs AS (
         |${graft.ops.CooccurOps.basketPairsOracleSql(
            "SELECT l_orderkey AS bk, p_brand AS it FROM lineitem " +
              "JOIN part ON l_partkey = p_partkey",
            minSupport = 20L)})
         |  SELECT item_a AS src, item_b AS dst, n_ab AS w FROM pairs
         |  UNION ALL
         |  SELECT item_b, item_a, n_ab FROM pairs) sym""".stripMargin),

    "q320_hhi" -> ProfileOps.hhiOracleSql(
      """(SELECT s_nationkey, s_suppkey,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        | FROM lineitem JOIN supplier ON l_suppkey = s_suppkey) j"""
        .stripMargin,
      "s_nationkey", "s_suppkey", "cents"),

    "q326_eb_shrink" -> ProfileOps.ebShrunkRatesOracleSql(
      """(SELECT p_brand, CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
        |  AS ret FROM lineitem JOIN part ON l_partkey = p_partkey) j"""
        .stripMargin,
      "p_brand", "ret"),

    "q328_capture_recapture" -> graft.ops.SampleOps.chapmanOracleSql(
      "documents", "doc_id", 0.5, "crawlA", "crawlB"),

    "q332_dp_release" -> ProfileOps.dpLaplaceOracleSql(
      "documents", "source", eps = 1.0, salt = "dp"),

    "q286_welch_t" -> ProfileOps.welchTOracleSql(
      "documents", "source", "n_chars"),

    "q277_trimmed_mean" -> ProfileOps.trimmedMeanOracleSql(
      "lineitem", "l_returnflag", "round(l_extendedprice * 100)"),

    "q271_approx_pctl_gate" ->
      """SELECT CAST(count(*) AS BIGINT) AS n, TRUE AS p50_ok,
        | TRUE AS p90_ok FROM lineitem""".stripMargin,

    "q264_merged_stats" -> ProfileOps.mergedStatsOracleSql(
      "documents", "source", "n_chars"),

    "q266_weighted_pctl" -> ProfileOps.weightedPercentilesOracleSql(
      "lineitem", "l_returnflag", "l_extendedprice", "l_quantity"),

    "q260_quantile_norm" -> ProfileOps.quantileNormalizeOracleSql(
      "SELECT doc_id AS id, source AS g, n_chars AS v FROM documents",
      "doc_id", "source", "n_chars"),

    "q261_benford" -> ProfileOps.benfordOracleSql(
      "lineitem", "round(l_extendedprice * 100)"),
    "q221_fk_integrity" ->
      """WITH e1 AS (SELECT 'lineitem->orders' AS edge,
        |  CAST(count(*) AS BIGINT) AS n_child,
        |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_orphans
        | FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey),
        |e2 AS (SELECT 'orders->customer',
        |  CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        | FROM orders LEFT JOIN customer ON o_custkey = c_custkey),
        |e3 AS (SELECT 'customer->nation',
        |  CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        | FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey),
        |e4 AS (SELECT 'supplier->nation',
        |  CAST(count(*) AS BIGINT),
        |  CAST(sum(CASE WHEN n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        | FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey),
        |u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2
        |  UNION ALL SELECT * FROM e3 UNION ALL SELECT * FROM e4)
        |SELECT edge, n_child, n_orphans,
        |  CAST((n_orphans * 2000000 + n_child) // (n_child * 2) AS BIGINT)
        |    AS orphan_ppm
        |FROM u""".stripMargin,
    "q393_kcore" -> GraphOps.kCoreOracleSql(
      """SELECT CAST(l_suppkey AS BIGINT) AS src,
        |  CAST(o_custkey + 1000000 AS BIGINT) AS dst
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_linenumber = 1""".stripMargin,
      k = 3, unrollRounds = 16),

    "q394_degree_mixing" -> GraphOps.degreeMixingOracleSql(
      """SELECT CAST(l_suppkey AS BIGINT) AS src,
        |  CAST(o_custkey + 1000000 AS BIGINT) AS dst
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_linenumber = 1""".stripMargin,
      kRich = 10L),

    "q397_trustrank" -> GraphOps.trustRankOracleSql(
      """SELECT src, dst, count(*) AS w FROM (
        |  SELECT CAST(l_suppkey AS BIGINT) AS src,
        |    CAST(o_custkey + 1000000 AS BIGINT) AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_linenumber = 1
        |  UNION ALL
        |  SELECT CAST(o_custkey + 1000000 AS BIGINT),
        |    CAST(l_suppkey AS BIGINT)
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_linenumber = 1) u
        |GROUP BY src, dst""".stripMargin,
      """SELECT CAST(s_suppkey AS BIGINT) AS node FROM supplier
        |WHERE s_nationkey = (SELECT min(s_nationkey) FROM supplier)"""
        .stripMargin,
      iterations = 6),

    "q396_nation_modularity" -> GraphOps.modularityOracleSql(
      """SELECT CAST(l_suppkey AS BIGINT) AS src,
        |  CAST(o_custkey + 1000000 AS BIGINT) AS dst
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_linenumber = 1""".stripMargin,
      """SELECT CAST(s_suppkey AS BIGINT) AS node,
        |  CAST(s_nationkey AS BIGINT) AS lbl FROM supplier
        |UNION ALL
        |SELECT CAST(c_custkey + 1000000 AS BIGINT),
        |  CAST(c_nationkey AS BIGINT) FROM customer""".stripMargin),

    "q201_pagerank" -> GraphOps.pageRankOracleSql(
      """SELECT src, dst, count(*) AS w FROM (
        |  SELECT CAST(l_suppkey AS BIGINT) AS src,
        |    CAST(o_custkey + 1000000 AS BIGINT) AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_linenumber = 1
        |  UNION ALL
        |  SELECT CAST(o_custkey + 1000000 AS BIGINT),
        |    CAST(l_suppkey AS BIGINT)
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_linenumber = 1)
        |GROUP BY src, dst""".stripMargin),
    "q200_rtbf_audit" -> graft.ops.ComplianceOps.cascadeOracleSql(
      "c_custkey % 101 = 0"),
    "q196_mad_outliers" -> graft.ops.ProfileOps.madOutliersOracleSql(
      "documents", "source", "n_chars"),
    "q148_curriculum" ->
      (SelectionOps.curriculumOracleSql(qualityOracleSql(TextOps.TrainedQualityWeights))
        .replaceFirst("SELECT q.doc_id AS id", "SELECT q.doc_id AS doc_id")),
    "q171_bradley_terry" -> PreferenceOps.bradleyTerryOracleSql(
      """SELECT CASE WHEN a.n_chars >= b.n_chars THEN a.source ELSE b.source END AS w,
        |       CASE WHEN a.n_chars >= b.n_chars THEN b.source ELSE a.source END AS l
        |FROM documents a JOIN documents b
        |  ON a.doc_id % 2 = 0 AND b.doc_id = a.doc_id + 1
        | AND a.source <> b.source""".stripMargin),
    "q120_feature_corr" -> ProfileOps.corrOracleSql("lineitem",
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")),
    "q127_blocklist" -> ("""WITH c AS (SELECT doc_id,
        | CASE WHEN doc_id % 6 = 0
        |   THEN text || ' Click here to BUY NOW and buy now again'
        |  WHEN doc_id % 10 = 0
        |   THEN 'Lorem Ipsum dolor. ' || text || ' All Rights Reserved. Subscribe!'
        |  WHEN doc_id % 17 = 0
        |   THEN text || ' This site uses cookies. Sign up for free shipping. Limited Time Offer!'
        |  ELSE text END AS t
        | FROM documents)
        |""".stripMargin + BlocklistOps.oracleSql("c", "doc_id", "t")),
    "q144_heaps_fit" ->
      ProfileOps.heapsOracleSql("documents", "text", "source"),
    "q141_length_lognormal" ->
      ProfileOps.lengthLogNormalOracleSql("documents", "text"),
    "q68_mixture_sample" -> {
      val coord = "substr(md5('mix1' || CAST(doc_id AS VARCHAR)), 1, 13)"
      val cases = MixtureFractions.map { case (s, f) =>
        s"WHEN '$s' THEN '${SampleOps.thresholdHex(f)}'"
      }.mkString(" ")
      s"""SELECT doc_id, source FROM documents
         |WHERE $coord < CASE source $cases
         |  ELSE '${SampleOps.thresholdHex(0.05)}' END""".stripMargin
    },
    "q69_split_assign" -> {
      val coord = "substr(md5('split1' || CAST(doc_id AS VARCHAR)), 1, 13)"
      val cuts = SplitSpec.init.scanLeft(0.0) { case (a, (_, f)) => a + f }.tail
      val whens = SplitSpec.init.zip(cuts).map { case ((label, _), cut) =>
        s"WHEN $coord < '${SampleOps.thresholdHex(cut)}' THEN '$label'"
      }.mkString(" ")
      s"""SELECT doc_id,
         |CASE $whens ELSE '${SplitSpec.last._1}' END AS split
         |FROM documents""".stripMargin
    },
    "q73_stratified_take" ->
      """SELECT doc_id, source FROM (
        | SELECT doc_id, source, row_number() OVER (PARTITION BY source
        |   ORDER BY substr(md5('strat1' || CAST(doc_id AS VARCHAR)), 1, 13),
        |            doc_id) AS rn
        | FROM documents) t
        |WHERE rn <= 20""".stripMargin,
  )
}
