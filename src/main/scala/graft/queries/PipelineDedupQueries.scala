package graft.queries

import graft.Tables
import graft.ops.{BlocklistOps, DedupOps, DsirOps, GraphOps, LmOps, MultimodalOps, PcaOps, PreferenceOps, ProfileOps, RetrievalOps, SampleOps, SelectionOps, SimilarityOps, TextOps, WinnowOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import PipelineShared._

/** dedup, winnowing, LSH and contamination queries — split from PipelineQueries (entries verbatim; the
  * aggregate map in PipelineQueries is unchanged).
  */
private[graft] object PipelineDedupQueries {
  val queries: Map[String, Q] = Map(

    // Durable IVF index lifecycle (q239 made operational): the three
    // batch deltas PERSIST to an append-only parquet stats store
    // (IndexStore.append — a fresh store per run, as a real ingest
    // would use a fresh delta path per batch), the refresh reads the
    // store via merge-on-read, and probe serving runs under the
    // store-derived centers. Output pins store-served == from-scratch
    // cell-for-cell; the oracle replays both paths arithmetically —
    // additivity makes the 3-way persisted split, the oracle's 2-way
    // in-memory split, and the single from-scratch pass bit-identical.
    "q351_ivf_store" -> ((s, d) => {
      import graft.ops.{IndexStore, IvfIndexOps}
      val emb = Tables(s, d, "embeddings")
      val c0 = IvfIndexOps.initCenters(s, emb, "vec_id", "embedding", 6)
      // store built ONCE per application+corpus (memoized like
      // winnowStorePath/orcLineitem): warm runs serve from it instead
      // of re-writing three deltas into a fresh temp dir each time
      val store = IndexStore.ivfDemoStorePath(s, d, k = 6)
      val asg = IvfIndexOps.assign(s, emb, "vec_id", "embedding", c0)
      val cStore = IvfIndexOps.refresh(c0,
        IndexStore.readIvfStats(s, store, expectK = 6))
      val cScr = IvfIndexOps.refresh(c0,
        IvfIndexOps.cellStatsFromAssigned(asg))
      val probes = emb.where(col("vec_id") % 5 === 0)
      val ai = IvfIndexOps.assign(s, probes, "vec_id", "embedding", cStore)
        .select(col("id").as("vec_id"),
          col("cell").cast("int").as("cell_incr"))
      val asx = IvfIndexOps.assign(s, probes, "vec_id", "embedding", cScr)
        .select(col("id").as("vec_id"),
          col("cell").cast("int").as("cell_scratch"))
      ai.join(asx, Seq("vec_id"))
        .select(col("vec_id"), col("cell_incr"), col("cell_scratch"),
          (col("cell_incr") === col("cell_scratch")).cast("int")
            .as("agree"))
    }),

    // Winnow pair store serve: the q156 funnel's pair frame persisted
    // ONCE to parquet (IndexStore.winnowStorePath) and this report
    // served FROM the store — a pair-frame parquet scan + filter,
    // zero document scans (PlanSpec asserts the plan never touches
    // raw text). The oracle replays the FULL funnel at the serve
    // threshold, so the hash match proves stored-serve == recompute.
    "q352_winnow_store" -> ((s, d) =>
      graft.ops.IndexStore.serveWinnowPairs(s, d, 0.4)
        .select("id_a", "id_b", "n_shared", "jac")),

    // Durable banded-LSH near-dup store — the q351/q352 discipline
    // for the MinHash family: md5-hash-family band rows persisted in
    // three batch appends (store memoized per app+corpus), near-dup
    // candidates SERVED from the store with corpus text untouched at
    // serve time. The oracle replays the whole pipeline from scratch,
    // so the hash match proves merged-store serve == from-scratch
    // (band rows carry no cross-doc state; any batch split unions to
    // the same frame).
    "q365_lsh_store" -> ((s, d) =>
      graft.ops.IndexStore.serveLshPairs(s,
        graft.ops.IndexStore.lshDemoStorePath(s, d))),

    // SimHash durable band store — q365's discipline for the SimHash
    // family, now banded under the md5Long64 token-hash family so the
    // store serve is FULLY SQL-oracled: the oracle replays the codes
    // digitwise from scratch and brute-forces the Hamming pairs, so
    // the hash match proves merged-store serve == from-scratch
    // (band rows carry no cross-doc state). SimhashStoreSpec keeps
    // pinning the xxhash64 production family's store ≡ live equality.
    "q366_simhash_store" -> ((s, d) =>
      graft.ops.IndexStore.serveSimHashPairs(s,
        graft.ops.IndexStore.simhashDemoStorePath(s, d))),

    // Curation pipeline v3 — this round's stages composed into one
    // decision manifest over the candidate half (odd ids) of the
    // corpus: doc-level lang-ID (q96), span-perplexity retention
    // (q243, integer micro-fraction threshold — no float compare),
    // Luhn card-PII gate (q246), and passage-index freshness vs the
    // already-ingested half (q247, exact 2·known ≤ total test).
    "q251_curation_v3" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val docs = Tables(s, d, "documents")
      val langs = graft.ops.LangNgram.langs
      // every downstream predicate is consumed ONLY for the candidate
      // (odd-id) half — the final joins are inner (lang/pii) or left
      // (ppl) on that half, so computing signals for even ids was
      // discarded work. Restrict each signal pass to the candidates:
      // per-doc signals are independent per row, so values for the
      // surviving ids are unchanged.
      val cand = docs.where(col("doc_id") % 2 === 1)
      // lang scores and the Luhn card count are both per-row text
      // signals: ONE floored scan computes both (two single-split
      // passes + two joins before), guide §2.4/§2.5
      val scored = graft.ops.SkewOps.parallelismFloor(
          cand.select(col("doc_id"), col("text")))
        .select(col("doc_id"),
          call_function("graft_lang_scores",
            coalesce(col("text"), lit(""))).as("_sc"),
          TextOps.luhnValidCount(col("text")).as("n_cards"))
        .select(col("doc_id") +: col("n_cards") +:
          langs.zipWithIndex.map { case (l, i) =>
            element_at(col("_sc"), i + 1).as(s"s_$l")
          }: _*)
      val pred = langs.zipWithIndex.foldRight(lit(langs.last)) {
        case ((l, i), rest) =>
          val laters = langs.drop(i + 1).map(o => col(s"s_$l") >= col(s"s_$o"))
          if (laters.isEmpty) rest
          else when(laters.reduce(_ && _), lit(l)).otherwise(rest)
      }
      val langPii = scored.select(col("doc_id"), pred.as("lang_pred"),
        col("n_cards"))
      val spans = graft.ops.LangSpanOps.sentenceSpans(cand, "doc_id", "text")
        .select((col("doc_id") * 100000 + col("span_idx")).as("id"),
          col("span"))
      val ppl = LmOps.score(spans,
          docs.where(col("lang") === "en")
            .select(col("doc_id").as("id"), col("text").as("span")),
          "id", "span")
        .select(expr("id div 100000").as("doc_id"), col("kn_logppl"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("kn_logppl") <= 6.0, 1L).otherwise(0L)).as("n_kept"))
        .select(col("doc_id"),
          expr("(2000000 * n_kept + n_spans) div (2 * n_spans)").as("kf6"))
      val store = WinnowOps.fingerprintIndex(
        docs.where(col("doc_id") % 2 === 0), "doc_id", "text")
      val fresh = WinnowOps.overlapAgainstIndex(
          cand, store, "doc_id", "text")
        .select(col("id").as("doc_id"),
          (col("n_fp") === 0 || col("n_known") * 2 <= col("n_fp"))
            .cast("int").as("p_fresh"))
      // the three signal subtrees are independent — checkpoint them
      // with their jobs overlapped (guide §2.6) so the cheap passes
      // back-fill the perplexity pipeline's stage tails
      val Seq(langPiiC, pplC, freshC) =
        graft.ops.Checkpoints.concurrently(Seq(langPii, ppl, fresh))
      cand.select(col("doc_id"))
        .join(langPiiC, Seq("doc_id"))
        .join(pplC, Seq("doc_id"), "left")
        .join(freshC, Seq("doc_id"))
        .select(col("doc_id"),
          (col("lang_pred") === "en").cast("int").as("p_lang"),
          (coalesce(col("kf6"), lit(0L)) >= 500000L).cast("int").as("p_ppl"),
          (col("n_cards") === 0).cast("int").as("p_pii"),
          col("p_fresh"))
        .withColumn("keep",
          (col("p_lang") === 1 && col("p_ppl") === 1 &&
            col("p_pii") === 1 && col("p_fresh") === 1).cast("int"))
    }),

    // Per-source duplication inflation: token mass before vs after
    // exact dedup (md5 fingerprint groups) — the dedup-ROI number
    // that decides which sources are worth near-dup passes.
    "q288_dup_inflation" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
        .select(col("source"), md5(col("text").cast("binary")).as("fp"),
          TextOps.tokenCount(col("text")).cast("long").as("tk"))
      docs.groupBy("source", "fp")
        .agg(count(lit(1)).as("cnt"), max("tk").as("tk"))
        .groupBy("source")
        .agg(sum("cnt").as("n_docs"), count(lit(1)).as("n_unique"),
          sum(col("cnt") * col("tk")).as("tok_total"),
          sum("tk").as("tok_unique"))
        .select(col("source"), col("n_docs"), col("n_unique"),
          col("tok_total"), col("tok_unique"),
          (expr("(2000000 * tok_total + tok_unique)" +
            " div (2 * tok_unique)").cast("double") / 1e6)
            .as("inflation"))
    }),

    // Integer-grid HITS hubs/authorities over the customer-brand
    // bipartite purchase graph — max-normalized exact iterations.
    "q314_hits" -> ((s, d) => {
      val o = Tables(s, d, "orders").select(col("o_orderkey"),
        col("o_custkey"))
      val li = Tables(s, d, "lineitem").select(col("l_orderkey"),
        col("l_partkey"))
      val p = Tables(s, d, "part").select(col("p_partkey"),
        col("p_brand"))
      // orders is a 2-column dim here -> broadcast both sides of the
      // derivation; dedup the (order, brand) grid BEFORE attaching
      // custkey so the distinct runs on the smallest frame
      val edges = li
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("p_brand")).distinct()
        .join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("h"), col("p_brand").as("a"))
      graft.ops.GraphOps.hits(edges, "h", "a")
    }),

    // Template detection: the share of each source's docs opening
    // with the source's most common 32-char prefix — the "is this
    // source one boilerplate page" probe.
    "q337_template_share" -> ((s, d) => {
      val pre = Tables(s, d, "documents")
        .select(col("source"), substring(col("text"), 1, 32).as("p"))
        .groupBy("source", "p").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("source")
        .orderBy(col("c").desc, col("p").asc)
      pre.select(col("source"), col("p"), col("c"),
          sum("c").over(Window.partitionBy("source")).as("n_docs"),
          row_number().over(w).as("rk"))
        .where(col("rk") === 1)
        .select(col("source"), col("n_docs"),
          col("c").as("template_count"),
          round(col("c").cast("double") / col("n_docs").cast("double"),
            6).as("template_share"), col("p").as("template_prefix"))
    }),

    // Cross-lingual fingerprint leakage: identical whitespace-
    // normalized content appearing under >= 2 languages (injected
    // deterministically, q159-style) — the translation-dup trap
    // resemblance dedup per-language misses.
    "q338_crosslingual_leak" -> ((s, d) => {
      val t = when(col("doc_id") % 97 === 0,
        lit("la plume de ma tante est sur la table"))
        .otherwise(col("text"))
      Tables(s, d, "documents").withColumn("text", t)
        .select(TextOps.fingerprint(col("text")).as("fp"),
          col("lang"), col("doc_id"))
        .groupBy("fp")
        .agg(countDistinct("lang").as("n_langs"),
          count(lit(1)).as("n_docs"), min("doc_id").as("min_doc"))
        .where(col("n_langs") >= 2)
    }),

    // Prefix-cache savings estimate: docs sharing their first-8-token
    // prefix with another doc — the KV-cache prefix-dedup readout a
    // serving stack sizes its cache from.
    "q339_prefix_cache" -> ((s, d) => {
      val toks = Tables(s, d, "documents")
        .select(TextOps.tokens(col("text")).as("ts"))
        .where(size(col("ts")) >= 8)
        .select(array_join(slice(col("ts"), 1, 8), " ").as("pre"))
      toks.groupBy("pre").agg(count(lit(1)).as("n"))
        .agg(sum("n").as("n_docs"),
          sum(when(col("n") >= 2, 1L).otherwise(0L)).as("n_groups_shared"),
          sum(when(col("n") >= 2, col("n")).otherwise(0L))
            .as("n_docs_shared"),
          sum(when(col("n") >= 2, (col("n") - 1) * 8).otherwise(0L))
            .as("saved_tokens"))
        .select(col("n_docs"), col("n_groups_shared"),
          col("n_docs_shared"), col("saved_tokens"),
          round(col("n_docs_shared").cast("double")
            / col("n_docs").cast("double"), 6).as("share_cached"))
    }),

    // One label-propagation step over the verified near-dup graph:
    // unlabeled docs (doc_id % 3 != 0) adopt the majority seed label
    // among their winnow-verified neighbors (count desc, label asc
    // ties) — semi-supervised tag spreading served FROM the shared
    // WinnowStage pair frame, no new corpus scan.
    "q357_label_spread" -> ((s, d) => {
      val vp = graft.ops.WinnowStage.pairsAt(s, d, 0.3)
      val e = vp.select(col("id_a").as("id"), col("id_b").as("nb"))
        .unionByName(vp.select(col("id_b").as("id"),
          col("id_a").as("nb")))
      val seeds = Tables(s, d, "documents")
        .where(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("nb"), col("lang"))
      val votes = e.where(col("id") % 3 =!= 0)
        .join(broadcast(seeds), "nb")
        .groupBy(col("id"), col("lang"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("id")
        .orderBy(col("c").desc, col("lang").asc)
      votes.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("id").as("doc_id"), col("lang").as("lang_pred"),
          col("c").as("votes"))
    }),

    // Prefix-filtered exact Jaccard join (PPJoin): lossless at
    // tau=0.5 — the oracle computes the FULL exact pair set, so the
    // hash match proves the prefix filter drops nothing.
    "q283_prefix_jaccard" -> ((s, d) =>
      DedupOps.prefixJaccardPairs(
        DedupOps.wordShingles(Tables(s, d, "documents"), "doc_id",
          "text", 3), tauPermille = 500)),

    // Data-driven MinHash-LSH parameter tuning: for each (rows r,
    // bands b) config, the EXPECTED candidate workload on THIS
    // corpus's measured pair-similarity distribution (the WinnowStage
    // jac histogram) via the S-curve P = 1−(1−j^r)^b — split into
    // expected true candidates (jac ≥ 0.3) and expected false ones.
    // Powers are squaring chains (r, b powers of two) so both engines
    // compute identical doubles; per-pair P rounds to micro-units and
    // sums as exact longs.
    "q249_lsh_tuning" -> ((s, d) => {
      import s.implicits._
      val cfg = Seq((2, 4), (2, 8), (2, 16), (4, 8), (4, 16), (8, 16))
        .toDF("r", "b")
      val j = col("jac")
      val j2 = j * j; val j4 = j2 * j2; val j8 = j4 * j4
      val jr = when(col("r") === 2, j2).when(col("r") === 4, j4)
        .otherwise(j8)
      val q1 = lit(1.0) - jr
      val q2 = q1 * q1; val q4 = q2 * q2; val q8 = q4 * q4
      val q16 = q8 * q8
      val qb = when(col("b") === 4, q4).when(col("b") === 8, q8)
        .otherwise(q16)
      val pm = round((lit(1.0) - qb) * 1e6, 0).cast("long")
      graft.ops.WinnowStage.pairs(s, d).select("jac")
        .crossJoin(broadcast(cfg))
        .select(col("r"), col("b"), col("jac"), pm.as("pm"))
        .groupBy("r", "b")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("jac") >= 0.3, 1L).otherwise(0L)).as("n_true"),
          sum(when(col("jac") >= 0.3, col("pm")).otherwise(0L)).as("_tp"),
          sum(when(col("jac") < 0.3, col("pm")).otherwise(0L)).as("_fp"))
        .select(col("r"), col("b"), col("n_pairs"), col("n_true"),
          round(col("_tp") / 1e6, 6).as("exp_tp"),
          round(col("_fp") / 1e6, 6).as("exp_fp"))
    }),

    // Incremental passage-fingerprint index (the crawl loop): build
    // the store from batch 1, score batch 2 against it, fold batch 2
    // in, score batch 3 against the grown store. %73 docs are FULL
    // duplicates of an indexed page (overlap 1.0 → dropped); %29 docs
    // share one boilerplate passage (partial overlap → kept).
    "q247_winnow_incremental" -> ((s, d) => {
      val fullDup = "this exact landing page is mirrored verbatim across " +
        "every regional site of the network with no local changes at all"
      val boiler = " Subscribe to our newsletter for weekly updates and " +
        "exclusive member offers."
      val docs = Tables(s, d, "documents").withColumn("text",
        when(col("doc_id") % 73 === 0, lit(fullDup))
          .when(col("doc_id") % 29 === 0, concat(col("text"), lit(boiler)))
          .otherwise(col("text")))
      val b1 = docs.where(col("doc_id") % 3 === 0)
      val b2 = docs.where(col("doc_id") % 3 === 1)
      val b3 = docs.where(col("doc_id") % 3 === 2)
      val store1 = WinnowOps.fingerprintIndex(b1, "doc_id", "text")
      val r2 = WinnowOps.overlapAgainstIndex(b2, store1, "doc_id", "text")
        .select(col("id").as("doc_id"), lit(2).as("batch"), col("n_fp"),
          col("n_known"), col("overlap"), col("keep"))
      val store2 = WinnowOps.indexUpdate(store1,
        WinnowOps.fingerprintIndex(b2, "doc_id", "text"))
      val r3 = WinnowOps.overlapAgainstIndex(b3, store2, "doc_id", "text")
        .select(col("id").as("doc_id"), lit(3).as("batch"), col("n_fp"),
          col("n_known"), col("overlap"), col("keep"))
      r2.unionByName(r3)
    }),

    // MMR-diversified retrieval (Carbonell & Goldstein): top-3 from
    // each query's 10 candidates balancing relevance vs redundancy —
    // the result-page/RAG-context dedup move; unrolled greedy with a
    // line-for-line SQL twin.
    "q245_mmr_diversified" -> ((s, d) =>
      SimilarityOps.mmrTop3(Tables(s, d, "embeddings"), "vec_id",
        "embedding", col("vec_id") < 5)),

    // Embedding-space benchmark decontamination: best cosine vs the
    // held-out benchmark slice (vec_id % 20 == 0) above 0.35.
    "q215_embedding_decontam" -> ((s, d) =>
      SimilarityOps.benchmarkContamination(Tables(s, d, "embeddings"),
        "vec_id", "embedding", pmod(col("vec_id"), lit(20L)) === 0,
        minSim = 0.35)),

    // Winnowing (MOSS) fingerprint dup pairs: injected boilerplate on
    // the %29 residue exercises the shared-passage guarantee; the
    // maxDf guard drops crawl-wide boilerplate before the pair join.
    "q147_winnow_pairs" -> ((s, d) => {
      val boiler = " Subscribe to our newsletter for weekly updates and exclusive offers today."
      val t = when(col("doc_id") % 29 === 0, concat(col("text"), lit(boiler)))
        .otherwise(col("text"))
      WinnowOps.dupPairs(
        Tables(s, d, "documents").withColumn("text", t),
        "doc_id", "text")
    }),

    // Embedding centroid outliers: top-5 farthest vectors per label
    // (mislabel/contamination audit) against exact fixed-point centroids.
    "q150_centroid_outliers" -> ((s, d) =>
      SimilarityOps.centroidOutliers(Tables(s, d, "embeddings"),
        "vec_id", "embedding", "label", topK = 5)),

    "q168_boilerplate_miner" -> ((s, d) => {
      val boiler = " Subscribe to our newsletter for weekly updates and exclusive offers today."
      val t = when(col("doc_id") % 29 === 0, concat(col("text"), lit(boiler)))
        .otherwise(col("text"))
      WinnowOps.boilerplateMiner(
        Tables(s, d, "documents").withColumn("text", t),
        "doc_id", "text", "source", topK = 3, minDf = 3)
    }),

    // Dedup savings estimate: cluster the verified dups, keep one doc
    // per cluster (the component label = min id), report how many
    // tokens dedup would remove — the "is near-dup dedup worth
    // running here" headline number.
    "q166_dedup_savings" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      // WinnowStage: the funnel is materialized ONCE per (app, dir)
      // and shared across q156/q158/q160/q165/q166/q167 — the
      // production shape (run the scan once, fan analyses out).
      val comps = GraphOps.connectedComponents(
        graft.ops.WinnowStage.pairsAt(s, d, 0.3)
          .select(col("id_a"), col("id_b")),
        "id_a", "id_b")
      val toks = docs.select(col("doc_id"),
        coalesce(TextOps.tokenCount(col("text")).cast("long"), lit(0L)).as("toks"))
      val clustered = toks
        .join(comps.withColumnRenamed("id", "doc_id"), Seq("doc_id"))
        .agg(count_distinct(col("comp")).as("n_clusters"),
          count(lit(1)).as("n_clustered_docs"),
          sum(col("toks")).as("tokens_clustered"),
          coalesce(sum(when(col("doc_id") =!= col("comp"), col("toks"))),
            lit(0L)).as("tokens_removable"))
      val totals = toks.agg(count(lit(1)).as("n_docs_total"),
        sum(col("toks")).as("tokens_total"))
      totals.crossJoin(clustered)
        .withColumn("savings_frac",
          round(col("tokens_removable").cast("double") / col("tokens_total"), 6))
    }),

    // Cross-source NEAR-dup leakage matrix (q140's exact-text audit
    // at passage level): verified-pair counts per source pair.
    "q167_source_neardup" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val vp = graft.ops.WinnowStage.pairsAt(s, d, 0.3)
      val src = docs.select(col("doc_id"), col("source"))
      vp.join(src.select(col("doc_id").as("id_a"), col("source").as("sa")), Seq("id_a"))
        .join(src.select(col("doc_id").as("id_b"), col("source").as("sb")), Seq("id_b"))
        .groupBy(least(col("sa"), col("sb")).as("source_a"),
          greatest(col("sa"), col("sb")).as("source_b"))
        .agg(count(lit(1)).as("n_pairs"))
    }),

    // Passage-level novelty vs the already-crawled reference (even
    // ids): the persisted-winnow-index probe, q145's verbatim-passage
    // companion.
    "q164_ref_overlap" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      WinnowOps.refOverlap(
        docs.where(col("doc_id") % 2 === 1),
        docs.where(col("doc_id") % 2 === 0),
        "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    }),

    // Dedup-threshold sweep: verified-pair counts at a Jaccard
    // ladder from ONE candidate+verify pass — the production
    // threshold-tuning curve.
    "q165_threshold_sweep" -> ((s, d) =>
      WinnowOps.thresholdSweepFrom(graft.ops.WinnowStage.pairs(s, d))),

    // LEAKAGE-SAFE train/val/test split: the q69 splitter keyed by
    // verified-dup COMPONENT instead of doc id — a near-dup cluster
    // can never straddle a split boundary (the eval-contamination
    // channel the plain per-doc split leaves open).
    "q160_leakage_safe_split" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val comps = GraphOps.connectedComponents(
        graft.ops.WinnowStage.pairsAt(s, d, 0.3)
          .select(col("id_a"), col("id_b")),
        "id_a", "id_b")
      docs.select(col("doc_id"))
        .join(comps.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("comp"), col("doc_id")).as("component"))
        .withColumn("split",
          SampleOps.assignSplit(col("component"), SplitSpec, salt = "split1"))
    }),

    // Connected dup clusters over VERIFIED winnow pairs: the
    // candidate→verify funnel feeding component labeling (group-level
    // dedup decisions, not just pairs).
    "q158_winnow_clusters" -> ((s, d) =>
      GraphOps.connectedComponents(
        graft.ops.WinnowStage.pairsAt(s, d, 0.3)
          .select(col("id_a"), col("id_b")),
        "id_a", "id_b")
        .select(col("id"), col("comp").as("component"))),

    // Asymmetric containment pairs (quote/excerpt inclusion): the %211
    // docs are verbatim-contained in the %223 docs — resemblance-based
    // dedup misses them, containment flags them. The pair frame is
    // memoized per application+corpus (the injection is deterministic
    // per dir, so the WinnowStage materialize-once discipline applies)
    // at minContainment = 0.0; the 0.7 serve threshold is a filter on
    // the already-5dp-rounded cont columns — bit-identical to running
    // the funnel at 0.7 directly, which the unchanged oracle replays.
    "q159_containment_pairs" -> ((s, d) =>
      containmentStage(s, d)
        .where(col("cont_a") >= 0.7 || col("cont_b") >= 0.7)),

    // Winnowing with passage LOCALIZATION: matching fingerprint
    // positions give "chars X–Y of A match U–V of B" spans (the
    // %29-injected boilerplate sits at text end → spans at the tail).
    "q155_winnow_spans" -> ((s, d) => {
      val boiler = " Subscribe to our newsletter for weekly updates and exclusive offers today."
      val t = when(col("doc_id") % 29 === 0, concat(col("text"), lit(boiler)))
        .otherwise(col("text"))
      WinnowOps.dupPairSpans(
        Tables(s, d, "documents").withColumn("text", t),
        "doc_id", "text")
    }),

    // Candidate→verify dedup composition: winnowing proposes, exact
    // word-3-gram Jaccard confirms — the exact measure runs on
    // |candidates|, never |corpus|².
    "q156_verified_pairs" -> ((s, d) =>
      graft.ops.WinnowStage.pairsAt(s, d, 0.3)
        .select("id_a", "id_b", "n_shared", "jac")),

    // Exact dedup: single hash shuffle keyed by the text digest.
    "q30_exact_dedup" -> ((s, d) =>
      DedupOps.exactDupGroups(Tables(s, d, "documents"), "doc_id", "text")),

    // Bloom-prefiltered cross-corpus dedup: drop docs whose opening
    // (80-char boilerplate prefix) already appears in the reference
    // slice (doc_id % 10 = 0 = "previous snapshot"). Bloom-negative
    // rows never shuffle; only probable hits reach the verifying
    // anti join — the result is EXACT on any bloom contents, so the
    // oracle is a plain NOT EXISTS.
    "q377_bloom_dedup" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val pk = md5(substring(col("text"), 1, 80).cast("binary"))
      graft.ops.BloomOps.bloomAntiJoin(
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
          .select(col("doc_id"), col("source"), pk.as("_k")),
        docs.filter(pmod(col("doc_id"), lit(10)) === 0)
          .select(pk.as("rk")),
        "_k", "rk")
        .select(col("doc_id"), col("source"))
    }),

    // Content-defined chunking dedup: rolling-hash boundaries (exact
    // polynomial window hash — the oracle replays it per position),
    // md5 chunk fingerprints, shift-tolerant shared-chunk stats.
    "q106_cdc_chunks" -> ((s, d) =>
      DedupOps.cdcChunkStats(Tables(s, d, "documents"), "doc_id", "text")),

    // LSH-bucketed approximate top-k (hyperplane sign bits), with one
    // Hamming-1 multi-probe — registered under the md5 sign-plane
    // family (lshBucketMd5) so the full pipeline replays in the
    // DuckDB oracle; the xxhash64 production planes share this exact
    // pipeline via the injected bucketExpr (q83 scoreboard +
    // SimilaritySpec keep covering them).
    "q38_knn_lsh" -> ((s, d) =>
      SimilarityOps.knnLsh(Tables(s, d, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 5, 10, nbits = 4, probes = 2,
        bucketExpr = SimilarityOps.lshBucketMd5(_, _, d = 64))),

    // Exact n-gram Jaccard pairs over 3-gram shingles.
    "q39_ngram_jaccard" -> ((s, d) =>
      DedupOps.ngramJaccardPairs(
        DedupOps.wordShingles(Tables(s, d, "documents"), "doc_id", "text", 3), 0.2,
        sizesProvided = true)),

    // MinHash+LSH near-dup candidate pairs — the LIVE md5-family
    // banding pipeline (the store-served q365's in-session twin) at
    // its own parameterization (32 hashes / 8 bands), fully
    // SQL-oracled; the xxhash64 native-signature production path
    // (minHashLshPairs) keeps its spec + q111-scoreboard coverage
    // and stays the at-scale default.
    "q40_minhash_lsh" -> ((s, d) =>
      DedupOps.lshBandPairs(
        DedupOps.minHashMd5Bands(Tables(s, d, "documents"), "doc_id",
          "text", shingleN = 3, numHashes = 32, bands = 8),
        numHashes = 32, minEstJaccard = 0.5)),

    // 64-bit SimHash — registered under the md5Long64 token-hash
    // family (full digitwise DuckDB replay); the xxhash64 production
    // family shares the simHashWith pipeline verbatim (one injected
    // scalar expression) and stays spec-covered.
    "q41_simhash" -> ((s, d) =>
      DedupOps.simHashMd5(Tables(s, d, "documents"), "doc_id", "text")),

    // SimHash near-dup PAIRS: banded chunk buckets, exact for
    // hamming<=3 by pigeonhole — md5 token-hash family, so the
    // oracle is a brute-force Hamming replay over the replayed
    // codes; banding-vs-brute exactness is ALSO spec-verified.
    "q86_simhash_pairs" -> ((s, d) =>
      DedupOps.simHashPairs(Tables(s, d, "documents"), "doc_id", "text",
        maxHamming = 3, tokenHash = DedupOps.md5Long64)),

    // Benchmark-contamination sweep: corpus docs vs the distinct
    // 3-gram set of a (deterministic) benchmark slice; broadcast
    // semi-join, corpus never shuffled on the gram.
    "q60_contamination" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      DedupOps.contaminationOverlap(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", 3)
    }),

    // Cluster-dedup retention: keep the longest doc per whitespace-
    // insensitive fingerprint (ties → lowest id); one key shuffle.
    "q61_keep_best" -> ((s, d) =>
      DedupOps.keepBest(Tables(s, d, "documents"), "doc_id",
        TextOps.fingerprint(col("text")), col("n_chars"))),

    // End-to-end curation funnel: length → language → repetition →
    // contamination → dedup, all signals from ONE corpus scan, stage
    // counts from one aggregation of cumulative flags.
    "q63_curation_funnel" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      graft.ops.CurationPipeline.funnel(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text")
    }),

    // Near-dup clusters: connected components over the exact-Jaccard
    // pair graph (q39's edge set) — pairs become actionable dedup
    // groups. Iterative min-label propagation, lineage truncated per
    // round (GraphOps scaladoc).
    "q66_dup_components" -> ((s, d) =>
      GraphOps.connectedComponents(
        DedupOps.ngramJaccardPairs(
          DedupOps.wordShingles(Tables(s, d, "documents"), "doc_id", "text", 3),
          0.2, sizesProvided = true),
        "a_id", "b_id")
        .select(col("id"), col("comp").as("component"))),

    // Line-level dedup (RefinedWeb-style boilerplate removal). The
    // synthetic corpus has no newlines, so the harness query injects
    // them deterministically (before every "table" token — same
    // expression replayed in the oracle); the operator itself is
    // generic over any line-structured text.
    "q71_line_dedup" -> ((s, d) =>
      // the op returns the cleaned corpus text (its downstream use);
      // the harness compacts it to md5 for the oracle compare
      TextOps.lineDedup(
        Tables(s, d, "documents")
          .select(col("doc_id"),
            regexp_replace(col("text"), " table", "\ntable").as("text")),
        "doc_id", "text", minDupCount = 2)
        .select(col("id").as("doc_id"), col("n_lines"), col("n_kept"),
          md5(col("cleaned").cast("binary")).as("cleaned_md5"))),

    // Curation funnel V2: the integration flagship of the trained/
    // model-based stages — lang-ID (n-gram profiles) -> trained
    // quality -> substring-dup exposure -> fingerprint dedup, one
    // cumulative funnel row. Every stage's oracle composes into one
    // SQL, so the whole pipeline is value-checked end to end.
    "q100_curation_v2" -> ((s, d) =>
      graft.ops.CurationPipeline.funnelV2(
        Tables(s, d, "documents"), "doc_id", "text")),

    // Exact substring-level dedup (Lee et al. ExactSubstr family):
    // per-doc summary of maximal verbatim >= 4-token spans repeated
    // anywhere in the corpus.
    "q94_substr_spans" -> ((s, d) => {
      val spans = DedupOps.substrDupSpans(Tables(s, d, "documents"),
        "doc_id", "text", k = 4)
      Tables(s, d, "documents").select(col("doc_id"))
        .join(spans.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .groupBy("doc_id")
        .agg(count(col("span_start")).as("n_spans"),
          coalesce(sum("span_tokens"), lit(0L)).as("sum_span_tokens"),
          coalesce(max("span_tokens"), lit(0L)).as("max_span_tokens"))
    }),

    // ExactSubstr REMOVAL (Lee et al. detect → cut): every flagged
    // duplicate span cut from its document, survivors token-rejoined.
    // The oracle replays the cut in SQL (covered-position anti-join).
    "q101_remove_spans" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val spans = DedupOps.substrDupSpans(docs, "doc_id", "text", k = 4)
      DedupOps.removeSpans(docs, "doc_id", "text", spans)
        .select(col("id").as("doc_id"), col("n_tokens_removed"),
          col("text_clean"))
    }),

    // Surgical decontamination (detect → cut vs a benchmark): spans
    // of verbatim 3-gram overlap with the q60 benchmark slice are cut
    // from the corpus slice; the oracle replays span detection AND
    // the covered-position cut.
    "q110_decontaminate" -> ((s, d) => {
      val all = Tables(s, d, "documents")
      val corpus = all.filter(col("doc_id") % 97 =!= 0)
      val bench = all.filter(col("doc_id") % 97 === 0)
      val spans = DedupOps.benchmarkSpans(corpus, bench, "doc_id", "text", 3)
      DedupOps.removeSpans(corpus, "doc_id", "text", spans)
        .select(col("id").as("doc_id"), col("n_tokens_removed"),
          col("text_clean"))
    }),

    // Cross-source duplicate leakage (release audit): same text under
    // multiple provenance labels = a contamination channel for any
    // split-by-source. Constant-text dups injected per residue (the
    // q137 group spans many sources).
    "q140_source_leakage" -> ((s, d) => {
      val t = when(col("doc_id") % 41 === 0,
          lit("the shared boilerplate body of a page that repeats across the crawl"))
        .otherwise(col("text"))
      DedupOps.crossSourceDupLeakage(
        Tables(s, d, "documents").select(col("source"), t.as("text")),
        "text", "source")
    }),

    // Zero-width / invisible character scrub (crawl artifacts that
    // break tokenizers and dedup keys): injected per residue; every
    // injected corruption scrubs back to the original text, and the
    // oracle replays injection + scrub independently.
    "q118_invisible_scrub" -> ((s, d) => {
      val t =
        when(col("doc_id") % 5 === 0,
          replace(col("text"), lit("e"), lit("e\u200B")))
        .when(col("doc_id") % 7 === 0, concat(lit("\uFEFF"), col("text")))
        .when(col("doc_id") % 11 === 0,
          replace(col("text"), lit(" "), lit("\u00A0")))
        .when(col("doc_id") % 13 === 0,
          replace(col("text"), lit("a"), lit("a\u00AD")))
        .otherwise(col("text"))
      Tables(s, d, "documents").select(col("doc_id"), t.as("t"))
        .select(col("doc_id"),
          TextOps.invisibleCount(col("t")).cast("long").as("n_invisible"),
          (TextOps.scrubInvisible(col("t")) =!= col("t")).cast("int")
            .as("changed"),
          md5(TextOps.scrubInvisible(col("t")).cast("binary"))
            .as("cleaned_md5"))
    }),

    // Dedup-detection quality scoreboard: precision/recall of the
    // MinHash-LSH and SimHash candidate paths against exact n-gram
    // Jaccard truth, SAME parameters as the q40/q41/q86
    // registrations — md5 detector families, so the ENTIRE scoreboard
    // (truth, both candidate paths, the PR arithmetic) replays in the
    // DuckDB oracle; floors stay enforced in Verify +
    // DedupScoreboardSpec (which also keeps scoring the xxhash
    // production paths).
    "q111_dedup_recall" -> ((s, d) =>
      DedupOps.dedupRecallReport(s, Tables(s, d, "documents"),
        "doc_id", "text", shingleN = 3, minJaccard = 0.5,
        numHashes = 32, bands = 8,
        simHashTruthJaccard = 0.9, maxHamming = 3,
        md5Family = true)),

    // SemDeDup-shape semantic dedup end-to-end: embedding near-dup
    // pairs -> connected components -> keep the highest-QUALITY member
    // of each semantic cluster (quality from the model-based scorer).
    // Registered under the md5 sign-plane family (the q47 discipline)
    // so the WHOLE composition oracles: pair replay + recursive-CTE
    // connected components + the q79 quality replay + the keepBest
    // tie rule. The xxhash64 production planes share this exact
    // pipeline via the injected bucketExpr and stay spec/scoreboard-
    // covered (q83, SimilaritySpec); composition invariants in OpsSpec.
    "q89_semantic_survivors" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val scored = docs.join(
        TextOps.qualityScore(docs, "doc_id", "text")
          .select(col("id").as("doc_id"), col("quality")), Seq("doc_id"))
      val pairs = SimilarityOps.embeddingNearDupPairs(
        Tables(s, d, "embeddings"), "vec_id", "embedding",
        minCosine = 0.35, nbits = 4,
        bucketExpr = SimilarityOps.lshBucketMd5(_, _, d = 64))
      GraphOps.nearDupSurvivors(scored, "doc_id", "quality", pairs,
        "a_id", "b_id")
        .select(col("doc_id"), col("quality"))
    }),

    // Paragraph-level dedup (RefinedWeb's second structural pass):
    // same banned-block machinery as q71, block = "\n\n"-separated
    // paragraph (structure manufactured deterministically, mirrored in
    // the oracle).
    "q84_paragraph_dedup" -> ((s, d) =>
      TextOps.lineDedup(
        Tables(s, d, "documents")
          .select(col("doc_id"),
            regexp_replace(col("text"), " value", "\n\nvalue").as("text")),
        "doc_id", "text", minDupCount = 2, sep = "\n\n")
        .select(col("id").as("doc_id"), col("n_lines").as("n_paras"),
          col("n_kept"), md5(col("cleaned").cast("binary")).as("cleaned_md5"))),

    // Cluster-dedup end-to-end: one survivor per near-dup cluster
    // (longest text, ties to lowest id), untouched documents kept.
    "q67_dedup_survivors" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      GraphOps.nearDupSurvivors(docs, "doc_id", "n_chars",
        DedupOps.ngramJaccardPairs(
          DedupOps.wordShingles(docs, "doc_id", "text", 3), 0.2,
          sizesProvided = true),
        "a_id", "b_id")
        .select(col("doc_id"), col("n_chars"))
    }),
  )

  val oracles: Map[String, String] = Map(
    // full SemDeDup composition replay: md5-plane pair generation
    // (the q47 oracle as a sub-select), connected components as a
    // recursive CTE (comp = min reachable id — the min-label
    // propagation fixed point), the q79 quality replay, and the
    // keepBest tie rule (quality DESC, id ASC)
    "q89_semantic_survivors" -> {
      val pairSub = SimilarityOps.embeddingNearDupMd5OracleSql(
        "embeddings", "vec_id", "embedding", minCosine = 0.35,
        nbits = 4, d = 64)
      s"""WITH RECURSIVE q AS (${qualityOracleSql(TextOps.QualityWeights())}),
         |prs AS (SELECT a_id, b_id FROM ($pairSub)),
         |edges AS (SELECT a_id AS u, b_id AS w FROM prs
         |  UNION SELECT b_id AS u, a_id AS w FROM prs),
         |lab AS (SELECT u AS id, u AS comp FROM edges
         |  UNION SELECT e.w AS id, lab.comp
         |    FROM lab JOIN edges e ON lab.id = e.u),
         |cc AS (SELECT id, min(comp) AS comp FROM lab GROUP BY id),
         |members AS (SELECT cc.id, cc.comp, q.quality
         |  FROM cc JOIN q ON cc.id = q.doc_id),
         |keep AS (SELECT id FROM (SELECT id, row_number() OVER (
         |    PARTITION BY comp ORDER BY quality DESC, id ASC) AS rn
         |  FROM members) WHERE rn = 1),
         |losers AS (SELECT id FROM members
         |  WHERE id NOT IN (SELECT id FROM keep))
         |SELECT doc_id, quality FROM q
         |WHERE doc_id NOT IN (SELECT id FROM losers)""".stripMargin
    },
    // q351's store path is proven by the same arithmetic replay as
    // q239 (stats additivity makes persisted 3-way == in-memory
    // 2-way == from-scratch), at this query's own k/probe params.
    "q351_ivf_store" -> graft.ops.IvfIndexOps
      .incrementalRefreshOracleSql("embeddings", "vec_id", "embedding",
        k = 6, probeMod = 5),
    "q352_winnow_store" -> WinnowOps.verifiedPairsOracleSql("documents",
      "doc_id", "text", minJaccard = 0.4),
    "q365_lsh_store" -> DedupOps.minHashMd5OracleSql("documents",
      "doc_id", "text"),
    // q40 is the LIVE md5-band pipeline at its own parameterization
    // (32 hashes / 8 bands — exercises the non-default threshold
    // translation of the oracle generator).
    "q40_minhash_lsh" -> DedupOps.minHashMd5OracleSql("documents",
      "doc_id", "text", shingleN = 3, numHashes = 32, bands = 8,
      minEstJaccard = 0.5),
    "q41_simhash" -> DedupOps.simHashMd5OracleSql("documents",
      "doc_id", "text"),
    // brute-force Hamming replay == the banded path by pigeonhole
    // (maxHamming=3 < bands=4)
    "q86_simhash_pairs" -> DedupOps.simHashMd5PairsOracleSql("documents",
      "doc_id", "text", maxHamming = 3),
    // from-scratch replay vs the 3-batch-appended store serve: the
    // hash match IS the merge-on-read == from-scratch proof (q365's
    // oracle argument, SimHash family)
    "q366_simhash_store" -> DedupOps.simHashMd5PairsOracleSql("documents",
      "doc_id", "text", maxHamming = 3),
    "q38_knn_lsh" -> SimilarityOps.knnLshMd5OracleSql("embeddings",
      "vec_id", "embedding", "id < 5", k = 10, nbits = 4, probes = 2,
      d = 64),
    // whole scoreboard replayed: truth + both md5 detector families +
    // the PR arithmetic
    "q111_dedup_recall" -> DedupOps.dedupRecallMd5OracleSql("documents",
      "doc_id", "text", shingleN = 3, minJaccard = 0.5, numHashes = 32,
      bands = 8, simHashTruthJaccard = 0.9, maxHamming = 3),
    "q245_mmr_diversified" -> SimilarityOps.mmrOracleSql("embeddings",
      "vec_id", "embedding", "q.vec_id < 5"),
    "q251_curation_v3" -> (LmOps.knOracleWith("d.lang = 'en'") +
      spanPplCtes("documents") +
      s""",
         |lpred AS (SELECT doc_id, lang_pred FROM ($langNgramOracleSql) lt),
         |cards AS (SELECT doc_id,
         |  len(list_filter(regexp_extract_all(text, '\\b[0-9]{13,16}\\b'),
         |   cand -> list_sum(list_transform(generate_series(1, length(cand)),
         |    i -> CASE WHEN i % 2 = 0 THEN
         |      CASE WHEN (ascii(substr(reverse(cand), CAST(i AS INT), 1)) - 48) * 2 > 9
         |        THEN (ascii(substr(reverse(cand), CAST(i AS INT), 1)) - 48) * 2 - 9
         |        ELSE (ascii(substr(reverse(cand), CAST(i AS INT), 1)) - 48) * 2 END
         |      ELSE ascii(substr(reverse(cand), CAST(i AS INT), 1)) - 48 END))
         |    % 10 = 0)) AS n_cards FROM documents),
         |wt AS (SELECT doc_id AS wid, doc_id % 2 AS wb,
         |  lower(regexp_replace(text, '[ \\t\\n\\f\\r]+', '', 'g')) AS ws
         |  FROM documents),
         |wg AS (SELECT wid, wb, CASE WHEN length(ws) >= 12
         |  THEN list_transform(generate_series(1, length(ws) - 11),
         |    i -> substr(md5(substr(ws, i, 12)), 1, 16))
         |  ELSE [] END AS h FROM wt),
         |wf AS (SELECT wid, wb, list_distinct(CASE
         |   WHEN len(h) = 0 THEN []
         |   WHEN len(h) <= 6 THEN [list_min(h)]
         |   ELSE list_transform(generate_series(1, len(h) - 5),
         |     i -> list_min(h[i:i+5])) END) AS fps FROM wg),
         |wstore AS (SELECT DISTINCT unnest(fps) AS fp FROM wf WHERE wb = 0),
         |we AS (SELECT wid, len(fps) AS n_fp, unnest(fps) AS fp
         |  FROM wf WHERE wb = 1),
         |wp AS (SELECT we.wid, any_value(we.n_fp) AS n,
         |   sum(CASE WHEN r.fp IS NULL THEN 0 ELSE 1 END) AS kn
         |  FROM we LEFT JOIN wstore r USING (fp) GROUP BY we.wid),
         |wk AS (SELECT wt.wid AS doc_id, CASE WHEN wp.n IS NULL OR wp.n = 0
         |    OR 2 * wp.kn <= wp.n THEN 1 ELSE 0 END AS p_fresh
         |  FROM wt LEFT JOIN wp ON wt.wid = wp.wid WHERE wt.wb = 1),
         |manifest AS (SELECT d.doc_id,
         |  CAST(lpred.lang_pred = 'en' AS INTEGER) AS p_lang,
         |  CAST(coalesce((2000000 * g.n_kept + g.n_spans)
         |    // (2 * g.n_spans), 0) >= 500000 AS INTEGER) AS p_ppl,
         |  CAST(cards.n_cards = 0 AS INTEGER) AS p_pii,
         |  CAST(wk.p_fresh AS INTEGER) AS p_fresh
         | FROM documents d
         | JOIN lpred USING (doc_id)
         | LEFT JOIN g USING (doc_id)
         | JOIN cards USING (doc_id)
         | JOIN wk USING (doc_id)
         | WHERE d.doc_id % 2 = 1)
         |SELECT doc_id, p_lang, p_ppl, p_pii, p_fresh,
         |  CAST(p_lang = 1 AND p_ppl = 1 AND p_pii = 1 AND p_fresh = 1
         |    AS INTEGER) AS keep
         |FROM manifest""".stripMargin),

    "q314_hits" -> graft.ops.GraphOps.hitsOracleSql(
      """SELECT o_custkey AS h, p_brand AS a
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey""".stripMargin),

    "q337_template_share" ->
      """WITH pre AS (SELECT source, substring(text, 1, 32) AS p,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |r AS (SELECT source, p, c,
        |    CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n_docs,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY c DESC, p ASC) AS rk
        |  FROM pre)
        |SELECT source, n_docs, c AS template_count,
        |  round(CAST(c AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
        |    AS template_share,
        |  p AS template_prefix
        |FROM r WHERE rk = 1""".stripMargin,

    "q338_crosslingual_leak" ->
      """WITH d AS (SELECT doc_id, lang,
        |    CASE WHEN doc_id % 97 = 0
        |      THEN 'la plume de ma tante est sur la table'
        |      ELSE text END AS text
        |  FROM documents),
        |f AS (SELECT doc_id, lang,
        |    md5(regexp_replace(lower(text), '[ \t\n\f\r]+', '', 'g'))
        |      AS fp
        |  FROM d)
        |SELECT fp, CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(doc_id) AS BIGINT) AS min_doc
        |FROM f GROUP BY fp HAVING count(DISTINCT lang) >= 2"""
        .stripMargin,

    "q339_prefix_cache" ->
      """WITH toks AS (SELECT list_filter(string_split_regex(
        |    lower(text), '[ \t\n\f\r]+'), x -> x <> '') AS ts
        |  FROM documents),
        |pre AS (SELECT array_to_string(ts[1:8], ' ') AS pre
        |  FROM toks WHERE len(ts) >= 8),
        |g AS (SELECT pre, CAST(count(*) AS BIGINT) AS n
        |  FROM pre GROUP BY pre),
        |agg AS (SELECT CAST(sum(n) AS BIGINT) AS n_docs,
        |    CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_groups_shared,
        |    CAST(sum(CASE WHEN n >= 2 THEN n ELSE 0 END) AS BIGINT)
        |      AS n_docs_shared,
        |    CAST(sum(CASE WHEN n >= 2 THEN (n - 1) * 8 ELSE 0 END)
        |      AS BIGINT) AS saved_tokens
        |  FROM g)
        |SELECT n_docs, n_groups_shared, n_docs_shared, saved_tokens,
        |  round(CAST(n_docs_shared AS DOUBLE) / CAST(n_docs AS DOUBLE),
        |    6) AS share_cached
        |FROM agg""".stripMargin,
    "q357_label_spread" -> {
      val vp0 = WinnowOps.verifiedPairsOracleSql("documents", "doc_id",
        "text", minJaccard = 0.3)
      s"""WITH vp AS ($vp0),
         |e AS (SELECT id_a AS id, id_b AS nb FROM vp
         |  UNION ALL SELECT id_b AS id, id_a AS nb FROM vp),
         |seeds AS (SELECT doc_id AS nb, lang FROM documents
         |  WHERE doc_id % 3 = 0),
         |v AS (SELECT e.id, s.lang, CAST(count(*) AS BIGINT) AS c
         |  FROM e JOIN seeds s ON e.nb = s.nb
         |  WHERE e.id % 3 <> 0 GROUP BY 1, 2),
         |r AS (SELECT id, lang, c, row_number() OVER (
         |    PARTITION BY id ORDER BY c DESC, lang ASC) AS rn FROM v)
         |SELECT id AS doc_id, lang AS lang_pred, c AS votes
         |FROM r WHERE rn = 1""".stripMargin
    },

    "q288_dup_inflation" ->
      """WITH d AS (SELECT source, md5(text) AS fp,
        |    CAST(len(list_filter(string_split_regex(lower(text),
        |      '[ \t\n\f\r]+'), x -> x <> '')) AS BIGINT) AS tk
        |  FROM documents),
        |g AS (SELECT source, fp, CAST(count(*) AS BIGINT) AS cnt,
        |    max(tk) AS tk FROM d GROUP BY 1, 2),
        |a AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_docs,
        |    CAST(count(*) AS BIGINT) AS n_unique,
        |    CAST(sum(cnt * tk) AS BIGINT) AS tok_total,
        |    CAST(sum(tk) AS BIGINT) AS tok_unique
        |  FROM g GROUP BY source)
        |SELECT source, n_docs, n_unique, tok_total, tok_unique,
        |  CAST((2000000 * tok_total + tok_unique) // (2 * tok_unique)
        |    AS DOUBLE) / 1e6 AS inflation
        |FROM a""".stripMargin,

    "q283_prefix_jaccard" -> DedupOps.prefixJaccardOracleSql(
      "documents", "doc_id", "text", 3, tauPermille = 500),
    "q249_lsh_tuning" -> {
      val vp = WinnowOps.verifiedPairsOracleSql("documents", "doc_id",
        "text", minJaccard = 0.0)
      s"""WITH vp AS ($vp),
         |c (r, b) AS (VALUES (2, 4), (2, 8), (2, 16), (4, 8), (4, 16),
         |  (8, 16)),
         |x1 AS (SELECT r, b, jac, jac * jac AS j2 FROM vp CROSS JOIN c),
         |x2 AS (SELECT *, j2 * j2 AS j4 FROM x1),
         |x3 AS (SELECT *, j4 * j4 AS j8 FROM x2),
         |x4 AS (SELECT r, b, jac, 1.0::DOUBLE - (CASE r WHEN 2 THEN j2
         |   WHEN 4 THEN j4 ELSE j8 END) AS q1 FROM x3),
         |x5 AS (SELECT *, q1 * q1 AS q2 FROM x4),
         |x6 AS (SELECT *, q2 * q2 AS q4 FROM x5),
         |x7 AS (SELECT *, q4 * q4 AS q8 FROM x6),
         |x8 AS (SELECT *, q8 * q8 AS q16 FROM x7),
         |x9 AS (SELECT r, b, jac, CAST(round((1.0::DOUBLE - (CASE b
         |   WHEN 4 THEN q4 WHEN 8 THEN q8 ELSE q16 END)) * 1e6, 0)
         |   AS BIGINT) AS pm FROM x8)
         |SELECT r, b, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(CASE WHEN jac >= 0.3 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_true,
         |  round(sum(CASE WHEN jac >= 0.3 THEN pm ELSE 0 END) / 1e6, 6)
         |    AS exp_tp,
         |  round(sum(CASE WHEN jac < 0.3 THEN pm ELSE 0 END) / 1e6, 6)
         |    AS exp_fp
         |FROM x9 GROUP BY r, b""".stripMargin
    },
    "q247_winnow_incremental" ->
      """WITH t AS (SELECT doc_id AS id, doc_id % 3 AS b,
        |  lower(regexp_replace(CASE
        |    WHEN doc_id % 73 = 0 THEN 'this exact landing page is mirrored verbatim across every regional site of the network with no local changes at all'
        |    WHEN doc_id % 29 = 0 THEN text || ' Subscribe to our newsletter for weekly updates and exclusive member offers.'
        |    ELSE text END, '[ \t\n\f\r]+', '', 'g')) AS s FROM documents),
        |g AS (SELECT id, b, CASE WHEN length(s) >= 12
        |  THEN list_transform(generate_series(1, length(s) - 11),
        |    i -> substr(md5(substr(s, i, 12)), 1, 16))
        |  ELSE [] END AS h FROM t),
        |f AS (SELECT id, b, list_distinct(CASE
        |   WHEN len(h) = 0 THEN []
        |   WHEN len(h) <= 6 THEN [list_min(h)]
        |   ELSE list_transform(generate_series(1, len(h) - 5),
        |     i -> list_min(h[i:i+5])) END) AS fps FROM g),
        |s1 AS (SELECT DISTINCT unnest(fps) AS fp FROM f WHERE b = 0),
        |e2 AS (SELECT id, len(fps) AS n_fp, unnest(fps) AS fp
        |  FROM f WHERE b = 1),
        |p2 AS (SELECT e2.id, any_value(e2.n_fp) AS n,
        |   sum(CASE WHEN r.fp IS NULL THEN 0 ELSE 1 END) AS kn
        |  FROM e2 LEFT JOIN s1 r USING (fp) GROUP BY e2.id),
        |r2 AS (SELECT t.id AS doc_id, 2 AS batch,
        |   CAST(coalesce(p2.n, 0) AS BIGINT) AS n_fp,
        |   CAST(coalesce(p2.kn, 0) AS BIGINT) AS n_known,
        |   CASE WHEN p2.n > 0 THEN round(p2.kn * 1.0::DOUBLE / p2.n, 5) END
        |     AS overlap
        |  FROM t LEFT JOIN p2 ON t.id = p2.id WHERE t.b = 1),
        |s2 AS (SELECT DISTINCT fp FROM (
        |  SELECT fp FROM s1
        |  UNION ALL SELECT unnest(fps) AS fp FROM f WHERE b = 1)),
        |e3 AS (SELECT id, len(fps) AS n_fp, unnest(fps) AS fp
        |  FROM f WHERE b = 2),
        |p3 AS (SELECT e3.id, any_value(e3.n_fp) AS n,
        |   sum(CASE WHEN r.fp IS NULL THEN 0 ELSE 1 END) AS kn
        |  FROM e3 LEFT JOIN s2 r USING (fp) GROUP BY e3.id),
        |r3 AS (SELECT t.id AS doc_id, 3 AS batch,
        |   CAST(coalesce(p3.n, 0) AS BIGINT) AS n_fp,
        |   CAST(coalesce(p3.kn, 0) AS BIGINT) AS n_known,
        |   CASE WHEN p3.n > 0 THEN round(p3.kn * 1.0::DOUBLE / p3.n, 5) END
        |     AS overlap
        |  FROM t LEFT JOIN p3 ON t.id = p3.id WHERE t.b = 2),
        |u AS (SELECT * FROM r2 UNION ALL SELECT * FROM r3)
        |SELECT doc_id, batch, n_fp, n_known, overlap,
        |  CAST(overlap IS NULL OR overlap <= 0.5 AS INTEGER) AS keep
        |FROM u""".stripMargin,
    "q215_embedding_decontam" ->
      SimilarityOps.benchmarkContaminationOracleSql("embeddings",
        "vec_id", "embedding", "vec_id % 20 = 0", 0.35),
    "q147_winnow_pairs" -> WinnowOps.dupPairsOracleSql("documents", "doc_id",
      "CASE WHEN doc_id % 29 = 0 THEN text || " +
        "' Subscribe to our newsletter for weekly updates and exclusive offers today.'" +
        " ELSE text END"),
    "q150_centroid_outliers" -> SimilarityOps.centroidOutliersOracleSql(
      "embeddings", "vec_id", "embedding", "label", topK = 5),
    "q168_boilerplate_miner" -> WinnowOps.boilerplateMinerOracleSql(
      "documents", "doc_id",
      "CASE WHEN doc_id % 29 = 0 THEN text || " +
        "' Subscribe to our newsletter for weekly updates and exclusive offers today.'" +
        " ELSE text END",
      "source", topK = 3, minDf = 3),
    "q166_dedup_savings" ->
      ("WITH RECURSIVE e AS (SELECT id_a, id_b FROM (\n" +
        WinnowOps.verifiedPairsOracleSql("documents", "doc_id", "text",
          minJaccard = 0.3) + ") vp),\n" +
        """bi AS (SELECT id_a AS u, id_b AS v FROM e
          |       UNION SELECT id_b, id_a FROM e),
          |reach(u, v) AS (
          | SELECT u, u FROM (SELECT DISTINCT u FROM bi) nodes
          | UNION
          | SELECT r.u, b.v FROM reach r JOIN bi b ON r.v = b.u),
          |comps AS (SELECT u AS id, min(v) AS comp FROM reach GROUP BY u),
          |tk AS (SELECT doc_id, CAST(coalesce(
          |   len(regexp_extract_all(text, '\S+')), 0) AS BIGINT) AS toks
          |  FROM documents),
          |cl AS (SELECT CAST(count(DISTINCT c.comp) AS BIGINT) AS n_clusters,
          |   count(*) AS n_clustered_docs,
          |   CAST(sum(tk.toks) AS BIGINT) AS tokens_clustered,
          |   CAST(coalesce(sum(CASE WHEN tk.doc_id <> c.comp
          |     THEN tk.toks END), 0) AS BIGINT) AS tokens_removable
          |  FROM tk JOIN comps c ON tk.doc_id = c.id),
          |tot AS (SELECT count(*) AS n_docs_total,
          |   CAST(sum(toks) AS BIGINT) AS tokens_total FROM tk)
          |SELECT tot.n_docs_total, tot.tokens_total, cl.n_clusters,
          | cl.n_clustered_docs, cl.tokens_clustered, cl.tokens_removable,
          | round(cl.tokens_removable * 1.0::DOUBLE / tot.tokens_total, 6)
          |   AS savings_frac
          |FROM tot, cl""".stripMargin),
    "q167_source_neardup" ->
      ("WITH vp AS (\n" +
        WinnowOps.verifiedPairsOracleSql("documents", "doc_id", "text",
          minJaccard = 0.3) + "),\n" +
        """s AS (SELECT doc_id, source FROM documents)
          |SELECT least(a.source, b.source) AS source_a,
          | greatest(a.source, b.source) AS source_b,
          | count(*) AS n_pairs
          |FROM vp JOIN s a ON vp.id_a = a.doc_id
          |JOIN s b ON vp.id_b = b.doc_id
          |GROUP BY 1, 2""".stripMargin),
    "q164_ref_overlap" -> WinnowOps.refOverlapOracleSql("documents",
      "doc_id", "text", "doc_id % 2 = 1")
      .replaceFirst("SELECT t.id,", "SELECT t.id AS doc_id,"),
    "q165_threshold_sweep" -> WinnowOps.thresholdSweepOracleSql("documents",
      "doc_id", "text"),
    "q160_leakage_safe_split" -> {
      val coord = "substr(md5('split1' || CAST(component AS VARCHAR)), 1, 13)"
      val cuts = SplitSpec.init.scanLeft(0.0) { case (a, (_, f)) => a + f }.tail
      val whens = SplitSpec.init.zip(cuts).map { case ((label, _), cut) =>
        s"WHEN $coord < '${SampleOps.thresholdHex(cut)}' THEN '$label'"
      }.mkString(" ")
      "WITH RECURSIVE e AS (SELECT id_a, id_b FROM (\n" +
        WinnowOps.verifiedPairsOracleSql("documents", "doc_id", "text",
          minJaccard = 0.3) + ") vp),\n" +
        """bi AS (SELECT id_a AS u, id_b AS v FROM e
          |       UNION SELECT id_b, id_a FROM e),
          |reach(u, v) AS (
          | SELECT u, u FROM (SELECT DISTINCT u FROM bi) nodes
          | UNION
          | SELECT r.u, b.v FROM reach r JOIN bi b ON r.v = b.u),
          |comps AS (SELECT u AS id, min(v) AS component FROM reach GROUP BY u),
          |withc AS (SELECT d.doc_id,
          |  coalesce(c.component, d.doc_id) AS component
          | FROM documents d LEFT JOIN comps c ON d.doc_id = c.id)
          |""".stripMargin +
        s"""SELECT doc_id, component,
           |CASE $whens ELSE '${SplitSpec.last._1}' END AS split
           |FROM withc""".stripMargin
    },
    "q158_winnow_clusters" ->
      ("WITH RECURSIVE e AS (SELECT id_a, id_b FROM (\n" +
        WinnowOps.verifiedPairsOracleSql("documents", "doc_id", "text",
          minJaccard = 0.3) + ") vp),\n" +
        """bi AS (SELECT id_a AS u, id_b AS v FROM e
          |       UNION SELECT id_b, id_a FROM e),
          |reach(u, v) AS (
          | SELECT u, u FROM (SELECT DISTINCT u FROM bi) nodes
          | UNION
          | SELECT r.u, b.v FROM reach r JOIN bi b ON r.v = b.u)
          |SELECT u AS id, min(v) AS component FROM reach GROUP BY u""".stripMargin),
    "q159_containment_pairs" -> WinnowOps.containmentPairsOracleSql(
      "documents", "doc_id",
      "CASE WHEN doc_id % 211 = 0 THEN " +
        "'the quarterly compliance digest reproduces member submissions verbatim in the appendix section for archival reference purposes'" +
        " WHEN doc_id % 223 = 0 THEN " +
        "'the quarterly compliance digest reproduces member submissions verbatim in the appendix section for archival reference purposes '" +
        " || text ELSE text END"),
    "q155_winnow_spans" -> WinnowOps.dupPairSpansOracleSql("documents", "doc_id",
      "CASE WHEN doc_id % 29 = 0 THEN text || " +
        "' Subscribe to our newsletter for weekly updates and exclusive offers today.'" +
        " ELSE text END"),
    "q156_verified_pairs" -> WinnowOps.verifiedPairsOracleSql("documents",
      "doc_id", "text", minJaccard = 0.3),
    "q140_source_leakage" ->
      """WITH c AS (SELECT source,
        | md5(CASE WHEN doc_id % 41 = 0
        |  THEN 'the shared boilerplate body of a page that repeats across the crawl'
        |  ELSE text END) AS fp
        | FROM documents)
        |SELECT a.source AS source_a, b.source AS source_b,
        | count(DISTINCT a.fp) AS n_shared_texts,
        | CAST(count(*) AS BIGINT) AS n_doc_pairs
        |FROM c a JOIN c b ON a.fp = b.fp AND a.source < b.source
        |GROUP BY 1, 2""".stripMargin,
    "q118_invisible_scrub" ->
      """WITH c AS (SELECT doc_id,
        | CASE WHEN doc_id % 5 = 0 THEN replace(text, 'e', 'e' || chr(8203))
        |      WHEN doc_id % 7 = 0 THEN chr(65279) || text
        |      WHEN doc_id % 11 = 0 THEN replace(text, ' ', chr(160))
        |      WHEN doc_id % 13 = 0 THEN replace(text, 'a', 'a' || chr(173))
        |      ELSE text END AS t FROM documents),
        |s AS (SELECT doc_id, t,
        |  replace(regexp_replace(t,
        |    '[\x{200B}\x{200C}\x{200D}\x{FEFF}\x{00AD}\x{200E}\x{200F}\x{202A}-\x{202E}\x{2060}]',
        |    '', 'g'), chr(160), ' ') AS clean
        | FROM c)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(t,
        |   '[\x{200B}\x{200C}\x{200D}\x{FEFF}\x{00AD}\x{200E}\x{200F}\x{202A}-\x{202E}\x{2060}]'))
        |  + len(regexp_extract_all(t, chr(160))) AS BIGINT) AS n_invisible,
        | CAST(clean <> t AS INT) AS changed,
        | md5(clean) AS cleaned_md5
        |FROM s""".stripMargin,
    "q66_dup_components" ->
      (componentsCte + "SELECT id, component FROM comps"),
    "q67_dedup_survivors" ->
      (componentsCte +
        """,keep AS (SELECT id FROM (
          | SELECT c.id, row_number() OVER (PARTITION BY c.component
          |   ORDER BY d.n_chars DESC, c.id) AS rn
          | FROM comps c JOIN documents d ON d.doc_id = c.id) t WHERE rn = 1),
          |losers AS (SELECT id FROM comps WHERE id NOT IN (SELECT id FROM keep))
          |SELECT doc_id, n_chars FROM documents
          |WHERE doc_id NOT IN (SELECT id FROM losers)""".stripMargin),
    "q71_line_dedup" ->
      """WITH t AS (SELECT doc_id,
        |  replace(text, ' table', chr(10) || 'table') AS tx FROM documents),
        |la AS (SELECT doc_id, string_split(tx, chr(10)) AS arr FROM t),
        |l AS (SELECT doc_id, unnest(generate_series(1, len(arr))) AS pos, arr
        |      FROM la),
        |l2 AS (SELECT doc_id, pos, arr[pos] AS line FROM l),
        |c AS (SELECT line, count(*) AS n FROM l2 GROUP BY line),
        |kept AS (SELECT doc_id, pos, line FROM l2 JOIN c USING (line)
        |         WHERE n < 2),
        |reb AS (SELECT doc_id, count(*) AS n_kept,
        |        string_agg(line, chr(10) ORDER BY pos) AS cleaned
        |        FROM kept GROUP BY doc_id)
        |SELECT la.doc_id, CAST(len(la.arr) AS INTEGER) AS n_lines,
        | coalesce(reb.n_kept, 0) AS n_kept,
        | md5(coalesce(reb.cleaned, '')) AS cleaned_md5
        |FROM la LEFT JOIN reb ON la.doc_id = reb.doc_id""".stripMargin,
    "q84_paragraph_dedup" ->
      """WITH t AS (SELECT doc_id,
        |  replace(text, ' value', chr(10) || chr(10) || 'value') AS tx
        | FROM documents),
        |la AS (SELECT doc_id, string_split(tx, chr(10) || chr(10)) AS arr FROM t),
        |l AS (SELECT doc_id, unnest(generate_series(1, len(arr))) AS pos, arr
        |      FROM la),
        |l2 AS (SELECT doc_id, pos, arr[pos] AS para FROM l),
        |c AS (SELECT para, count(*) AS n FROM l2 GROUP BY para),
        |kept AS (SELECT doc_id, pos, para FROM l2 JOIN c USING (para)
        |         WHERE n < 2),
        |reb AS (SELECT doc_id, count(*) AS n_kept,
        |        string_agg(para, chr(10) || chr(10) ORDER BY pos) AS cleaned
        |        FROM kept GROUP BY doc_id)
        |SELECT la.doc_id, CAST(len(la.arr) AS INTEGER) AS n_paras,
        | coalesce(reb.n_kept, 0) AS n_kept,
        | md5(coalesce(reb.cleaned, '')) AS cleaned_md5
        |FROM la LEFT JOIN reb ON la.doc_id = reb.doc_id""".stripMargin,
    "q30_exact_dedup" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
        | count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "q377_bloom_dedup" ->
      """SELECT c.doc_id, c.source FROM documents c
        |WHERE c.doc_id % 10 <> 0 AND NOT EXISTS (
        |  SELECT 1 FROM documents r WHERE r.doc_id % 10 = 0
        |    AND md5(substr(r.text, 1, 80)) = md5(substr(c.text, 1, 80)))""".stripMargin,
    "q94_substr_spans" -> substrSpansOracleSql,
    "q101_remove_spans" -> removeSpansOracleSql,
    "q110_decontaminate" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '[ \t\n\f\r]+'),
        |    x -> x <> '') AS ws
        | FROM documents WHERE doc_id % 97 <> 0),
        |tb AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '[ \t\n\f\r]+'),
        |    x -> x <> '') AS ws
        | FROM documents WHERE doc_id % 97 = 0),
        |o AS (SELECT doc_id,
        |  list_filter(string_split_regex(text, '[ \t\n\f\r]+'),
        |    x -> x <> '') AS ws
        | FROM documents WHERE doc_id % 97 <> 0),
        |g AS (SELECT doc_id, CAST(i AS INTEGER) - 1 AS pos,
        |    md5(array_to_string(ws[i:i+2], ' ')) AS gd
        |  FROM t, unnest(generate_series(1, len(ws) - 2)) AS u(i)
        |  WHERE len(ws) >= 3),
        |bg AS (SELECT DISTINCT md5(array_to_string(ws[i:i+2], ' ')) AS gd
        |  FROM tb, unnest(generate_series(1, len(ws) - 2)) AS u(i)
        |  WHERE len(ws) >= 3),
        |f AS (SELECT g.doc_id, g.pos FROM g JOIN bg USING (gd)),
        |i AS (SELECT doc_id, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
        |  FROM f),
        |s AS (SELECT doc_id, min(pos) AS span_start,
        |    max(pos) - min(pos) + 3 AS span_tokens
        |  FROM i GROUP BY doc_id, isl),
        |cov AS (SELECT DISTINCT s.doc_id,
        |    s.span_start + CAST(u.i AS BIGINT) AS p
        |  FROM s, unnest(generate_series(0, span_tokens - 1)) AS u(i)),
        |tok AS (SELECT doc_id, CAST(u.j AS BIGINT) - 1 AS p,
        |    ws[CAST(u.j AS INTEGER)] AS tok
        |  FROM o, unnest(generate_series(1, len(ws))) AS u(j)),
        |kept AS (SELECT tok.doc_id, tok.p, tok.tok FROM tok
        |  LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.p = cov.p
        |  WHERE cov.p IS NULL),
        |agg AS (SELECT doc_id, count(*) AS n_kept,
        |    string_agg(tok, ' ' ORDER BY p) AS text_clean
        |  FROM kept GROUP BY doc_id),
        |nt AS (SELECT doc_id, len(ws) AS n_toks FROM o)
        |SELECT d.doc_id,
        |  CAST(nt.n_toks - coalesce(agg.n_kept, 0) AS BIGINT)
        |    AS n_tokens_removed,
        |  coalesce(agg.text_clean, '') AS text_clean
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
        |JOIN nt USING (doc_id)
        |LEFT JOIN agg USING (doc_id)""".stripMargin,
    "q100_curation_v2" ->
      s"""WITH lang AS (SELECT doc_id, lang_pred FROM ($langNgramOracleSql) lt),
         |qual AS (SELECT doc_id, quality FROM
         |  (${qualityOracleSql(TextOps.TrainedQualityWeights)}) qt),
         |sub AS (SELECT doc_id, sum_span_tokens FROM ($substrSpansOracleSql) st),
         |fps AS (SELECT doc_id,
         |  md5(regexp_replace(lower(text), '[ \\t\\n\\f\\r]+', '', 'g')) AS fp
         | FROM documents),
         |sig AS (SELECT d.doc_id,
         |  (lang.lang_pred = 'en') AS p_lang,
         |  (lang.lang_pred = 'en' AND qual.quality >= 0.44::DOUBLE) AS p_quality,
         |  (lang.lang_pred = 'en' AND qual.quality >= 0.44::DOUBLE
         |    AND sub.sum_span_tokens <= 24) AS p_substr,
         |  fps.fp
         | FROM documents d
         | JOIN lang ON d.doc_id = lang.doc_id
         | JOIN qual ON d.doc_id = qual.doc_id
         | JOIN sub ON d.doc_id = sub.doc_id
         | JOIN fps ON d.doc_id = fps.doc_id)
         |SELECT CAST(count(*) AS BIGINT) AS n_total,
         |  CAST(sum(CASE WHEN p_lang THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
         |  CAST(sum(CASE WHEN p_quality THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
         |  CAST(sum(CASE WHEN p_substr THEN 1 ELSE 0 END) AS BIGINT) AS n_substr,
         |  CAST(count(DISTINCT CASE WHEN p_substr THEN fp END) AS BIGINT) AS n_dedup
         |FROM sig""".stripMargin,
    "q106_cdc_chunks" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |p AS (SELECT doc_id, text, n, unnest(range(1, n - 6)) AS i FROM d),
        |hv AS (SELECT doc_id, i + 8 AS b,
        |  CAST(unicode(substr(text, i + 0, 1)) % 128 AS BIGINT) * 562949953421312
        |  + CAST(unicode(substr(text, i + 1, 1)) % 128 AS BIGINT) * 4398046511104
        |  + CAST(unicode(substr(text, i + 2, 1)) % 128 AS BIGINT) * 34359738368
        |  + CAST(unicode(substr(text, i + 3, 1)) % 128 AS BIGINT) * 268435456
        |  + CAST(unicode(substr(text, i + 4, 1)) % 128 AS BIGINT) * 2097152
        |  + CAST(unicode(substr(text, i + 5, 1)) % 128 AS BIGINT) * 16384
        |  + CAST(unicode(substr(text, i + 6, 1)) % 128 AS BIGINT) * 128
        |  + CAST(unicode(substr(text, i + 7, 1)) % 128 AS BIGINT) AS h
        | FROM p),
        |bounds AS (SELECT doc_id, b FROM hv WHERE h % 61 = 0
        |  UNION SELECT doc_id, 1 FROM d
        |  UNION SELECT doc_id, n + 1 FROM d),
        |spans AS (SELECT doc_id, b AS st,
        |    lead(b) OVER (PARTITION BY doc_id ORDER BY b) AS nxt
        |  FROM bounds),
        |fps AS (SELECT s.doc_id, md5(substr(d.text, s.st, s.nxt - s.st)) AS fp
        |  FROM spans s JOIN d USING (doc_id) WHERE s.nxt IS NOT NULL),
        |shared AS (SELECT fp FROM fps GROUP BY fp
        |  HAVING count(DISTINCT doc_id) > 1)
        |SELECT doc_id,
        |  count(*) AS n_chunks,
        |  count(DISTINCT fp) AS n_distinct,
        |  CAST(sum(CASE WHEN fp IN (SELECT fp FROM shared) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_shared,
        |  round(CAST(sum(CASE WHEN fp IN (SELECT fp FROM shared) THEN 1 ELSE 0
        |    END) AS DOUBLE) / count(*), 5) AS shared_ratio
        |FROM fps GROUP BY doc_id""".stripMargin,
    "q39_ngram_jaccard" ->
      """WITH sh AS (
        | SELECT DISTINCT doc_id AS id, shingle FROM (
        |  SELECT doc_id,
        |   unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
        |     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
        |  FROM (SELECT doc_id, string_split_regex(lower(text), '[ \t\n\f\r]+') AS w
        |        FROM documents) t0) t1),
        |sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
        |inter AS (
        | SELECT a.id AS a_id, b.id AS b_id, count(*) AS n_common
        | FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
        | GROUP BY 1, 2)
        |SELECT a_id, b_id, n_common, sa.n_sh AS n_a, sb.n_sh AS n_b,
        | round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 5) AS jaccard
        |FROM inter
        |JOIN sizes sa ON inter.a_id = sa.id
        |JOIN sizes sb ON inter.b_id = sb.id
        |WHERE round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 5) >= 0.2""".stripMargin,
    "q60_contamination" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(text), '[ \t\n\f\r]+') AS w
        | FROM documents),
        |g AS (SELECT doc_id,
        | CASE WHEN len(w) >= 3
        |   THEN list_distinct(list_transform(generate_series(1, len(w) - 2),
        |     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
        |   ELSE [] END AS gl
        | FROM w),
        |cg AS (SELECT doc_id AS id, len(gl) AS n_grams, unnest(gl) AS shingle
        |       FROM g WHERE doc_id % 97 <> 0),
        |bg AS (SELECT DISTINCT unnest(gl) AS shingle FROM g WHERE doc_id % 97 = 0)
        |SELECT id, CAST(n_grams AS BIGINT) AS n_grams, count(*) AS n_contaminated,
        | round(count(*) * 1.0 / n_grams, 5) AS contamination
        |FROM cg WHERE shingle IN (SELECT shingle FROM bg)
        |GROUP BY id, n_grams""".stripMargin,
    "q61_keep_best" ->
      """SELECT dedup_key, keep_id, keep_score, n_candidates FROM (
        | SELECT md5(regexp_replace(lower(text), '[ \t\n\f\r]+', '', 'g'))
        |    AS dedup_key,
        |  doc_id AS keep_id, n_chars AS keep_score,
        |  count(*) OVER (PARTITION BY
        |    md5(regexp_replace(lower(text), '[ \t\n\f\r]+', '', 'g')))
        |    AS n_candidates,
        |  row_number() OVER (PARTITION BY
        |    md5(regexp_replace(lower(text), '[ \t\n\f\r]+', '', 'g'))
        |    ORDER BY n_chars DESC, doc_id) AS rn
        | FROM documents) t
        |WHERE rn = 1""".stripMargin,
    "q63_curation_funnel" ->
      """WITH w0 AS (SELECT doc_id, text, string_split_regex(lower(text), '[ \t\n\f\r]+') AS w
        | FROM documents),
        |g AS (SELECT doc_id, text,
        | CASE WHEN len(w) >= 2 THEN list_transform(generate_series(1, len(w) - 1),
        |   i -> w[i] || ' ' || w[i+1]) ELSE [] END AS g2,
        | CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(generate_series(1, len(w) - 2),
        |   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) ELSE [] END AS g3
        | FROM w0),
        |bg AS (SELECT DISTINCT unnest(g3) AS sh FROM g WHERE doc_id % 97 = 0),
        |cont AS (SELECT doc_id, round(count(*) * 1.0 / len3, 5) AS frac
        | FROM (SELECT doc_id, len(g3) AS len3, unnest(g3) AS sh FROM g
        |        WHERE doc_id % 97 <> 0) cg
        | WHERE sh IN (SELECT sh FROM bg) GROUP BY doc_id, len3),
        |sig AS (SELECT g.doc_id,
        | len(regexp_extract_all(text, '\S+')) AS n_tokens,
        | len(regexp_extract_all(lower(text), '\b(the|and|of)\b')) AS s_en,
        | CASE WHEN len(g2) > 0
        |   THEN 1.0 - len(list_distinct(g2)) * 1.0 / len(g2) ELSE 0.0 END AS dup2,
        | md5(regexp_replace(lower(text), '[ \t\n\f\r]+', '', 'g')) AS fp,
        | coalesce(cont.frac, 0.0) AS frac
        | FROM g LEFT JOIN cont ON g.doc_id = cont.doc_id
        | WHERE g.doc_id % 97 <> 0),
        |f AS (SELECT fp,
        | (n_tokens BETWEEN 25 AND 95) AS p1,
        | (n_tokens BETWEEN 25 AND 95) AND s_en > 0 AS p2,
        | (n_tokens BETWEEN 25 AND 95) AND s_en > 0 AND dup2 <= 0.1 AS p3,
        | (n_tokens BETWEEN 25 AND 95) AND s_en > 0 AND dup2 <= 0.1
        |   AND frac < 0.05 AS p4
        | FROM sig)
        |SELECT count(*) AS n_total,
        | CAST(sum(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT) AS n_len,
        | CAST(sum(CASE WHEN p2 THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
        | CAST(sum(CASE WHEN p3 THEN 1 ELSE 0 END) AS BIGINT) AS n_rep,
        | CAST(sum(CASE WHEN p4 THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
        | count(DISTINCT CASE WHEN p4 THEN fp END) AS n_dedup
        |FROM f""".stripMargin,
  )
}
