package graft.queries

import graft.Tables
import graft.ops.{BlocklistOps, DedupOps, DsirOps, GraphOps, LmOps, MultimodalOps, PcaOps, PreferenceOps, ProfileOps, RetrievalOps, SampleOps, SelectionOps, SimilarityOps, TextOps, WinnowOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import PipelineShared._

/** tokenizer, language-model and text-quality queries — split from PipelineQueries (entries verbatim; the
  * aggregate map in PipelineQueries is unchanged).
  */
private[graft] object PipelineTextQueries {
  val queries: Map[String, Q] = Map(

    // t-closeness over (source, lang) QI groups with n_chars//64
    // (capped at 9) as the ordered sensitive bucket — EMD as exact
    // integer cumulative sums; completes k-anon (q172) + l-div
    // (q176).
    "q294_t_closeness" -> ((s, d) =>
      ProfileOps.tCloseness(Tables(s, d, "documents"), Seq(
        "source" -> col("source"), "lang" -> col("lang")),
        expr("least(n_chars div 64, 9)").cast("long"),
        nBuckets = 10)),

    // Deterministic systematic PPS sample (k=20 per source) by token
    // weight — Madow sampling with midpoint start; exact integer
    // grid arithmetic, bit-stable across engines and partitionings.
    "q298_systematic_pps" -> ((s, d) =>
      graft.ops.SampleOps.systematicPps(
        Tables(s, d, "documents").select(col("source"), col("doc_id"),
          TextOps.tokenCount(col("text")).cast("long").as("tk")),
        "source", "doc_id", "tk", k = 20)),

    // Exact Gini concentration of document length per source — the
    // inequality profile beside the Pareto point (q284).
    "q315_gini" -> ((s, d) =>
      ProfileOps.giniIndex(Tables(s, d, "documents"), "source",
        "n_chars")),

    // MCC + macro-F1 of the trained scorer against the rule labels —
    // the skew-robust confusion readout beside kappa (q157) and
    // best-F1 (q273).
    "q318_mcc" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val qual = TextOps.qualityScore(docs, "doc_id", "text",
          TextOps.TrainedQualityWeights)
        .select(col("id"), (col("quality") > 0.5).as("flag"))
      val rules = TextOps.qualityRules(docs, "doc_id", "text")
        .select(col("doc_id").as("id"), col("passes").as("flag"))
      ProfileOps.mccReport(qual, rules)
    }),

    // Mutual information between source and the rule-pass flag —
    // feature relevance in nats, 1e-12-grid exact term sums.
    "q321_mutual_info" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val rules = TextOps.qualityRules(docs, "doc_id", "text")
        .select(col("doc_id"), col("passes"))
      ProfileOps.normalizedMutualInfo(
        docs.select(col("doc_id"), col("source")).join(rules, "doc_id"),
        "source", "passes")
    }),

    // Chao1 unseen-vocabulary estimate from singleton/doubleton
    // term counts — the tokenizer-freeze completeness check.
    "q329_chao1_vocab" -> ((s, d) =>
      TextOps.chao1Vocab(Tables(s, d, "documents"), "text")),

    // Spiegelhalter's calibration Z of the trained scorer against
    // rule labels — the binning-free significance companion of
    // the reliability/ECE readouts.
    "q330_spiegelhalter" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val sc = TextOps.qualityScore(docs, "doc_id", "text",
        TextOps.TrainedQualityWeights)
      val lab = TextOps.qualityRules(docs, "doc_id", "text")
        .select(col("doc_id").as("id"), col("passes").cast("int").as("pos"))
      ProfileOps.spiegelhalterZ(sc.join(lab, "id"), "quality", "pos")
    }),

    // word2vec negative-sampling table: unigram^0.75 weights
    // apportioned over a 1M-slot table by exact largest-remainder —
    // slots sum to the budget on every engine.
    "q336_negative_sampling" -> ((s, d) => {
      val tf = Tables(s, d, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("c"))
      SelectionOps.largestRemainderAlloc(
        tf.select(col("term").as("grp"),
          round(pow(col("c"), 0.75) * 1000, 0).cast("long").as("w")),
        "grp", "w", budget = 1000000L)
    }),

    // Cumulative gains / lift by score decile of the trained scorer
    // vs rule labels — the triage readout beside best-F1 and ECE.
    "q345_decile_gains" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val sc = TextOps.qualityScore(docs, "doc_id", "text",
        TextOps.TrainedQualityWeights)
      val lab = TextOps.qualityRules(docs, "doc_id", "text")
        .select(col("doc_id").as("id"), col("passes").cast("int").as("pos"))
      ProfileOps.decileGains(sc.join(lab, "id"), "id", "quality", "pos")
    }),

    // Murphy decomposition of the Brier score (reliability −
    // resolution + uncertainty) on the exact score grid — splits the
    // probability error into the fixable and the earned part.
    "q346_brier_decomp" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val sc = TextOps.qualityScore(docs, "doc_id", "text",
        TextOps.TrainedQualityWeights)
      val lab = TextOps.qualityRules(docs, "doc_id", "text")
        .select(col("doc_id").as("id"), col("passes").cast("int").as("pos"))
      ProfileOps.brierDecomposition(sc.join(lab, "id"), "quality", "pos")
    }),

    // RAG chunking manifest: fixed 32-token windows with 8-token
    // overlap (stride 24) — per chunk the exact token span and a
    // content fingerprint; one narrow scan, chunk count derived
    // arithmetically (never a per-token explode).
    "q358_rag_chunks" -> ((s, d) => {
      val ts = TextOps.tokens(col("text"))
      val base = Tables(s, d, "documents")
        .select(col("doc_id"), ts.as("ts"), size(ts).as("nt"))
        .where(col("nt") >= 1)
      val nChunks = lit(1) +
        expr("(greatest(nt - 32, 0) + 23) div 24").cast("int")
      base.select(col("doc_id"), col("ts"), col("nt"),
          explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
        .select(col("doc_id"), col("chunk_idx"),
          (col("chunk_idx") * 24 + 1).as("start_tok"),
          least(col("chunk_idx") * 24 + 32, col("nt")).as("end_tok"),
          md5(concat_ws(" ", slice(col("ts"),
            col("chunk_idx") * 24 + 1,
            least(col("chunk_idx") * 24 + 32, col("nt")) -
              col("chunk_idx") * 24))).as("chunk_fp"))
        .withColumn("n_tokens", col("end_tok") - col("start_tok") + 1)
    }),

    // Per-source dataset-card manifest: docs, tokens, chars, language
    // spread, and the exact-dup rate in ppm — the one-row-per-source
    // audit a mixture owner reads before weighting.
    "q359_source_manifest" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val fp = md5(regexp_replace(lower(col("text")),
        "[ \\t\\n\\f\\r]+", ""))
      val base = docs.select(col("source"), col("lang"),
        col("n_chars"), TextOps.tokenCount(col("text")).as("tk"),
        fp.as("fp"))
      val dup = base.groupBy("source", "fp")
        .agg(count(lit(1)).as("cf"))
        .groupBy("source")
        .agg(sum(when(col("cf") >= 2, col("cf")).otherwise(0L))
          .as("dup_docs"))
      base.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("tk").as("n_tokens"),
          sum("n_chars").as("n_chars"),
          countDistinct("lang").as("n_langs"))
        .join(dup, "source")
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("n_chars"), col("n_langs"), col("dup_docs"),
          expr("(2000000 * dup_docs + n_docs) div (2 * n_docs)")
            .as("dup_ppm"))
    }),

    // Split-conformal 90% interval for quality ~ length with its
    // held-out coverage audit — distribution-free uncertainty.
    "q331_conformal" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val sc = TextOps.qualityScore(docs, "doc_id", "text",
          TextOps.TrainedQualityWeights)
        .select(col("id").as("doc_id"),
          round(col("quality") * 1e6, 0).cast("long").as("ymicro"))
      ProfileOps.splitConformal(
        docs.select(col("doc_id"), col("n_chars")).join(sc, "doc_id"),
        "n_chars", "ymicro", pmod(col("doc_id"), lit(2L)) === 0)
    }),

    // Per-source OLS of trained quality (5dp micro grid) on document
    // length — the grouped-regression signal audit; decimal-exact
    // moments, closed-form slope/intercept/r².
    "q285_grouped_ols" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val sc = TextOps.qualityScore(docs, "doc_id", "text",
          TextOps.TrainedQualityWeights)
        .select(col("id").as("doc_id"),
          round(col("quality") * 1e5, 0).cast("long").as("ymicro"))
      ProfileOps.groupedOls(
        docs.select(col("doc_id"), col("source"), col("n_chars"))
          .join(sc, "doc_id"),
        "source", "n_chars", "ymicro")
    }),

    // Skip-gram (center, context) pair counts within a ±2 token
    // window — the word2vec/GloVe training-pair extraction; doc-keyed
    // equi-join with linear fan-out, never quadratic.
    "q280_skipgram" -> ((s, d) =>
      graft.ops.CooccurOps.skipgramCounts(
        Tables(s, d, "documents"), "doc_id", "text",
        window = 2, minCount = 30L)),

    // Exact stratified split allocation: Hamilton largest-remainder
    // 800/100/100 within every (source, lang) stratum — sums to n
    // exactly, unlike hash assignment's in-expectation proportions.
    "q279_stratified_split" -> ((s, d) =>
      graft.ops.SelectionOps.stratifiedSplitCounts(
        Tables(s, d, "documents"), Seq("source", "lang"),
        Seq("train" -> 800, "val" -> 100, "test" -> 100))),

    // Best-F1 operating point of the trained quality scorer against
    // the rule labels — the deployment threshold, argmax on the exact
    // micro F1 grid.
    "q273_best_f1" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val sc = TextOps.qualityScore(docs, "doc_id", "text",
        TextOps.TrainedQualityWeights)
      val lab = TextOps.qualityRules(docs, "doc_id", "text")
        .select(col("doc_id").as("id"), col("passes").cast("int").as("pos"))
      ProfileOps.bestF1Threshold(sc.join(lab, "id"), "quality", "pos")
    }),

    // Simple Good–Turing (Gale–Sampson): neighbor-gap Z_r + log-log
    // OLS smoothing of count-of-counts — the unseen-mass estimator
    // beside the KN family.
    "q269_good_turing" -> ((s, d) =>
      graft.ops.LmOps.simpleGoodTuring(Tables(s, d, "documents"), "text")),

    // Isotonic (PAV) repair of the q181 calibration curve via the
    // minimax closed form — the monotone score→rate map a threshold
    // picker actually consumes.
    "q259_isotonic" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val sc = TextOps.qualityScore(docs, "doc_id", "text",
        TextOps.TrainedQualityWeights)
      val lab = TextOps.qualityRules(docs, "doc_id", "text")
        .select(col("doc_id").as("id"), col("passes").cast("int").as("pos"))
      ProfileOps.isotonicCalibration(
        sc.join(lab, "id").select(
          least(floor(col("quality") * 10).cast("int"), lit(9))
            .as("bucket"), col("pos")),
        "bucket", "pos")
    }),

    // Theil's U (uncertainty coefficient) source↔lang, both
    // directions — the normalized, asymmetric companion of mutual
    // information (q228).
    "q263_theils_u" -> ((s, d) =>
      ProfileOps.theilsU(Tables(s, d, "documents"), "source", "lang")),

    // Chi-squared categorical drift per source vs rest: does any
    // source's language mix differ from the corpus — the categorical
    // completion of the drift family (PSI q153 / KS q250 / MW q252
    // cover numeric signals). Cramér's V normalizes across sources.
    "q256_chi2_drift" -> ((s, d) =>
      ProfileOps.chiSquaredAgainstRest(
        Tables(s, d, "documents"), "source", "lang")),

    // Exact Spearman rank correlation between two quality signals
    // (length vs trained quality): the monotone-association check a
    // linear Pearson (q120) under-reads on saturating relations.
    "q255_spearman" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val q = TextOps.qualityScore(docs, "doc_id", "text",
          TextOps.TrainedQualityWeights)
        .select(col("id").as("doc_id"), col("quality"))
      ProfileOps.spearman(
        docs.select(col("doc_id"), col("n_chars")).join(q, Seq("doc_id")),
        "n_chars", "quality")
    }),

    // Exact Mann-Whitney U / AUC per source vs rest: the rank-sum
    // location test beside q250's KS shape test — "is this source's
    // quality systematically shifted", with the probability-of-
    // superiority effect size, all in exact integer rank arithmetic.
    "q252_mannwhitney_drift" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val q = TextOps.qualityScore(docs, "doc_id", "text",
          TextOps.TrainedQualityWeights)
        .select(col("id").as("doc_id"), col("quality"))
      ProfileOps.mannWhitneyAgainstRest(
        q.join(docs.select(col("doc_id"), col("source")), Seq("doc_id")),
        "source", "quality")
    }),

    // Exact two-sample KS drift per source vs the rest of the corpus
    // (no binning, integer-exact ECDF comparison) — the classical
    // complement to the binned PSI/JSD drift ops.
    "q250_ks_drift" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val q = TextOps.qualityScore(docs, "doc_id", "text",
          TextOps.TrainedQualityWeights)
        .select(col("id").as("doc_id"), col("quality"))
      ProfileOps.ksAgainstRest(
        q.join(docs.select(col("doc_id"), col("source")), Seq("doc_id")),
        "source", "quality")
    }),

    // Leave-one-source-out data valuation: corpus mean quality with
    // vs without each source — the "which feed drags the mixture
    // down" curation analytic. Exact decimal(18,5) sums (quality is
    // a 5dp grid) so group/total statistics are order-free.
    "q248_loo_source_impact" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val q = TextOps.qualityScore(docs, "doc_id", "text",
          TextOps.TrainedQualityWeights)
        .select(col("id").as("doc_id"), col("quality"))
      val per = q.join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("quality").cast("decimal(18,5)")).as("_s"))
      val tot = per.agg(sum("n_docs").as("_nn"), sum("_s").as("_ss"))
      // 6dp means via exact half-up INTEGER division over micro-units
      // (quality is a 5dp grid, so rounded double division hits
      // structured half-way points — the q245 lesson); delta is a
      // difference of exact integers, never of rounded doubles
      val meanSrc = "(20 * CAST(_s * 100000 AS BIGINT) + n_docs)" +
        " div (2 * n_docs)"
      val meanAll = "(20 * CAST(_ss * 100000 AS BIGINT) + _nn) div (2 * _nn)"
      val meanWo = "(20 * CAST((_ss - _s) * 100000 AS BIGINT)" +
        " + (_nn - n_docs)) div (2 * (_nn - n_docs))"
      per.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"),
          (expr(meanSrc).cast("double") / 1e6).as("mean_source"),
          (expr(meanAll).cast("double") / 1e6).as("mean_all"),
          (expr(meanWo).cast("double") / 1e6).as("mean_without"),
          ((expr(meanWo) - expr(meanAll)).cast("double") / 1e6).as("delta"))
    }),

    // Luhn-validated card-number PII: 13-16 digit runs checked by
    // the payment-card checksum — the precision upgrade over bare
    // digit regexes. Fixture: %17 docs carry a VALID test card
    // number, %19 docs an invalid one digit off; the checksum must
    // separate them.
    "q246_luhn_pii" -> ((s, d) => {
      val t = when(col("doc_id") % 17 === 0,
          concat(col("text"), lit(" card 4539148803436467 ok")))
        .when(col("doc_id") % 19 === 0,
          concat(col("text"), lit(" num 4539148803436468 bad")))
        .otherwise(col("text"))
      Tables(s, d, "documents").select(col("doc_id"),
        size(TextOps.cardCandidates(t)).as("n_card_cands"),
        TextOps.luhnValidCount(t).as("n_cards"),
        (TextOps.luhnValidCount(t) > 0).cast("int").as("has_card"))
    }),

    // Temperature-scaled source mixture (the multilingual-rebalance
    // standard: w_i ∝ n_i^(1/T), T<1 upsamples the tail) allocated to
    // an exact integer token budget by the Hamilton apportionment —
    // raw counts → exp(ln(n)/T) weights (spelled identically in the
    // oracle) → largestRemainderAlloc, so the final allocation sums
    // to the budget EXACTLY on every engine.
    "q244_temperature_mixture" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val toks = docs.groupBy("source")
        .agg(sum(TextOps.tokenCount(col("text")).cast("long")).as("n_tokens"))
      val w = toks.select(col("source"), col("n_tokens"),
        round(exp(log(col("n_tokens").cast("double")) / 0.7), 0)
          .cast("long").as("w"))
      val alloc = SelectionOps.largestRemainderAlloc(w, "source", "w",
          1000000L)
        .select(col("grp").as("source"), col("alloc"))
      w.join(alloc, Seq("source"))
        .select(col("source"), col("n_tokens"), col("w").as("weight"),
          col("alloc"),
          round(col("alloc").cast("double") / 1000000L, 6).as("alloc_frac"))
    }),

    // CCNet-style span-perplexity filter (Wenzek et al. 2020): score
    // each sentence span under the q126 KN bigram model (trained on
    // the 'en' slice), keep low-perplexity spans, report the per-doc
    // retention + kept-span quality. Doc-level perplexity keeps or
    // drops whole documents; the span filter salvages the clean
    // paragraphs of mixed-quality pages — the production crawl move.
    "q243_span_ppl_filter" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      // %13 docs get a gibberish tail sentence (all-unseen bigrams →
      // backoff-floor perplexity ≈ ln(B+V+1) ≫ thr): the span filter
      // must salvage the clean leading span and drop the junk one —
      // the CCNet scenario in miniature. The model trains on the
      // UNINJECTED 'en' slice.
      val junk = ". zxq vlorp qeth wubble snarv gribbet zund flep vorx."
      val injected = docs.withColumn("text",
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(junk)))
          .otherwise(col("text")))
      val spans = graft.ops.LangSpanOps.sentenceSpans(injected, "doc_id", "text")
        .select((col("doc_id") * 100000 + col("span_idx")).as("id"),
          col("span"))
      val scored = LmOps.score(spans,
        docs.where(col("lang") === "en")
          .select(col("doc_id").as("id"), col("text").as("span")),
        "id", "span")
      val thr = 6.0
      scored.select(expr("id div 100000").as("doc_id"),
          col("kn_logppl"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(col("kn_logppl").isNotNull.cast("long")).as("n_scored"),
          sum(when(col("kn_logppl") <= thr, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("kn_logppl") <= thr,
            col("kn_logppl").cast("decimal(18,5)"))).as("_s"))
        .select(col("doc_id"), col("n_spans"), col("n_scored"), col("n_kept"),
          // keep_frac: n/N at 6dp via exact half-up integer division
          // ((2e6·n + N) div 2N) — round(double) hits structured
          // half-way points (the q245 lesson) whenever N divides 1e6
          (expr("(2000000 * n_kept + n_spans) div (2 * n_spans)")
            .cast("double") / 1e6).as("keep_frac"),
          // mean over the 5dp grid: micro-unit sum s5·10, half-up /n —
          // integer `div`, never double `/` (idiv exactness caveat)
          when(col("n_kept") > 0,
            expr("(20 * CAST(_s * 100000 AS BIGINT) + n_kept)" +
              " div (2 * n_kept)").cast("double") / 1e6)
            .as("mean_ppl_kept"))
    }),

    // Span-level (code-switching) language-ID: q96's frozen trigram
    // profiles over sentence spans + per-doc mixture summary — the
    // crawl reality one doc-level label misses (LangSpanOps).
    "q240_span_lang" -> ((s, d) =>
      graft.ops.LangSpanOps.docMixture(Tables(s, d, "documents"),
        "doc_id", "text")),

    // Per-source z-standardization of the trained quality score
    // (batch-effect correction from exact integer-cents moments).
    "q231_score_standardize" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val sc = TextOps.qualityScore(docs, "doc_id", "text",
        TextOps.TrainedQualityWeights)
      val j = docs.select(col("doc_id").as("id"), col("source")).join(sc, "id")
      ProfileOps.zStandardize(j, "id", "source", "quality")
        .withColumnRenamed("grp", "source")
    }),

    // Expected calibration error — the one-number verdict on q181's
    // reliability diagram.
    "q232_calibration_ece" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val sc = TextOps.qualityScore(docs, "doc_id", "text",
        TextOps.TrainedQualityWeights)
      val lab = TextOps.qualityRules(docs, "doc_id", "text")
        .select(col("doc_id").as("id"), col("passes").cast("int").as("pos"))
      ProfileOps.calibrationEce(
        ProfileOps.calibrationBuckets(sc.join(lab, "id"), "quality", "pos"))
    }),

    // Per-document keyword extraction: top-3 tf-idf terms.
    "q233_keywords" -> ((s, d) =>
      TextOps.topKeywords(Tables(s, d, "documents"), "doc_id", "text")),

    // RAKE phrase keywords (q233's multi-word complement): stopword/
    // punctuation-delimited candidate phrases, degree/frequency word
    // scores on the half-up micro grid, exact integer phrase ranks.
    "q388_rake_keywords" -> ((s, d) =>
      TextOps.rakeKeywords(Tables(s, d, "documents"), "doc_id", "text")),

    // TextTiling topic segmentation: lexical-cohesion valleys as
    // chunk boundaries (the semantic upgrade over fixed windows for
    // RAG/packing) — integer bag moments, micro cosine via IEEE
    // sqrt, fixed-horizon peak depth.
    "q395_topic_segments" -> ((s, d) =>
      TextOps.topicSegments(Tables(s, d, "documents"), "doc_id", "text")),

    // Declared-language vs dominant-script mismatch audit.
    "q234_script_mismatch" -> ((s, d) =>
      TextOps.scriptMismatch(Tables(s, d, "documents"), "lang", "text",
        Map("en" -> "latin", "de" -> "latin", "fr" -> "latin",
          "es" -> "latin", "zh" -> "cjk"))),

    // Mutual information lang x source (nats) — categorical
    // dependency audit; ordered cell fold.
    "q228_mutual_info" -> ((s, d) =>
      ProfileOps.mutualInformation(Tables(s, d, "documents"),
        "lang", "source")),

    // Bigram next-token top-1 accuracy on the corpus itself.
    "q229_next_token_acc" -> ((s, d) =>
      TextOps.nextTokenAccuracy(Tables(s, d, "documents"), "text")),

    // Simpson effective-language diversity per source.
    "q230_simpson_diversity" -> ((s, d) =>
      ProfileOps.simpsonDiversity(Tables(s, d, "documents"),
        "source", "lang").withColumnRenamed("grp", "source")),

    // One-way ANOVA: does source explain the trained quality score?
    // (F statistic from exact integer-cents moments; quality 5dp
    // values scale exactly to cents at 2dp? no — scaled 100x of a
    // 5dp value rounds; both engines round identically from the
    // identical doubles.)
    "q224_anova_quality" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val sc = TextOps.qualityScore(docs, "doc_id", "text",
        TextOps.TrainedQualityWeights)
      val j = docs.select(col("doc_id").as("id"), col("source")).join(sc, "id")
      ProfileOps.anovaF(j, "source", "quality")
    }),

    // Token-frequency Gini coefficient (vocabulary inequality).
    "q225_token_gini" -> ((s, d) =>
      TextOps.tokenGini(Tables(s, d, "documents"), "text")),

    // Release-readiness MANIFEST (capstone): one row composing the
    // verified signal families — corpus size, token volume, language
    // spread, exact-dup mass, mean trained quality (exact decimal
    // sum), raw-PII surface, and the expectation-suite failure count.
    // Six bounded aggregates cross-joined (all 1-row broadcasts);
    // every input rides an already-oracle-verified kernel.
    "q220_release_manifest" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val base = docs.agg(count(lit(1)).as("n_docs"),
        sum(TextOps.tokenCount(col("text"))).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        sum(TextOps.emailCount(col("text"))).cast("long").as("n_raw_emails"))
      val dups = docs.select(TextOps.fingerprint(col("text")).as("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .agg(coalesce(sum(when(col("n") > 1, col("n"))), lit(0L))
          .as("n_exact_dup_docs"))
      val qual = TextOps.qualityScore(docs, "doc_id", "text",
          TextOps.TrainedQualityWeights)
        .agg(sum(col("quality").cast("decimal(18,5)")).as("_s"),
          count(lit(1)).as("_n"))
        // exact half-up 6dp mean over the 5dp grid (integer div — the
        // rounded-double spelling hits structured half-way points)
        .select((expr("(20 * CAST(_s * 100000 AS BIGINT) + _n)" +
          " div (2 * _n)").cast("double") / 1e6).as("mean_quality"))
      val checks = ProfileOps.expectationReport(docs,
        Seq(
          "doc_id_not_null" -> col("doc_id").isNull,
          "text_not_null" -> col("text").isNull,
          "n_chars_positive" -> (col("n_chars").isNull || col("n_chars") <= 0),
          "n_chars_le_400" -> (col("n_chars") > 400),
          "lang_known" -> !col("lang").isin("en", "de", "fr", "es", "zh"),
          "source_prefix" -> !col("source").startsWith("src")),
        uniqueKey = Some("doc_id"))
        .agg(count(when(col("passed") === 0, 1)).as("n_checks_failed"))
      base.crossJoin(broadcast(dups)).crossJoin(broadcast(qual))
        .crossJoin(broadcast(checks))
        .select(col("n_docs"), col("n_tokens"), col("n_langs"),
          col("n_exact_dup_docs"), col("mean_quality"),
          col("n_raw_emails"), col("n_checks_failed"),
          (col("n_checks_failed") === 0).cast("int").as("release_ready"))
    }),

    // Largest-remainder apportionment of a 1M-token budget across
    // sources proportional to observed token counts — exact integer,
    // allocations provably sum to the budget.
    "q217_budget_alloc" -> ((s, d) => {
      val w = Tables(s, d, "documents")
        .groupBy(col("source").as("grp"))
        .agg(sum(TextOps.tokenCount(col("text"))).as("w"))
      SelectionOps.largestRemainderAlloc(w, "grp", "w", budget = 1000000L)
        .withColumnRenamed("grp", "source")
    }),

    // Sentence-aware chunking (RAG assembly): 3-sentence windows,
    // 1-sentence overlap, boundary-respecting.
    "q211_sentence_chunks" -> ((s, d) =>
      TextOps.sentenceChunks(Tables(s, d, "documents"), "doc_id", "text")),

    // Corpus readability per language from exact integer totals.
    "q212_readability" -> ((s, d) =>
      TextOps.readabilityByGroup(Tables(s, d, "documents"), "text", "lang")
        .withColumnRenamed("grp", "lang")),

    // Data-contract expectation suite over documents: null/range/
    // domain checks + key uniqueness in ONE scan; n_chars<=400 is
    // deliberately violated so the report shows a failing row.
    "q210_expectations" -> ((s, d) =>
      ProfileOps.expectationReport(Tables(s, d, "documents"),
        Seq(
          "doc_id_not_null" -> col("doc_id").isNull,
          "text_not_null" -> col("text").isNull,
          "n_chars_positive" -> (col("n_chars").isNull || col("n_chars") <= 0),
          "n_chars_le_400" -> (col("n_chars") > 400),
          "lang_known" -> !col("lang").isin("en", "de", "fr", "es", "zh"),
          "source_prefix" -> !col("source").startsWith("src")),
        uniqueKey = Some("doc_id"))),

    // WOE / information value of the length-bucket feature against
    // the quality-rules label — the feature-screening report.
    "q202_woe_iv" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val lab = TextOps.qualityRules(docs, "doc_id", "text")
        .select(col("doc_id"), col("passes"))
      val j = docs.select(col("doc_id"),
          least(floor(col("n_chars") / 200.0).cast("int"), lit(9)).as("bin"))
        .join(lab, "doc_id")
      ProfileOps.woeIv(j, col("bin"), col("passes"))
    }),

    // DPO preference pairs: per prompt bucket (doc_id % 199) the
    // trained-quality best/worst responses with margin >= 0.05.
    "q197_dpo_pairs" -> ((s, d) =>
      PreferenceOps.dpoPairs(
        TextOps.qualityScore(Tables(s, d, "documents"), "doc_id", "text",
          TextOps.TrainedQualityWeights),
        "id", "quality", col("id") % 199, minMargin = 0.05)),

    // DSIR importance-resampling weights (Xie et al. 2023): hashed
    // unigram target-vs-raw log-likelihood ratio per doc; the
    // doc_id%7 residue stands in for the curated target domain.
    "q146_dsir_weights" -> ((s, d) =>
      DsirOps.importanceWeights(Tables(s, d, "documents"),
        "doc_id", "text", col("doc_id") % 7 === 0)
        .withColumnRenamed("id", "doc_id")),

    // Token-budget greedy selection per source: best docs first until
    // 5k tokens — the per-source mixture-shaping summary.
    "q149_token_budget" -> ((s, d) =>
      SelectionOps.tokenBudgetSelect(Tables(s, d, "documents"),
        "doc_id", "text", "source", budget = 5000L)),

    // Scorer calibration curve: trained quality score bucketed into
    // deciles vs the rule-filter label — the reliability diagram a
    // scorer owner reads before trusting thresholds.
    "q181_calibration" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val sc = TextOps.qualityScore(docs, "doc_id", "text",
        TextOps.TrainedQualityWeights)
      val lab = TextOps.qualityRules(docs, "doc_id", "text")
        .select(col("doc_id").as("id"), col("passes").cast("int").as("pos"))
      ProfileOps.calibrationBuckets(sc.join(lab, "id"), "quality", "pos")
    }),

    // Rank-sum (Mann–Whitney) AUC of the trained scorer against the
    // rule labels — exact, tie-aware (midranks), computed over the
    // BOUNDED distinct-score frame (<= 100001 5dp values at any
    // corpus size), so the global window is model-scale.
    "q182_scorer_auc" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val sc = TextOps.qualityScore(docs, "doc_id", "text",
        TextOps.TrainedQualityWeights)
      val lab = TextOps.qualityRules(docs, "doc_id", "text")
        .select(col("doc_id").as("id"), col("passes").cast("int").as("pos"))
      ProfileOps.rankAuc(sc.join(lab, "id"), "quality", "pos")
    }),

    // Language-ID confusion matrix: frozen-profile prediction (q96's
    // kernel) tabulated against the table's lang column.
    "q183_langid_confusion" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val langs = graft.ops.LangNgram.langs
      val docs = Tables(s, d, "documents")
      val scored = docs.select(col("doc_id"), col("lang").as("actual"),
        call_function("graft_lang_scores",
          coalesce(col("text"), lit(""))).as("_sc"))
        .select(col("doc_id") +: col("actual") +:
          langs.zipWithIndex.map { case (l, i) =>
            element_at(col("_sc"), i + 1).as(s"s_$l")
          }: _*)
      val pred = langs.zipWithIndex.foldRight(lit(langs.last)) {
        case ((l, i), rest) =>
          val laters = langs.drop(i + 1).map(o => col(s"s_$l") >= col(s"s_$o"))
          if (laters.isEmpty) rest
          else when(laters.reduce(_ && _), lit(l)).otherwise(rest)
      }
      scored.withColumn("predicted", pred)
        .groupBy("actual", "predicted")
        .agg(count(lit(1)).as("n"))
    }),

    // l-diversity audit: the k-anonymity companion — (source,
    // len-bucket) classes that are k-safe but share ONE language leak
    // it (homogeneity attack); lang plays the sensitive attribute.
    "q176_l_diversity" -> ((s, d) =>
      ProfileOps.lDiversity(Tables(s, d, "documents"), Seq(
        "source" -> col("source"),
        "len_bucket" -> (col("n_chars") / 500).cast("long")),
        col("lang"), l = 3)),

    // CATEGORICAL t-closeness: the unordered-attribute companion of
    // q294's ordered-bucket EMD gate (lang has no order, so the
    // paper's distance is total variation); TVD from exact integer
    // cross-multiplications, absent values in closed form.
    "q376_t_closeness" -> ((s, d) =>
      ProfileOps.tClosenessCategorical(Tables(s, d, "documents"), Seq(
        "source" -> col("source"),
        "len_bucket" -> (col("n_chars") / 500).cast("long")),
        col("lang"), t = 0.2)),

    // Unigram-LM tokenizer FIT (Kudo 2018 / SentencePiece family):
    // distributed EM over the word table, exact micro-unit count
    // aggregation — the trained-model twin of q80's frozen BPE.
    // Oracled DYNAMICALLY (r16): the full EM loop is not SQL-
    // expressible, but Verify freezes the model entering the final
    // E-step and DuckDB replays that step from the data — forward-
    // backward expected counts, micro-unit integers, exact
    // aggregation — gating the embedded final rows on the integers
    // matching (UnigramOps.fitOracleSql; kernel pinned by
    // UnigramSpec differentials, partition-invariant by construction).
    "q173_unigram_fit" -> ((s, d) =>
      graft.ops.UnigramOps.q173Fit(Tables(s, d, "documents"))),

    // Viterbi (max-likelihood) segmentation under the FROZEN unigram
    // model — zero-shuffle inference scan, LRU word cache. Rows-only
    // (runtime DP; expression differential in UnigramSpec).
    "q174_unigram_encode" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val pieces = graft.ops.UnigramOps.unigramEncode(col("text"),
        graft.ops.UnigramOps.DefaultUnigramEntries)
      Tables(s, d, "documents").select(col("doc_id"),
        coalesce(size(pieces), lit(0)).as("n_pieces"),
        md5(to_binary(coalesce(array_join(pieces, " "), lit("")), lit("utf-8")))
          .as("pieces_md5"))
    }),

    // Greedy longest-match (WordPiece inference) under the frozen
    // DefaultVocab — deterministic AND SQL-replayable: the oracle
    // recursive-CTE replays the exact candidate ladder.
    "q175_wordpiece_tokens" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val pieces = graft.ops.UnigramOps.greedyEncodeCol(col("text"),
        graft.ops.UnigramOps.DefaultVocab)
      Tables(s, d, "documents").select(col("doc_id").as("id"),
        coalesce(size(pieces), lit(0)).cast("long").as("n_pieces"),
        md5(to_binary(coalesce(array_join(pieces, " "), lit("")), lit("utf-8")))
          .as("pieces_md5"))
    }),

    // k-anonymity audit on (source, lang, length-bucket) quasi-
    // identifiers — the release-time privacy probe after the q64 PII
    // scrub.
    "q172_k_anonymity" -> ((s, d) =>
      ProfileOps.kAnonymity(Tables(s, d, "documents"), Seq(
        "source" -> col("source"),
        "lang" -> col("lang"),
        "len_bucket" -> (col("n_chars") / 500).cast("long")), k = 5)),

    // SFT example assembly with loss masks: prompt tokens mask 0,
    // completion mask 1, truncated — the instruction-tuning twin of
    // the pretraining pack (exploded layout for the oracle).
    "q162_sft_masks" -> ((s, d) =>
      graft.ops.PackOps.sftTokenRows(Tables(s, d, "documents"),
        "doc_id", "text").withColumnRenamed("id", "doc_id")),

    // Global token offsets (memmap index) via a two-level prefix sum:
    // per-source exclusive cumsum + broadcast source bases — no
    // global sort anywhere.
    "q163_token_offsets" -> ((s, d) =>
      graft.ops.PackOps.tokenOffsets(Tables(s, d, "documents"),
        "doc_id", "text", "source").withColumnRenamed("id", "doc_id")),

    // Distinct-1/distinct-2 diversity per source (mode-collapse /
    // synthetic-batch audit).
    "q161_distinct_n" -> ((s, d) =>
      TextOps.distinctN(Tables(s, d, "documents"), "source", "text")),

    // Cohen's kappa between the C4/Gopher rule filter and the
    // IRLS-trained quality scorer — the scorer-agreement audit.
    "q157_scorer_kappa" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val rules = TextOps.qualityRules(docs, "doc_id", "text")
        .select(col("doc_id").as("id"), col("passes").as("flag"))
      val qual = TextOps.qualityScore(docs, "doc_id", "text",
          TextOps.TrainedQualityWeights)
        .select(col("id"), (col("quality") > 0.5).as("flag"))
      ProfileOps.cohenKappa(rules, qual)
    }),

    // Vocabulary coverage curve: corpus fraction covered by the top-k
    // token types — tokenizer vocab sizing.
    "q154_vocab_coverage" -> ((s, d) =>
      TextOps.vocabCoverage(Tables(s, d, "documents"), "text")),

    // Per-document quality scoring — pure codegen projections, no shuffle.
    "q31_quality_metrics" -> ((s, d) =>
      TextOps.qualityMetrics(Tables(s, d, "documents"), "doc_id", "text")),

    // Heuristic language-ID: marker-regex counts + argmax.
    "q32_lang_predict" -> ((s, d) => {
      val t = col("text")
      Tables(s, d, "documents").select(
        col("doc_id"),
        TextOps.langScore(t, "en").as("s_en"),
        TextOps.langScore(t, "de").as("s_de"),
        TextOps.langScore(t, "fr").as("s_fr"),
        TextOps.langScore(t, "es").as("s_es"),
        TextOps.langPredict(t).as("lang_pred"))
    }),

    // Char-trigram profile language-ID (Cavnar–Trenkle/langid shape):
    // frozen seed-text profiles, integer log-prob weights, one native
    // scan projection — the real upgrade over q32's marker heuristic.
    "q96_lang_ngram" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val langs = graft.ops.LangNgram.langs
      val scored = Tables(s, d, "documents").select(col("doc_id"),
        call_function("graft_lang_scores",
          coalesce(col("text"), lit(""))).as("_sc"))
        .select(col("doc_id") +: langs.zipWithIndex.map { case (l, i) =>
          element_at(col("_sc"), i + 1).as(s"s_$l")
        }: _*)
      // argmax, earlier language wins ties (same fold as langPredict)
      val pred = langs.zipWithIndex.foldRight(lit(langs.last)) {
        case ((l, i), rest) =>
          val laters = langs.drop(i + 1).map(o => col(s"s_$l") >= col(s"s_$o"))
          if (laters.isEmpty) rest
          else when(laters.reduce(_ && _), lit(l)).otherwise(rest)
      }
      scored.withColumn("lang_pred", pred)
    }),

    // Profile-TABLE language-ID: the wide (10-language) model routed
    // through its DataFrame form (toTable -> fromTable -> score) — the
    // model-as-data twin of q96's compile-time profiles; same kernel,
    // same zero-shuffle scan, profiles swappable without a recompile.
    "q102_lang_profile_table" -> ((s, d) => {
      val P = graft.ops.LangProfiles
      val model = P.fromTable(P.toTable(s, P.wideModel))
      P.score(Tables(s, d, "documents"), "doc_id", "text", model)
        .withColumnRenamed("id", "doc_id")
    }),

    // Whitespace-insensitive fingerprint (near-dup key modulo formatting).
    "q33_fingerprint" -> ((s, d) =>
      Tables(s, d, "documents").select(
        col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))),

    // BPE-ish regex tokenizer count (letters run | digit | other symbol).
    "q34_bpe_tokens" -> ((s, d) =>
      Tables(s, d, "documents").select(
        col("doc_id"),
        // engine-neutral whitespace class (Java \s has \x0B, RE2 not)
        regexp_count(col("text"),
          lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\f\\r]")).as("n_bpe"))),

    // Compression-ratio quality signal — no oracle (zlib is JVM-side
    // only; rows-only check), ordering/determinism pinned in OpsSpec.
    "q109_compression_ratio" -> ((s, d) =>
      TextOps.compressionSignal(Tables(s, d, "documents"), "doc_id", "text")),

    // HTML boilerplate strip (crawl extract stage): deterministic
    // HTML manufactured around each document (messyUrl precedent),
    // script/style/comment blocks dropped, tags to spaces, minimal
    // entity set decoded — the oracle replays the same RE2-safe chain.
    "q107_html_extract" -> ((s, d) => {
      val html = concat(
        lit("<html><head><title>D"), col("doc_id").cast("string"),
        lit("</title><style>p {color: red;}</style>" +
          "<script>if (1<2) { go(); }</script></head><body><h1>Doc "),
        col("doc_id").cast("string"),
        lit("</h1><p>"), col("text"),
        lit("</p><!-- hidden --><p>&nbsp;Tom &amp; Jerry &lt;3 " +
          "&quot;quoted&quot; &#39;q&#39;</p></body></html>"))
      Tables(s, d, "documents")
        .select(col("doc_id"), TextOps.htmlExtract(html).as("text_clean"))
        .withColumn("n_chars_clean", length(col("text_clean")))
    }),

    // Per-source line-frequency boilerplate removal (CCNet/RefinedWeb
    // line-wise filter): deterministic multi-line pages manufactured
    // around each document (the q107 messy-HTML precedent) — two
    // whole-source template lines (nav + copyright) must drop, the
    // text and per-doc lines survive, and a promo line planted on
    // doc_id % 7 == 0 (~14% of each source — deliberately NOT % 10,
    // which aligns with the source = doc_id % 20 assignment and would
    // concentrate the line at 100% of two sources) stays under the
    // 50% share and survives. The oracle replays the page manufacture
    // and the census word for word. concat_ws skips the NULL promo
    // slot in BOTH engines.
    "q386_line_boilerplate" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val page = concat_ws("\n",
        lit("Home | About | Contact"),
        concat(lit("Source "), col("source"), lit(" News")),
        col("text"),
        when(col("doc_id") % 7 === 0, lit("Subscribe to our newsletter!")),
        concat(lit("doc "), col("doc_id").cast("string")),
        concat(lit("(c) 2026 "), col("source")))
      TextOps.lineBoilerplate(
          docs.select(col("doc_id"), col("source"), page.as("page")),
          "doc_id", "page", "source")
        .select(col("id").as("doc_id"), col("n_lines_removed"),
          col("text_clean"))
    }),

    // Documents rollup by (lang, source).
    "q37_doc_stats" -> ((s, d) =>
      Tables(s, d, "documents")
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n"),
          round(avg("n_chars"), 4).as("avg_chars"),
          sum("n_chars").as("sum_chars"))),

    // Token-frequency repetition stats (Gopher-style): explode + two
    // map-side-combined aggregations, shuffles keyed by doc id.
    "q58_token_stats" -> ((s, d) =>
      TextOps.tokenStats(Tables(s, d, "documents"), "doc_id", "text")),

    // Duplicate n-gram fractions (count + character share) — pure
    // per-row array expressions, zero shuffles.
    "q59_repetition" -> ((s, d) =>
      TextOps.repetitionMetrics(Tables(s, d, "documents"), "doc_id", "text")),

    // Corpus vocabulary (tokenizer-training / stopword-mining input):
    // explode + one token-keyed aggregation + bounded ordered take.
    "q65_vocabulary" -> ((s, d) =>
      TextOps.vocabulary(Tables(s, d, "documents"), "doc_id", "text", 100)),

    // PII detect + redact: deterministic PII is injected into the
    // synthetic corpus (which has none) so the scrub has real work;
    // everything is codegen regex in one projection — no shuffle.
    "q64_pii_scrub" -> ((s, d) => {
      val injected = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" from 10.0."), (col("doc_id") % 250).cast("string"), lit(".1")))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit(" call 555-867-5309")).otherwise(lit("")))
      Tables(s, d, "documents")
        .select(col("doc_id"), injected.as("t"))
        .select(col("doc_id"),
          TextOps.emailCount(col("t")).as("n_email"),
          TextOps.ipv4Count(col("t")).as("n_ip"),
          TextOps.phoneCount(col("t")).as("n_phone"),
          md5(TextOps.redactPii(col("t")).cast("binary")).as("redacted_md5"))
    }),

    // BM25 relevance of every document against a fixed term bag —
    // retrieval-style quality ranking; doc-length norm carried through
    // the explode so the scoring needs no per-doc join.
    "q72_bm25" -> ((s, d) =>
      TextOps.bm25(Tables(s, d, "documents"), "doc_id", "text",
        terms = Seq("spark", "join", "merge"))
        .select(col("id").as("doc_id"), col("bm25"))),

    // Context-window sharding: overlapping 64-token chunks (stride 48)
    // per document — zero shuffles, chunk text hashed for compactness.
    "q74_chunk_tokens" -> ((s, d) =>
      graft.ops.PackOps.chunkTokens(Tables(s, d, "documents"),
          "doc_id", "text", chunkSize = 64, overlap = 16)
        .select(col("id").as("doc_id"), col("chunk_idx"),
          col("n_chunk_tokens"), md5(col("chunk").cast("binary")).as("chunk_md5"))),

    // Sequence packing: docs laid end-to-end in 8 hash buckets, cut
    // every 256 tokens; reports each doc's sequence span. Every piece
    // of the bucket/count arithmetic is engine-congruent with the
    // DuckDB oracle: `%` (sign of the dividend in both engines, unlike
    // pmod), an explicit whitespace class (Java `\s` includes \x0B,
    // RE2's does not), and a null-text coalesce (DuckDB greatest()
    // propagates NULL where Spark's skips it).
    "q75_pack_sequences" -> ((s, d) =>
      graft.ops.PackOps.packSequences(Tables(s, d, "documents"), "doc_id",
        coalesce(regexp_count(col("text"), lit("[^ \\t\\n\\f\\r]+")), lit(0)),
        col("doc_id") % lit(8), contextLen = 256)),

    // One-pass bounded-memory heavy hitters (Misra-Gries native
    // aggregate). The synthetic corpus has ~31 distinct tokens, below
    // the capacity, so the summary is provably exact here (the oracle
    // pins that property); the approximate regime is spec-tested.
    "q77_heavy_hitters" -> ((s, d) =>
      TextOps.approxTopTokens(Tables(s, d, "documents"), "text", capacity = 64)),

    // Data-driven curation cut: per-source p10/p90 length trim —
    // thresholds from a per-stratum percentile agg, broadcast back,
    // pure filter (corpus never shuffles).
    "q78_adaptive_trim" -> ((s, d) =>
      TextOps.adaptiveLengthTrim(Tables(s, d, "documents"), "source", "n_chars",
          lo = 0.1, hi = 0.9)
        .select(col("doc_id"), col("source"), col("n_chars"))),

    // Model-based quality scoring (CCNet/fasttext-filter shape): fixed
    // auditable linear weights over the quality signals, logistic
    // squash, one codegen projection.
    "q79_quality_score" -> ((s, d) =>
      TextOps.qualityScore(Tables(s, d, "documents"), "doc_id", "text")
        .select(col("id").as("doc_id"), col("quality"))),

    // Same scorer with TRAINED weights: deterministic distributed
    // IRLS (QualityFit.fit, label = target language) run offline and
    // frozen — scoring stays one codegen projection; only the
    // weight literals differ from q79.
    "q95_trained_quality" -> ((s, d) =>
      TextOps.qualityScore(Tables(s, d, "documents"), "doc_id", "text",
          TextOps.TrainedQualityWeights)
        .select(col("id").as("doc_id"), col("quality"))),

    // Dataset assembly report: per-source docs / whitespace tokens /
    // BPE tokens and corpus shares — the "what did we build"
    // scoreboard of a curation run. One corpus scan + one tiny agg.
    "q91_dataset_report" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val perDoc = Tables(s, d, "documents").select(col("source"),
        coalesce(regexp_count(col("text"), lit("[^ \\t\\n\\f\\r]+")), lit(0))
          .as("n_tok"),
        size(coalesce(graft.ops.BpeOps.bpeEncode(col("text")),
          array().cast("array<string>"))).cast("long").as("n_bpe"))
      val bySrc = perDoc.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        sum("n_bpe").as("n_bpe_tokens"))
      // totals via an unpartitioned window on the AGGREGATED frame
      // (source-cardinality rows): a crossJoin(agg(bySrc)) would plan
      // the whole scan+BPE subtree twice
      val w = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      bySrc
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("n_bpe_tokens"),
          round(col("n_docs").cast("double") /
            sum("n_docs").over(w), 5).as("doc_share"),
          round(col("n_tokens").cast("double") /
            sum("n_tokens").over(w), 5).as("token_share"))
    }),

    // Corpus-LM log-perplexity (the CCNet quality filter's shape):
    // add-one bigram model trained as two aggregations, each doc
    // scored by mean bigram NLL. Fully relational -> exact oracle.
    "q90_perplexity" -> ((s, d) =>
      TextOps.perplexityScore(Tables(s, d, "documents"), "doc_id", "text")
        .select(col("id").as("doc_id"), col("logppl"))),

    // TF-IDF (smoothed sklearn idf, minDf=2): per-doc summary of the
    // vector-space weights — docs whose every term is sub-minDf drop
    // out (inner semantics, mirrored by the oracle's join).
    "q93_tfidf" -> ((s, d) =>
      TextOps.tfidfWeights(Tables(s, d, "documents"), "doc_id", "text",
          minDf = 2)
        .groupBy(col("id").as("doc_id"))
        .agg(count(lit(1)).as("n_terms"),
          round(sum("w"), 5).as("sum_w"),
          round(max("w"), 5).as("max_w"))),

    // Tokens -> ids (training assembly's final mapping step): dense
    // lexicographic vocabulary ids, per-doc id sequence digested.
    "q88_token_ids" -> ((s, d) =>
      graft.ops.BpeOps.tokenIds(Tables(s, d, "documents"), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_bpe_tokens"), col("ids_md5"))),

    // Deterministic WEIGHTED sample (Efraimidis-Spirakis by content
    // hash): top-50 docs by u^(1/n_chars) — quality/length-weighted
    // corpus selection with the uniform sampler's reproducibility.
    "q121_weighted_sample" -> ((s, d) =>
      SampleOps.weightedPriority(Tables(s, d, "documents"),
        "doc_id", "n_chars", n = 50, salt = "wsample:")),

    // Sentence-preserving passage windows (the RAG chunker): new
    // passage at each 40-token crossing, sentences never split;
    // zero-shuffle array expressions. The synthetic corpus is one
    // giant sentence per doc, so sentence boundaries are injected
    // deterministically (q84's replace idiom, mirrored in the
    // oracle) to exercise the multi-passage path.
    "q134_passage_windows" -> ((s, d) =>
      graft.ops.PackOps.passageWindows(
        Tables(s, d, "documents").select(col("doc_id"),
          replace(col("text"), lit(" value"), lit(". value")).as("text")),
        "doc_id", "text", tokensPerPassage = 40)
        .withColumnRenamed("id", "doc_id")),

    // Epoch/repetition budgeting: the q128 mixture priced against a
    // 105k-token run with a 4-epoch repetition cap — desired vs
    // granted tokens and the shortfall per domain.
    "q133_epoch_budget" -> ((s, d) =>
      SampleOps.epochBudget(Tables(s, d, "documents"),
        "source", "text", alpha = 0.3, budgetTokens = 105000L,
        maxEpochs = 4.0)),

    // Context-length budgeting: truncation loss + padding waste vs
    // packed utilization at candidate sequence lengths, over the
    // frozen-BPE token counts — the pick-L-before-training table.
    "q132_pack_efficiency" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val counts = Tables(s, d, "documents").select(
        size(coalesce(graft.ops.BpeOps.bpeEncode(col("text")),
          array().cast("array<string>"))).as("n_bpe"))
      graft.ops.PackOps.packEfficiency(counts, "n_bpe", Seq(32, 64, 128))
    }),

    // BPE fertility by language (chars/token, tokens/word): the
    // multilingual tokenizer-fairness report over the frozen model.
    "q130_bpe_fertility" -> ((s, d) =>
      graft.ops.BpeOps.fertilityByLang(Tables(s, d, "documents"),
        "text", "lang")),

    // Zipf power-law fit of the token-frequency distribution — the
    // one-row corpus-health probe (slope ~ -1 is natural text).
    "q129_zipf_fit" -> ((s, d) =>
      ProfileOps.zipfFit(Tables(s, d, "documents"), "text")),

    // Temperature-based domain mixture reweighting (XLM-R sampler):
    // token shares flattened at alpha=0.3, per-domain boost table.
    "q128_domain_mixture" -> ((s, d) =>
      SampleOps.temperatureWeights(Tables(s, d, "documents"),
        "source", "text", alpha = 0.3)),

    // "Fightin' words" distinctive terms per source (Monroe et al.
    // 2008): informed-Dirichlet log-odds z-scores vs the rest of the
    // corpus — the statistically sound per-domain keyword table
    // (the prior shrinks the rare-word over-ranking of tf-idf/PMI).
    "q402_distinctive_terms" -> ((s, d) =>
      TextOps.distinctiveTerms(Tables(s, d, "documents"),
        "source", "text")),

    // DoReMi-flavored excess-loss mixture (q128's loss-aware
    // counterpart): corpus-vs-own unigram NLL gap per source in exact
    // micronats, token shares scaled by exp(eta·excess), renormalized.
    "q389_excess_loss_mixture" -> ((s, d) =>
      SampleOps.excessLossWeights(Tables(s, d, "documents"),
        "source", "text", eta = 0.5)),

    // Interpolated Kneser-Ney bigram LM trained on the English slice
    // (the CCNet shape: trusted reference LM, score everything). The
    // model is a dataset: every reference bigram type with its counts
    // and final KN probability.
    "q125_kn_model" -> ((s, d) =>
      LmOps.model(Tables(s, d, "documents").where(col("lang") === "en"),
        "doc_id", "text")),

    // KN perplexity of EVERY document under the q125 English model —
    // non-English docs surface as high-ppl/high-OOV outliers, the
    // CCNet keep/bucket signal.
    "q126_kn_ppl" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      LmOps.score(docs, docs.where(col("lang") === "en"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    }),

    // N-gram novelty vs a reference corpus (crawl-refresh signal):
    // even docs are "already crawled", odd docs are the candidate
    // batch scored against them.
    "q145_novelty_vs_ref" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      TextOps.gramNoveltyVsRef(
        docs.where(col("doc_id") % 2 === 1),
        docs.where(col("doc_id") % 2 === 0),
        "doc_id", "text", n = 3)
        .withColumnRenamed("id", "doc_id")
    }),

    // Per-source quality percentiles (mixture-design source ranking):
    // exact interpolated p10/p50/p90 of the IRLS-trained quality
    // score per source.
    "q143_source_quality" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val qual = TextOps.qualityScore(docs, "doc_id", "text",
        TextOps.TrainedQualityWeights)
      docs.select(col("doc_id").as("id"), col("source"))
        .join(qual, Seq("id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          expr("percentile(quality, array(0.1D, 0.5D, 0.9D))").as("_p"))
        .select(col("source"), col("n_docs"),
          round(element_at(col("_p"), 1), 5).as("p10"),
          round(element_at(col("_p"), 2), 5).as("p50"),
          round(element_at(col("_p"), 3), 5).as("p90"))
    }),

    // Pairwise source-similarity matrix: token-distribution JSD for
    // every source pair (mixture-design / redundant-source input).
    "q142_source_jsd" -> ((s, d) =>
      ProfileOps.tokenDistJsd(Tables(s, d, "documents"), "text", "source")),

    // Full Chen-Goodman TRIGRAM interpolated KN: highest order
    // discounts raw counts, bigram level discounts continuation
    // (type) counts, +1-smoothed continuation unigram floor. One
    // reference scan; model table = seen trigram types.
    "q135_kn3_model" -> ((s, d) =>
      LmOps.model3(Tables(s, d, "documents").where(col("lang") === "en"),
        "doc_id", "text")),

    // Trigram-KN perplexity of every doc (OOV gibberish injected per
    // residue so all three backoff levels are exercised and
    // oracle-checked: unseen trigram w/ seen context -> P2, unseen
    // middle -> P1).
    "q136_kn3_ppl" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val injected = docs.select(col("doc_id"),
        when(col("doc_id") % 31 === 0,
          concat(col("text"), lit(" zzq zzq zzq")))
          .otherwise(col("text")).as("text"))
      LmOps.score3(injected, docs.where(col("lang") === "en"),
        "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    }),

    // Per-span mojibake repair in script-MIXED documents — the case
    // whole-string strictness (q114) correctly refuses: CJK context
    // is kept verbatim, the broken Latin run repairs, and a run
    // poisoned by an invalid sequence stays untouched even though it
    // also holds a repairable one (per-run strictness, the documented
    // coarseness). Oracle replays injection and the expected splice.
    "q119_span_mojibake" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val t =
        when(col("doc_id") % 6 === 0,
          concat(col("text"), lit(" 東京タワー cafÃ© corner")))
        .when(col("doc_id") % 25 === 0,
          concat(col("text"), lit(" 移動 SÃO PAULO â€”dash")))
        .otherwise(col("text"))
      Tables(s, d, "documents").select(col("doc_id"), t.as("t"))
        .select(col("doc_id"),
          TextOps.mojibakeCount(col("t")).cast("long").as("n_moji"),
          (TextOps.fixMojibakeSpans(col("t")) =!= col("t")).cast("int")
            .as("changed"),
          md5(TextOps.fixMojibakeSpans(col("t")).cast("binary"))
            .as("repaired_md5"))
    }),

    // Corpus-wide n-gram novelty: how much of each doc's distinct
    // 3-gram set appears nowhere else (TF-IDF-shaped plan: gram-keyed
    // DF aggregation + join back, both map-side combined).
    "q116_gram_novelty" -> ((s, d) =>
      TextOps.gramNovelty(Tables(s, d, "documents"), "doc_id", "text", 3)
        .withColumnRenamed("id", "doc_id")),

    // Unicode script profile (the routing signal that runs BEFORE
    // language-ID at 100 TB): per-script char fractions, zero
    // shuffle. The ASCII corpus gets deterministic non-Latin snippet
    // injection so every block is exercised (q64 idiom, mirrored in
    // the oracle).
    "q117_script_profile" -> ((s, d) => {
      val t =
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" Привет мир")))
        .when(col("doc_id") % 7 === 0, concat(col("text"), lit(" こんにちは世界")))
        .when(col("doc_id") % 11 === 0, concat(col("text"), lit(" مرحبا بالعالم")))
        .when(col("doc_id") % 13 === 0, concat(col("text"), lit(" 안녕하세요")))
        .when(col("doc_id") % 17 === 0, concat(col("text"), lit(" Γειά σου κόσμε")))
        .when(col("doc_id") % 19 === 0, concat(col("text"), lit(" नमस्ते दुनिया")))
        .otherwise(col("text"))
      TextOps.scriptProfile(
        Tables(s, d, "documents").select(col("doc_id"), t.as("text")),
        "doc_id", "text")
    }),

    // Mojibake detect + strict repair: UTF-8-read-as-cp1252 damage is
    // injected into the (pure-ASCII) corpus per doc_id residue —
    // accent mojibake, punctuation mojibake, and one UNREPAIRABLE
    // case (a cp1252-undefined byte lost to U+FFFD) that the strict
    // contract must refuse to touch. The oracle replays the injection
    // and the expected repair (the byte-level recode inverts to a
    // plain replace on this controlled corruption), so the native
    // codec path is value-checked cross-engine; repair is a
    // zero-shuffle projection.
    "q114_fix_mojibake" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val corrupted =
        when(col("doc_id") % 7 === 0,
          replace(col("text"), lit("e"), lit("Ã©")))
        .when(col("doc_id") % 11 === 0,
          concat(col("text"), lit(" â€œquotedâ€¦")))
        .when(col("doc_id") % 13 === 0,
          concat(col("text"), lit(" broken â€\uFFFD end")))
        .otherwise(col("text"))
      Tables(s, d, "documents").select(col("doc_id"), corrupted.as("t"))
        .select(col("doc_id"),
          TextOps.mojibakeCount(col("t")).cast("long").as("n_moji"),
          (TextOps.fixMojibake(col("t")) =!= col("t")).cast("int").as("changed"),
          md5(TextOps.fixMojibake(col("t")).cast("binary")).as("repaired_md5"))
    }),

    // C4/Gopher-style rule battery over deterministically degraded
    // docs (the synthetic corpus is uniformly clean, so boilerplate
    // failure modes — bullet walls, ellipsis teasers, symbol spam,
    // numeric spam, lorem ipsum, runt docs — are injected per doc_id
    // residue, mirrored exactly in the oracle; the q64 idiom). The
    // operator itself is one zero-shuffle projection.
    "q112_quality_rules" -> ((s, d) => {
      val injected = when(col("doc_id") % 29 === 0, lit("tiny doc"))
        .otherwise(concat(col("text"),
          when(col("doc_id") % 13 === 0,
            concat(lit("\n"), repeat(lit("- bullet line\n"), 24)))
            .otherwise(lit("")),
          when(col("doc_id") % 17 === 0, lit(" lorem ipsum {"))
            .otherwise(lit("")),
          when(col("doc_id") % 19 === 0,
            lit("\nread more...\nsee details…\nmore..."))
            .otherwise(lit("")),
          when(col("doc_id") % 23 === 0, repeat(lit(" #"), 40))
            .otherwise(lit("")),
          when(col("doc_id") % 31 === 0, repeat(lit(" 4242"), 30))
            .otherwise(lit("")),
          when(col("doc_id") % 37 === 0,
            repeat(lit(" pneumonoultramicroscopicsilicovolcanoconiosis"), 25))
            .otherwise(lit(""))))
      val rules = TextOps.qualityRules(
        Tables(s, d, "documents").select(col("doc_id"), injected.as("text")),
        "doc_id", "text")
      rules.select((Seq("doc_id", "n_words", "mean_word_len",
          "symbol_ratio", "bullet_line_frac", "ellipsis_line_frac",
          "alpha_word_frac", "n_stop_hits").map(col) ++
        Seq("r_len", "r_word_len", "r_symbol", "r_bullet", "r_ellipsis",
          "r_alpha", "r_stop", "r_clean", "passes")
          .map(c => col(c).cast("int").as(c))): _*)
    }),

    // Canonical text normal form: NFC + lowercase + whitespace
    // collapse. Value-checked against DuckDB's nfc_normalize (both
    // implement UAX#15).
    "q87_text_normalize" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val norm = TextOps.normalizeText(coalesce(col("text"), lit("")))
      Tables(s, d, "documents").select(col("doc_id"),
        md5(norm.cast("binary")).as("norm_md5"),
        length(norm).as("n_norm_chars"))
    }),

    // Sequence packing in the BPE token unit — the budget that
    // actually matters for a pretraining run. Same pack machinery as
    // q75 with the merges-based count (q75's whitespace unit kept as
    // the cheap twin); cut every 128 BPE tokens.
    "q85_pack_bpe" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      graft.ops.PackOps.packSequences(Tables(s, d, "documents"), "doc_id",
        size(coalesce(graft.ops.BpeOps.bpeEncode(col("text")),
          array().cast("array<string>"))),
        col("doc_id") % lit(8), contextLen = 128)
    }),

    // Real BPE tokenization under the frozen 32-merge model (trained
    // once on this corpus, shipped as constants — the normal BPE
    // deployment artifact). The oracle replays the identical merge
    // table through a recursive CTE, so the subword segmentation
    // itself is value-checked cross-engine, not just counted.
    "q80_bpe_encode" -> ((s, d) =>
      graft.ops.BpeOps.bpeTokens(Tables(s, d, "documents"), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_bpe_tokens"), col("bpe_md5"))),
  )

  val oracles: Map[String, String] = Map(
    "q240_span_lang" -> spanLangOracleSql,

    "q298_systematic_pps" -> graft.ops.SampleOps.systematicPpsOracleSql(
      "documents", "source", "doc_id",
      "len(list_filter(string_split_regex(lower(text)," +
        " '[ \t\n\f\r]+'), x -> x <> ''))", 20),

    "q315_gini" -> ProfileOps.giniOracleSql(
      "documents", "source", "n_chars"),

    "q318_mcc" -> ProfileOps.mccOracleSql(
      s"SELECT doc_id AS id, quality > 0.5 AS flag FROM (\n" +
        s"${qualityOracleSql(TextOps.TrainedQualityWeights)}) q",
      "WITH plain AS (SELECT doc_id, text AS t FROM documents),\n" +
        rulesOracleBody("plain") +
        "SELECT doc_id AS id, passes = 1 AS flag FROM pr"),

    "q321_mutual_info" -> ProfileOps.normalizedMutualInfoOracleSql(
      s"""(WITH plain AS (SELECT doc_id, text AS t FROM documents),
         |${rulesOracleBody("plain")}
         |SELECT d.source, pr.passes FROM pr
         |JOIN documents d USING (doc_id)) j""".stripMargin,
      "source", "passes"),

    "q329_chao1_vocab" -> TextOps.chao1OracleSql("documents", "text"),

    "q330_spiegelhalter" -> ProfileOps.spiegelhalterOracleSql(
      s"""(WITH plain AS (SELECT doc_id, text AS t FROM documents),
         |${rulesOracleBody("plain")}
         |SELECT q.quality, pr.passes FROM pr
         |JOIN (${qualityOracleSql(TextOps.TrainedQualityWeights)}) q
         |  USING (doc_id)) j""".stripMargin,
      "quality", "passes"),

    "q336_negative_sampling" -> SelectionOps.largestRemainderOracleSql(
      """SELECT term AS grp,
        |  CAST(round(pow(c, 0.75) * 1000) AS BIGINT) AS w
        |FROM (SELECT term, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(list_filter(string_split_regex(
        |      lower(text), '[ \t\n\f\r]+'), x -> x <> '')) AS term
        |    FROM documents) t
        |  GROUP BY term) tf""".stripMargin, budget = 1000000L),

    "q345_decile_gains" -> ProfileOps.decileGainsOracleSql(
      s"""(WITH plain AS (SELECT doc_id, text AS t FROM documents),
         |${rulesOracleBody("plain")}
         |SELECT q.doc_id AS id, q.quality, pr.passes FROM pr
         |JOIN (${qualityOracleSql(TextOps.TrainedQualityWeights)}) q
         |  USING (doc_id)) j""".stripMargin,
      "id", "quality", "passes"),
    "q358_rag_chunks" ->
      """WITH tok AS (SELECT doc_id, list_filter(string_split_regex(
        |    lower(text), '[ \t\n\f\r]+'), x -> x <> '') AS ts
        |  FROM documents),
        |b AS (SELECT doc_id, ts, len(ts) AS nt FROM tok
        |  WHERE len(ts) >= 1),
        |c AS (SELECT doc_id, ts, nt, unnest(range(0,
        |    1 + (greatest(nt - 32, 0) + 23) // 24)) AS chunk_idx
        |  FROM b)
        |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
        |  CAST(chunk_idx * 24 + 1 AS INT) AS start_tok,
        |  CAST(least(chunk_idx * 24 + 32, nt) AS INT) AS end_tok,
        |  md5(array_to_string(
        |    ts[chunk_idx * 24 + 1 : least(chunk_idx * 24 + 32, nt)],
        |    ' ')) AS chunk_fp,
        |  CAST(least(chunk_idx * 24 + 32, nt) - chunk_idx * 24 AS INT)
        |    AS n_tokens
        |FROM c""".stripMargin,
    "q359_source_manifest" ->
      """WITH base AS (SELECT source, lang, n_chars,
        |    CAST(len(list_filter(string_split_regex(text,
        |      '[ \t\n\f\r]+'), x -> x <> '')) AS BIGINT) AS tk,
        |    md5(regexp_replace(lower(text), '[ \t\n\f\r]+', '', 'g'))
        |      AS fp
        |  FROM documents),
        |dup AS (SELECT source,
        |    CAST(sum(CASE WHEN cf >= 2 THEN cf ELSE 0 END) AS BIGINT)
        |      AS dup_docs
        |  FROM (SELECT source, fp, count(*) AS cf FROM base
        |    GROUP BY 1, 2) g
        |  GROUP BY source),
        |agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(tk) AS BIGINT) AS n_tokens,
        |    CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        |  FROM base GROUP BY source)
        |SELECT a.source, n_docs, n_tokens, n_chars, n_langs, dup_docs,
        |  (2000000 * dup_docs + n_docs) // (2 * n_docs) AS dup_ppm
        |FROM agg a JOIN dup d ON a.source = d.source""".stripMargin,
    "q346_brier_decomp" -> ProfileOps.brierDecompositionOracleSql(
      s"""(WITH plain AS (SELECT doc_id, text AS t FROM documents),
         |${rulesOracleBody("plain")}
         |SELECT q.quality, pr.passes FROM pr
         |JOIN (${qualityOracleSql(TextOps.TrainedQualityWeights)}) q
         |  USING (doc_id)) j""".stripMargin,
      "quality", "passes"),

    "q331_conformal" -> ProfileOps.splitConformalOracleSql(
      s"""(SELECT d.doc_id, d.n_chars,
         |  CAST(round(q.quality * 1e6) AS BIGINT) AS ymicro
         | FROM documents d
         | JOIN (${qualityOracleSql(TextOps.TrainedQualityWeights)}) q
         |  USING (doc_id)) j""".stripMargin,
      "n_chars", "ymicro", "doc_id % 2 = 0"),

    "q294_t_closeness" ->
      """WITH cell AS (SELECT source, lang,
        |    LEAST(n_chars // 64, 9) AS b, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2, 3),
        |gl AS (SELECT b, CAST(sum(c) AS BIGINT) AS cb
        |  FROM cell GROUP BY b),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_all FROM cell),
        |grp AS (SELECT source, lang, CAST(sum(c) AS BIGINT) AS n
        |  FROM cell GROUP BY 1, 2),
        |dense AS (SELECT source, lang, n, gs.b FROM grp,
        |  (SELECT unnest(generate_series(0, 9)) AS b) gs),
        |j AS (SELECT d.source, d.lang, d.n, d.b,
        |    coalesce(c.c, 0) AS c, coalesce(g.cb, 0) AS cb, n_all
        |  FROM dense d
        |  LEFT JOIN cell c ON d.source = c.source AND d.lang = c.lang
        |    AND d.b = c.b
        |  LEFT JOIN gl g ON d.b = g.b CROSS JOIN tot),
        |cum AS (SELECT source, lang, n, n_all,
        |    sum(c * n_all - cb * n) OVER (PARTITION BY source, lang
        |      ORDER BY b ROWS UNBOUNDED PRECEDING) AS s
        |  FROM j),
        |a AS (SELECT source, lang, any_value(n) AS n,
        |    CAST(sum(abs(s)) AS BIGINT) AS sa, any_value(n_all) AS na
        |  FROM cum GROUP BY 1, 2)
        |SELECT source, lang, n,
        |  CAST((2000000 * sa + 9 * n * na) // (2 * 9 * n * na)
        |    AS DOUBLE) / 1e6 AS t_emd
        |FROM a""".stripMargin,

    "q285_grouped_ols" -> {
      val q = qualityOracleSql(TextOps.TrainedQualityWeights)
      ProfileOps.groupedOlsOracleSql(
        s"(SELECT d.source, d.n_chars, CAST(round(qq.quality * 1e5)" +
          s" AS BIGINT) AS ymicro FROM ($q) qq" +
          " JOIN documents d USING (doc_id)) src",
        "source", "n_chars", "ymicro")
    },

    "q280_skipgram" -> graft.ops.CooccurOps.skipgramOracleSql(
      "documents", "doc_id", "text", window = 2, minCount = 30L),

    "q279_stratified_split" ->
      graft.ops.SelectionOps.stratifiedSplitOracleSql(
        "documents", Seq("source", "lang"),
        Seq("train" -> 800, "val" -> 100, "test" -> 100)),

    "q273_best_f1" -> ProfileOps.bestF1OracleSql(
      s"""WITH q AS (${qualityOracleSql(TextOps.TrainedQualityWeights)}),
         |docs0 AS (SELECT doc_id, text AS t FROM documents),
         |""".stripMargin + rulesOracleBody("docs0") +
      """
        |SELECT quality AS s, pr.passes AS pos
        |FROM q JOIN pr USING (doc_id)""".stripMargin),

    "q269_good_turing" -> graft.ops.LmOps.simpleGoodTuringOracleSql(
      "documents", "text"),

    "q259_isotonic" -> ProfileOps.isotonicOracleSql(
      s"""WITH q AS (${qualityOracleSql(TextOps.TrainedQualityWeights)}),
         |docs0 AS (SELECT doc_id, text AS t FROM documents),
         |""".stripMargin + rulesOracleBody("docs0") +
      """
        |SELECT least(CAST(floor(quality * 10) AS INTEGER), 9) AS bucket,
        | pr.passes AS pos
        |FROM q JOIN pr USING (doc_id)""".stripMargin),

    "q263_theils_u" -> ProfileOps.theilsUOracleSql(
      "documents", "source", "lang"),

    "q256_chi2_drift" -> ProfileOps.chiSquaredOracleSql(
      "documents", "source", "lang"),

    "q255_spearman" -> ProfileOps.spearmanOracleSql(
      s"SELECT CAST(d.n_chars AS DOUBLE) AS x, qq.quality AS y FROM " +
        s"(${qualityOracleSql(TextOps.TrainedQualityWeights)}) qq " +
        "JOIN documents d USING (doc_id)",
      "n_chars", "quality"),
    "q252_mannwhitney_drift" -> ProfileOps.mannWhitneyOracleSql(
      s"(SELECT d.source, qq.quality FROM " +
        s"(${qualityOracleSql(TextOps.TrainedQualityWeights)}) qq " +
        "JOIN documents d USING (doc_id))",
      "source", "quality"),
    "q250_ks_drift" -> ProfileOps.ksAgainstRestOracleSql(
      s"(SELECT d.source, qq.quality FROM " +
        s"(${qualityOracleSql(TextOps.TrainedQualityWeights)}) qq " +
        "JOIN documents d USING (doc_id))",
      "source", "quality"),
    "q248_loo_source_impact" ->
      s"""WITH q AS (${qualityOracleSql(TextOps.TrainedQualityWeights)}),
         |j AS (SELECT d.source, qq.quality
         |  FROM q qq JOIN documents d USING (doc_id)),
         |per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  sum(CAST(quality AS DECIMAL(18,5))) AS s FROM j GROUP BY source),
         |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS nn, sum(s) AS ss
         |  FROM per)
         |SELECT source, n_docs,
         |  ((20 * CAST(s * 100000 AS BIGINT) + n_docs)
         |    // (2 * n_docs)) / 1e6 AS mean_source,
         |  ((20 * CAST(ss * 100000 AS BIGINT) + nn) // (2 * nn)) / 1e6
         |    AS mean_all,
         |  ((20 * CAST((ss - s) * 100000 AS BIGINT) + (nn - n_docs))
         |    // (2 * (nn - n_docs))) / 1e6 AS mean_without,
         |  (((20 * CAST((ss - s) * 100000 AS BIGINT) + (nn - n_docs))
         |    // (2 * (nn - n_docs)))
         |   - ((20 * CAST(ss * 100000 AS BIGINT) + nn) // (2 * nn))) / 1e6
         |    AS delta
         |FROM per CROSS JOIN tot""".stripMargin,
    "q246_luhn_pii" ->
      """WITH c AS (SELECT doc_id, CASE
        |   WHEN doc_id % 17 = 0 THEN text || ' card 4539148803436467 ok'
        |   WHEN doc_id % 19 = 0 THEN text || ' num 4539148803436468 bad'
        |   ELSE text END AS t FROM documents),
        |e AS (SELECT doc_id,
        |  unnest(regexp_extract_all(t, '\b[0-9]{13,16}\b')) AS cand FROM c),
        |v AS (SELECT doc_id,
        |  CASE WHEN list_sum(list_transform(generate_series(1, length(cand)),
        |    i -> CASE WHEN i % 2 = 0 THEN
        |      CASE WHEN (ascii(substr(reverse(cand), CAST(i AS INT), 1)) - 48) * 2 > 9
        |        THEN (ascii(substr(reverse(cand), CAST(i AS INT), 1)) - 48) * 2 - 9
        |        ELSE (ascii(substr(reverse(cand), CAST(i AS INT), 1)) - 48) * 2 END
        |      ELSE ascii(substr(reverse(cand), CAST(i AS INT), 1)) - 48 END))
        |    % 10 = 0 THEN 1 ELSE 0 END AS ok FROM e),
        |g AS (SELECT doc_id, count(*) AS nc, sum(ok) AS nv
        |  FROM v GROUP BY doc_id)
        |SELECT c.doc_id,
        |  CAST(coalesce(g.nc, 0) AS INTEGER) AS n_card_cands,
        |  CAST(coalesce(g.nv, 0) AS INTEGER) AS n_cards,
        |  CAST(coalesce(g.nv, 0) > 0 AS INTEGER) AS has_card
        |FROM c LEFT JOIN g USING (doc_id)""".stripMargin,
    "q244_temperature_mixture" -> {
      val baseSql =
        """SELECT source,
          |  CAST(sum(len(regexp_extract_all(text, '[^ \t\n\f\r]+')))
          |    AS BIGINT) AS n_tokens
          |FROM documents GROUP BY source""".stripMargin
      val weightsSql =
        s"""SELECT source AS grp,
           |  CAST(round(exp(ln(CAST(n_tokens AS DOUBLE)) / 0.7), 0)
           |    AS BIGINT) AS w
           |FROM ($baseSql)""".stripMargin
      s"""WITH base AS ($baseSql),
         |al AS (${SelectionOps.largestRemainderOracleSql(weightsSql, 1000000L)})
         |SELECT b.source, b.n_tokens, al.weight, al.alloc,
         |  round(CAST(al.alloc AS DOUBLE) / 1000000, 6) AS alloc_frac
         |FROM base b JOIN al ON b.source = al.grp""".stripMargin
    },
    "q243_span_ppl_filter" -> (LmOps.knOracleWith("d.lang = 'en'") +
      """,
        |inj AS (SELECT doc_id, CASE WHEN doc_id % 13 = 0
        |   THEN text || '. zxq vlorp qeth wubble snarv gribbet zund flep vorx.'
        |   ELSE text END AS text FROM documents)""".stripMargin +
      spanPplCtes("inj") +
      """
        |SELECT doc_id, n_spans, n_scored, n_kept,
        |  ((2000000 * n_kept + n_spans) // (2 * n_spans)) / 1e6
        |    AS keep_frac,
        |  CASE WHEN n_kept > 0
        |    THEN ((20 * CAST(s * 100000 AS BIGINT) + n_kept)
        |      // (2 * n_kept)) / 1e6 END AS mean_ppl_kept
        |FROM g""".stripMargin),
    "q231_score_standardize" -> (ProfileOps.zStandardizeOracleSql(
        s"(WITH qq AS (${qualityOracleSql(TextOps.TrainedQualityWeights)}) " +
          "SELECT d.doc_id, d.source, qq.quality FROM documents d " +
          "JOIN qq ON d.doc_id = qq.doc_id)",
        "doc_id", "source", "quality")
      .replace("SELECT id, b.grp,", "SELECT id, b.grp AS source,")),
    "q232_calibration_ece" ->
      (s"""WITH q AS (${qualityOracleSql(TextOps.TrainedQualityWeights)}),
        |docs0 AS (SELECT doc_id, text AS t FROM documents),
        |""".stripMargin + rulesOracleBody("docs0") +
        """,
        |j AS (SELECT q.doc_id,
        |   least(CAST(floor(quality * 10) AS INTEGER), 9) AS bucket,
        |   quality, pr.passes AS pos
        | FROM q JOIN pr USING (doc_id)),
        |bk AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |   round(avg(quality), 6) AS avg_score,
        |   round(sum(pos) * 1.0::DOUBLE / count(*), 6) AS frac_pos
        | FROM j GROUP BY bucket)
        |SELECT CAST(count(*) AS BIGINT) AS n_buckets,
        | round(list_sum(list(n * abs(frac_pos - avg_score) ORDER BY bucket))
        |   / CAST(sum(n) AS DOUBLE), 6) AS ece
        |FROM bk""".stripMargin),
    "q233_keywords" -> TextOps.topKeywordsOracleSql(
      "documents", "doc_id", "text"),
    "q388_rake_keywords" -> TextOps.rakeKeywordsOracleSql(
      "documents", "doc_id", "text"),
    "q395_topic_segments" -> TextOps.topicSegmentsOracleSql(
      "documents", "doc_id", "text"),
    "q234_script_mismatch" ->
      """WITH c AS (SELECT lang,
        | len(regexp_extract_all(text, '[A-Za-z]')) AS c0,
        | len(regexp_extract_all(text, '[\x{0400}-\x{04FF}]')) AS c1,
        | len(regexp_extract_all(text, '[\x{0370}-\x{03FF}]')) AS c2,
        | len(regexp_extract_all(text, '[\x{0600}-\x{06FF}]')) AS c3,
        | len(regexp_extract_all(text, '[\x{0900}-\x{097F}]')) AS c4,
        | len(regexp_extract_all(text, '[\x{4E00}-\x{9FFF}]')) AS c5,
        | len(regexp_extract_all(text, '[\x{3040}-\x{30FF}]')) AS c6,
        | len(regexp_extract_all(text, '[\x{AC00}-\x{D7AF}]')) AS c7
        | FROM documents),
        |d AS (SELECT lang,
        | CASE
        |  WHEN c0 >= c1 AND c0 >= c2 AND c0 >= c3 AND c0 >= c4
        |   AND c0 >= c5 AND c0 >= c6 AND c0 >= c7 THEN 'latin'
        |  WHEN c1 >= c2 AND c1 >= c3 AND c1 >= c4 AND c1 >= c5
        |   AND c1 >= c6 AND c1 >= c7 THEN 'cyrillic'
        |  WHEN c2 >= c3 AND c2 >= c4 AND c2 >= c5 AND c2 >= c6
        |   AND c2 >= c7 THEN 'greek'
        |  WHEN c3 >= c4 AND c3 >= c5 AND c3 >= c6 AND c3 >= c7
        |   THEN 'arabic'
        |  WHEN c4 >= c5 AND c4 >= c6 AND c4 >= c7 THEN 'devanagari'
        |  WHEN c5 >= c6 AND c5 >= c7 THEN 'cjk'
        |  WHEN c6 >= c7 THEN 'kana'
        |  ELSE 'hangul' END AS dominant_script,
        | CASE WHEN lang IN ('en','de','fr','es') THEN 'latin'
        |      WHEN lang = 'zh' THEN 'cjk' ELSE 'unknown' END
        |   AS expected_script
        | FROM c)
        |SELECT lang, dominant_script, expected_script,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(dominant_script <> expected_script AS INT) AS is_mismatch
        |FROM d GROUP BY 1, 2, 3""".stripMargin,
    "q228_mutual_info" -> ProfileOps.mutualInformationOracleSql(
      "documents", "lang", "source"),
    "q229_next_token_acc" -> TextOps.nextTokenAccuracyOracleSql(
      "documents", "text"),
    "q230_simpson_diversity" -> (ProfileOps.simpsonOracleSql(
        "documents", "source", "lang")
      .replace("SELECT grp,", "SELECT grp AS source,")),
    "q224_anova_quality" ->
      // CTE-list merge: prefix the quality + join CTEs, then splice
      // the ANOVA builder's own CTE chain (minus its WITH keyword)
      ("WITH jq AS (" + qualityOracleSql(TextOps.TrainedQualityWeights)
        + "),\nsrc AS (SELECT d.source AS g_src, jq.quality FROM documents d "
        + "JOIN jq ON d.doc_id = jq.doc_id),\n"
        + graft.ops.ProfileOps.anovaOracleSql("src", "g_src", "quality")
          .replaceFirst("^WITH ", "")),
    "q225_token_gini" -> TextOps.tokenGiniOracleSql("documents", "text"),
    "q220_release_manifest" ->
      (s"""WITH q AS (${qualityOracleSql(TextOps.TrainedQualityWeights)}),
         |base AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(len(regexp_extract_all(text, '[^ \\t\\n\\f\\r]+')))
         |    AS BIGINT) AS n_tokens,
         |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |  CAST(sum(len(regexp_extract_all(text,
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')))
         |    AS BIGINT) AS n_raw_emails
         | FROM documents),
         |tg AS (SELECT md5(regexp_replace(lower(text),
         |    '[ \\t\\n\\f\\r]+', '', 'g')) AS k, count(*) AS n
         |  FROM documents GROUP BY 1),
         |dups AS (SELECT CAST(coalesce(sum(CASE WHEN n > 1 THEN n END), 0)
         |    AS BIGINT) AS n_exact_dup_docs FROM tg),
         |qm AS (SELECT ((20 * CAST(sum(CAST(quality AS DECIMAL(18,5)))
         |    * 100000 AS BIGINT) + count(*)) // (2 * count(*))) / 1e6
         |    AS mean_quality FROM q),
         |ck AS (SELECT
         |  CAST((sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) > 0)
         |    AS INT)
         |  + CAST((sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) > 0) AS INT)
         |  + CAST((sum(CASE WHEN n_chars IS NULL OR n_chars <= 0
         |      THEN 1 ELSE 0 END) > 0) AS INT)
         |  + CAST((sum(CASE WHEN n_chars > 400 THEN 1 ELSE 0 END) > 0) AS INT)
         |  + CAST((sum(CASE WHEN lang NOT IN ('en','de','fr','es','zh')
         |      THEN 1 ELSE 0 END) > 0) AS INT)
         |  + CAST((sum(CASE WHEN NOT starts_with(source, 'src')
         |      THEN 1 ELSE 0 END) > 0) AS INT)
         |  + CAST((count(*) - count(DISTINCT doc_id) > 0) AS INT)
         |    AS nf FROM documents)
         |SELECT n_docs, n_tokens, n_langs, n_exact_dup_docs, mean_quality,
         |  n_raw_emails, CAST(nf AS BIGINT) AS n_checks_failed,
         |  CAST(nf = 0 AS INT) AS release_ready
         |FROM base CROSS JOIN dups CROSS JOIN qm CROSS JOIN ck"""
        .stripMargin),
    "q217_budget_alloc" -> (SelectionOps.largestRemainderOracleSql(
      """SELECT source AS grp,
        | CAST(sum(len(regexp_extract_all(text, '[^ \t\n\f\r]+')))
        |   AS BIGINT) AS w
        |FROM documents GROUP BY source""".stripMargin, 1000000L)
      .replace("SELECT grp, w AS weight", "SELECT grp AS source, w AS weight")),
    "q211_sentence_chunks" -> TextOps.sentenceChunksOracleSql(
      "documents", "doc_id", "text"),
    "q212_readability" -> TextOps.readabilityOracleSql(
        "documents", "text", "lang")
      .replace("SELECT grp, n_docs", "SELECT grp AS lang, n_docs"),
    "q210_expectations" ->
      """WITH w AS (SELECT
        |  sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS v0,
        |  sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS v1,
        |  sum(CASE WHEN n_chars IS NULL OR n_chars <= 0 THEN 1 ELSE 0 END) AS v2,
        |  sum(CASE WHEN n_chars > 400 THEN 1 ELSE 0 END) AS v3,
        |  sum(CASE WHEN lang NOT IN ('en','de','fr','es','zh')
        |      THEN 1 ELSE 0 END) AS v4,
        |  sum(CASE WHEN NOT starts_with(source, 'src') THEN 1 ELSE 0 END) AS v5,
        |  count(*) - count(DISTINCT doc_id) AS vu
        | FROM documents)
        |SELECT "check", CAST(n_violations AS BIGINT) AS n_violations,
        |  CAST(n_violations = 0 AS INT) AS passed
        |FROM (
        |  SELECT 'doc_id_not_null' AS "check", v0 AS n_violations FROM w
        |  UNION ALL SELECT 'text_not_null', v1 FROM w
        |  UNION ALL SELECT 'n_chars_positive', v2 FROM w
        |  UNION ALL SELECT 'n_chars_le_400', v3 FROM w
        |  UNION ALL SELECT 'lang_known', v4 FROM w
        |  UNION ALL SELECT 'source_prefix', v5 FROM w
        |  UNION ALL SELECT 'doc_id_unique', vu FROM w)""".stripMargin,
    "q202_woe_iv" -> ("WITH docs0 AS (SELECT doc_id, text AS t FROM documents),\n"
      + rulesOracleBody("docs0")
      + """,
        |bj AS (SELECT least(CAST(floor(d.n_chars / 200.0) AS INT), 9) AS bin,
        |  pr.passes AS y FROM documents d JOIN pr USING (doc_id)),
        |""".stripMargin
      + ProfileOps.woeIvOracleSql("bj", "bin", "y").stripPrefix("WITH ")),
    "q197_dpo_pairs" -> PreferenceOps.dpoOracleSql(
      qualityOracleSql(TextOps.TrainedQualityWeights), 199, "0.05"),

    "q146_dsir_weights" -> (DsirOps.oracleSql("documents", "doc_id", "text",
      "doc_id % 7 = 0")
      .replaceFirst("SELECT d.doc_id AS id", "SELECT d.doc_id AS doc_id")),
    "q149_token_budget" -> SelectionOps.tokenBudgetOracleSql("documents",
      "doc_id", "text", "source", budget = 5000L,
      qualityOracleSql(TextOps.TrainedQualityWeights)),
    "q181_calibration" ->
      (s"""WITH q AS (${qualityOracleSql(TextOps.TrainedQualityWeights)}),
        |docs0 AS (SELECT doc_id, text AS t FROM documents),
        |""".stripMargin + rulesOracleBody("docs0") +
        """,
        |j AS (SELECT q.doc_id,
        |   least(CAST(floor(quality * 10) AS INTEGER), 9) AS bucket,
        |   quality, pr.passes AS pos
        | FROM q JOIN pr USING (doc_id))
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(pos) AS BIGINT) AS n_pos,
        | round(avg(quality), 6) AS avg_score,
        | round(sum(pos) * 1.0::DOUBLE / count(*), 6) AS frac_pos
        |FROM j GROUP BY bucket""".stripMargin),
    "q182_scorer_auc" ->
      (s"""WITH q AS (${qualityOracleSql(TextOps.TrainedQualityWeights)}),
        |docs0 AS (SELECT doc_id, text AS t FROM documents),
        |""".stripMargin + rulesOracleBody("docs0") +
        """,
        |j AS (SELECT quality, pr.passes AS pos
        | FROM q JOIN pr USING (doc_id)),
        |g AS (SELECT quality, count(*) AS cnt, sum(pos) AS npos
        | FROM j GROUP BY quality),
        |m AS (SELECT *,
        |   coalesce(sum(cnt) OVER (ORDER BY quality
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        | FROM g),
        |mm AS (SELECT *, below + (cnt + 1) / 2.0 AS midrank FROM m),
        |a AS (SELECT sum(npos) AS p, sum(cnt) - sum(npos) AS nn,
        |   sum(npos * midrank) AS spr FROM mm)
        |SELECT CAST(p AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
        | round((spr - p * (p + 1) / 2.0) / (p * 1.0::DOUBLE * nn), 6) AS auc
        |FROM a""".stripMargin),
    "q183_langid_confusion" ->
      s"""WITH base AS ($langNgramOracleSql)
        |SELECT d.lang AS actual, b.lang_pred AS predicted,
        | CAST(count(*) AS BIGINT) AS n
        |FROM documents d JOIN base b USING (doc_id)
        |GROUP BY 1, 2""".stripMargin,
    "q176_l_diversity" ->
      """SELECT source, CAST(n_chars // 500 AS BIGINT) AS len_bucket,
        | CAST(count(*) AS BIGINT) AS n,
        | CAST(count(DISTINCT lang) AS BIGINT) AS l,
        | count(DISTINCT lang) < 3 AS below_l,
        | count(DISTINCT lang) = 1 AND count(*) > 1 AS homogeneous
        |FROM documents GROUP BY 1, 2""".stripMargin,
    "q175_wordpiece_tokens" -> graft.ops.UnigramOps.greedyOracleSql(
      "documents", "doc_id", "text", graft.ops.UnigramOps.DefaultVocab),
    "q174_unigram_encode" -> graft.ops.UnigramOps.viterbiOracleSql(
      "documents", "doc_id", "text",
      graft.ops.UnigramOps.DefaultUnigramEntries),
    "q172_k_anonymity" ->
      """SELECT source, lang, CAST(n_chars // 500 AS BIGINT) AS len_bucket,
        | CAST(count(*) AS BIGINT) AS n, count(*) < 5 AS at_risk
        |FROM documents GROUP BY 1, 2, 3""".stripMargin,
    // t-closeness: integer cross-mult TVD, absent values folded in
    // closed form (1 - sum of present global mass); the double tree
    // (0.5 * (s1/n/N + (1 - s2/N))) is left-to-right identical to
    // the Spark side
    "q376_t_closeness" ->
      """WITH cells AS (SELECT source, n_chars // 500 AS len_bucket,
        |   lang AS v, count(*) AS ncv FROM documents
        |   WHERE lang IS NOT NULL GROUP BY 1, 2, 3),
        |gl AS (SELECT v, sum(ncv) AS nv FROM cells GROUP BY v),
        |tot AS (SELECT CAST(sum(nv) AS BIGINT) AS nn FROM gl),
        |j AS (SELECT c.source, c.len_bucket, c.ncv, g.nv,
        |   sum(c.ncv) OVER (PARTITION BY c.source, c.len_bucket) AS nc
        |  FROM cells c JOIN gl g USING (v)),
        |per AS (SELECT source, len_bucket, max(nc) AS n,
        |   sum(abs(CAST(ncv AS DECIMAL(38,0)) * (SELECT nn FROM tot)
        |     - CAST(nv AS DECIMAL(38,0)) * nc)) AS s1,
        |   sum(nv) AS s2
        |  FROM j GROUP BY 1, 2)
        |SELECT source, CAST(len_bucket AS BIGINT) AS len_bucket,
        | CAST(n AS BIGINT) AS n,
        | round(0.5 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
        |     / CAST((SELECT nn FROM tot) AS DOUBLE)
        |   + (1.0 - CAST(s2 AS DOUBLE)
        |     / CAST((SELECT nn FROM tot) AS DOUBLE))), 6) AS tvd,
        | round(0.5 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
        |     / CAST((SELECT nn FROM tot) AS DOUBLE)
        |   + (1.0 - CAST(s2 AS DOUBLE)
        |     / CAST((SELECT nn FROM tot) AS DOUBLE))), 6) > 0.2 AS above_t
        |FROM per""".stripMargin,
    "q162_sft_masks" -> graft.ops.PackOps.sftTokenRowsOracleSql(
      "documents", "doc_id", "text")
      .replaceFirst("SELECT id, CAST\\(pos AS INT\\)",
        "SELECT id AS doc_id, CAST(pos AS INT)"),
    "q163_token_offsets" -> graft.ops.PackOps.tokenOffsetsOracleSql(
      "documents", "doc_id", "text", "source")
      .replaceFirst("SELECT l.id,", "SELECT l.id AS doc_id,"),
    "q161_distinct_n" -> TextOps.distinctNOracleSql("documents", "source", "text"),
    "q157_scorer_kappa" -> ProfileOps.cohenKappaOracleSql(
      "WITH plain AS (SELECT doc_id, text AS t FROM documents),\n" +
        rulesOracleBody("plain") +
        "SELECT doc_id AS id, passes = 1 AS flag FROM pr",
      s"SELECT doc_id AS id, quality > 0.5 AS flag FROM (\n" +
        s"${qualityOracleSql(TextOps.TrainedQualityWeights)}) q"),
    "q154_vocab_coverage" -> TextOps.vocabCoverageOracleSql("documents", "text"),
    "q128_domain_mixture" -> SampleOps.temperatureWeightsOracleSql(
      "documents", "source", "text", alpha = 0.3),
    "q389_excess_loss_mixture" -> SampleOps.excessLossWeightsOracleSql(
      "documents", "source", "text", eta = 0.5),
    "q402_distinctive_terms" -> TextOps.distinctiveTermsOracleSql(
      "documents", "source", "text"),
    "q129_zipf_fit" -> ProfileOps.zipfOracleSql("documents", "text"),
    "q134_passage_windows" ->
      """WITH s0 AS (SELECT doc_id,
        |  list_filter(list_transform(string_split_regex(
        |    replace(text, ' value', '. value'), '\. '),
        |    x -> trim(x)), x -> x <> '') AS sents
        | FROM documents),
        |s1 AS (SELECT doc_id, sents,
        |  list_transform(sents, s -> CAST(len(list_filter(
        |    string_split_regex(lower(s), '[ \t\n\f\r]+'), x -> x <> '')) AS BIGINT)) AS tc
        | FROM s0 WHERE len(sents) > 0),
        |s2 AS (SELECT doc_id, sents,
        |  list_transform(generate_series(1, len(sents)), i ->
        |    CAST(floor(coalesce(list_sum(tc[1:i-1]), 0) / 40) AS BIGINT)) AS pid
        | FROM s1),
        |px AS (SELECT doc_id, sents, pid,
        |  unnest(generate_series(0, pid[len(pid)])) AS p FROM s2),
        |sel AS (SELECT doc_id, p AS passage_id,
        |  list_transform(list_filter(generate_series(1, len(sents)),
        |    i -> pid[i] = p), i -> sents[i]) AS sel
        | FROM px)
        |SELECT doc_id, passage_id,
        | CAST(len(sel) AS INTEGER) AS n_sentences,
        | CAST(len(list_filter(string_split_regex(
        |   lower(array_to_string(sel, '. ')), '[ \t\n\f\r]+'), x -> x <> ''))
        |   AS INTEGER) AS n_tokens,
        | md5(array_to_string(sel, '. ')) AS passage_md5
        |FROM sel WHERE len(sel) > 0""".stripMargin,
    "q133_epoch_budget" -> SampleOps.epochBudgetOracleSql(
      "documents", "source", "text", alpha = 0.3,
      budgetTokens = 105000L, maxEpochs = 4.0),
    "q130_bpe_fertility" ->
      s"""$bpeCteSql,
         |cnt AS (SELECT doc_id, CAST(sum(len(s)) AS BIGINT) AS nb
         |        FROM fin GROUP BY doc_id),
         |base AS (SELECT doc_id, lang, length(text) AS nc,
         |  len(list_filter(string_split_regex(lower(text), '[ \\t\\n\\f\\r]+'),
         |      x -> x <> '')) AS nw
         | FROM documents),
         |j AS (SELECT lang, nc, nw, coalesce(nb, 0) AS nb
         |      FROM base LEFT JOIN cnt USING (doc_id))
         |SELECT lang, count(*) AS n_docs,
         | CAST(sum(nc) AS BIGINT) AS sum_chars,
         | CAST(sum(nw) AS BIGINT) AS sum_words,
         | CAST(sum(nb) AS BIGINT) AS sum_bpe,
         | round(CAST(sum(nc) AS DOUBLE) / sum(nb), 4) AS chars_per_token,
         | round(CAST(sum(nb) AS DOUBLE) / sum(nw), 4) AS tokens_per_word
         |FROM j GROUP BY lang""".stripMargin,
    "q132_pack_efficiency" ->
      s"""$bpeCteSql,
         |cnt0 AS (SELECT doc_id, CAST(sum(len(s)) AS BIGINT) AS nb
         |         FROM fin GROUP BY doc_id),
         |cnt AS (SELECT coalesce(nb, 0) AS n
         |        FROM documents d LEFT JOIN cnt0 USING (doc_id)),
         |l AS (SELECT unnest([CAST(32 AS BIGINT), CAST(64 AS BIGINT),
         |                     CAST(128 AS BIGINT)]) AS seq_len),
         |x AS (SELECT seq_len, n, least(n, seq_len) AS kept FROM cnt, l),
         |g AS (SELECT seq_len, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN n > seq_len THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated,
         |  CAST(sum(greatest(n - seq_len, 0)) AS BIGINT) AS trunc_loss_tokens,
         |  CAST(sum(seq_len - kept) AS BIGINT) AS pad_waste_tokens,
         |  CAST(sum(kept) AS BIGINT) AS kept_tokens
         | FROM x GROUP BY seq_len)
         |SELECT seq_len, n_docs, n_truncated, trunc_loss_tokens,
         | pad_waste_tokens,
         | (kept_tokens + seq_len - 1) // seq_len AS n_packed_seqs,
         | round(CAST(kept_tokens AS DOUBLE) / (n_docs * seq_len), 4)
         |   AS util_padded,
         | round(CAST(kept_tokens AS DOUBLE)
         |   / (((kept_tokens + seq_len - 1) // seq_len) * seq_len), 4)
         |   AS util_packed
         |FROM g""".stripMargin,
    "q142_source_jsd" ->
      ProfileOps.tokenDistJsdOracleSql("documents", "text", "source"),
    "q145_novelty_vs_ref" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(text), '[ \t\n\f\r]+') AS w
        | FROM documents),
        |g AS (SELECT doc_id, CASE WHEN len(w) >= 3
        |  THEN list_distinct(list_transform(generate_series(1, len(w) - 2),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
        |  ELSE [] END AS gl FROM w),
        |refset AS (SELECT DISTINCT unnest(gl) AS gram FROM g
        |           WHERE doc_id % 2 = 0),
        |e AS (SELECT doc_id, len(gl) AS n_grams, unnest(gl) AS gram
        |      FROM g WHERE doc_id % 2 = 1),
        |p AS (SELECT e.doc_id, any_value(e.n_grams) AS n_grams,
        |  sum(CASE WHEN r.gram IS NULL THEN 1 ELSE 0 END) AS n_novel
        | FROM e LEFT JOIN refset r ON e.gram = r.gram GROUP BY e.doc_id)
        |SELECT d.doc_id,
        | CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
        | CAST(coalesce(p.n_novel, 0) AS BIGINT) AS n_novel,
        | CASE WHEN p.n_grams > 0 THEN round(p.n_novel * 1.0 / p.n_grams, 5)
        |   END AS novelty
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
        |LEFT JOIN p ON d.doc_id = p.doc_id""".stripMargin,
    "q143_source_quality" ->
      s"""SELECT d.source, count(*) AS n_docs,
         | round(quantile_cont(q.quality, 0.1), 5) AS p10,
         | round(quantile_cont(q.quality, 0.5), 5) AS p50,
         | round(quantile_cont(q.quality, 0.9), 5) AS p90
         |FROM (${qualityOracleSql(TextOps.TrainedQualityWeights)}) q
         |JOIN documents d USING (doc_id)
         |GROUP BY d.source""".stripMargin,
    "q135_kn3_model" -> (LmOps.kn3OracleWith("d.lang = 'en'") +
      """
        |SELECT a, b, c, c_abc,
        | round(greatest(CAST(c_abc AS DOUBLE) - 0.75, 0.0) / c_ab
        |  + 0.75 * n1p_ab / c_ab *
        |   (greatest(CAST(nbc AS DOUBLE) - 0.75, 0.0) / n_b_dot
        |    + 0.75 * n1p_b / n_b_dot
        |      * (CAST(n_dot_c + 1 AS DOUBLE) / (b2 + v + 1))), 6) AS p_kn3
        |FROM ct JOIN ctx USING (a, b) JOIN tbc USING (b, c)
        |     JOIN mid USING (b) JOIN uni USING (c), scalars""".stripMargin),
    "q136_kn3_ppl" -> (LmOps.kn3OracleWith("d.lang = 'en'") +
      """,
        |ttk AS (SELECT doc_id AS id, list_filter(string_split_regex(lower(
        |  CASE WHEN doc_id % 31 = 0 THEN text || ' zzq zzq zzq' ELSE text END),
        |  '[ \t\n\f\r]+'), x -> x <> '') AS t FROM documents),
        |tpos AS (SELECT id, unnest(generate_series(1, len(t) - 2)) AS i, t
        |         FROM ttk WHERE len(t) >= 3),
        |tg AS (SELECT id, t[i] AS a, t[i+1] AS b, t[i+2] AS c FROM tpos),
        |sc AS (SELECT id, count(*) AS n_trigrams,
        |  CAST(sum(CASE WHEN ct.c_abc IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unseen,
        |  round(avg(-ln(
        |    CASE WHEN ctx.c_ab IS NULL THEN
        |      CASE WHEN mid.n_b_dot IS NULL
        |        THEN CAST(coalesce(uni.n_dot_c, 0) + 1 AS DOUBLE) / (b2 + v + 1)
        |        ELSE greatest(CAST(coalesce(tbc.nbc, 0) AS DOUBLE) - 0.75, 0.0) / n_b_dot
        |          + 0.75 * n1p_b / n_b_dot
        |            * (CAST(coalesce(uni.n_dot_c, 0) + 1 AS DOUBLE) / (b2 + v + 1))
        |      END
        |    ELSE greatest(CAST(coalesce(ct.c_abc, 0) AS DOUBLE) - 0.75, 0.0) / c_ab
        |      + 0.75 * n1p_ab / c_ab *
        |      (CASE WHEN mid.n_b_dot IS NULL
        |        THEN CAST(coalesce(uni.n_dot_c, 0) + 1 AS DOUBLE) / (b2 + v + 1)
        |        ELSE greatest(CAST(coalesce(tbc.nbc, 0) AS DOUBLE) - 0.75, 0.0) / n_b_dot
        |          + 0.75 * n1p_b / n_b_dot
        |            * (CAST(coalesce(uni.n_dot_c, 0) + 1 AS DOUBLE) / (b2 + v + 1))
        |      END)
        |    END)), 5) AS kn3_logppl
        | FROM tg LEFT JOIN ct USING (a, b, c) LEFT JOIN ctx USING (a, b)
        |      LEFT JOIN tbc USING (b, c) LEFT JOIN mid USING (b)
        |      LEFT JOIN uni USING (c), scalars
        | GROUP BY id)
        |SELECT d.doc_id, coalesce(s.n_trigrams, 0) AS n_trigrams,
        | coalesce(s.n_unseen, 0) AS n_unseen, s.kn3_logppl
        |FROM documents d LEFT JOIN sc s ON d.doc_id = s.id""".stripMargin),
    "q125_kn_model" -> (LmOps.knOracleWith("d.lang = 'en'") +
      """
        |SELECT a, b, c_ab,
        | round(greatest(CAST(c_ab AS DOUBLE) - 0.75, 0.0) / c_a
        |   + 0.75 * n1p_fwd / c_a
        |     * (CAST(n1p_back + 1 AS DOUBLE) / (bt + vc + 1)), 6) AS p_kn
        |FROM cab JOIN heads USING (a) JOIN conts USING (b), scalars""".stripMargin),
    "q126_kn_ppl" -> (LmOps.knOracleWith("d.lang = 'en'") +
      """,
        |tpos AS (SELECT id, unnest(generate_series(1, len(t) - 1)) AS i, t
        |         FROM tk WHERE len(t) >= 2),
        |tbg AS (SELECT id, t[i] AS a, t[i+1] AS b FROM tpos),
        |sc AS (SELECT id, count(*) AS n_bigrams,
        |  CAST(sum(CASE WHEN cab.c_ab IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unseen,
        |  round(avg(-ln(CASE WHEN heads.c_a IS NULL
        |    THEN CAST(coalesce(conts.n1p_back, 0) + 1 AS DOUBLE) / (bt + vc + 1)
        |    ELSE greatest(CAST(coalesce(cab.c_ab, 0) AS DOUBLE) - 0.75, 0.0) / c_a
        |      + 0.75 * n1p_fwd / c_a
        |        * (CAST(coalesce(conts.n1p_back, 0) + 1 AS DOUBLE) / (bt + vc + 1))
        |    END)), 5) AS kn_logppl
        | FROM tbg LEFT JOIN cab USING (a, b) LEFT JOIN heads USING (a)
        |      LEFT JOIN conts USING (b), scalars
        | GROUP BY id)
        |SELECT d.doc_id, coalesce(s.n_bigrams, 0) AS n_bigrams,
        | coalesce(s.n_unseen, 0) AS n_unseen, s.kn_logppl
        |FROM documents d LEFT JOIN sc s ON d.doc_id = s.id""".stripMargin),
    "q121_weighted_sample" ->
      """SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight
        |FROM (SELECT doc_id, n_chars,
        |  ln((('0x' || substr(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT + 1)
        |     / 4503599627370497.0) / n_chars AS k
        | FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)
        |ORDER BY k DESC, doc_id LIMIT 50""".stripMargin,
    "q119_span_mojibake" ->
      """WITH c AS (SELECT doc_id,
        | CASE WHEN doc_id % 6 = 0 THEN text || ' 東京タワー cafÃ© corner'
        |      WHEN doc_id % 25 = 0 THEN text || ' 移動 SÃO PAULO â€”dash'
        |      ELSE text END AS t,
        | CASE WHEN doc_id % 6 = 0 THEN text || ' 東京タワー café corner'
        |      WHEN doc_id % 25 = 0 THEN text || ' 移動 SÃO PAULO â€”dash'
        |      ELSE text END AS rep
        | FROM documents)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(t, '(Ã.|â€.)')) AS BIGINT) AS n_moji,
        | CAST(rep <> t AS INT) AS changed,
        | md5(rep) AS repaired_md5
        |FROM c""".stripMargin,
    "q116_gram_novelty" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(text), '[ \t\n\f\r]+') AS w
        | FROM documents),
        |g AS (SELECT doc_id, CASE WHEN len(w) >= 3
        |  THEN list_distinct(list_transform(generate_series(1, len(w) - 2),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
        |  ELSE [] END AS gl FROM w),
        |e AS (SELECT doc_id, len(gl) AS n_grams, unnest(gl) AS gram FROM g),
        |f AS (SELECT gram, count(*) AS df FROM e GROUP BY gram),
        |p AS (SELECT e.doc_id, any_value(e.n_grams) AS n_grams,
        |  sum(CASE WHEN f.df = 1 THEN 1 ELSE 0 END) AS n_novel,
        |  max(f.df) AS max_df
        | FROM e JOIN f USING (gram) GROUP BY e.doc_id)
        |SELECT d.doc_id,
        | CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
        | CAST(coalesce(p.n_novel, 0) AS BIGINT) AS n_novel,
        | CAST(coalesce(p.max_df, 0) AS BIGINT) AS max_df,
        | CASE WHEN p.n_grams > 0 THEN round(p.n_novel * 1.0 / p.n_grams, 5)
        |   END AS novelty
        |FROM documents d LEFT JOIN p ON d.doc_id = p.doc_id""".stripMargin,
    "q117_script_profile" ->
      """WITH c AS (SELECT doc_id,
        | CASE WHEN doc_id % 5 = 0 THEN text || ' Привет мир'
        |      WHEN doc_id % 7 = 0 THEN text || ' こんにちは世界'
        |      WHEN doc_id % 11 = 0 THEN text || ' مرحبا بالعالم'
        |      WHEN doc_id % 13 = 0 THEN text || ' 안녕하세요'
        |      WHEN doc_id % 17 = 0 THEN text || ' Γειά σου κόσμε'
        |      WHEN doc_id % 19 = 0 THEN text || ' नमस्ते दुनिया'
        |      ELSE text END AS t FROM documents),
        |n AS (SELECT doc_id, t,
        |  greatest(length(regexp_replace(t, '[ \t\n\f\r]', '', 'g')), 1) AS nc,
        |  length(regexp_replace(t, '[ \t\n\f\r]', '', 'g')) AS n_chars
        | FROM c)
        |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
        | round(len(regexp_extract_all(t, '[A-Za-z]')) * 1.0 / nc, 5) AS latin_frac,
        | round(len(regexp_extract_all(t, '[\x{0400}-\x{04FF}]')) * 1.0 / nc, 5) AS cyrillic_frac,
        | round(len(regexp_extract_all(t, '[\x{0370}-\x{03FF}]')) * 1.0 / nc, 5) AS greek_frac,
        | round(len(regexp_extract_all(t, '[\x{0600}-\x{06FF}]')) * 1.0 / nc, 5) AS arabic_frac,
        | round(len(regexp_extract_all(t, '[\x{0900}-\x{097F}]')) * 1.0 / nc, 5) AS devanagari_frac,
        | round(len(regexp_extract_all(t, '[\x{4E00}-\x{9FFF}]')) * 1.0 / nc, 5) AS cjk_frac,
        | round(len(regexp_extract_all(t, '[\x{3040}-\x{30FF}]')) * 1.0 / nc, 5) AS kana_frac,
        | round(len(regexp_extract_all(t, '[\x{AC00}-\x{D7AF}]')) * 1.0 / nc, 5) AS hangul_frac
        |FROM n""".stripMargin,
    "q114_fix_mojibake" ->
      """WITH c AS (SELECT doc_id,
        | CASE WHEN doc_id % 7 = 0 THEN replace(text, 'e', 'Ã©')
        |      WHEN doc_id % 11 = 0 THEN text || ' â€œquotedâ€¦'
        |      WHEN doc_id % 13 = 0 THEN text || ' broken â€' || chr(65533) || ' end'
        |      ELSE text END AS t,
        | CASE WHEN doc_id % 7 = 0 THEN replace(text, 'e', 'é')
        |      WHEN doc_id % 11 = 0 THEN text || ' “quoted…'
        |      WHEN doc_id % 13 = 0 THEN text || ' broken â€' || chr(65533) || ' end'
        |      ELSE text END AS rep
        | FROM documents)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(t, '(Ã.|â€.)')) AS BIGINT) AS n_moji,
        | CAST(rep <> t AS INT) AS changed,
        | md5(rep) AS repaired_md5
        |FROM c""".stripMargin,
    "q112_quality_rules" ->
      ("""WITH inj AS (SELECT doc_id,
        | CASE WHEN doc_id % 29 = 0 THEN 'tiny doc'
        |  ELSE text
        |   || CASE WHEN doc_id % 13 = 0
        |        THEN chr(10) || repeat('- bullet line' || chr(10), 24)
        |        ELSE '' END
        |   || CASE WHEN doc_id % 17 = 0 THEN ' lorem ipsum {' ELSE '' END
        |   || CASE WHEN doc_id % 19 = 0 THEN chr(10) || 'read more...'
        |        || chr(10) || 'see details…' || chr(10) || 'more...'
        |        ELSE '' END
        |   || CASE WHEN doc_id % 23 = 0 THEN repeat(' #', 40) ELSE '' END
        |   || CASE WHEN doc_id % 31 = 0 THEN repeat(' 4242', 30) ELSE '' END
        |   || CASE WHEN doc_id % 37 = 0
        |        THEN repeat(' pneumonoultramicroscopicsilicovolcanoconiosis', 25)
        |        ELSE '' END
        |  END AS t FROM documents),
        |""".stripMargin + rulesOracleBody("inj") + "\nSELECT * FROM pr"),
    // weight literals are ::DOUBLE-cast: bare decimal literals are
    // DECIMAL in DuckDB and would change the arithmetic vs Spark
    "q79_quality_score" -> qualityOracleSql(TextOps.QualityWeights()),
    // same scorer, IRLS-trained frozen weights (QualityFit)
    "q95_trained_quality" -> qualityOracleSql(TextOps.TrainedQualityWeights),
    "q80_bpe_encode" ->
      s"""$bpeCteSql
         |SELECT d.doc_id, coalesce(a.n_bpe_tokens, 0) AS n_bpe_tokens,
         |  md5(coalesce(a.toks, '')) AS bpe_md5
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin,
    "q85_pack_bpe" ->
      s"""$bpeCteSql,
         |b AS (SELECT d.doc_id, d.doc_id % 8 AS bucket,
         |  CAST(coalesce(a.n_bpe_tokens, 0) AS BIGINT) AS n_tokens
         | FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id),
         |st AS (SELECT bucket, doc_id AS id, n_tokens,
         |  CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id)
         |    - n_tokens AS BIGINT) AS start_tok FROM b)
         |SELECT bucket, id, n_tokens, start_tok,
         | CAST(start_tok // 128 AS BIGINT) AS seq_first,
         | CAST((start_tok + greatest(n_tokens, 1) - 1) // 128 AS BIGINT)
         |   AS seq_last,
         | CAST((start_tok + greatest(n_tokens, 1) - 1) // 128
         |   - start_tok // 128 + 1 AS BIGINT) AS n_seqs
         |FROM st""".stripMargin,
    "q78_adaptive_trim" ->
      """WITH cuts AS (SELECT source,
        |  quantile_cont(n_chars, 0.1) AS lo, quantile_cont(n_chars, 0.9) AS hi
        | FROM documents GROUP BY source)
        |SELECT doc_id, d.source, n_chars
        |FROM documents d JOIN cuts c ON d.source = c.source
        |WHERE n_chars >= lo AND n_chars <= hi""".stripMargin,
    "q77_heavy_hitters" ->
      """WITH tk AS (SELECT
        |  unnest(list_filter(string_split_regex(lower(text), '[ \t\n\f\r]+'), x -> x <> '')) AS tok
        | FROM documents)
        |SELECT tok, count(*) AS est FROM tk GROUP BY tok""".stripMargin,
    "q91_dataset_report" ->
      s"""$bpeCteSql,
         |pd AS (SELECT d.source,
         |  coalesce(CAST(len(regexp_extract_all(d.text, '[^ \\t\\n\\f\\r]+'))
         |    AS BIGINT), 0) AS n_tok,
         |  CAST(coalesce(a.n_bpe_tokens, 0) AS BIGINT) AS n_bpe
         | FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id),
         |bysrc AS (SELECT source, count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |  CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens
         | FROM pd GROUP BY source),
         |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS t_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS t_tokens FROM bysrc)
         |SELECT source, CAST(n_docs AS BIGINT) AS n_docs, n_tokens,
         |  n_bpe_tokens,
         |  round(CAST(n_docs AS DOUBLE) / t_docs, 5) AS doc_share,
         |  round(CAST(n_tokens AS DOUBLE) / t_tokens, 5) AS token_share
         |FROM bysrc, tot""".stripMargin,
    "q90_perplexity" ->
      """WITH tk AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '[ \t\n\f\r]+'), x -> x <> '') AS t
        | FROM documents),
        |pos AS (SELECT doc_id, unnest(generate_series(1, len(t) - 1)) AS i, t
        |        FROM tk WHERE len(t) >= 2),
        |bg AS (SELECT doc_id, t[i] AS a, t[i+1] AS b FROM pos),
        |uni AS (SELECT a, count(*) AS c_a FROM bg GROUP BY a),
        |big AS (SELECT a, b, count(*) AS c_ab FROM bg GROUP BY a, b),
        |vv AS (SELECT count(DISTINCT tok) AS v
        |       FROM (SELECT unnest(t) AS tok FROM tk)),
        |sc AS (SELECT doc_id,
        |  round(avg(-ln(CAST(c_ab + 1 AS DOUBLE) / (c_a + v))), 5) AS logppl
        | FROM bg JOIN big USING (a, b) JOIN uni USING (a), vv
        | GROUP BY doc_id)
        |SELECT d.doc_id, s.logppl
        |FROM documents d LEFT JOIN sc s ON d.doc_id = s.doc_id""".stripMargin,
    "q93_tfidf" ->
      """WITH tk AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '[ \t\n\f\r]+'), x -> x <> '') AS t
        | FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS tok FROM tk),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1, 2),
        |nd AS (SELECT count(*) AS n_docs FROM documents),
        |dfq AS (SELECT tok, count(*) AS df FROM tf
        |        GROUP BY tok HAVING count(*) >= 2)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
        |  round(sum(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0)), 5) AS sum_w,
        |  round(max(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0)), 5) AS max_w
        |FROM tf JOIN dfq USING (tok), nd
        |GROUP BY doc_id""".stripMargin,
    "q88_token_ids" ->
      s"""$bpeCteSql,
         |ft AS (SELECT doc_id, wi, unnest(generate_series(1, len(s))) AS ti, s
         |       FROM fin),
         |tok AS (SELECT doc_id, wi, ti, s[ti] AS tok FROM ft),
         |voc AS (SELECT tok, dense_rank() OVER (ORDER BY tok) AS token_id
         |        FROM (SELECT DISTINCT tok FROM tok)),
         |ids AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bpe_tokens,
         |  md5(string_agg(CAST(token_id AS VARCHAR), ','
         |    ORDER BY wi, ti)) AS ids_md5
         | FROM tok JOIN voc USING (tok) GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(i.n_bpe_tokens, 0) AS n_bpe_tokens,
         |  coalesce(i.ids_md5, md5('')) AS ids_md5
         |FROM documents d LEFT JOIN ids i ON d.doc_id = i.doc_id""".stripMargin,
    "q87_text_normalize" ->
      """WITH n AS (SELECT doc_id,
        |  trim(regexp_replace(lower(nfc_normalize(coalesce(text, ''))),
        |    '[ \t\n\f\r]+', ' ', 'g')) AS norm FROM documents)
        |SELECT doc_id, md5(norm) AS norm_md5,
        |  CAST(length(norm) AS INTEGER) AS n_norm_chars
        |FROM n""".stripMargin,
    "q72_bm25" ->
      """WITH tk AS (SELECT doc_id AS id,
        |  len(list_filter(string_split_regex(lower(text), '[ \t\n\f\r]+'), x -> x <> '')) AS dl,
        |  unnest(list_filter(string_split_regex(lower(text), '[ \t\n\f\r]+'), x -> x <> '')) AS tok
        | FROM documents),
        |tf AS (SELECT id, tok, max(dl) AS dl, count(*) AS tf FROM tk
        |       WHERE tok IN ('spark', 'join', 'merge') GROUP BY id, tok),
        |dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |st AS (SELECT count(*) AS n_docs,
        |       avg(len(list_filter(string_split_regex(lower(text), '[ \t\n\f\r]+'), x -> x <> ''))) AS avgdl
        |       FROM documents)
        |SELECT id AS doc_id, round(sum(
        |  ln(1 + (n_docs - df + 0.5) / (df + 0.5))
        |    * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 5) AS bm25
        |FROM tf JOIN dfq ON tf.tok = dfq.tok, st
        |GROUP BY id""".stripMargin,
    "q74_chunk_tokens" ->
      """WITH w AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '[ \t\n\f\r]+'), x -> x <> '') AS w
        | FROM documents),
        |p AS (SELECT doc_id, w, len(w) AS n,
        |      greatest((len(w) - 16 + 47) // 48, 1) AS nc FROM w),
        |c AS (SELECT doc_id, unnest(generate_series(0, nc - 1)) AS ci, w, n
        |      FROM p)
        |SELECT doc_id, CAST(ci AS INTEGER) AS chunk_idx,
        | CAST(len(w[ci*48+1 : least(ci*48+64, n)]) AS INTEGER) AS n_chunk_tokens,
        | md5(array_to_string(w[ci*48+1 : least(ci*48+64, n)], ' ')) AS chunk_md5
        |FROM c""".stripMargin,
    "q75_pack_sequences" ->
      """WITH b AS (SELECT doc_id, doc_id % 8 AS bucket,
        |  coalesce(CAST(len(regexp_extract_all(text, '[^ \t\n\f\r]+'))
        |    AS BIGINT), 0) AS n_tokens
        | FROM documents),
        |s AS (SELECT bucket, doc_id AS id, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id)
        |    - n_tokens AS BIGINT) AS start_tok FROM b)
        |SELECT bucket, id, n_tokens, start_tok,
        | CAST(start_tok // 256 AS BIGINT) AS seq_first,
        | CAST((start_tok + greatest(n_tokens, 1) - 1) // 256 AS BIGINT)
        |   AS seq_last,
        | CAST((start_tok + greatest(n_tokens, 1) - 1) // 256
        |   - start_tok // 256 + 1 AS BIGINT) AS n_seqs
        |FROM s""".stripMargin,
    "q31_quality_metrics" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '\S+')) AS INTEGER) AS n_tokens,
        | CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS INTEGER) AS n_punct,
        | CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|to|and)\b')) AS INTEGER) AS n_stop,
        | round(len(regexp_extract_all(text, '[.,;:!?]')) * 1.0
        |       / greatest(length(text), 1), 5) AS punct_ratio,
        | round(len(regexp_extract_all(lower(text), '\b(the|a|of|to|and)\b')) * 1.0
        |       / greatest(len(regexp_extract_all(text, '\S+')), 1), 5) AS stop_ratio,
        | round(length(regexp_replace(text, '[ \t\n\f\r]', '', 'g')) * 1.0
        |       / greatest(len(regexp_extract_all(text, '\S+')), 1), 4) AS avg_token_len
        |FROM documents""".stripMargin,
    "q32_lang_predict" ->
      """SELECT doc_id, s_en, s_de, s_fr, s_es,
        | CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
        |      WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
        |      WHEN s_fr >= s_es THEN 'fr'
        |      ELSE 'es' END AS lang_pred
        |FROM (SELECT doc_id,
        |  CAST(len(regexp_extract_all(lower(text), '\b(the|and|of)\b')) AS INTEGER) AS s_en,
        |  CAST(len(regexp_extract_all(lower(text), '\b(der|die|und)\b')) AS INTEGER) AS s_de,
        |  CAST(len(regexp_extract_all(lower(text), '\b(le|la|et)\b')) AS INTEGER) AS s_fr,
        |  CAST(len(regexp_extract_all(lower(text), '\b(el|los|y)\b')) AS INTEGER) AS s_es
        | FROM documents) t""".stripMargin,
    "q96_lang_ngram" -> langNgramOracleSql,
    "q102_lang_profile_table" -> langWideOracleSql,

    "q386_line_boilerplate" ->
      """WITH pages AS (SELECT doc_id, source AS grp,
        |  concat_ws(chr(10),
        |    'Home | About | Contact',
        |    'Source ' || source || ' News',
        |    text,
        |    CASE WHEN doc_id % 7 = 0 THEN 'Subscribe to our newsletter!' END,
        |    'doc ' || CAST(doc_id AS VARCHAR),
        |    '(c) 2026 ' || source) AS page
        | FROM documents),
        |lines AS (SELECT doc_id, grp, ws[i] AS line, i AS pos,
        |  trim(ws[i]) AS lk
        | FROM (SELECT doc_id, grp, string_split(page, chr(10)) AS ws
        |       FROM pages) t,
        |  LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i)),
        |sizes AS (SELECT grp, count(DISTINCT doc_id) AS n_docs
        | FROM pages GROUP BY grp),
        |census AS (SELECT grp, lk, count(DISTINCT doc_id) AS nd
        | FROM lines WHERE lk <> '' GROUP BY grp, lk),
        |dropkeys AS (SELECT c.grp, c.lk
        | FROM census c JOIN sizes s ON c.grp = s.grp
        | WHERE c.nd >= 3 AND c.nd > s.n_docs * 0.5)
        |SELECT l.doc_id,
        | CAST(count(*) FILTER (WHERE d.lk IS NOT NULL) AS BIGINT)
        |   AS n_lines_removed,
        | coalesce(string_agg(l.line, chr(10) ORDER BY l.pos)
        |   FILTER (WHERE d.lk IS NULL), '') AS text_clean
        |FROM lines l LEFT JOIN dropkeys d
        |  ON l.grp = d.grp AND l.lk = d.lk
        |GROUP BY l.doc_id""".stripMargin,
    "q107_html_extract" ->
      """WITH h AS (SELECT doc_id,
        |  '<html><head><title>D' || CAST(doc_id AS VARCHAR) ||
        |  '</title><style>p {color: red;}</style>' ||
        |  '<script>if (1<2) { go(); }</script></head><body><h1>Doc ' ||
        |  CAST(doc_id AS VARCHAR) || '</h1><p>' || text ||
        |  '</p><!-- hidden --><p>&nbsp;Tom &amp; Jerry &lt;3 ' ||
        |  '&quot;quoted&quot; &#39;q&#39;</p></body></html>' AS html
        | FROM documents),
        |e AS (SELECT doc_id,
        |  trim(regexp_replace(
        |    replace(replace(replace(replace(replace(replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(html,
        |              '(?is)<script\b[^>]*>.*?</script\s*>', ' ', 'g'),
        |            '(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g'),
        |          '(?s)<!--.*?-->', ' ', 'g'),
        |        '<[^>]+>', ' ', 'g'),
        |      '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |      '&#39;', ''''), '&amp;', '&'),
        |    '[ \t\n\f\r]+', ' ', 'g')) AS text_clean
        | FROM h)
        |SELECT doc_id, text_clean,
        |  CAST(length(text_clean) AS INTEGER) AS n_chars_clean
        |FROM e""".stripMargin,
    "q33_fingerprint" ->
      """SELECT doc_id,
        | md5(regexp_replace(lower(text), '[ \t\n\f\r]+', '', 'g')) AS fp
        |FROM documents""".stripMargin,
    "q34_bpe_tokens" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text,
        |   '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\f\r]')) AS INTEGER) AS n_bpe
        |FROM documents""".stripMargin,
    "q37_doc_stats" ->
      """SELECT lang, source, count(*) AS n,
        | round(avg(n_chars), 4) AS avg_chars,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang, source""".stripMargin,
    "q58_token_stats" ->
      """WITH tk AS (SELECT doc_id AS id,
        |  unnest(list_filter(string_split_regex(lower(text), '[ \t\n\f\r]+'), x -> x <> '')) AS tok
        | FROM documents),
        |pc AS (SELECT id, tok, count(*) AS c FROM tk GROUP BY 1, 2)
        |SELECT id, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_distinct,
        | CAST(max(c) AS BIGINT) AS top_count,
        | round(max(c) * 1.0 / sum(c), 5) AS top_frac,
        | round(1.0 - count(*) * 1.0 / sum(c), 5) AS dup_frac
        |FROM pc GROUP BY id""".stripMargin,
    "q59_repetition" ->
      """WITH w AS (SELECT doc_id AS id, string_split_regex(lower(text), '[ \t\n\f\r]+') AS w
        | FROM documents),
        |g AS (SELECT id,
        | CASE WHEN len(w) >= 2 THEN list_transform(generate_series(1, len(w) - 1),
        |   i -> w[i] || ' ' || w[i+1]) ELSE [] END AS g2,
        | CASE WHEN len(w) >= 3 THEN list_transform(generate_series(1, len(w) - 2),
        |   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) ELSE [] END AS g3
        | FROM w)
        |SELECT id,
        | CASE WHEN len(g2) > 0
        |   THEN round(1.0 - len(list_distinct(g2)) * 1.0 / len(g2), 5)
        |   ELSE 0.0 END AS dup_2gram_frac,
        | CASE WHEN coalesce(list_sum(list_transform(g2, x -> length(x))), 0) > 0
        |   THEN round(1.0 - list_sum(list_transform(list_distinct(g2), x -> length(x))) * 1.0
        |        / list_sum(list_transform(g2, x -> length(x))), 5)
        |   ELSE 0.0 END AS dup_2gram_char_frac,
        | CASE WHEN len(g3) > 0
        |   THEN round(1.0 - len(list_distinct(g3)) * 1.0 / len(g3), 5)
        |   ELSE 0.0 END AS dup_3gram_frac,
        | CASE WHEN coalesce(list_sum(list_transform(g3, x -> length(x))), 0) > 0
        |   THEN round(1.0 - list_sum(list_transform(list_distinct(g3), x -> length(x))) * 1.0
        |        / list_sum(list_transform(g3, x -> length(x))), 5)
        |   ELSE 0.0 END AS dup_3gram_char_frac
        |FROM g""".stripMargin,
    "q65_vocabulary" ->
      """WITH tk AS (SELECT doc_id,
        |  unnest(list_filter(string_split_regex(lower(text), '[ \t\n\f\r]+'), x -> x <> '')) AS tok
        | FROM documents)
        |SELECT tok, count(*) AS tf, count(DISTINCT doc_id) AS df
        |FROM tk GROUP BY tok
        |ORDER BY tf DESC, tok LIMIT 100""".stripMargin,
    "q64_pii_scrub" ->
      """WITH t AS (SELECT doc_id,
        |  text || ' contact user' || doc_id || '@example.com'
        |    || CASE WHEN doc_id % 3 = 0
        |            THEN ' from 10.0.' || (doc_id % 250) || '.1' ELSE '' END
        |    || CASE WHEN doc_id % 5 = 0 THEN ' call 555-867-5309' ELSE '' END AS t
        | FROM documents)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_email,
        | CAST(len(regexp_extract_all(t, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS INTEGER) AS n_ip,
        | CAST(len(regexp_extract_all(t, '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b')) AS INTEGER) AS n_phone,
        | md5(regexp_replace(regexp_replace(regexp_replace(t,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<PII>', 'g'),
        |   '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<PII>', 'g'),
        |   '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '<PII>', 'g')) AS redacted_md5
        |FROM t""".stripMargin,
  )
}
