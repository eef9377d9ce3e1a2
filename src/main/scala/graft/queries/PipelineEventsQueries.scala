package graft.queries

import graft.Tables
import graft.ops.{BlocklistOps, DedupOps, DsirOps, GraphOps, LmOps, MultimodalOps, PcaOps, PreferenceOps, ProfileOps, RetrievalOps, SampleOps, SelectionOps, SimilarityOps, TextOps, WinnowOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import PipelineShared._

/** event-stream, drift and experimentation queries — split from PipelineQueries (entries verbatim; the
  * aggregate map in PipelineQueries is unchanged).
  */
private[graft] object PipelineEventsQueries {
  val queries: Map[String, Q] = Map(
    // Dense hourly grid + last-observation-carried-forward fill per
    // user (every 5th user keeps the dumped frame bounded; the
    // operator itself is per-key and unbounded).
    "q191_locf_gapfill" -> ((s, d) =>
      graft.ops.TimeSeriesOps.locfGapfill(
        Tables(s, d, "events").filter(col("user_id") % 5 === 0),
        "user_id", "ts", "value")),

    // Same grid with linear interpolation across the gaps — the
    // modeling-grade repair (LOCF's staircase biases trend features).
    "q193_interpolate" -> ((s, d) =>
      graft.ops.TimeSeriesOps.interpolateGaps(
        Tables(s, d, "events").filter(col("user_id") % 5 === 0),
        "user_id", "ts", "value")),

    // OHLC bars per (event_type, hour): open/close by deterministic
    // (t, event_id) order inside ONE map-side-combinable aggregation.
    "q192_ohlc_bars" -> ((s, d) =>
      graft.ops.TimeSeriesOps.ohlcBars(Tables(s, d, "events"),
        "event_type", "ts", "event_id", "value")),

    // Per-stage funnel latency: the q208 kernel applied to each
    // consecutive step pair — where the funnel actually stalls.
    "q238_stage_latency" -> ((s, d) => {
      val e = Tables(s, d, "events")
      Seq("signup" -> "view", "view" -> "click", "click" -> "purchase")
        .map { case (a, b) =>
          graft.ops.EventOps.conversionLatency(e, "ts", "user_id",
              "event_type", a, b, windowDays = 7)
            .select(lit(s"$a->$b").as("stage"), col("n_converted"),
              col("p50_s"), col("p90_s"))
        }.reduce(_ unionByName _)
    }),

    // Cohort LTV matrix: first-event-week cohorts x weeks-since,
    // cumulative purchase revenue per user — retention economics on
    // cents-exact integers; only the (cohort x week) grid windows.
    "q287_cohort_ltv" -> ((s, d) =>
      graft.ops.EventOps.cohortLtv(Tables(s, d, "events"),
        "user_id", "ts", "event_type", "value", revType = "purchase")),

    // EWMA anomaly band over daily mean event value per type —
    // alpha=1/5 integer recurrence, flag when |obs - level| > 30.0;
    // calendar-bounded per-series fold, DuckDB recursive-CTE twin.
    "q289_ewma_band" -> ((s, d) =>
      graft.ops.TimeSeriesOps.ewmaBand(Tables(s, d, "events"),
        "event_type", "ts", "value", aNum = 1, aDen = 5,
        bandMicro = 30000000L)),

    // Delete-one jackknife SE for revenue-per-click by arm — ratio
    // readout with distributed integer-exact loo sums (no collect,
    // no sorted fold; survives a billion users).
    "q290_jackknife_ratio" -> ((s, d) =>
      graft.ops.EventOps.jackknifeRatio(Tables(s, d, "events"),
        "user_id", "event_type", "value", "purchase", "click")),

    // Minimum detectable effect at 80% power / 5% alpha over
    // per-user revenue — the experiment-design readout; pooled
    // variance as ONE exact rational from distributed integer sums.
    "q300_mde_power" -> ((s, d) =>
      graft.ops.EventOps.mdePower(Tables(s, d, "events"),
        "user_id", "event_type", "value", "purchase")),

    // Benjamini–Hochberg + Holm corrections over the per-source KS
    // drift family (q250's statistic, asymptotic p) — which drift
    // alarms survive multiple testing; three windows over the
    // sources frame, never corpus rows.
    "q303_ks_fdr" -> ((s, d) =>
      ProfileOps.ksFdr(Tables(s, d, "documents"), "source", "n_chars")),

    // Exact 1-Wasserstein (earth-mover) drift per source vs rest —
    // mass-weighted companion of KS; decimal-exact numerator over
    // the value grid.
    "q304_wasserstein" -> ((s, d) =>
      ProfileOps.wassersteinAgainstRest(
        Tables(s, d, "documents"), "source", "n_chars")),

    // 2×2 difference-in-differences on per-user purchase revenue
    // (treated = odd users, post = mid-month) — integer-exact cell
    // means on the micro-dollar grid.
    "q305_did" -> ((s, d) =>
      graft.ops.EventOps.didEstimate(Tables(s, d, "events"),
        "user_id", "ts", "event_type", "value", "purchase",
        "2024-01-16 00:00:00")),

    // Offline policy evaluation (IPS + SNIPS) from logged bandit
    // feedback with exact power-of-two importance weights.
    "q306_ips_policy" -> ((s, d) =>
      graft.ops.EventOps.ipsPolicyValue(Tables(s, d, "events"),
        "user_id", "event_type", "value",
        Seq("click", "error", "purchase", "signup", "view"))),

    // Deterministic Poisson bootstrap CI for mean per-user purchase
    // revenue — md5-hex Poisson(1) weights, order-statistic CI on
    // the exact micro grid.
    "q307_poisson_boot" -> ((s, d) =>
      graft.ops.EventOps.poissonBootstrapMean(Tables(s, d, "events"),
        "user_id", "event_type", "value", "purchase")),

    // Randomization test for the treated-vs-control revenue delta:
    // 200 md5-coin reassignments, exact micro-long comparisons.
    "q308_rand_test" -> ((s, d) =>
      graft.ops.EventOps.randomizationTest(Tables(s, d, "events"),
        "user_id", "event_type", "value", "purchase")),

    // Count-min sketch heavy-hitter audit on event users: replayable
    // polynomial hashes, estimate = min of d counters, overestimate
    // vs exact truth for the top 20.
    "q310_cms_heavy" -> ((s, d) =>
      graft.ops.SketchOps.cmsHeavyHitters(Tables(s, d, "events"),
        "user_id", w = 64, k = 20)),

    // Durable CMS store (q310's merge/store half, the q351/q381
    // discipline): counters from 3 content-keyed batch appends,
    // merge-on-read == from-scratch — the oracle IS q310's
    // from-scratch replay, so the hash match proves it cross-engine.
    "q384_cms_store" -> ((s, d) => {
      val store = graft.ops.IndexStore.cmsDemoStorePath(s, d, w = 64)
      graft.ops.SketchOps.cmsHeavyHittersFromSketch(
        Tables(s, d, "events"),
        graft.ops.IndexStore.readCmsSketch(s, store, expectW = 64),
        "user_id", w = 64, k = 20)
    }),

    // Durable quantile-histogram store (the rank-query member of the
    // mergeable-store family beside q381/q384): price quantiles from
    // 3 content-keyed batch appends served merge-on-read, audited
    // against the exact order statistics — est − exact must sit in
    // (0, cell]; the oracle replays from scratch, so the hash match
    // proves batch-merge == from-scratch cross-engine.
    "q390_quantile_store" -> ((s, d) => {
      val cell = 100000000L // $100 cells on the micro grid
      val store = graft.ops.IndexStore.quantHistDemoStorePath(s, d, cell)
      graft.ops.SketchOps.quantileAuditFromHist(
        Tables(s, d, "lineitem"), "l_extendedprice",
        graft.ops.IndexStore.readQuantHist(s, store, expectCellMicro = cell),
        cell, Seq(500000L, 900000L, 990000L))
    }),

    // CMS inner-product join-size estimation (AMS; CM §4.2): the
    // pre-shuffle planning probe — both relation sides sketched
    // independently (d·w counters each), |A ⋈ B| estimated as the
    // min-row counter inner product, never an undercount; audited
    // against the exact per-key count-table sum.
    "q391_cms_join_size" -> ((s, d) => {
      val li = Tables(s, d, "lineitem")
      graft.ops.SketchOps.cmsJoinSize(
        li.where(col("l_quantity") < 25).select(col("l_partkey")),
        "l_partkey",
        li.where(col("l_quantity") >= 25).select(col("l_partkey")),
        "l_partkey", w = 8192)
    }),

    // Nelson-Aalen cumulative hazard over the q272 censored
    // time-to-purchase frame — the additive survival companion.
    "q316_nelson_aalen" -> ((s, d) => {
      val ev = Tables(s, d, "events")
      val subj = ev.groupBy("user_id")
        .agg(min(unix_micros(col("ts"))).as("t0"),
          max(unix_micros(col("ts"))).as("t_last"),
          min(when(col("event_type") === "purchase",
            unix_micros(col("ts")))).as("t_buy"))
        .select(
          (coalesce(col("t_buy"), col("t_last")) - col("t0"))
            .as("span_us"),
          col("t_buy").isNotNull.cast("int").as("ev"))
        .select(expr("span_us div 3600000000").as("t_hours"), col("ev"))
      graft.ops.EventOps.nelsonAalen(subj, "t_hours", "ev")
    }),

    // Wald SPRT sequential conversion monitor per arm — integer
    // micro-grid LLR walk with pre-rounded boundaries, crossing
    // index exact.
    "q317_sprt" -> ((s, d) =>
      graft.ops.EventOps.sprtMonitor(Tables(s, d, "events"),
        "user_id", "ts", "event_id", "event_type", "purchase")),

    // Hellinger drift of each source's length distribution vs rest —
    // the bounded bin-additive companion of PSI/KS/W1.
    "q322_hellinger" -> ((s, d) =>
      ProfileOps.hellingerAgainstRest(Tables(s, d, "documents"),
        "source", expr("n_chars div 256").cast("long"))),

    // Holt level+trend smoothing of daily mean value per event type
    // with the one-step-ahead forecast error — sign-safe micro-grid
    // recurrence, recursive-CTE oracle.
    "q323_holt_trend" -> ((s, d) =>
      graft.ops.TimeSeriesOps.holtTrend(Tables(s, d, "events"),
        "event_type", "ts", "value")),

    // Post-stratified ATE over user-hash strata plus the weighted
    // ALL row — covariate-imbalance-robust experiment readout.
    "q324_poststrat_ate" -> ((s, d) =>
      graft.ops.EventOps.postStratifiedAte(Tables(s, d, "events"),
        "user_id", "event_type", "value", "purchase")),

    // Cochran-Mantel-Haenszel pooled odds ratio across the same
    // strata — Simpson's-paradox-proof association pooling.
    "q325_cmh_or" -> ((s, d) =>
      graft.ops.EventOps.cmhOddsRatio(Tables(s, d, "events"),
        "user_id", "event_type", "purchase")),

    // Doubly-robust (AIPW) off-policy value beside q306's IPS —
    // exact outcome model + power-of-two-weight correction.
    "q327_doubly_robust" -> ((s, d) =>
      graft.ops.EventOps.doublyRobustValue(Tables(s, d, "events"),
        "user_id", "event_type", "value",
        Seq("click", "error", "purchase", "signup", "view"))),

    // Pointer-doubling hierarchy resolution: every user's root and
    // depth in the synthetic parent(u) = u div 2 tree in O(log depth)
    // self-joins — the scale technique a naive per-hop walk can't
    // match; oracle is the sequential recursive walk.
    "q340_tree_resolve" -> ((s, d) => {
      val nodes = Tables(s, d, "events")
        .select(col("user_id").as("node")).distinct()
        .select(col("node"),
          when(col("node") === 0, 0L)
            .otherwise(expr("node div 2")).as("parent"))
      graft.ops.GraphOps.resolveAncestors(nodes, "node", "parent")
    }),

    // Quantile treatment effects at 25/50/75 — which part of the
    // revenue distribution the treatment moved; exact order stats.
    "q333_qte" -> ((s, d) =>
      graft.ops.EventOps.quantileTreatmentEffects(
        Tables(s, d, "events"), "user_id", "event_type", "value",
        "purchase")),

    // Simpson's-paradox detector: per-stratum vs pooled association
    // direction over exact integer cross-products.
    "q334_simpson" -> ((s, d) =>
      graft.ops.EventOps.simpsonDetector(Tables(s, d, "events"),
        "user_id", "event_type", "purchase")),

    // Leakage-safe temporal label builder: 14d feature window, 7d
    // label horizon around a fixed cutoff — the supervised-dataset
    // construction primitive.
    "q335_temporal_labels" -> ((s, d) =>
      graft.ops.EventOps.temporalLabels(Tables(s, d, "events"),
        "user_id", "ts", "event_type", "value", "purchase",
        "2024-01-20 00:00:00", lookbackDays = 14, horizonDays = 7)),

    // Pareto concentration: minimum number of users generating 80%
    // of events — exact crossing solved on the count grid, corpus
    // never sorts.
    "q284_pareto_point" -> ((s, d) =>
      graft.ops.EventOps.paretoPoint(
        Tables(s, d, "events"), "user_id", sharePermille = 800)),

    // Mann-Kendall monotone trend on daily counts per event type —
    // the drift-direction complement of the CUSUM level-shift
    // detector; S and the tie-corrected variance are exact integers.
    "q281_mann_kendall" -> ((s, d) =>
      graft.ops.TimeSeriesOps.mannKendallTrend(
        Tables(s, d, "events"), "event_type", "ts")),

    // CUPED variance-reduced A/B readout: post-period revenue per arm
    // adjusted by the pre-period covariate; reports theta and the
    // rho^2 sensitivity gain. Decimal-exact moments, parity arms.
    "q278_cuped" -> ((s, d) =>
      graft.ops.EventOps.cupedLift(Tables(s, d, "events"),
        "user_id", "ts", "value", splitDate = "2024-01-16 00:00:00")),

    // CUSUM changepoint per event type over hourly counts — the
    // level-shift detector; the scaled statistic is an exact integer
    // so the argmax compares integers.
    "q274_cusum_changepoint" -> ((s, d) =>
      graft.ops.TimeSeriesOps.cusumChangepoint(
        Tables(s, d, "events"), "event_type", "ts")),

    // Seasonal-naive backtest (same hour, previous day) per event
    // type — the baseline any forecaster must beat, as a drift
    // monitor. Exact integer errors, idiv MAE.
    "q275_seasonal_backtest" -> ((s, d) =>
      graft.ops.TimeSeriesOps.seasonalNaiveBacktest(
        Tables(s, d, "events"), "event_type", "ts")),

    // Kaplan–Meier time-to-first-purchase (hours) with right
    // censoring (never-purchasers are censored at their last event,
    // not dropped) — hour-grid windows, ln-sum product.
    "q272_kaplan_meier" -> ((s, d) => {
      val ev = Tables(s, d, "events")
      val subj = ev.groupBy("user_id")
        .agg(min(unix_micros(col("ts"))).as("t0"),
          max(unix_micros(col("ts"))).as("t_last"),
          min(when(col("event_type") === "purchase",
            unix_micros(col("ts")))).as("t_buy"))
        .select(
          (coalesce(col("t_buy"), col("t_last")) - col("t0"))
            .as("span_us"),
          col("t_buy").isNotNull.cast("int").as("ev"))
        .select(expr("span_us div 3600000000").as("t_hours"), col("ev"))
      graft.ops.EventOps.kaplanMeier(subj, "t_hours", "ev")
    }),

    // Last-touch attribution: purchases credited to the most recent
    // click by the same user within 24h — one user-keyed window, no
    // event self-join; exact micro-integer latencies.
    "q268_attribution" -> ((s, d) =>
      graft.ops.EventOps.lastTouchAttribution(Tables(s, d, "events"),
        "user_id", "ts", "event_type", "event_id",
        convType = "purchase", touchType = "click", windowSec = 86400L)),

    // Exact Kendall tau-b (tie-corrected) between hour-of-day and
    // event value decade, on the joint histogram — the
    // concordance-based association probe beside Spearman (q255);
    // bucketing bounds the contingency at 24×50 cells.
    "q257_kendall_tau" -> ((s, d) =>
      ProfileOps.kendallTau(
        Tables(s, d, "events").select(
          hour(col("ts")).cast("long").as("hr"),
          floor(col("value") / lit(10.0)).cast("long").as("vdec")),
        "hr", "vdec")),

    // Lead-lag cross-correlation: does hourly click level LEAD
    // purchase level (negative lags = purchase leads) — the
    // conversion-latency question at the aggregate level.
    "q254_crosscorr" -> ((s, d) =>
      graft.ops.TimeSeriesOps.crossCorr(Tables(s, d, "events"),
        "ts", "event_type", "value", "click", "purchase",
        Seq(-24, -1, 0, 1, 24))),

    // Exact lag autocorrelation per event type over the hourly
    // micro-unit mean grid (1h persistence, 24h seasonality) —
    // integer moments, corrMatrix closed form.
    "q253_autocorr" -> ((s, d) =>
      graft.ops.TimeSeriesOps.autocorr(Tables(s, d, "events"),
        "event_type", "ts", "value", Seq(1, 24))),

    // Audience overlap: exact Jaccard of user sets per event-type
    // pair (|types|²-bounded output; distinct (type, user) frame
    // self-joined on user — never a cartesian).
    "q236_audience_overlap" -> ((s, d) => {
      val tu = Tables(s, d, "events")
        .select(col("event_type").as("t"), col("user_id").as("u")).distinct()
      val sizes = tu.groupBy("t").agg(count(lit(1)).as("n"))
      val inter = tu.as("a").join(tu.as("b"),
          col("a.u") === col("b.u") && col("a.t") < col("b.t"))
        .groupBy(col("a.t").as("t1"), col("b.t").as("t2"))
        .agg(count(lit(1)).as("n_both"))
      inter
        .join(broadcast(sizes.select(col("t").as("t1"), col("n").as("n1"))), "t1")
        .join(broadcast(sizes.select(col("t").as("t2"), col("n").as("n2"))), "t2")
        .select(col("t1"), col("t2"), col("n1"), col("n2"), col("n_both"),
          round(col("n_both").cast("double")
            / (col("n1") + col("n2") - col("n_both")).cast("double"), 6)
            .as("jaccard"))
    }),

    // Expectation-violation trend: contract checks per event-time day
    // (when did the contract start failing).
    "q235_dq_trend" -> ((s, d) =>
      ProfileOps.expectationTrend(Tables(s, d, "events"), "ts", Seq(
        "value_over_500" -> (col("value") > 500.0),
        "unknown_type" -> !col("event_type").isin(
          "signup", "view", "click", "purchase", "error"),
        "null_user" -> col("user_id").isNull))),

    // Two-proportion A/B lift + z over purchase conversion
    // (user_id parity as the deterministic arm assignment).
    "q227_ab_lift" -> ((s, d) =>
      graft.ops.EventOps.abLift(Tables(s, d, "events"),
        "user_id", "event_type", "value", "purchase",
        minTotalCents = 70000L)),

    // Arrival burstiness (Fano factor of per-minute counts) per type.
    "q226_burstiness" -> ((s, d) =>
      graft.ops.EventOps.burstiness(Tables(s, d, "events"),
        "ts", "event_type")),

    // Late-data audit (watermark planning): lateness vs the running
    // event-time max in event_id arrival order, per type.
    "q222_late_data" -> ((s, d) =>
      graft.ops.EventOps.lateDataAudit(Tables(s, d, "events"),
        "ts", "event_type", "event_id")),

    // RFM (recency / frequency / monetary) user segmentation over the
    // events stream: quintile scores with deterministic tie-breaks,
    // concatenated segment label. The ntile windows run over the USER
    // PROFILE frame (one row per user) — at 1e9 users switch to
    // percentile-threshold bucket assignment (the q148 curriculum
    // idiom: 4 exact cutoffs broadcast back) and accept that
    // boundary ties land by value instead of by position.
    "q219_rfm_segments" -> ((s, d) => {
      val e = Tables(s, d, "events")
      val maxT = e.agg(max(col("ts").cast("double")).as("t_max"))
      val per = e.groupBy(col("user_id"))
        .agg(max(col("ts").cast("double")).as("t_last"),
          count(lit(1)).as("freq"),
          round(sum("value"), 4).as("monetary"))
        .crossJoin(broadcast(maxT))
        .select(col("user_id"),
          floor((col("t_max") - col("t_last")) / 86400).cast("long")
            .as("recency_days"),
          col("freq"), col("monetary"))
      def quint(c: org.apache.spark.sql.Column, asc: Boolean) =
        ntile(5).over(if (asc)
          Window.orderBy(c.asc, col("user_id").asc)
        else Window.orderBy(c.desc, col("user_id").asc))
      per.select(col("user_id"), col("recency_days"), col("freq"),
          col("monetary"),
          quint(col("recency_days"), asc = true).as("r_score"),
          quint(col("freq"), asc = false).as("f_score"),
          quint(col("monetary"), asc = false).as("m_score"))
        .withColumn("segment", concat(col("r_score"), col("f_score"),
          col("m_score")))
    }),

    // CDC op-log compaction: last-write-wins apply over a change log
    // derived from events (signup=I, purchase=D, else U).
    "q216_cdc_apply" -> ((s, d) => {
      val log = Tables(s, d, "events").select(
        pmod(col("user_id"), lit(100L)).as("k"),
        when(col("event_type") === "signup", "I")
          .when(col("event_type") === "purchase", "D")
          .otherwise("U").as("op"),
        col("value"), col("ts").cast("double").as("t"), col("event_id"))
      graft.ops.SnapshotOps.cdcApply(log, "k", "op", "value", "t",
        "event_id")
    }),

    // First-order Markov transition matrix over 30-min sessions.
    "q206_markov" -> ((s, d) =>
      graft.ops.EventOps.markovTransitions(Tables(s, d, "events"),
        "ts", "user_id", "event_type", "event_id", gapSeconds = 1800.0)),

    // Long-run state occupancy of the q206 session chain: exact
    // integer power iteration (absorbing states self-loop, mass
    // never leaks), matrix-bounded driver math after the one
    // corpus aggregation.
    "q401_markov_stationary" -> ((s, d) =>
      graft.ops.EventOps.stationaryDistribution(
        graft.ops.EventOps.markovTransitions(Tables(s, d, "events"),
          "ts", "user_id", "event_type", "event_id", gapSeconds = 1800.0),
        "from_type", "to_type", "n")),

    // Frequent 3-step journeys over the same 30-min sessions —
    // q206's higher-order companion (contiguous PrefixSpan): top-20
    // session paths, k-1 leads in one window pass, no collect_list.
    "q385_frequent_journeys" -> ((s, d) =>
      graft.ops.EventOps.frequentJourneys(Tables(s, d, "events"),
        "ts", "user_id", "event_type", "event_id", gapSeconds = 1800.0,
        k = 3, topN = 20)),

    // Inter-arrival gap percentiles per user cohort (mod 10).
    "q207_interarrival" -> ((s, d) =>
      graft.ops.EventOps.interArrivalGaps(Tables(s, d, "events"),
        "ts", "user_id", "event_id")),

    // Signup -> purchase conversion latency distribution (7 days).
    "q208_conversion_latency" -> ((s, d) =>
      graft.ops.EventOps.conversionLatency(Tables(s, d, "events"),
        "ts", "user_id", "event_type", "signup", "purchase",
        windowDays = 7)),

    // Hour-of-day seasonality profile per event type (ppm shares +
    // peak flag).
    "q203_seasonality" -> ((s, d) =>
      graft.ops.EventOps.seasonalityProfile(Tables(s, d, "events"),
        "ts", "event_type")),

    // Hourly anomaly hours per type vs the hour-of-day baseline
    // (z>3, exact integer sufficient statistics).
    "q204_hourly_anomalies" -> ((s, d) =>
      graft.ops.EventOps.hourlyAnomalies(Tables(s, d, "events"),
        "ts", "event_type")),

    // Equi-width 20-bin histogram of the event value distribution.
    "q205_histogram" -> ((s, d) =>
      ProfileOps.histogram(Tables(s, d, "events"), "value", 20)),

    // Z-order vs round-robin data-skipping report: expected files
    // scanned for a point query on the user-bucket axis.
    "q198_zorder_skipping" -> ((s, d) => {
      val ev = Tables(s, d, "events")
      graft.ops.LayoutOps.zSkippingReport(ev,
        pmod(col("user_id"), lit(1024L)),
        pmod(floor(col("ts").cast("double") / 60).cast("long"), lit(1024L)),
        col("event_id"))
    }),

    // Conversation/session path assembly: 30-min-gap sessions, first
    // 5 event types in deterministic order, exact-ms mean duration.
    "q199_conversation_paths" -> ((s, d) =>
      graft.ops.EventOps.conversationPaths(Tables(s, d, "events"),
        "ts", "user_id", "event_type", "event_id", gapSeconds = 1800.0)),

    // TEMPORAL (point-in-time) join: each event resolves the
    // dimension VERSION valid at its timestamp — the consumer side of
    // the q185 SCD2 history. Deterministic two-version history per
    // key (cutover Jan 16 for even keys, Jan 8 for odd), interval
    // predicate valid_from <= t < valid_to.
    "q190_temporal_join" -> ((s, d) => {
      val cutEven = lit("2024-01-16 00:00:00").cast("timestamp").cast("double")
      val cutOdd = lit("2024-01-08 00:00:00").cast("timestamp").cast("double")
      val base = Tables(s, d, "supplier")
        .select(col("s_suppkey").cast("long").as("k"))
      val cut = when(col("k") % 2 === 0, cutEven).otherwise(cutOdd)
      val history = base.select(col("k"), lit("v1").as("ver"),
          lit(0.0).as("valid_from"), cut.as("valid_to"))
        .unionByName(base.select(col("k"), lit("v2").as("ver"),
          cut.as("valid_from"), lit(Double.MaxValue).as("valid_to")))
      val facts = Tables(s, d, "events")
        .select(col("event_id"), (col("user_id") % 100 + 1).cast("long").as("k"),
          graft.ops.EventOps.epochS(col("ts")).as("t"))
      facts.join(history,
          facts("k") === history("k") &&
            col("t") >= col("valid_from") && col("t") < col("valid_to"))
        .groupBy("ver")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(facts("k")).as("n_keys"))
    }),

    // RANGE-frame sliding window: per event, that user's event count
    // and value sum over the PRECEDING HOUR (time-based frame, not
    // row-based — q08's running_sum twin on the other frame type).
    "q184_sliding_window" -> ((s, d) =>
      Tables(s, d, "events").select(col("event_id"), col("user_id"),
          graft.ops.EventOps.epochS(col("ts")).as("t"), col("value"))
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(Window.partitionBy("user_id").orderBy("t")
            .rangeBetween(-3600, 0)).as("n_1h"),
          round(sum("value").over(Window.partitionBy("user_id").orderBy("t")
            .rangeBetween(-3600, 0)), 4).as("sum_1h"))),

    // Weekly retention-cohort matrix over the events stream — users
    // cohorted by first-seen week, per-offset active counts.
    "q179_retention_cohorts" -> ((s, d) =>
      graft.ops.EventOps.retentionCohorts(Tables(s, d, "events"), "ts", "user_id")),

    // First-touch-anchored conversion funnel signup -> view -> click
    // -> purchase within 7 days; one event scan, chain of conditional
    // mins over per-(user, step) sorted timestamp lists.
    "q180_event_funnel" -> ((s, d) =>
      graft.ops.EventOps.eventFunnel(Tables(s, d, "events"), "ts", "user_id",
        "event_type", Seq("signup", "view", "click", "purchase"), windowDays = 7)),

    // PSI numeric drift: first-half vs second-half value distribution
    // over fixed reference bins — the release-gate companion to the
    // q139 categorical JSD monitor.
    "q153_psi_drift" -> ((s, d) =>
      graft.ops.EventOps.psiDrift(Tables(s, d, "events"), "ts", "value")),
  )

  val oracles: Map[String, String] = Map(
    "q191_locf_gapfill" -> graft.ops.TimeSeriesOps.locfOracleSql(
      "(SELECT * FROM events WHERE user_id % 5 = 0)",
      "user_id", "ts", "value"),
    "q193_interpolate" -> graft.ops.TimeSeriesOps.interpolateOracleSql(
      "(SELECT * FROM events WHERE user_id % 5 = 0)",
      "user_id", "ts", "value"),
    "q192_ohlc_bars" -> graft.ops.TimeSeriesOps.ohlcOracleSql(
      "events", "event_type", "ts", "event_id", "value"),
    "q238_stage_latency" ->
      Seq("signup" -> "view", "view" -> "click", "click" -> "purchase")
        .map { case (a, b) =>
          s"SELECT '$a->$b' AS stage, * FROM (" +
            graft.ops.EventOps.conversionLatencyOracleSql(
              "events", "ts", "user_id", "event_type", a, b, 7) + ")"
        }.mkString("\nUNION ALL\n"),
    "q253_autocorr" -> graft.ops.TimeSeriesOps.autocorrOracleSql(
      "events", "event_type", "ts", "value", Seq(1, 24)),
    "q254_crosscorr" -> graft.ops.TimeSeriesOps.crossCorrOracleSql(
      "events", "ts", "event_type", "value", "click", "purchase",
      Seq(-24, -1, 0, 1, 24)),
    "q287_cohort_ltv" -> graft.ops.EventOps.cohortLtvOracleSql(
      "events", "user_id", "ts", "event_type", "value", "purchase"),

    "q289_ewma_band" -> graft.ops.TimeSeriesOps.ewmaOracleSql(
      "events", "event_type", "ts", "value", 1, 5, 30000000L),

    "q300_mde_power" -> graft.ops.EventOps.mdePowerOracleSql(
      "events", "user_id", "event_type", "value", "purchase"),

    "q303_ks_fdr" -> ProfileOps.ksFdrOracleSql(
      "documents", "source", "n_chars"),

    "q304_wasserstein" -> ProfileOps.wassersteinOracleSql(
      "documents", "source", "n_chars"),

    "q305_did" -> graft.ops.EventOps.didOracleSql(
      "events", "user_id", "ts", "event_type", "value", "purchase",
      "2024-01-16 00:00:00"),

    "q306_ips_policy" -> graft.ops.EventOps.ipsOracleSql(
      "events", "user_id", "event_type", "value",
      Seq("click", "error", "purchase", "signup", "view")),

    "q307_poisson_boot" -> graft.ops.EventOps.poissonBootstrapOracleSql(
      "events", "user_id", "event_type", "value", "purchase"),

    "q308_rand_test" -> graft.ops.EventOps.randomizationTestOracleSql(
      "events", "user_id", "event_type", "value", "purchase"),

    "q310_cms_heavy" -> graft.ops.SketchOps.cmsHeavyHittersOracleSql(
      "events", "user_id", w = 64, k = 20),

    "q384_cms_store" -> graft.ops.SketchOps.cmsHeavyHittersOracleSql(
      "events", "user_id", w = 64, k = 20),
    "q390_quantile_store" -> graft.ops.SketchOps.quantileAuditOracleSql(
      "lineitem", "l_extendedprice", cellMicro = 100000000L,
      qMicros = Seq(500000L, 900000L, 990000L)),
    "q391_cms_join_size" -> graft.ops.SketchOps.cmsJoinSizeOracleSql(
      "SELECT l_partkey AS key FROM lineitem WHERE l_quantity < 25",
      "SELECT l_partkey AS key FROM lineitem WHERE l_quantity >= 25",
      w = 8192),

    "q316_nelson_aalen" -> graft.ops.EventOps.nelsonAalenOracleSql(
      """SELECT (coalesce(t_buy, t_last) - t0) // 3600000000 AS t,
        |  CASE WHEN t_buy IS NOT NULL THEN 1 ELSE 0 END AS ev
        |FROM (SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t_last,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
        |      AS t_buy
        |  FROM events GROUP BY user_id) u""".stripMargin),

    "q317_sprt" -> graft.ops.EventOps.sprtOracleSql(
      "events", "user_id", "ts", "event_id", "event_type", "purchase"),

    "q322_hellinger" -> ProfileOps.hellingerOracleSql(
      "documents", "source", "n_chars // 256"),

    "q323_holt_trend" -> graft.ops.TimeSeriesOps.holtOracleSql(
      "events", "event_type", "ts", "value"),

    "q324_poststrat_ate" -> graft.ops.EventOps.postStratifiedAteOracleSql(
      "events", "user_id", "event_type", "value", "purchase"),

    "q325_cmh_or" -> graft.ops.EventOps.cmhOracleSql(
      "events", "user_id", "event_type", "purchase"),

    "q327_doubly_robust" -> graft.ops.EventOps.doublyRobustOracleSql(
      "events", "user_id", "event_type", "value",
      Seq("click", "error", "purchase", "signup", "view")),

    "q340_tree_resolve" -> graft.ops.GraphOps.resolveAncestorsOracleSql(
      """SELECT node, CASE WHEN node = 0 THEN 0 ELSE node // 2 END
        |  AS parent
        |FROM (SELECT DISTINCT user_id AS node FROM events) u"""
        .stripMargin),

    "q333_qte" -> graft.ops.EventOps.qteOracleSql(
      "events", "user_id", "event_type", "value", "purchase"),

    "q334_simpson" -> graft.ops.EventOps.simpsonDetectorOracleSql(
      "events", "user_id", "event_type", "purchase"),

    "q335_temporal_labels" -> graft.ops.EventOps.temporalLabelsOracleSql(
      "events", "user_id", "ts", "event_type", "value", "purchase",
      "2024-01-20 00:00:00", 14, 7),

    "q290_jackknife_ratio" ->
      graft.ops.EventOps.jackknifeRatioOracleSql(
        "events", "user_id", "event_type", "value", "purchase",
        "click"),

    "q284_pareto_point" -> graft.ops.EventOps.paretoOracleSql(
      "events", "user_id", sharePermille = 800),

    "q281_mann_kendall" -> graft.ops.TimeSeriesOps.mannKendallOracleSql(
      "events", "event_type", "ts"),

    "q278_cuped" -> graft.ops.EventOps.cupedOracleSql(
      "events", "user_id", "ts", "value", "2024-01-16 00:00:00"),

    "q274_cusum_changepoint" -> graft.ops.TimeSeriesOps.cusumOracleSql(
      "events", "event_type", "ts"),

    "q275_seasonal_backtest" ->
      graft.ops.TimeSeriesOps.seasonalNaiveOracleSql(
        "events", "event_type", "ts"),

    "q272_kaplan_meier" -> graft.ops.EventOps.kaplanMeierOracleSql(
      """SELECT (coalesce(t_buy, t_last) - t0) // 3600000000 AS t,
        |  CASE WHEN t_buy IS NOT NULL THEN 1 ELSE 0 END AS ev
        |FROM (SELECT min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t_last,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
        |      AS t_buy
        |  FROM events GROUP BY user_id) u""".stripMargin),

    "q268_attribution" -> graft.ops.EventOps.lastTouchOracleSql(
      "events", "user_id", "ts", "event_type", "event_id",
      convType = "purchase", touchType = "click", windowSec = 86400L),

    "q257_kendall_tau" -> ProfileOps.kendallTauOracleSql(
      "SELECT hour(ts) AS x, floor(value / 10.0) AS y FROM events",
      "hr", "vdec"),
    "q236_audience_overlap" ->
      """WITH tu AS (SELECT DISTINCT event_type AS t, user_id AS u
        |  FROM events),
        |sz AS (SELECT t, CAST(count(*) AS BIGINT) AS n FROM tu GROUP BY t),
        |iv AS (SELECT a.t AS t1, b.t AS t2, CAST(count(*) AS BIGINT)
        |    AS n_both
        |  FROM tu a JOIN tu b ON a.u = b.u AND a.t < b.t GROUP BY 1, 2)
        |SELECT t1, t2, s1.n AS n1, s2.n AS n2, n_both,
        |  round(CAST(n_both AS DOUBLE)
        |    / CAST(s1.n + s2.n - n_both AS DOUBLE), 6) AS jaccard
        |FROM iv JOIN sz s1 ON iv.t1 = s1.t JOIN sz s2 ON iv.t2 = s2.t"""
        .stripMargin,
    "q235_dq_trend" ->
      """WITH w AS (SELECT
        |  CAST(floor(epoch(ts) / 86400) AS BIGINT) * 86400 AS day_s,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN value > 500.0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS v0,
        |  CAST(sum(CASE WHEN event_type NOT IN
        |    ('signup','view','click','purchase','error')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS v1,
        |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS v2
        | FROM events GROUP BY 1)
        |SELECT day_s, n_rows, 'value_over_500' AS "check",
        |  v0 AS n_violations FROM w
        |UNION ALL SELECT day_s, n_rows, 'unknown_type', v1 FROM w
        |UNION ALL SELECT day_s, n_rows, 'null_user', v2 FROM w"""
        .stripMargin,
    "q227_ab_lift" -> graft.ops.EventOps.abLiftOracleSql(
      "events", "user_id", "event_type", "value", "purchase", 70000L),
    "q226_burstiness" -> graft.ops.EventOps.burstinessOracleSql(
      "events", "ts", "event_type"),
    "q222_late_data" -> graft.ops.EventOps.lateDataOracleSql(
      "events", "ts", "event_type", "event_id"),
    "q219_rfm_segments" ->
      """WITH m AS (SELECT max(epoch(ts)) AS t_max FROM events),
        |p AS (SELECT user_id, max(epoch(ts)) AS t_last,
        |    CAST(count(*) AS BIGINT) AS freq,
        |    round(sum(value), 4) AS monetary
        |  FROM events GROUP BY user_id),
        |b AS (SELECT user_id,
        |    CAST(floor((t_max - t_last) / 86400) AS BIGINT) AS recency_days,
        |    freq, monetary FROM p CROSS JOIN m),
        |s AS (SELECT *,
        |  CAST(ntile(5) OVER (ORDER BY recency_days ASC, user_id ASC) AS INT)
        |    AS r_score,
        |  CAST(ntile(5) OVER (ORDER BY freq DESC, user_id ASC) AS INT)
        |    AS f_score,
        |  CAST(ntile(5) OVER (ORDER BY monetary DESC, user_id ASC) AS INT)
        |    AS m_score FROM b)
        |SELECT user_id, recency_days, freq, monetary, r_score, f_score,
        |  m_score, CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
        |    || CAST(m_score AS VARCHAR) AS segment
        |FROM s""".stripMargin,
    "q216_cdc_apply" -> graft.ops.SnapshotOps.cdcApplyOracleSql(
      """SELECT user_id % 100 AS k,
        | CASE WHEN event_type = 'signup' THEN 'I'
        |      WHEN event_type = 'purchase' THEN 'D'
        |      ELSE 'U' END AS op,
        | value, epoch(ts) AS t, event_id
        |FROM events""".stripMargin,
      "k", "op", "value", "t", "event_id"),
    "q206_markov" -> graft.ops.EventOps.markovOracleSql(
      "events", "ts", "user_id", "event_type", "event_id", 1800.0),
    "q401_markov_stationary" -> graft.ops.EventOps.stationaryOracleSql(
      "events", "ts", "user_id", "event_type", "event_id", 1800.0),
    "q385_frequent_journeys" -> graft.ops.EventOps.frequentJourneysOracleSql(
      "events", "ts", "user_id", "event_type", "event_id", 1800.0,
      k = 3, topN = 20),
    "q207_interarrival" -> graft.ops.EventOps.interArrivalOracleSql(
      "events", "ts", "user_id", "event_id"),
    "q208_conversion_latency" -> graft.ops.EventOps.conversionLatencyOracleSql(
      "events", "ts", "user_id", "event_type", "signup", "purchase", 7),
    "q203_seasonality" -> graft.ops.EventOps.seasonalityOracleSql(
      "events", "ts", "event_type"),
    "q204_hourly_anomalies" -> graft.ops.EventOps.hourlyAnomaliesOracleSql(
      "events", "ts", "event_type"),
    "q205_histogram" -> ProfileOps.histogramOracleSql("events", "value", 20),
    "q198_zorder_skipping" -> graft.ops.LayoutOps.zSkippingOracleSql(
      "events", "user_id % 1024",
      "CAST(floor(epoch(ts) / 60) AS BIGINT) % 1024", "event_id"),
    "q199_conversation_paths" -> graft.ops.EventOps.conversationOracleSql(
      "events", "ts", "user_id", "event_type", "event_id", 1800.0),
    "q190_temporal_join" ->
      """WITH base AS (SELECT CAST(s_suppkey AS BIGINT) AS k FROM supplier),
        |cuts AS (SELECT k,
        |  CASE WHEN k % 2 = 0 THEN epoch(TIMESTAMP '2024-01-16 00:00:00')
        |       ELSE epoch(TIMESTAMP '2024-01-08 00:00:00') END AS cut
        | FROM base),
        |hist AS (
        | SELECT k, 'v1' AS ver, 0.0 AS valid_from, cut AS valid_to FROM cuts
        | UNION ALL
        | SELECT k, 'v2', cut, 1.7976931348623157e308 FROM cuts),
        |facts AS (SELECT event_id, CAST(user_id % 100 + 1 AS BIGINT) AS k,
        |  epoch(ts) AS t FROM events)
        |SELECT ver, CAST(count(*) AS BIGINT) AS n_events,
        | CAST(count(DISTINCT f.k) AS BIGINT) AS n_keys
        |FROM facts f JOIN hist h
        |  ON f.k = h.k AND f.t >= h.valid_from AND f.t < h.valid_to
        |GROUP BY ver""".stripMargin,
    "q184_sliding_window" ->
      """SELECT event_id, user_id,
        | CAST(count(*) OVER w AS BIGINT) AS n_1h,
        | round(sum(value) OVER w, 4) AS sum_1h
        |FROM (SELECT event_id, user_id, epoch(ts) AS t, value FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY t
        |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q179_retention_cohorts" ->
      graft.ops.EventOps.retentionOracleSql("events", "ts", "user_id"),
    "q180_event_funnel" -> graft.ops.EventOps.funnelOracleSql(
      "events", "ts", "user_id", "event_type",
      Seq("signup", "view", "click", "purchase"), windowDays = 7),
    "q153_psi_drift" -> graft.ops.EventOps.psiOracleSql("events", "ts", "value"),
  )
}
