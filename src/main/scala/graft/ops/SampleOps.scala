package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and split assignment.
  *
  * Training-data pipelines need sampling that is REPRODUCIBLE — the
  * same document lands in the same sample/split on every rerun, on
  * any engine, at any parallelism. RNG-based sampling (`df.sample`,
  * `rand(seed)`) is none of those: it depends on partition layout and
  * the engine's generator. The standard fix is content hashing: a
  * document is kept iff a hash of (salt, key) falls below the target
  * fraction.
  *
  * Implementation note: the decision compares a fixed-width lowercase
  * hex PREFIX of md5 against a precomputed hex threshold STRING.
  * Lexicographic order on lowercase hex equals numeric order, md5 is
  * identical everywhere, and string comparison avoids float parsing —
  * so the exact same rows pass in Spark and in any SQL engine with
  * md5() (the DuckDB oracles replay the identical expression).
  * 13 hex digits = 52 bits of hash: fraction resolution ~2⁻⁵², far
  * below any corpus-size granularity.
  *
  * Scale: pure per-row codegen'd expressions — no shuffle, no state,
  * no driver involvement; filters push down past them freely.
  */
object SampleOps {

  private[graft] val Width = 13
  private val Space = BigInt(16).pow(Width) // 2^52 buckets

  /** Lowercase-hex md5 prefix of (salt, key) — the sampling coordinate
    * in [0, 16^13) as a fixed-width hex string.
    */
  def hashCoord(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt), key.cast("string")).cast("binary")), 1, Width)

  /** Hex threshold below which a coordinate is "kept" for `fraction`.
    * fraction >= 1 returns "g" (sorts above every hex digit: keep
    * all); fraction <= 0 returns 13 zeros (keep none).
    */
  def thresholdHex(fraction: Double): String =
    if (fraction >= 1.0) "g"
    else if (fraction <= 0.0) "0" * Width
    else {
      val t = (BigDecimal(fraction) * BigDecimal(Space)).toBigInt
      val hex = t.toString(16)
      "0" * (Width - hex.length) + hex
    }

  /** Keep-predicate: true iff (salt, key) hashes into the bottom
    * `fraction` of the coordinate space.
    */
  def keepPredicate(key: Column, fraction: Double, salt: String): Column =
    hashCoord(key, salt) < lit(thresholdHex(fraction))

  /** Deterministic uniform sample: every engine, every rerun, every
    * partitioning keeps exactly the same rows. Rows with a NULL key
    * are DROPPED at any fraction (NULL coordinate ⇒ NULL predicate) —
    * same for [[mixturePredicate]]; handle null keys explicitly
    * upstream if they must survive.
    */
  def deterministicSample(df: org.apache.spark.sql.DataFrame, keyCol: String,
      fraction: Double, salt: String): org.apache.spark.sql.DataFrame =
    df.filter(keepPredicate(col(keyCol), fraction, salt))

  /** Stratified deterministic sample: per-stratum keep fractions (the
    * domain-mixing primitive — "keep 50% of web, 5% of forums"),
    * `default` for strata not in the map. One CASE expression, no
    * shuffle, no per-stratum passes.
    */
  def mixturePredicate(key: Column, stratum: Column,
      fractions: Map[String, Double], default: Double, salt: String): Column = {
    val coord = hashCoord(key, salt)
    val byStratum = fractions.foldLeft(lit(thresholdHex(default))) {
      case (acc, (s, f)) => when(stratum === s, lit(thresholdHex(f))).otherwise(acc)
    }
    coord < byStratum
  }

  /** Exact-n deterministic sample per stratum (eval-set construction:
    * "exactly 20 docs from every source"): rank each stratum's rows by
    * the hash coordinate (ties by key — total order) and keep the
    * first `n`. Re-running, re-partitioning, or porting engines keeps
    * the SAME n rows, and growing a stratum only ever displaces the
    * highest-coordinate survivors.
    *
    * One shuffle (window partitioned by stratum), and the shuffle is
    * BOUNDED: Catalyst's InferWindowGroupLimit rewrites the
    * `rank <= n` filter into a map-side partial WindowGroupLimit
    * before the exchange (verified: graft.PlanProbeQ73), so each
    * input partition ships at most n rows per stratum — the same
    * bounded-shipment property [[graft.functions.KMinDistinct]]
    * provides manually where a distinct() blocks the rule (r15
    * k-min inventory, BENCHNOTES). At 100 TB the residual cost is
    * the map-side per-partition sort; pre-filter with
    * [[deterministicSample]] at a fraction safely above
    * n/stratum-size to shrink even that.
    */
  def stratifiedTake(df: org.apache.spark.sql.DataFrame, keyCol: String,
      stratumCol: String, n: Int, salt: String): org.apache.spark.sql.DataFrame = {
    require(n >= 1, "stratifiedTake needs n >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(hashCoord(col(keyCol), salt), col(keyCol))
    df.withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") <= n)
      .drop("_graft_rn")
  }

  /** Deterministic train/val/test (or arbitrary) split assignment:
    * consecutive half-open intervals of the hash space, in the given
    * order, remainder to the last label. A document's split never
    * changes across reruns, and sampling (different salt) stays
    * independent of splitting.
    *
    * NULL keys get a NULL split, never a label: a NULL hash coordinate
    * makes every interval test NULL, which would silently fall through
    * to the last label — every null-id document landing in "test" is
    * eval contamination. This mirrors the filter-based samplers
    * ([[deterministicSample]]/[[mixturePredicate]]), where a NULL
    * coordinate makes the keep-predicate NULL and the row is DROPPED —
    * filter / route / fail the nulls explicitly before splitting.
    */
  def assignSplit(key: Column, splits: Seq[(String, Double)], salt: String): Column = {
    require(splits.nonEmpty, "assignSplit needs at least one (label, fraction)")
    val coord = hashCoord(key, salt)
    val cuts = splits.init.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val cased = splits.init.zip(cuts).foldLeft(Option.empty[Column]) {
      case (acc, ((label, _), cut)) =>
        val cond = coord < lit(thresholdHex(cut))
        Some(acc.fold(when(cond, lit(label)))(_.when(cond, lit(label))))
    }
    val assigned =
      cased.fold(lit(splits.head._1))(_.otherwise(lit(splits.last._1)))
    when(key.isNull, lit(null: String)).otherwise(assigned)
  }

  /** Deterministic WEIGHTED sample without replacement (Efraimidis–
    * Spirakis A-Res): keep the top-`n` rows by u^(1/w), where u is
    * the row's content-hash coordinate mapped into (0, 1] and w its
    * positive weight — quality-weighted corpus selection with every
    * reproducibility property of the uniform sampler (same rows on
    * any engine/partitioning/rerun), and the same nesting property (a
    * larger n strictly extends the sample, since per-row keys never
    * move).
    *
    * Ordering uses ln(u)/w (monotone in u^(1/w), no overflow at tiny
    * weights). The engine-portability caveat: ln is evaluated in each
    * engine's libm, so two rows whose keys differ by ~1 ulp could in
    * principle order differently — with continuous weights the
    * probability is negligible, and the q79/q95 oracles already pin
    * exp/ln cross-engine on this corpus.
    *
    * Scale: a pure projection + global top-n (per-partition top-n,
    * driver merge of n rows) — no shuffle of the corpus. Non-positive
    * or NULL weights are dropped (a zero-weight row can never be
    * selected; NULL would poison the ordering).
    */
  def weightedPriority(df: org.apache.spark.sql.DataFrame, keyCol: String,
      weightCol: String, n: Int, salt: String): org.apache.spark.sql.DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val u = (conv(hashCoord(col(keyCol), salt), 16, 10).cast("double") + 1) /
      lit(Space.toDouble + 1)
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(keyCol), col(weightCol).cast("double").as("weight"),
        (log(u) / col(weightCol)).as("_key"))
      .orderBy(col("_key").desc, col(keyCol))
      .limit(n)
      .drop("_key")
  }

  /** Temperature-based domain mixture reweighting (the multilingual-
    * pretraining sampler of XLM-R / mBERT: q_i = p_i^α / Σ_j p_j^α
    * over token shares p_i): flattens the domain distribution so
    * head domains stop drowning the tail, with α the flattening knob
    * (α=1 natural, α→0 uniform). Output per domain: doc/token
    * counts, natural share p, target share q, and the resulting
    * up/down-sampling boost q/p — the table a pipeline owner feeds
    * into [[mixturePredicate]]-style rate assignment.
    *
    * One corpus scan (map-side-combined token-count agg down to
    * |domains| rows); the share/softmax math runs on the domain-
    * bounded table via two broadcast scalar joins — no driver math,
    * no second scan. Counts are exact longs; the double-precision
    * evaluation order is fixed and mirrored in the q128 oracle.
    */
  def temperatureWeights(df: org.apache.spark.sql.DataFrame,
      domainCol: String, textCol: String,
      alpha: Double): org.apache.spark.sql.DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    val da = df.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextOps.tokenCount(col(textCol)).cast("long")).as("n_tokens"))
    val tot = da.agg(sum("n_tokens").as("tot"))
    val withP = da.crossJoin(broadcast(tot))
      .withColumn("p", col("n_tokens").cast("double") / col("tot"))
    val den = withP.agg(sum(pow(col("p"), alpha)).as("den"))
    withP.crossJoin(broadcast(den))
      .select(col("domain"), col("n_docs"), col("n_tokens"),
        round(col("p"), 6).as("p"),
        round(pow(col("p"), alpha) / col("den"), 6).as("q"),
        round(pow(col("p"), alpha) / col("den") / col("p"), 4).as("boost"))
  }

  private def temperatureCtePrefix(table: String, domainCol: String,
      textCol: String, alpha: Double): String =
    s"""WITH da AS (SELECT $domainCol AS domain, count(*) AS n_docs,
       |  CAST(sum(len(regexp_extract_all($textCol, '\\S+'))) AS BIGINT) AS n_tokens
       | FROM $table GROUP BY 1),
       |tot AS (SELECT sum(n_tokens) AS tot FROM da),
       |wp AS (SELECT domain, n_docs, n_tokens,
       |  CAST(n_tokens AS DOUBLE) / tot AS p FROM da, tot),
       |den AS (SELECT sum(pow(p, $alpha)) AS den FROM wp),
       |tw AS (SELECT domain, n_docs, n_tokens, round(p, 6) AS p,
       | round(pow(p, $alpha) / den, 6) AS q,
       | round(pow(p, $alpha) / den / p, 4) AS boost
       | FROM wp, den)""".stripMargin

  /** DuckDB oracle replaying [[temperatureWeights]]'s operation order. */
  def temperatureWeightsOracleSql(table: String, domainCol: String,
      textCol: String, alpha: Double): String =
    temperatureCtePrefix(table, domainCol, textCol, alpha) +
      "\nSELECT * FROM tw"

  /** Epoch/repetition budgeting on top of [[temperatureWeights]]: a
    * training run wants `budgetTokens` total at mixture q, but no
    * domain repeated past `maxEpochs` (repetition degrades past ~4
    * epochs — the multi-epoch scaling-law constraint). Per domain:
    * the mixture's desired token draw, the epoch count it implies,
    * the `maxEpochs`-capped grant, and the shortfall the pipeline
    * owner must re-allocate or accept. Downstream math consumes the
    * ROUNDED q (exactly what q128 publishes), so the whole table is
    * engine-exact; domain-bounded rows, no extra corpus work.
    */
  def epochBudget(df: org.apache.spark.sql.DataFrame,
      domainCol: String, textCol: String, alpha: Double,
      budgetTokens: Long, maxEpochs: Double): org.apache.spark.sql.DataFrame = {
    require(budgetTokens > 0 && maxEpochs > 0.0,
      s"bad budget $budgetTokens / maxEpochs $maxEpochs")
    temperatureWeights(df, domainCol, textCol, alpha)
      .select(col("domain"), col("n_tokens"), col("q"),
        round(col("q") * budgetTokens).cast("long").as("desired_tokens"),
        round(col("q") * budgetTokens / col("n_tokens"), 4).as("desired_epochs"),
        least(round(col("q") * budgetTokens).cast("long"),
          round(lit(maxEpochs) * col("n_tokens")).cast("long"))
          .as("granted_tokens"),
        (round(col("q") * budgetTokens).cast("long") -
          least(round(col("q") * budgetTokens).cast("long"),
            round(lit(maxEpochs) * col("n_tokens")).cast("long")))
          .as("shortfall_tokens"))
  }

  /** DuckDB oracle replaying [[epochBudget]]. */
  def epochBudgetOracleSql(table: String, domainCol: String,
      textCol: String, alpha: Double, budgetTokens: Long,
      maxEpochs: Double): String =
    temperatureCtePrefix(table, domainCol, textCol, alpha) +
      s"""
         |SELECT domain, n_tokens, q,
         | CAST(round(q * $budgetTokens) AS BIGINT) AS desired_tokens,
         | round(q * $budgetTokens / n_tokens, 4) AS desired_epochs,
         | least(CAST(round(q * $budgetTokens) AS BIGINT),
         |   CAST(round($maxEpochs * n_tokens) AS BIGINT)) AS granted_tokens,
         | CAST(round(q * $budgetTokens) AS BIGINT)
         |   - least(CAST(round(q * $budgetTokens) AS BIGINT),
         |       CAST(round($maxEpochs * n_tokens) AS BIGINT))
         |   AS shortfall_tokens
         |FROM tw""".stripMargin

  /** DoReMi-flavored excess-loss domain reweighting (the mixture-
    * design signal of Xie et al. 2023, one-shot): for each domain,
    * the unigram add-one NLL a CORPUS-level model pays on the domain
    * minus what the domain's OWN model pays (the achievable floor);
    * the positive part is the domain's EXCESS loss, and the published
    * mixture is the token share scaled by exp(eta · excess) and
    * renormalized — domains a generalist underfits get boosted,
    * already-easy (template/duplicate-heavy) domains shrink. The
    * multiplicative-weights step of the full algorithm with the proxy
    * retrain replaced by the one-shot unigram estimate — the
    * data-side signal, computable in one pass.
    *
    * Exactness: per-token NLLs are integer MICRONATS
    * (round(−ln(p)·1e6), the DsirOps discipline), token-weighted sums
    * are exact longs (ANSI: a domain past ~4.6e11 micronat·token
    * units fails loudly rather than drifting — the ExactArith
    * contract), per-token means are half-up integer division, and
    * only the final exp/normalize runs in doubles with a fixed
    * evaluation order, rounded at publication (weight 6dp, boost
    * 4dp) exactly as the oracle replays.
    *
    * Scale shape: ONE corpus scan — every model quantity derives
    * from the (domain, word) count table, whose build is the only
    * corpus-wide exchange; Catalyst's exchange reuse serves all of
    * its consumers (corpus marginals, domain totals, both NLL sums)
    * from that single shuffle. Everything downstream is
    * vocab·|domains|-bounded; the weight table is |domains| rows.
    *
    * @return (domain, n_tokens, nll_corpus_micro, nll_own_micro,
    *         excess_micro, share, weight, boost)
    */
  def excessLossWeights(df: org.apache.spark.sql.DataFrame,
      domainCol: String, textCol: String,
      eta: Double): org.apache.spark.sql.DataFrame = {
    require(eta >= 0.0 && eta <= 100.0, s"eta must be in [0,100], got $eta")
    val cdw = df.select(col(domainCol).as("domain"),
        explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("domain", "w").agg(count(lit(1)).as("c"))
    val cw = cdw.groupBy("w").agg(sum("c").as("cw"))
    val glob = cw.agg(count(lit(1)).as("v"), sum("cw").as("t"))
    val td = cdw.groupBy("domain").agg(sum("c").as("n_tokens"))
    def micronat(p: Column): Column =
      round(-log(p) * 1e6, 0).cast("long")
    val corpusSum = cdw.join(cw, "w").crossJoin(broadcast(glob))
      .select(col("domain"), (col("c") * micronat(
        (col("cw") + 1).cast("double") / (col("t") + col("v"))
          .cast("double"))).as("term"))
      .groupBy("domain").agg(sum("term").as("s_corpus"))
    val ownSum = cdw.join(td, "domain").crossJoin(broadcast(glob))
      .select(col("domain"), (col("c") * micronat(
        (col("c") + 1).cast("double") / (col("n_tokens") + col("v"))
          .cast("double"))).as("term"))
      .groupBy("domain").agg(sum("term").as("s_own"))
    val dom = td.join(corpusSum, "domain").join(ownSum, "domain")
      .crossJoin(broadcast(glob.select(col("t"))))
      .select(col("domain"), col("n_tokens"),
        ExactArith.halfUpDiv(col("s_corpus"), col("n_tokens"))
          .as("nll_corpus_micro"),
        ExactArith.halfUpDiv(col("s_own"), col("n_tokens"))
          .as("nll_own_micro"),
        col("t"))
      .withColumn("excess_micro",
        greatest(lit(0L), col("nll_corpus_micro") - col("nll_own_micro")))
      .withColumn("_share", col("n_tokens").cast("double") / col("t"))
      .withColumn("_u", col("_share") *
        exp(lit(eta) * col("excess_micro").cast("double") / 1e6))
    val den = dom.agg(sum("_u").as("den"))
    dom.crossJoin(broadcast(den))
      .select(col("domain"), col("n_tokens"), col("nll_corpus_micro"),
        col("nll_own_micro"), col("excess_micro"),
        round(col("_share"), 6).as("share"),
        round(col("_u") / col("den"), 6).as("weight"),
        round(col("_u") / col("den") / col("_share"), 4).as("boost"))
  }

  /** DuckDB replay of [[excessLossWeights]] — identical tokenizer,
    * micronat rounding, half-up means, and double evaluation order.
    */
  def excessLossWeightsOracleSql(table: String, domainCol: String,
      textCol: String, eta: Double): String =
    s"""WITH cdw AS (SELECT $domainCol AS domain, w,
       |    CAST(count(*) AS BIGINT) AS c FROM (
       |    SELECT $domainCol, unnest(list_filter(string_split_regex(
       |      lower($textCol), '[ \\t\\n\\f\\r]+'), x -> x <> '')) AS w
       |    FROM $table) tk GROUP BY 1, 2),
       |cw AS (SELECT w, CAST(sum(c) AS BIGINT) AS cw FROM cdw GROUP BY w),
       |gl AS (SELECT CAST(count(*) AS BIGINT) AS v,
       |    CAST(sum(cw) AS BIGINT) AS t FROM cw),
       |td AS (SELECT domain, CAST(sum(c) AS BIGINT) AS n_tokens
       |  FROM cdw GROUP BY domain),
       |cs AS (SELECT domain, CAST(sum(c * CAST(round(-ln(
       |      (cw + 1) * 1.0::DOUBLE / (t + v)) * 1e6, 0) AS BIGINT))
       |    AS BIGINT) AS s_corpus
       |  FROM cdw JOIN cw USING (w) CROSS JOIN gl GROUP BY domain),
       |os AS (SELECT cdw.domain, CAST(sum(c * CAST(round(-ln(
       |      (c + 1) * 1.0::DOUBLE / (n_tokens + v)) * 1e6, 0) AS BIGINT))
       |    AS BIGINT) AS s_own
       |  FROM cdw JOIN td ON cdw.domain = td.domain CROSS JOIN gl
       |  GROUP BY cdw.domain),
       |dom AS (SELECT td.domain, td.n_tokens,
       |    (2 * s_corpus + n_tokens) // (2 * n_tokens) AS nll_corpus_micro,
       |    (2 * s_own + n_tokens) // (2 * n_tokens) AS nll_own_micro,
       |    greatest(0, (2 * s_corpus + n_tokens) // (2 * n_tokens)
       |      - (2 * s_own + n_tokens) // (2 * n_tokens)) AS excess_micro,
       |    CAST(n_tokens AS DOUBLE) / t AS sh
       |  FROM td JOIN cs ON td.domain = cs.domain
       |  JOIN os ON td.domain = os.domain CROSS JOIN gl),
       |du AS (SELECT *, sh * exp($eta * CAST(excess_micro AS DOUBLE)
       |    / 1e6) AS u FROM dom),
       |den AS (SELECT sum(u) AS den FROM du)
       |SELECT domain, n_tokens,
       |  CAST(nll_corpus_micro AS BIGINT) AS nll_corpus_micro,
       |  CAST(nll_own_micro AS BIGINT) AS nll_own_micro,
       |  CAST(excess_micro AS BIGINT) AS excess_micro,
       |  round(sh, 6) AS share, round(u / den, 6) AS weight,
       |  round(u / den / sh, 4) AS boost
       |FROM du CROSS JOIN den""".stripMargin

  /** Systematic probability-proportional-to-size sampling (Madow
    * 1949) per group with the DETERMINISTIC midpoint start — the
    * reproducible twin of randomized PPS: lay k equally-spaced grid
    * points T/2k, 3T/2k, … over the cumulative weight axis (T =
    * group total) and give each row as many copies as grid points
    * land in its cumulative span. Inclusion count is within 1 of
    * k·w/T (the PPS guarantee); Σ copies = k exactly. EXACT integer
    * arithmetic: points at-or-below cum W count f(W) = (2kW + T) div
    * (2T), copies = f(W_i) − f(W_{i−1}) — both engines replay the
    * floor identically, so the sample is bit-stable across engines,
    * partitionings and reruns.
    *
    * Scale shape: one per-group cumulative window ordered by id (the
    * group — source, shard, day — is the parallelism unit; no global
    * sort), one broadcast of group totals. Zero-weight rows can
    * never be selected; all-zero groups are skipped (T = 0 would
    * divide by zero).
    *
    * @return selected rows: (g, id, w, copies) with copies ≥ 1
    */
  def systematicPps(df: org.apache.spark.sql.DataFrame,
      groupCol: String, idCol: String, weightCol: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val base = df.select(col(groupCol).as("g"), col(idCol).as("id"),
      col(weightCol).cast("long").as("w"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("id")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val cum = base.withColumn("cw", sum("w").over(w))
    val tot = base.groupBy("g").agg(sum("w").as("t"))
      .where(col("t") > 0)
    cum.join(broadcast(tot), "g")
      .select(col("g"), col("id"), col("w"),
        (expr(s"(2 * $k * cw + t) div (2 * t)") -
          expr(s"(2 * $k * (cw - w) + t) div (2 * t)")).as("copies"))
      .where(col("copies") > 0)
  }

  /** DuckDB replay of [[systematicPps]]. */
  def systematicPpsOracleSql(table: String, groupCol: String,
      idCol: String, weightExpr: String, k: Int): String =
    s"""WITH base AS (SELECT $groupCol AS g, $idCol AS id,
       |    CAST($weightExpr AS BIGINT) AS w FROM $table),
       |cum AS (SELECT g, id, w, sum(w) OVER (PARTITION BY g
       |    ORDER BY id ROWS UNBOUNDED PRECEDING) AS cw FROM base),
       |tot AS (SELECT g, CAST(sum(w) AS BIGINT) AS t FROM base
       |  GROUP BY g HAVING sum(w) > 0)
       |SELECT g, id, w,
       |  CAST((2 * $k * cw + t) // (2 * t)
       |    - (2 * $k * (cw - w) + t) // (2 * t) AS BIGINT) AS copies
       |FROM cum JOIN tot USING (g)
       |WHERE (2 * $k * cw + t) // (2 * t)
       |    - (2 * $k * (cw - w) + t) // (2 * t) > 0""".stripMargin

  /** Chapman capture–recapture population estimate from two
    * independent deterministic "crawls" (md5 keep-samples with
    * different salts): how many unique keys EXIST given how much two
    * overlapping samples intersect — the coverage estimator a crawl
    * pipeline runs before claiming corpus completeness:
    *
    *   N̂ = (n₁+1)(n₂+1)/(m+1) − 1   (bias-corrected Petersen)
    *
    * Here the truth is also measurable, so the query doubles as a
    * standing calibration check of the estimator (error vs N).
    * One scan, two md5-predicate columns, one aggregate.
    *
    * @return (n1, n2, n_overlap, n_true, chapman, err_pct) — 2dp
    */
  def chapmanEstimate(df: org.apache.spark.sql.DataFrame,
      keyCol: String, fraction: Double, saltA: String,
      saltB: String): org.apache.spark.sql.DataFrame = {
    val inA = keepPredicate(col(keyCol), fraction, saltA)
    val inB = keepPredicate(col(keyCol), fraction, saltB)
    df.agg(count(lit(1)).as("n_true"),
        sum(inA.cast("long")).as("n1"),
        sum(inB.cast("long")).as("n2"),
        sum((inA && inB).cast("long")).as("m"))
      .select(col("n1"), col("n2"), col("m").as("n_overlap"),
        col("n_true"),
        round((col("n1") + 1).cast("double") * (col("n2") + 1)
          / (col("m") + 1).cast("double") - 1.0, 2).as("chapman"),
        round((((col("n1") + 1).cast("double") * (col("n2") + 1)
            / (col("m") + 1).cast("double") - 1.0)
          / col("n_true").cast("double") - 1.0) * 100, 2).as("err_pct"))
  }

  /** DuckDB replay of [[chapmanEstimate]]. */
  def chapmanOracleSql(table: String, keyExpr: String,
      fraction: Double, saltA: String, saltB: String): String = {
    val th = thresholdHex(fraction)
    def keep(salt: String): String =
      s"substring(md5('$salt' || CAST($keyExpr AS VARCHAR)), 1, 13)" +
        s" < '$th'"
    s"""WITH agg AS (SELECT CAST(count(*) AS BIGINT) AS n_true,
       |    CAST(sum(CASE WHEN ${keep(saltA)} THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN ${keep(saltB)} THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n2,
       |    CAST(sum(CASE WHEN ${keep(saltA)} AND ${keep(saltB)}
       |      THEN 1 ELSE 0 END) AS BIGINT) AS m
       |  FROM $table)
       |SELECT n1, n2, m AS n_overlap, n_true,
       |  round(CAST(n1 + 1 AS DOUBLE) * (n2 + 1)
       |    / CAST(m + 1 AS DOUBLE) - 1.0, 2) AS chapman,
       |  round(((CAST(n1 + 1 AS DOUBLE) * (n2 + 1)
       |      / CAST(m + 1 AS DOUBLE) - 1.0)
       |    / CAST(n_true AS DOUBLE) - 1.0) * 100, 2) AS err_pct
       |FROM agg""".stripMargin
  }
}
