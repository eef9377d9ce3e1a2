package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 — the MOSS algorithm): slide a window of `w`
  * consecutive char-`k`-gram hashes over the whitespace-stripped text
  * and keep each window's MINIMUM hash. The selected set is a
  * position-robust fingerprint — any shared substring of length
  * ≥ k + w − 1 chars is GUARANTEED to contribute at least one common
  * fingerprint, while storage is ~2/(w+1) of the full k-gram set.
  * The copy-detection complement to MinHash: MinHash estimates
  * whole-document similarity; winnowing localizes shared passages.
  *
  * Hashes are 16-hex-char md5 prefixes compared LEXICOGRAPHICALLY —
  * lowercase hex order equals numeric order (the [[SampleOps]]
  * coordinate trick), so the DuckDB oracle replays the selection
  * byte-for-byte with no integer conversion.
  *
  * Scale shape: fingerprint extraction is a pure narrow per-row map
  * (arrays + higher-order functions, whole-stage codegen, no UDF);
  * the pair stage is the standard bucket join with a document-
  * frequency guard — fingerprints shared by more than `maxDf` docs
  * (site boilerplate) are dropped BEFORE the self-join, bounding any
  * bucket's pair fan-out at maxDf², exactly like the hot-bucket caps
  * on the MinHash/SimHash paths.
  */
object WinnowOps {

  /** The normalized text the fingerprints hash over. Explicit
    * whitespace class (TextOps.Ws discipline): Java's \s includes
    * \x0B, RE2's does not — the explicit class keeps engine and
    * oracle byte-identical on documents containing vertical tabs.
    */
  private def normText(textCol: String) =
    lower(regexp_replace(col(textCol), "[ \\t\\n\\f\\r]+", ""))

  /** Per-document winnowing fingerprint sets, via the native
    * single-pass `graft_winnow` kernel (functions/WinnowFp.scala —
    * reused digest, monotone-deque window minima; measured ~6× over
    * the composed HOF form at sf0.1, bit-identical by
    * WinnowNativeSpec).
    *
    * @return (id, n_fp, fp) — one row per distinct fingerprint; docs
    *         shorter than `k` normalized chars yield no rows
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 12, w: Int = 6): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // parallelism floor before the winnow kernel: the per-row k-gram
    // hash + window-min work otherwise runs on a 1-split scan's
    // single core (the DedupOps.wordShingles guard)
    SkewOps.parallelismFloor(docs.select(col(idCol).as("id"),
        col(textCol).as("_t")))
      .select(col("id"),
        call_function("graft_winnow", normText("_t"), lit(k), lit(w)).as("_x"))
      .select(col("id"),
        array_distinct(transform(col("_x"), _.getField("fp"))).as("_f"))
      .select(col("id"), size(col("_f")).cast("long").as("n_fp"),
        explode(col("_f")).as("fp"))
  }

  /** The composed higher-order-function form of [[fingerprints]] —
    * kept as the differential reference the native kernel is pinned
    * against (WinnowNativeSpec), and as documentation of the
    * pure-builtin expression of the algorithm.
    */
  private[graft] def fingerprintsComposed(docs: DataFrame, idCol: String,
      textCol: String, k: Int = 12, w: Int = 6): DataFrame = {
    // Normalize ONCE per row; the explode(array(..)) Generate barrier
    // keeps the regexp_replace out of the per-gram lambda (the same
    // O(len²) projection-collapse trap documented in
    // DedupOps.wordShingles).
    val s = col("_s")
    docs.select(col(idCol).as("id"), normText(textCol).as("_s"))
      .select(col("id"), explode(array(gramHashes(s, k))).as("_h"))
      .select(col("id"), explode(array(windowMins(col("_h"), w))).as("_f"))
      .select(col("id"), size(col("_f")).cast("long").as("n_fp"),
        explode(col("_f")).as("fp"))
  }

  /** Hash array: md5-prefix of each char k-gram of `s`. */
  private def gramHashes(s: Column, k: Int): Column =
    when(length(s) >= k,
      transform(sequence(lit(1), length(s) - (k - 1)),
        i => substring(md5(substring(s, i, lit(k)).cast("binary")), 1, 16)))
      .otherwise(array().cast("array<string>"))

  /** Distinct window-min selection over the hash array. Fewer hashes
    * than one window → a single global-min fingerprint (the standard
    * short-document convention). */
  private def windowMins(h: Column, w: Int): Column =
    when(size(h) >= 1,
      array_distinct(transform(
        sequence(lit(1), greatest(size(h) - (w - 1), lit(1))),
        i => array_min(slice(h, i, lit(w))))))
      .otherwise(array().cast("array<string>"))

  /** Document pairs sharing ≥ `minShared` fingerprints, after the
    * `maxDf` boilerplate guard. Returns (id_a, id_b, n_shared).
    *
    * Guard semantics caveat (measured, WinnowScaleSpec): the df guard
    * counts SELECTED fingerprints, and window-min selection near a
    * boilerplate run's boundaries is context-dependent — so while the
    * run's consistently-selected interior fps hit df≈corpus and drop,
    * a middling-hash boilerplate gram can be selected only in the
    * small doc subset whose surrounding hashes are all larger,
    * survive the guard, and legitimately pair those docs. If known
    * site boilerplate must never link documents, strip it BEFORE
    * fingerprinting (TextOps.htmlExtract / line dedup) — the guard
    * bounds fan-out; it is not a boilerplate remover. */
  def dupPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 12, w: Int = 6, maxDf: Int = 64, minShared: Int = 2): DataFrame = {
    // localCheckpoint: the (id, fp) frame feeds the df-guard aggregate
    // AND both sides of the pair self-join — without it the winnow
    // scan (normalize + per-char MD5) re-runs per consumer. The
    // materialized frame is narrow (two short strings per fp), the
    // scan is the expensive part.
    val fp = fingerprints(docs, idCol, textCol, k, w).select("id", "fp")
      .localCheckpoint()
    // df guard as an ANTI-join against the over-df blacklist: almost
    // every fingerprint passes the guard, so the whitelist equi-join
    // would shuffle the whole fp frame to drop a handful of
    // boilerplate groups. No explicit broadcast hint: the blacklist
    // is only bounded by |fp rows|/maxDf, which at 100 TB can be tens
    // of millions of strings — a forced broadcast would OOM the
    // driver, while AQE broadcasts by MEASURED size when small and
    // degrades to a shuffled anti-join gracefully when not.
    val bad = fp.groupBy("fp").agg(count(lit(1)).as("_df"))
      .where(col("_df") > maxDf).select("fp")
    val guarded = fp.join(bad, Seq("fp"), "left_anti")
    guarded.as("a").join(guarded.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Position-localized fingerprints: each selected window-min hash
    * with the (1-based, normalized-char) index of the k-gram it came
    * from — min index per (doc, fingerprint). This is what turns
    * winnowing from a similarity signal into passage LOCALIZATION:
    * matching fingerprints pin down *where* the shared passage sits.
    *
    * @return (id, fp, pos)
    */
  def fingerprintsPos(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 12, w: Int = 6): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col(idCol).as("id"),
        explode(call_function("graft_winnow", normText(textCol),
          lit(k), lit(w))).as("_x"))
      .groupBy(col("id"), col("_x.fp").as("fp"))
      .agg(min(col("_x.pos")).as("pos"))
  }

  /** Composed twin of [[fingerprintsPos]] (differential reference —
    * see [[fingerprintsComposed]]). */
  private[graft] def fingerprintsPosComposed(docs: DataFrame, idCol: String,
      textCol: String, k: Int = 12, w: Int = 6): DataFrame = {
    val h = col("_h")
    val m = greatest(size(h) - (w - 1), lit(1))
    // struct(fp, pos) per window: pos = argmin within the slice
    // (first occurrence on hash ties — deterministic) offset by the
    // window start
    val sel = when(size(h) >= 1,
      transform(sequence(lit(1), m), i => {
        val win = slice(h, i, lit(w))
        struct(array_min(win).as("fp"),
          (array_position(win, array_min(win)) + i - 1).as("pos"))
      })).otherwise(array().cast("array<struct<fp:string,pos:long>>"))
    docs.select(col(idCol).as("id"), normText(textCol).as("_s"))
      .select(col("id"), explode(array(gramHashes(col("_s"), k))).as("_h"))
      .select(col("id"), explode(array(sel)).as("_sel"))
      .select(col("id"), explode(col("_sel")).as("_x"))
      .groupBy(col("id"), col("_x.fp").as("fp"))
      .agg(min(col("_x.pos")).as("pos"))
  }

  /** Pair report WITH passage localization: shared-fingerprint count
    * plus the min/max matching k-gram positions in each document —
    * the "lines X–Y of A match lines U–V of B" copy report.
    *
    * @return (id_a, id_b, n_shared, a_lo, a_hi, b_lo, b_hi)
    */
  def dupPairSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 12, w: Int = 6, maxDf: Int = 64, minShared: Int = 2): DataFrame = {
    val fp = fingerprintsPos(docs, idCol, textCol, k, w).localCheckpoint()
    val bad = fp.groupBy("fp").agg(count(lit(1)).as("_df"))
      .where(col("_df") > maxDf).select("fp")
    // no broadcast hint — see dupPairs: AQE sizes the blacklist.
    val guarded = fp.join(bad, Seq("fp"), "left_anti")
    guarded.as("a").join(guarded.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"),
        min(col("a.pos")).as("a_lo"), max(col("a.pos")).as("a_hi"),
        min(col("b.pos")).as("b_lo"), max(col("b.pos")).as("b_hi"))
      .where(col("n_shared") >= minShared)
  }

  /** DuckDB replay of [[dupPairSpans]]. */
  def dupPairSpansOracleSql(table: String, idCol: String, textExpr: String,
      k: Int = 12, w: Int = 6, maxDf: Int = 64, minShared: Int = 2): String =
    s"""WITH t AS (SELECT $idCol AS id,
       |  lower(regexp_replace($textExpr, '[ \\t\\n\\f\\r]+', '', 'g')) AS s FROM $table),
       |g AS (SELECT id, CASE WHEN length(s) >= $k
       |  THEN list_transform(generate_series(1, length(s) - ${k - 1}),
       |    i -> substr(md5(substr(s, i, $k)), 1, 16))
       |  ELSE [] END AS h FROM t),
       |wins AS (SELECT id, unnest(CASE WHEN len(h) = 0 THEN []
       |   ELSE list_transform(generate_series(1, greatest(len(h) - ${w - 1}, 1)),
       |     i -> {fp: list_min(h[i:i+${w - 1}]),
       |           pos: list_position(h[i:i+${w - 1}], list_min(h[i:i+${w - 1}])) + i - 1})
       |   END, recursive := true) FROM g),
       |e AS (SELECT id, fp, CAST(min(pos) AS BIGINT) AS pos
       |  FROM wins GROUP BY id, fp),
       |ok AS (SELECT fp FROM e GROUP BY fp HAVING count(*) <= $maxDf),
       |ge AS (SELECT e.id, e.fp, e.pos FROM e JOIN ok USING (fp))
       |SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared,
       |  min(a.pos) AS a_lo, max(a.pos) AS a_hi,
       |  min(b.pos) AS b_lo, max(b.pos) AS b_hi
       |FROM ge a JOIN ge b ON a.fp = b.fp AND a.id < b.id
       |GROUP BY 1, 2 HAVING count(*) >= $minShared""".stripMargin

  /** Candidate→verify dedup composition: winnowing proposes pairs
    * (cheap, fingerprint-bucket join), exact word-`n`-gram Jaccard
    * CONFIRMS them (exact, but only on the candidates). This is the
    * canonical two-stage 100 TB near-dup shape — the expensive exact
    * measure runs on |candidates| rows, never on |corpus|² — and
    * because each stage is deterministic the whole composition has a
    * SQL oracle (unlike the xxhash MinHash path whose verify stage is
    * spec-only).
    *
    * The per-doc gram sets ship only to candidate pairs (two
    * id-keyed joins); at candidate counts ≫ corpus counts you have a
    * dedup-parameter problem, not an operator problem.
    *
    * @return (id_a, id_b, n_shared, jac) — jac rounded 5dp, only
    *         pairs with jac ≥ minJaccard
    */
  def verifiedPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 12, w: Int = 6, maxDf: Int = 64, minShared: Int = 2,
      n: Int = 3, minJaccard: Double = 0.5): DataFrame = {
    val cand = dupPairs(docs, idCol, textCol, k, w, maxDf, minShared)
    // NOT checkpointed: materializing the gram-set arrays costs more
    // than re-running the (cheap, codegen) shingle explode on the
    // second join side — measured at sf0.1, r10 session.
    val grams = DedupOps.wordShingles(docs, idCol, textCol, n)
      .groupBy("id").agg(collect_set(col("shingle")).as("gs"))
    val j = cand
      .join(grams.select(col("id").as("id_a"), col("gs").as("ga")), Seq("id_a"))
      .join(grams.select(col("id").as("id_b"), col("gs").as("gb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("n_shared"),
        size(array_intersect(col("ga"), col("gb"))).as("_i"),
        (size(col("ga")) + size(col("gb"))).as("_t"))
      .select(col("id_a"), col("id_b"), col("n_shared"),
        // |A∪B| = |A| + |B| − |A∩B| (exact on sets — collect_set
        // guarantees distinct): sizes instead of materializing the
        // union array per pair halves the verify stage's set work.
        // greatest(…,1): a pair of <n-word docs has an empty gram
        // union — define jac=0 instead of NaN (engines disagree on
        // NaN ordering, and a no-evidence pair must not pass)
        round(col("_i").cast("double") /
          greatest(col("_t") - col("_i"), lit(1)).cast("double"),
          5).as("jac"))
    j.where(col("jac") >= minJaccard)
      .select("id_a", "id_b", "n_shared", "jac")
  }

  /** DuckDB replay of [[verifiedPairs]]. */
  def verifiedPairsOracleSql(table: String, idCol: String, textExpr: String,
      k: Int = 12, w: Int = 6, maxDf: Int = 64, minShared: Int = 2,
      n: Int = 3, minJaccard: Double = 0.5): String =
    s"""WITH cand AS (${dupPairsOracleSql(table, idCol, textExpr, k, w, maxDf, minShared)}),
       |wt AS (SELECT $idCol AS id, list_filter(string_split_regex(
       |    lower($textExpr), '[ \\t\\n\\f\\r]+'), x -> x <> '') AS wds
       |  FROM $table),
       |gs AS (SELECT id, CASE WHEN len(wds) >= $n
       |  THEN list_distinct(list_transform(generate_series(1, len(wds) - ${n - 1}),
       |    i -> ${(0 until n).map(o => s"wds[i+$o]").mkString(" || ' ' || ")}))
       |  ELSE [] END AS g FROM wt),
       |j AS (SELECT c.id_a, c.id_b, c.n_shared,
       |  round(len(list_intersect(a.g, b.g)) * 1.0::DOUBLE /
       |    greatest(len(list_distinct(list_concat(a.g, b.g))), 1), 5) AS jac
       | FROM cand c JOIN gs a ON c.id_a = a.id JOIN gs b ON c.id_b = b.id)
       |SELECT id_a, id_b, n_shared, jac FROM j WHERE jac >= $minJaccard""".stripMargin

  /** Passage-level novelty vs a REFERENCE corpus: what fraction of a
    * candidate document's winnow fingerprints already exist anywhere
    * in the reference — the crawl-refresh "have we already got this
    * content" gate at PASSAGE granularity (the [[graft.ops.TextOps
    * .gramNoveltyVsRef]] companion: n-gram novelty sees vocabulary,
    * winnow overlap sees verbatim shared passages).
    *
    * Scale shape: the reference reduces ONCE to a distinct
    * fingerprint set (an index you would persist and reuse across
    * refreshes); candidates probe it with a digest-keyed left join —
    * text never shuffles, and the index is ~2/(w+1) of the reference
    * gram count.
    *
    * @return (id, n_fp, n_known, round(overlap,5)) per candidate —
    *         overlap null for un-fingerprint-able docs
    */
  /** The passage-fingerprint INDEX: distinct winnow fingerprints of a
    * corpus — the persisted store the crawl loop probes and grows
    * (the [[DedupOps.dedupAgainstStore]] discipline at passage
    * granularity). fp-only frame: tiny relative to text, dedupable,
    * bucketable.
    */
  def fingerprintIndex(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 12, w: Int = 6): DataFrame =
    fingerprints(docs, idCol, textCol, k, w).select("fp").distinct()

  /** Incremental index update: distinct union — IDEMPOTENT (replaying
    * a batch is a no-op) and associative, so any batch order builds
    * the same store.
    */
  def indexUpdate(store: DataFrame, batchFps: DataFrame): DataFrame =
    store.unionByName(batchFps).distinct()

  /** Score a new batch against the CURRENT store: per doc its
    * fingerprint count, how many are already indexed, the overlap
    * share, and the keep decision (`overlap ≤ maxOverlap`, docs too
    * short to fingerprint keep). The crawl-loop near-verbatim filter:
    * score batch N against store, keep survivors, fold batch N's fps
    * in via [[indexUpdate]], move to batch N+1 — one fingerprint scan
    * per batch, the store never rescans old text.
    */
  def overlapAgainstIndex(batch: DataFrame, store: DataFrame,
      idCol: String, textCol: String, maxOverlap: Double = 0.5,
      k: Int = 12, w: Int = 6): DataFrame = {
    val refIdx = store.select(col("fp")).distinct().withColumn("known", lit(1))
    val cand = fingerprints(batch, idCol, textCol, k, w)
    val per = cand.join(refIdx, Seq("fp"), "left")
      .groupBy("id")
      .agg(first(col("n_fp")).as("_n"),
        sum(col("known").isNotNull.cast("long")).as("_k"))
    batch.select(col(idCol).as("id")).join(per, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("_n"), lit(0L)).as("n_fp"),
        coalesce(col("_k"), lit(0L)).as("n_known"),
        when(col("_n") > 0,
          round(col("_k").cast("double") / col("_n"), 5)).as("overlap"))
      .withColumn("keep",
        (col("overlap").isNull || col("overlap") <= maxOverlap).cast("int"))
  }

  def refOverlap(candidates: DataFrame, reference: DataFrame,
      idCol: String, textCol: String, k: Int = 12, w: Int = 6): DataFrame = {
    val refIdx = fingerprints(reference, idCol, textCol, k, w)
      .select(col("fp")).distinct().withColumn("known", lit(1))
    val cand = fingerprints(candidates, idCol, textCol, k, w)
    val per = cand.join(refIdx, Seq("fp"), "left")
      .groupBy("id")
      .agg(first(col("n_fp")).as("_n"),
        sum(col("known").isNotNull.cast("long")).as("_k"))
    candidates.select(col(idCol).as("id")).join(per, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("_n"), lit(0L)).as("n_fp"),
        coalesce(col("_k"), lit(0L)).as("n_known"),
        when(col("_n") > 0,
          round(col("_k").cast("double") / col("_n"), 5)).as("overlap"))
  }

  /** DuckDB replay of [[refOverlap]]: candidates = rows passing
    * `candPredSql`, reference = the rest. */
  def refOverlapOracleSql(table: String, idCol: String, textExpr: String,
      candPredSql: String, k: Int = 12, w: Int = 6): String =
    s"""WITH t AS (SELECT $idCol AS id, ($candPredSql) AS is_cand,
       |  lower(regexp_replace($textExpr, '[ \\t\\n\\f\\r]+', '', 'g')) AS s FROM $table),
       |g AS (SELECT id, is_cand, CASE WHEN length(s) >= $k
       |  THEN list_transform(generate_series(1, length(s) - ${k - 1}),
       |    i -> substr(md5(substr(s, i, $k)), 1, 16))
       |  ELSE [] END AS h FROM t),
       |f AS (SELECT id, is_cand, list_distinct(CASE
       |   WHEN len(h) = 0 THEN []
       |   WHEN len(h) <= $w THEN [list_min(h)]
       |   ELSE list_transform(generate_series(1, len(h) - ${w - 1}),
       |     i -> list_min(h[i:i+${w - 1}])) END) AS fps FROM g),
       |refidx AS (SELECT DISTINCT unnest(fps) AS fp FROM f WHERE NOT is_cand),
       |e AS (SELECT id, len(fps) AS n_fp, unnest(fps) AS fp
       |  FROM f WHERE is_cand),
       |per AS (SELECT e.id, any_value(e.n_fp) AS n,
       |  sum(CASE WHEN r.fp IS NULL THEN 0 ELSE 1 END) AS kn
       | FROM e LEFT JOIN refidx r ON e.fp = r.fp GROUP BY e.id)
       |SELECT t.id, CAST(coalesce(per.n, 0) AS BIGINT) AS n_fp,
       |  CAST(coalesce(per.kn, 0) AS BIGINT) AS n_known,
       |  CASE WHEN per.n > 0
       |    THEN round(per.kn * 1.0::DOUBLE / per.n, 5) END AS overlap
       |FROM (SELECT id FROM t WHERE is_cand) t
       |LEFT JOIN per ON t.id = per.id""".stripMargin

  /** Dedup-threshold sweep: verified-pair counts at a ladder of
    * Jaccard thresholds, from ONE candidate+verify pass (conditional
    * sums — the sweep costs one aggregate, not |thresholds| runs).
    * The input for choosing the production dedup threshold: where
    * the pair count curve elbows is where near-dups end and topical
    * similarity begins.
    *
    * @return one row: n_candidates, n_verified_at_<t>...
    */
  def thresholdSweep(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 12, w: Int = 6, maxDf: Int = 64, minShared: Int = 2,
      n: Int = 3, thresholds: Seq[Double] = Seq(0.3, 0.5, 0.7, 0.9)): DataFrame =
    thresholdSweepFrom(verifiedPairs(docs, idCol, textCol, k, w, maxDf,
      minShared, n, minJaccard = 0.0), thresholds)

  /** The sweep aggregate over an ALREADY-MATERIALIZED minJaccard=0
    * pair frame ([[WinnowStage.pairs]]) — the form the shared-stage
    * pipeline uses so the funnel isn't recomputed per analysis.
    */
  def thresholdSweepFrom(pairs: DataFrame,
      thresholds: Seq[Double] = Seq(0.3, 0.5, 0.7, 0.9)): DataFrame = {
    val counts = thresholds.map(t =>
      sum((col("jac") >= t).cast("long"))
        .as(s"n_at_${(t * 100).round.toInt}"))
    pairs.agg(count(lit(1)).as("n_candidates"), counts: _*)
  }

  /** DuckDB replay of [[thresholdSweep]]. */
  def thresholdSweepOracleSql(table: String, idCol: String, textExpr: String,
      k: Int = 12, w: Int = 6, maxDf: Int = 64, minShared: Int = 2,
      n: Int = 3, thresholds: Seq[Double] = Seq(0.3, 0.5, 0.7, 0.9)): String = {
    val counts = thresholds.map(t =>
      s"CAST(sum(CASE WHEN jac >= $t THEN 1 ELSE 0 END) AS BIGINT)" +
        s" AS n_at_${(t * 100).round.toInt}").mkString(",\n  ")
    s"""SELECT count(*) AS n_candidates,
       |  $counts
       |FROM (${verifiedPairsOracleSql(table, idCol, textExpr, k, w, maxDf,
          minShared, n, minJaccard = 0.0)}) vp""".stripMargin
  }

  /** Boilerplate passage MINER: the most document-frequent winnow
    * fingerprints per group (source/site) with an example document —
    * the input to building the strip-before-fingerprint blocklist
    * that the [[dupPairs]] guard caveat calls for (mine what repeats,
    * strip it upstream, THEN dedup). df is counted on selected
    * fingerprints, which under-counts boundary-context passages — the
    * right bias for a miner (a passage selected corpus-wide is
    * boilerplate beyond doubt).
    *
    * @return (group, fp, df, example_doc, rn) — top `topK` per group
    *         by (df desc, fp), df ≥ minDf
    */
  def boilerplateMiner(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, topK: Int = 3, minDf: Long = 5,
      k: Int = 12, w: Int = 6): DataFrame = {
    val fp = fingerprints(docs, idCol, textCol, k, w).select("id", "fp")
    val withGrp = fp.join(
      docs.select(col(idCol).as("id"), col(groupCol).as("grp")), Seq("id"))
    val df = withGrp.groupBy("grp", "fp")
      .agg(count(lit(1)).as("df"), min(col("id")).as("example_doc"))
      .where(col("df") >= minDf)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("df").desc, col("fp"))
    df.withColumn("rn", row_number().over(win)).where(col("rn") <= topK)
      .select(col("grp").as(groupCol), col("fp"), col("df"),
        col("example_doc"), col("rn"))
  }

  /** DuckDB replay of [[boilerplateMiner]]. */
  def boilerplateMinerOracleSql(table: String, idCol: String, textExpr: String,
      groupCol: String, topK: Int = 3, minDf: Long = 5,
      k: Int = 12, w: Int = 6): String =
    s"""WITH t AS (SELECT $idCol AS id, $groupCol AS grp,
       |  lower(regexp_replace($textExpr, '[ \\t\\n\\f\\r]+', '', 'g')) AS s FROM $table),
       |g AS (SELECT id, grp, CASE WHEN length(s) >= $k
       |  THEN list_transform(generate_series(1, length(s) - ${k - 1}),
       |    i -> substr(md5(substr(s, i, $k)), 1, 16))
       |  ELSE [] END AS h FROM t),
       |f AS (SELECT id, grp, unnest(list_distinct(CASE
       |   WHEN len(h) = 0 THEN []
       |   WHEN len(h) <= $w THEN [list_min(h)]
       |   ELSE list_transform(generate_series(1, len(h) - ${w - 1}),
       |     i -> list_min(h[i:i+${w - 1}])) END)) AS fp FROM g),
       |d AS (SELECT grp, fp, count(*) AS df, min(id) AS example_doc
       |  FROM f GROUP BY grp, fp HAVING count(*) >= $minDf),
       |r AS (SELECT grp, fp, df, example_doc, row_number() OVER (
       |   PARTITION BY grp ORDER BY df DESC, fp) AS rn FROM d)
       |SELECT grp AS $groupCol, fp, df, example_doc, CAST(rn AS INT) AS rn
       |FROM r WHERE rn <= $topK""".stripMargin

  /** Asymmetric CONTAINMENT verification (Broder's containment, the
    * quote-inclusion detector): for each winnow candidate pair,
    * c(A→B) = |grams(A) ∩ grams(B)| / |grams(A)| — near 1 when A is
    * embedded in B even though symmetric Jaccard is low (the case
    * resemblance-based dedup systematically misses: quotes, syndicated
    * excerpts, doc-inside-digest). Kept when either direction ≥
    * `minContainment`.
    *
    * Same scale contract as [[verifiedPairs]]: the exact gram math
    * runs on |candidates|, never |corpus|².
    *
    * @return (id_a, id_b, n_shared, cont_a, cont_b) — cont_a =
    *         fraction of A's grams found in B
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 12, w: Int = 6, maxDf: Int = 64, minShared: Int = 2,
      n: Int = 3, minContainment: Double = 0.7): DataFrame = {
    val cand = dupPairs(docs, idCol, textCol, k, w, maxDf, minShared)
    // NOT checkpointed: materializing the gram-set arrays costs more
    // than re-running the (cheap, codegen) shingle explode on the
    // second join side — measured at sf0.1, r10 session.
    val grams = DedupOps.wordShingles(docs, idCol, textCol, n)
      .groupBy("id").agg(collect_set(col("shingle")).as("gs"))
    val inter = size(array_intersect(col("ga"), col("gb"))).cast("double")
    cand
      .join(grams.select(col("id").as("id_a"), col("gs").as("ga")), Seq("id_a"))
      .join(grams.select(col("id").as("id_b"), col("gs").as("gb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("n_shared"),
        round(inter / greatest(size(col("ga")), lit(1)).cast("double"), 5).as("cont_a"),
        round(inter / greatest(size(col("gb")), lit(1)).cast("double"), 5).as("cont_b"))
      .where(col("cont_a") >= minContainment || col("cont_b") >= minContainment)
  }

  /** DuckDB replay of [[containmentPairs]]. */
  def containmentPairsOracleSql(table: String, idCol: String, textExpr: String,
      k: Int = 12, w: Int = 6, maxDf: Int = 64, minShared: Int = 2,
      n: Int = 3, minContainment: Double = 0.7): String =
    s"""WITH cand AS (${dupPairsOracleSql(table, idCol, textExpr, k, w, maxDf, minShared)}),
       |wt AS (SELECT $idCol AS id, list_filter(string_split_regex(
       |    lower($textExpr), '[ \\t\\n\\f\\r]+'), x -> x <> '') AS wds
       |  FROM $table),
       |gs AS (SELECT id, CASE WHEN len(wds) >= $n
       |  THEN list_distinct(list_transform(generate_series(1, len(wds) - ${n - 1}),
       |    i -> ${(0 until n).map(o => s"wds[i+$o]").mkString(" || ' ' || ")}))
       |  ELSE [] END AS g FROM wt),
       |j AS (SELECT c.id_a, c.id_b, c.n_shared,
       |  round(len(list_intersect(a.g, b.g)) * 1.0::DOUBLE /
       |    greatest(len(a.g), 1), 5) AS cont_a,
       |  round(len(list_intersect(a.g, b.g)) * 1.0::DOUBLE /
       |    greatest(len(b.g), 1), 5) AS cont_b
       | FROM cand c JOIN gs a ON c.id_a = a.id JOIN gs b ON c.id_b = b.id)
       |SELECT id_a, id_b, n_shared, cont_a, cont_b FROM j
       |WHERE cont_a >= $minContainment OR cont_b >= $minContainment""".stripMargin

  /** DuckDB replay of [[dupPairs]] over `textExpr` of `table`. */
  def dupPairsOracleSql(table: String, idCol: String, textExpr: String,
      k: Int = 12, w: Int = 6, maxDf: Int = 64, minShared: Int = 2): String =
    s"""WITH t AS (SELECT $idCol AS id,
       |  lower(regexp_replace($textExpr, '[ \\t\\n\\f\\r]+', '', 'g')) AS s FROM $table),
       |g AS (SELECT id, CASE WHEN length(s) >= $k
       |  THEN list_transform(generate_series(1, length(s) - ${k - 1}),
       |    i -> substr(md5(substr(s, i, $k)), 1, 16))
       |  ELSE [] END AS h FROM t),
       |f AS (SELECT id, list_distinct(CASE
       |   WHEN len(h) = 0 THEN []
       |   WHEN len(h) <= $w THEN [list_min(h)]
       |   ELSE list_transform(generate_series(1, len(h) - ${w - 1}),
       |     i -> list_min(h[i:i+${w - 1}])) END) AS fps FROM g),
       |e AS (SELECT id, unnest(fps) AS fp FROM f),
       |ok AS (SELECT fp FROM e GROUP BY fp HAVING count(*) <= $maxDf),
       |ge AS (SELECT e.id, e.fp FROM e JOIN ok USING (fp))
       |SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
       |FROM ge a JOIN ge b ON a.fp = b.fp AND a.id < b.id
       |GROUP BY 1, 2 HAVING count(*) >= $minShared""".stripMargin
}
