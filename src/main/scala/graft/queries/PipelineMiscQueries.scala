package graft.queries

import graft.Tables
import graft.ops.{BlocklistOps, DedupOps, DsirOps, GraphOps, LmOps, MultimodalOps, PcaOps, PreferenceOps, ProfileOps, RetrievalOps, SampleOps, SelectionOps, SimilarityOps, TextOps, WinnowOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import PipelineShared._

/** remaining pipeline queries — split from PipelineQueries (entries verbatim; the
  * aggregate map in PipelineQueries is unchanged).
  */
private[graft] object PipelineMiscQueries {
  val queries: Map[String, Q] = Map(

    // JSONL interchange round-trip: the documents table exported once
    // per app as gzipped JSONL (Spark-native distributed sink), read
    // back schema-enforced + FAILFAST, and hash-compared against the
    // ORIGINAL parquet by the oracle — proving writer, codec and
    // reader preserve content exactly (the corpus interchange format
    // training pipelines actually ship).
    "q378_jsonl_roundtrip" -> ((s, d) => {
      val path = graft.sources.JsonlIO.demoJsonlPath(s, d)
      val schema = Tables(s, d, "documents")
        .select("doc_id", "source", "lang", "n_chars", "text").schema
      graft.sources.JsonlIO.load(s, path, schema)
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
          md5(col("text").cast("binary")).as("text_md5"))
    }),

    // Hash-shard skew preflight: md5-bucket documents into 16 shards
    // weighted by n_chars, report per-shard load vs the even share —
    // the salt-before-you-shuffle planner check.
    "q299_shard_skew" -> ((s, d) =>
      graft.ops.LayoutOps.shardSkewPlan(Tables(s, d, "documents"),
        "doc_id", "n_chars", nShards = 16)),

    // Micro-averaged ROUGE-1/2 per reference source over the
    // deterministic (even=ref, odd=cand) doc pairs — the generation
    // eval overlap metric; every ratio one long/long IEEE division.
    "q301_rouge" -> ((s, d) =>
      graft.ops.EvalOps.rouge(Tables(s, d, "documents"),
        "doc_id", "text", "source")),

    // Corpus BLEU-2 with brevity penalty per reference source —
    // same clipped-overlap sufficient statistics as q301, composed
    // as Papineni's geometric mean instead of F1.
    "q302_bleu" -> ((s, d) =>
      graft.ops.EvalOps.bleu2(Tables(s, d, "documents"),
        "doc_id", "text", "source")),

    // Jaro-Winkler best-match linkage of corrupted part names
    // against the clean vocabulary — native byte-exact expression
    // pinned to DuckDB's builtin; length-band blocking, 6dp-grid
    // argmax.
    "q311_jw_linkage" -> ((s, d) =>
      graft.ops.FuzzyOps.jwBestMatch(Tables(s, d, "part"),
        "p_partkey", "p_name", pmod(col("p_partkey"), lit(4L)) === 0)),

    // Fellegi-Sunter m/u probabilities and log2 match weights per
    // (brand, type, name) agreement pattern over size-blocked pairs
    // with a deterministic dirty twin.
    "q312_fellegi_sunter" -> ((s, d) =>
      graft.ops.FuzzyOps.fellegiSunter(Tables(s, d, "part"),
        "p_partkey", "p_size", "p_brand", "p_type", "p_name")),

    // Soundex blocking-recall audit: does a single-char deletion
    // keep a name in its phonetic block? Pure RE2-safe expression
    // chain, identical in both engines.
    "q313_soundex_block" -> ((s, d) =>
      graft.ops.PhoneticOps.soundexBlockRecall(Tables(s, d, "part"),
        "p_partkey", "p_name")),

    // Concurrent-open-orders backlog: +1/-1 interval sweep over
    // (orderdate, last shipdate] with one running sum — never a
    // per-day explode; emits the backlog at every change day.
    "q341_order_backlog" -> ((s, d) => {
      val o = Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderdate"))
      val close = Tables(s, d, "lineitem")
        .groupBy("l_orderkey").agg(max("l_shipdate").as("close"))
      val iv = o.join(close, col("o_orderkey") === col("l_orderkey"))
      val deltas = iv.select(to_date(col("o_orderdate")).as("day"),
          lit(1L).as("delta"))
        .unionByName(iv.select(
          date_add(to_date(col("close")), 1).as("day"),
          lit(-1L).as("delta")))
        .groupBy("day").agg(sum("delta").as("d"))
      deltas.select(col("day"),
          sum("d").over(Window.orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("n_open"))
    }),

    // Market-basket 2-itemsets: brand pairs co-ordered with lift —
    // association mining over order baskets (fan-out bounded by
    // basket size², one basket-keyed exchange).
    "q267_brand_itemsets" -> ((s, d) => {
      val li = Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val part = Tables(s, d, "part")
        .select(col("p_partkey"), col("p_brand"))
      graft.ops.CooccurOps.basketPairs(
        li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("basket"), col("p_brand").as("item")),
        "basket", "item", minSupport = 20L)
    }),

    // HLL sketch-merge distinct counting: per-source batch sketches
    // unioned, estimate gated within 5% of the exact count — the
    // incremental approx-distinct path with a HARD oracle gate (the
    // oracle emits the exact count and TRUE; an estimate outside the
    // bound reds the row).
    "q270_hll_merge" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
        .select(col("source"),
          md5(col("text").cast("binary")).as("fp"),
          (col("doc_id") % 2).as("parity"))
      val merged = docs.groupBy("source", "parity")
        .agg(expr("hll_sketch_agg(fp)").as("sk"))
        .groupBy("source")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      docs.groupBy("source").agg(countDistinct("fp").as("n_exact"))
        .join(merged, "source")
        .select(col("source"), col("n_exact"),
          (abs(col("est") - col("n_exact")) * 20 <= col("n_exact"))
            .as("within_5pct"))
    }),

    // TPC-H Q17 shape (small-quantity revenue by brand): the
    // correlated "quantity < 0.2 x per-part average" filter
    // decorrelated into a partkey aggregate + join, with the
    // threshold rewritten integer-exact (5·q·cnt < Σq — no double
    // average to disagree on).
    "q265_small_qty_revenue" -> ((s, d) => {
      val li = Tables(s, d, "lineitem").select(col("l_partkey"),
        col("l_quantity").cast("long").as("q"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
      val pavg = li.groupBy("l_partkey")
        .agg(sum("q").as("sq"), count(lit(1)).as("cq"))
      li.join(broadcast(pavg), "l_partkey")
        .where(col("q") * col("cq") * 5 < col("sq"))
        .join(broadcast(Tables(s, d, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_small"),
          (sum("cents").cast("double") / lit(700.0)).as("avg_yearly"))
    }),

    // Market-basket affinity: brand-pair support + lift within orders
    // (distinct (order, brand) collapse before the pair join — the
    // q194/q178 group-collapse discipline; brand space is bounded so
    // the pair table is model-sized).
    "q237_brand_affinity" -> ((s, d) => {
      val li = Tables(s, d, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      val part = Tables(s, d, "part").select(col("p_partkey"), col("p_brand"))
      // ob feeds three reads (brand census + both pair-join sides):
      // checkpoint it once. NOT floored: a round-robin spread of the
      // pre-distinct rows costs a full extra shuffle (plus its
      // sort-before-repartition) — measured slower than the few-split
      // partial-aggregate it parallelizes (same finding as the q314/
      // basketPairs attempt, reverted).
      val ob = li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .select(col("l_orderkey").as("o"), col("p_brand").as("b"))
        .distinct().localCheckpoint()
      val nOrders = Tables(s, d, "orders").agg(
        countDistinct("o_orderkey").as("n_orders"))
      val single = ob.groupBy("b").agg(count(lit(1)).as("n"))
      val pairs = ob.as("x").join(ob.as("y"),
          col("x.o") === col("y.o") && col("x.b") < col("y.b"))
        .groupBy(col("x.b").as("b1"), col("y.b").as("b2"))
        .agg(count(lit(1)).as("n_both"))
        .filter(col("n_both") >= 20)
      pairs
        .join(broadcast(single.select(col("b").as("b1"), col("n").as("n1"))), "b1")
        .join(broadcast(single.select(col("b").as("b2"), col("n").as("n2"))), "b2")
        .crossJoin(broadcast(nOrders))
        .select(col("b1"), col("b2"), col("n_both"),
          round((col("n_both") * col("n_orders")).cast("double")
            / (col("n1") * col("n2")).cast("double"), 6).as("lift"))
    }),

    // Small-file compaction plan: doc_id//10 groups as simulated
    // files (bytes = Σ n_chars), sequential fill into 20 kB targets.
    "q223_compaction_plan" -> ((s, d) => {
      val files = Tables(s, d, "documents")
        .groupBy((col("doc_id") - pmod(col("doc_id"), lit(10L)))
          .as("id"))
        .agg(sum("n_chars").as("bytes"))
      graft.ops.LayoutOps.compactionPlan(files, "id", "bytes",
        targetBytes = 20000L)
    }),

    // Collocation mining: PMI over the top-150 df words — bounded
    // pair space (vocab², never corpus²), one corpus scan.
    "q195_pmi_cooccur" -> ((s, d) =>
      graft.ops.CooccurOps.pmiPairs(Tables(s, d, "documents"),
        "doc_id", "text")),

    // Exact ed<=1 fuzzy join (SymSpell deletion-neighborhood
    // equi-join + levenshtein verify): every third part name gets a
    // deterministic one-character deletion, then resolves against the
    // clean part table. Oracle is the brute-force quadratic — the
    // match proves the neighborhood construction is exact.
    // Part names repeat heavily (64 distinct across 20k rows at
    // sf0.1), so raw pairs explode quadratically inside duplicate-
    // name groups. GROUP-COLLAPSE first (the q178 discipline): run
    // the SymSpell join over DISTINCT names carrying multiplicities,
    // then reconstitute pair counts by multiplication — the 2.1M-pair
    // frame never materializes, and the same shape is what survives
    // 100 TB. min_pair decomposes because keys within a name group
    // are chosen independently: min(l + r*1e6) = min_r*1e6 + min_l.
    "q194_fuzzy_join" -> ((s, d) => {
      val part = Tables(s, d, "part")
      val dirtyG = part.filter(col("p_partkey") % 3 === 0)
        .select(col("p_partkey").as("k"),
          graft.ops.FuzzyOps.corruptName(col("p_partkey"), col("p_name"))
            .as("nm"))
        .groupBy("nm").agg(count(lit(1)).as("nl"), min("k").as("min_l"))
      val cleanG = part.groupBy(col("p_name").as("nm"))
        .agg(count(lit(1)).as("nr"), min("p_partkey").as("min_r"))
      val pairsG = graft.ops.FuzzyOps.editJoin1(dirtyG, "nm", "nm",
          cleanG, "nm", "nm")
        .join(dirtyG.select(col("nm").as("l_key"), col("nl"), col("min_l")),
          "l_key")
        .join(cleanG.select(col("nm").as("r_key"), col("nr"), col("min_r")),
          "r_key")
      val perDist = pairsG.groupBy("dist")
        .agg(sum(col("nl") * col("nr")).as("n_pairs"),
          min(col("min_l") + col("min_r") * lit(1000000L)).as("min_pair"))
      val nDirty = pairsG.select(col("dist"), col("l_key"), col("nl"))
        .distinct().groupBy("dist").agg(sum("nl").as("n_dirty"))
      val nClean = pairsG.select(col("dist"), col("r_key"), col("nr"))
        .distinct().groupBy("dist").agg(sum("nr").as("n_clean"))
      perDist.join(nDirty, "dist").join(nClean, "dist")
        .select(col("dist"), col("n_pairs"), col("n_dirty"), col("n_clean"),
          col("min_pair"))
    }),

    // SCD TYPE-2 merge: fold a mutated supplier snapshot (acctbal
    // bumped on %7 keys, %13 keys deleted, 5 new keys) into a
    // versioned history — the warehouse dimension-maintenance staple.
    "q185_scd2_merge" -> ((s, d) => {
      val sup = Tables(s, d, "supplier")
        .select(col("s_suppkey").cast("long").as("k"),
          col("s_name").as("name"),
          col("s_acctbal").cast("double").as("acctbal"))
      val history = sup.select(col("k"), col("name"), col("acctbal"),
        lit(0L).as("valid_from"), lit(null).cast("long").as("valid_to"))
      val snapshot = sup.filter(col("k") % 13 =!= 0)
        .select(col("k"), col("name"),
          when(col("k") % 7 === 0, round(col("acctbal") + 100.0, 2))
            .otherwise(col("acctbal")).as("acctbal"))
        .unionByName(s.range(1, 6).select(
          (col("id") + 900000).as("k"),
          concat(lit("Supplier#new"), col("id")).as("name"),
          lit(0.0).as("acctbal")))
      graft.ops.SnapshotOps.scd2Merge(history, snapshot, "k",
        Seq("name", "acctbal"), ts = 1000L)
    }),

    // Incremental-pipeline change detection: current snapshot diffed
    // against a deterministically-derived "previous" one (docs with
    // doc_id % 7 = 0 didn't exist yet; % 5 = 0 had different text) —
    // per-id added/removed/changed/unchanged. Digest-only join.
    "q92_snapshot_diff" -> ((s, d) => {
      val cur = Tables(s, d, "documents")
      val prev = cur.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v1")))
            .otherwise(col("text")).as("text"))
      graft.ops.SnapshotOps.snapshotDiff(cur, prev, "doc_id", "text")
    }),

    // Corpus Merkle manifest (q92's O(1)-compare companion): the
    // fixed-depth content tree — roots match iff corpora match, a
    // divergent node names the id range to rescan. Bounded per-node
    // state (leafSpan rows / fanout children), layout-independent.
    "q398_merkle_manifest" -> ((s, d) =>
      graft.ops.SnapshotOps.merkleManifest(
        Tables(s, d, "documents"), "doc_id", "text")),

    // Per-doc curation decision manifest (the release provenance
    // record): first-failing-stage reason per document — rules /
    // blocklist / duplicate / keep. Failure modes injected per
    // residue (q112 idiom), incl. a constant-text dup group.
    "q137_decision_manifest" -> ((s, d) => {
      val t =
        when(col("doc_id") % 41 === 0,
          lit("the shared boilerplate body of a page that repeats across the crawl"))
        .when(col("doc_id") % 29 === 0, lit("tiny doc"))
        .when(col("doc_id") % 23 === 0,
          concat(col("text"), lit(" "), repeat(lit("# "), 25)))
        .when(col("doc_id") % 19 === 0,
          concat(col("text"),
            lit(" Click here to buy now. Click here to buy now. Click here again")))
        .otherwise(col("text"))
      graft.ops.CurationPipeline.decisionManifest(
        Tables(s, d, "documents").select(col("doc_id"), t.as("text")),
        "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    }),

    // URL canonicalization (crawl curation stage 1): scheme/host case,
    // default ports, fragments, tracking params, trailing slashes —
    // plus registered-domain extraction. Zero shuffles.
    "q81_url_normalize" -> ((s, d) => {
      val u = Tables(s, d, "documents")
        .select(col("doc_id"), messyUrl(col("doc_id")).as("url"))
      u.select(col("doc_id"),
        graft.ops.UrlOps.urlNormalize(col("url")).as("url_norm"),
        graft.ops.UrlOps.registeredDomain(
          graft.ops.UrlOps.urlHost(col("url"))).as("domain"))
    }),

    // Per-domain quota (no site dominates the corpus): deterministic
    // hash-coordinate take of at most 5 docs per registered domain.
    "q82_domain_quota" -> ((s, d) =>
      graft.ops.UrlOps.capPerDomain(
        Tables(s, d, "documents")
          .select(col("doc_id"), messyUrl(col("doc_id")).as("url")),
        "doc_id", "url", n = 5, salt = "dq1")
        .select(col("doc_id"), col("domain"))),
  )

  val oracles: Map[String, String] = Map(
    // the oracle reads the ORIGINAL parquet — matching it proves the
    // JSONL writer/codec/reader chain is content-preserving
    "q378_jsonl_roundtrip" ->
      """SELECT doc_id, source, lang, n_chars, md5(text) AS text_md5
        |FROM documents""".stripMargin,

    "q195_pmi_cooccur" -> graft.ops.CooccurOps.pmiOracleSql(
      "documents", "doc_id", "text"),

    "q299_shard_skew" -> graft.ops.LayoutOps.shardSkewOracleSql(
      "documents", "doc_id", "n_chars", 16),

    "q301_rouge" -> graft.ops.EvalOps.rougeOracleSql(
      "documents", "doc_id", "text", "source"),

    "q302_bleu" -> graft.ops.EvalOps.bleu2OracleSql(
      "documents", "doc_id", "text", "source"),

    "q311_jw_linkage" -> graft.ops.FuzzyOps.jwBestMatchOracleSql(
      "part", "p_partkey", "p_name", "p_partkey % 4 = 0"),

    "q312_fellegi_sunter" -> graft.ops.FuzzyOps.fellegiSunterOracleSql(
      "part", "p_partkey", "p_size", "p_brand", "p_type", "p_name"),

    "q313_soundex_block" ->
      graft.ops.PhoneticOps.soundexBlockRecallOracleSql(
        "part", "p_partkey", "p_name"),

    "q341_order_backlog" ->
      """WITH iv AS (SELECT o_orderkey, o_orderdate, close FROM orders
        |  JOIN (SELECT l_orderkey, max(l_shipdate) AS close
        |    FROM lineitem GROUP BY l_orderkey) c
        |  ON o_orderkey = l_orderkey),
        |deltas AS (SELECT day, CAST(sum(delta) AS BIGINT) AS d FROM (
        |    SELECT CAST(o_orderdate AS DATE) AS day, 1 AS delta FROM iv
        |    UNION ALL
        |    SELECT CAST(close AS DATE) + 1 AS day, -1 AS delta FROM iv)
        |  t GROUP BY day)
        |SELECT day, CAST(sum(d) OVER (ORDER BY day
        |  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_open
        |FROM deltas""".stripMargin,

    "q267_brand_itemsets" -> graft.ops.CooccurOps.basketPairsOracleSql(
      "SELECT l_orderkey AS bk, p_brand AS it FROM lineitem " +
        "JOIN part ON l_partkey = p_partkey", minSupport = 20L),

    "q270_hll_merge" ->
      """SELECT source, count(DISTINCT md5(text)) AS n_exact,
        | TRUE AS within_5pct
        |FROM documents GROUP BY source""".stripMargin,

    "q265_small_qty_revenue" ->
      """WITH li AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem),
        |pa AS (SELECT l_partkey, CAST(sum(q) AS BIGINT) AS sq,
        |    CAST(count(*) AS BIGINT) AS cq FROM li GROUP BY 1),
        |sel AS (SELECT li.l_partkey, cents
        |  FROM li JOIN pa USING (l_partkey) WHERE q * cq * 5 < sq)
        |SELECT p_brand, CAST(count(*) AS BIGINT) AS n_small,
        |  CAST(sum(cents) AS DOUBLE) / 700.0 AS avg_yearly
        |FROM sel JOIN part ON l_partkey = p_partkey
        |GROUP BY 1""".stripMargin,
    "q237_brand_affinity" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey AS o, p_brand AS b
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |no AS (SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT)
        |    AS n_orders FROM orders),
        |sg AS (SELECT b, CAST(count(*) AS BIGINT) AS n FROM ob GROUP BY b),
        |pr AS (SELECT x.b AS b1, y.b AS b2, CAST(count(*) AS BIGINT)
        |    AS n_both
        |  FROM ob x JOIN ob y ON x.o = y.o AND x.b < y.b
        |  GROUP BY 1, 2 HAVING count(*) >= 20)
        |SELECT b1, b2, n_both,
        |  round(CAST(n_both * n_orders AS DOUBLE)
        |    / CAST(s1.n * s2.n AS DOUBLE), 6) AS lift
        |FROM pr JOIN sg s1 ON pr.b1 = s1.b JOIN sg s2 ON pr.b2 = s2.b
        |CROSS JOIN no""".stripMargin,
    "q223_compaction_plan" -> graft.ops.LayoutOps.compactionOracleSql(
      """SELECT doc_id - doc_id % 10 AS id,
        | CAST(sum(n_chars) AS BIGINT) AS bytes
        |FROM documents GROUP BY 1""".stripMargin, 20000L),
    "q194_fuzzy_join" ->
      // placeholder substitution AFTER stripMargin: the inner SQL
      // contains lines starting with the || concat operator, which a
      // second stripMargin pass would eat
      """WITH pairs AS (__PAIRS__)
        |SELECT dist, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(count(DISTINCT l_key) AS BIGINT) AS n_dirty,
        |  CAST(count(DISTINCT r_key) AS BIGINT) AS n_clean,
        |  min(l_key + r_key * 1000000) AS min_pair
        |FROM pairs GROUP BY dist""".stripMargin
        .replace("__PAIRS__", graft.ops.FuzzyOps.editJoin1OracleSql(
          "part", "p_partkey", "p_name", "p_partkey % 3 = 0")),
    "q185_scd2_merge" ->
      """WITH hist AS (SELECT CAST(s_suppkey AS BIGINT) AS k, s_name AS name,
        |  CAST(s_acctbal AS DOUBLE) AS acctbal,
        |  CAST(0 AS BIGINT) AS valid_from, CAST(NULL AS BIGINT) AS valid_to
        | FROM supplier),
        |snap AS (
        | SELECT k, name,
        |  CASE WHEN k % 7 = 0 THEN round(acctbal + 100.0, 2)
        |       ELSE acctbal END AS acctbal
        | FROM hist WHERE k % 13 <> 0
        | UNION ALL
        | SELECT CAST(i + 900000 AS BIGINT), 'Supplier#new' || CAST(i AS VARCHAR),
        |  0.0 FROM unnest(generate_series(1, 5)) AS t(i)),
        |j AS (SELECT h.k AS hk, h.name AS hname, h.acctbal AS hbal,
        |  h.valid_from AS hfrom, s.k AS sk, s.name AS sname, s.acctbal AS sbal
        | FROM hist h FULL OUTER JOIN snap s ON h.k = s.k)
        |SELECT hk AS k, hname AS name, hbal AS acctbal,
        |  hfrom AS valid_from, CAST(NULL AS BIGINT) AS valid_to
        | FROM j WHERE hk IS NOT NULL AND sk IS NOT NULL
        |  AND hname IS NOT DISTINCT FROM sname
        |  AND hbal IS NOT DISTINCT FROM sbal
        |UNION ALL
        |SELECT hk, hname, hbal, hfrom, CAST(1000 AS BIGINT)
        | FROM j WHERE hk IS NOT NULL
        |  AND (sk IS NULL OR hname IS DISTINCT FROM sname
        |       OR hbal IS DISTINCT FROM sbal)
        |UNION ALL
        |SELECT sk, sname, sbal, CAST(1000 AS BIGINT), CAST(NULL AS BIGINT)
        | FROM j WHERE sk IS NOT NULL
        |  AND (hk IS NULL OR hname IS DISTINCT FROM sname
        |       OR hbal IS DISTINCT FROM sbal)""".stripMargin,
    "q137_decision_manifest" -> {
      val hits = BlocklistOps.hitsExprSql("t")
      s"""WITH c AS (SELECT doc_id,
         | CASE WHEN doc_id % 41 = 0
         |   THEN 'the shared boilerplate body of a page that repeats across the crawl'
         |  WHEN doc_id % 29 = 0 THEN 'tiny doc'
         |  WHEN doc_id % 23 = 0 THEN text || ' ' || repeat('# ', 25)
         |  WHEN doc_id % 19 = 0 THEN text ||
         |   ' Click here to buy now. Click here to buy now. Click here again'
         |  ELSE text END AS t
         | FROM documents),
         |sig AS (SELECT doc_id, t,
         |  CAST(len(list_filter(string_split_regex(lower(t), '[ \\t\\n\\f\\r]+'),
         |    x -> x <> '')) AS BIGINT) AS n_words,
         |  len(regexp_extract_all(t, '#')) + len(regexp_extract_all(t, '\\.\\.\\.'))
         |    + len(regexp_extract_all(t, '…')) AS nsym,
         |  CAST(len(regexp_extract_all(lower(t), '\\b(the|a|of|to|and)\\b'))
         |    AS BIGINT) AS n_stop,
         |  CAST($hits AS BIGINT) AS n_hits
         | FROM c),
         |r AS (SELECT *, (n_words >= 10 AND n_words <= 100000
         |  AND round(nsym * 1.0 / greatest(n_words, 1), 5) <= 0.1
         |  AND n_stop >= 2) AS pass_rules FROM sig),
         |b AS (SELECT *, pass_rules AND n_hits < 3 AS pass_block FROM r),
         |rk AS (SELECT doc_id, row_number() OVER (PARTITION BY md5(t)
         |         ORDER BY doc_id) AS dup_rank
         |       FROM b WHERE pass_block)
         |SELECT b.doc_id, n_words, n_hits,
         | CASE WHEN NOT pass_rules THEN 'rules'
         |      WHEN n_hits >= 3 THEN 'blocklist'
         |      WHEN rk.dup_rank > 1 THEN 'duplicate'
         |      ELSE 'keep' END AS reason,
         | CAST(CASE WHEN pass_block AND coalesce(rk.dup_rank, 1) = 1
         |      THEN 1 ELSE 0 END AS INTEGER) AS keep
         |FROM b LEFT JOIN rk ON b.doc_id = rk.doc_id""".stripMargin
    },
    "q81_url_normalize" -> {
      val suffixes = graft.ops.UrlOps.MultiPartSuffixes
        .map(s => s"'$s'").mkString(", ")
      s"""WITH u AS (SELECT doc_id, $sqlUrlCase AS url FROM documents),
         |p AS (SELECT doc_id, url,
         |  regexp_extract(url, '^([^#]*)', 1) AS pre FROM u),
         |c AS (SELECT doc_id, url,
         |  lower(regexp_extract(pre, '^([^:/?#]+)://', 1)) AS scheme,
         |  lower(regexp_extract(pre, '^[^:/?#]+://([^/?#]*)', 1)) AS hostport,
         |  regexp_extract(pre, '^[^:/?#]+://[^/?#]*([^?#]*)', 1) AS path,
         |  regexp_extract(pre, '\\?(.*)$$', 1) AS query FROM p),
         |n AS (SELECT doc_id, url, scheme,
         |  CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$$', '')
         |       WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$$', '')
         |       ELSE hostport END AS host,
         |  regexp_replace(path, '/+$$', '') AS cleanpath,
         |  coalesce(array_to_string(list_filter(string_split(query, '&'),
         |    x -> x <> '' AND NOT regexp_matches(x,
         |      '^(utm_[^=]*|gclid|fbclid|ref)(=|$$)')), '&'), '') AS cleanquery
         | FROM c),
         |o AS (SELECT doc_id, url,
         |  CASE WHEN scheme = '' THEN url
         |       ELSE scheme || '://' || host || cleanpath ||
         |         CASE WHEN cleanquery = '' THEN ''
         |              ELSE '?' || cleanquery END END AS url_norm,
         |  regexp_replace(lower(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1)),
         |    ':[0-9]+$$', '') AS hostnp
         | FROM n),
         |d AS (SELECT doc_id, url_norm, hostnp,
         |  string_split(hostnp, '.') AS parts FROM o)
         |SELECT doc_id, url_norm,
         |  CASE WHEN len(parts) <= 2 THEN hostnp
         |       WHEN parts[-2] || '.' || parts[-1] IN ($suffixes)
         |         THEN parts[-3] || '.' || parts[-2] || '.' || parts[-1]
         |       ELSE parts[-2] || '.' || parts[-1] END AS domain
         |FROM d""".stripMargin
    },
    "q82_domain_quota" -> {
      val suffixes = graft.ops.UrlOps.MultiPartSuffixes
        .map(s => s"'$s'").mkString(", ")
      s"""WITH u AS (SELECT doc_id, $sqlUrlCase AS url FROM documents),
         |h AS (SELECT doc_id,
         |  regexp_replace(lower(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1)),
         |    ':[0-9]+$$', '') AS hostnp FROM u),
         |d AS (SELECT doc_id, hostnp, string_split(hostnp, '.') AS parts FROM h),
         |dom AS (SELECT doc_id,
         |  CASE WHEN len(parts) <= 2 THEN hostnp
         |       WHEN parts[-2] || '.' || parts[-1] IN ($suffixes)
         |         THEN parts[-3] || '.' || parts[-2] || '.' || parts[-1]
         |       ELSE parts[-2] || '.' || parts[-1] END AS domain
         | FROM d)
         |SELECT doc_id, domain FROM (
         | SELECT doc_id, domain, row_number() OVER (PARTITION BY domain
         |   ORDER BY substr(md5('dq1' || CAST(doc_id AS VARCHAR)), 1, 13),
         |            doc_id) AS rn
         | FROM dom) t
         |WHERE rn <= 5""".stripMargin
    },
    "q398_merkle_manifest" -> graft.ops.SnapshotOps
      .merkleManifestOracleSql("documents", "doc_id", "text"),

    "q92_snapshot_diff" ->
      """WITH prev AS (SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0 THEN text || ' v1' ELSE text END AS text
        | FROM documents WHERE doc_id % 7 <> 0),
        |ck AS (SELECT doc_id, md5(c.text) AS cd, TRUE AS cp
        |       FROM documents c),
        |pk AS (SELECT doc_id, md5(text) AS pd, TRUE AS pp FROM prev)
        |SELECT coalesce(ck.doc_id, pk.doc_id) AS id,
        |  CASE WHEN pp IS NULL THEN 'added'
        |       WHEN cp IS NULL THEN 'removed'
        |       WHEN cd IS NOT DISTINCT FROM pd THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM ck FULL OUTER JOIN pk ON ck.doc_id = pk.doc_id""".stripMargin,
  )
}
