package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval operators: rank fusion across heterogeneous
  * retrieval runs and ranking-quality evaluation — the glue a
  * production search/curation stack needs BETWEEN the single-modality
  * retrievers this repo already ships (dense cosine q36/q38/q48,
  * lexical BM25 q72, winnow/jaccard passage retrieval) and a consumer
  * of their results.
  *
  * Reference has no counterpart (its tabular engine has no retrieval
  * surface); this extends the LLM-pipeline family per the builder
  * brief. Determinism discipline matches SimilarityOps.knnBrute:
  * every similarity/score is rounded to 6dp BEFORE ranking, ranks
  * tie-break on candidate id, and the oracles replay the identical
  * operation order.
  */
object RetrievalOps {

  /** Reciprocal-rank fusion (Cormack & Clarke 2009): fuse N ranked
    * runs into one ranking per query with
    *
    *   rrf(q, c) = Σ_runs 1 / (K + rank_run(q, c))
    *
    * `runs` rows are (query_id, cand_id, rank) with rank 1-based
    * within each (run, query). K=60 is the published default; larger
    * K flattens the head. Output: top `k` fused candidates per query
    * with the fused score, the number of contributing runs, and the
    * fused rank (score desc, cand_id asc on ties).
    *
    * Scale shape: each input run is already per-query-bounded (a
    * retriever emits top-k' per query), so the union + (query, cand)
    * aggregation shuffles O(queries · k' · runs) rows — bounded by
    * the query workload, never by corpus size, and map-side combined.
    * The per-query window ranks ≤ k'·runs candidates. The corpus is
    * never touched here — fusion cost is independent of corpus scale
    * by construction.
    */
  def rrfFuse(runs: Seq[DataFrame], k: Int, kConst: Int = 60): DataFrame = {
    require(runs.nonEmpty, "rrfFuse needs at least one run")
    val tagged = runs.map(_.select(col("query_id"), col("cand_id"),
      (lit(1.0) / (lit(kConst.toDouble) + col("rank").cast("double"))).as("rr")))
    val fused = tagged.reduce(_ unionByName _)
      .groupBy("query_id", "cand_id")
      .agg(round(sum("rr"), 6).as("rrf_score"),
        count(lit(1)).as("n_runs"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_score").desc, col("cand_id"))
    fused.withColumn("fused_rank", row_number().over(w))
      .filter(col("fused_rank") <= k)
      .select(col("query_id"), col("cand_id"), col("rrf_score"),
        col("n_runs"), col("fused_rank"))
  }

  /** Lexical word-n-gram Jaccard retrieval run: rank every corpus
    * document against each query document by shingle-set Jaccard —
    * the sparse twin of the dense cosine run, shaped for [[rrfFuse]].
    * Output (query_id, cand_id, jaccard, rank), rank 1-based per
    * query on (jaccard 6dp desc, cand_id asc), top `k`, self
    * excluded.
    *
    * Scale shape: query-side shingle sets are per-query-bounded and
    * broadcast; the corpus side streams its shingles through one
    * broadcast-hash join and a map-side-combined (query, cand)
    * aggregation — the corpus is scanned once, never shuffled on
    * itself (the q39 all-pairs generator is the WRONG shape here:
    * retrieval has a fixed small query set, so the bounded side is
    * known up front).
    */
  def jaccardRun(docs: DataFrame, idCol: String, textCol: String,
      queryPred: org.apache.spark.sql.Column, k: Int, n: Int = 3): DataFrame = {
    val sh = DedupOps.wordShingles(docs, idCol, textCol, n)
    val q = sh.filter(queryPred)
      .select(col("id").as("query_id"), col("n_sh").as("q_nsh"),
        col("shingle"))
    val joined = sh.join(broadcast(q),
        Seq("shingle")).filter(col("id") =!= col("query_id"))
      .groupBy(col("query_id"), col("id").as("cand_id"))
      .agg(count(lit(1)).as("inter"),
        first(col("n_sh")).as("c_nsh"), first(col("q_nsh")).as("q_nsh"))
      .select(col("query_id"), col("cand_id"),
        round(col("inter").cast("double") /
          (col("q_nsh") + col("c_nsh") - col("inter")), 6).as("jaccard"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("jaccard").desc, col("cand_id"))
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** nDCG@k of a scored retrieval run against graded relevance
    * labels. `run` rows are (query_id, cand_id, score); ranks are
    * derived here (score 6dp desc, cand_id asc — the knnBrute rule)
    * so callers pass raw retriever output. `labels` rows are
    * (query_id, cand_id, rel) with graded gains; absent pairs gain 0.
    *
    *   DCG@k  = Σ_{i ≤ k} rel_i / log2(i + 1)      (run order)
    *   IDCG@k = Σ_{j ≤ k} rel_(j) / log2(j + 1)    (labels, rel desc)
    *
    * Output per query: n_rel (positive labels), dcg, idcg, ndcg —
    * all 6dp. Queries with no positive labels report ndcg 0 (not
    * null): an evaluator averaging the column must see them.
    *
    * Scale shape: the run is query-bounded; labels can be
    * corpus-scale (e.g. "same source" derived labels) — the run-side
    * join probes labels on (query_id, cand_id) and the IDCG
    * aggregation needs only each query's top-k gains (window over
    * labels partitioned by query — the one labels-wide shuffle,
    * unavoidable because ideal order is a property of the full label
    * set; pre-aggregate labels per query upstream if they explode).
    */
  def ndcgAtK(run: DataFrame, labels: DataFrame, k: Int): DataFrame = {
    val wRun = Window.partitionBy("query_id")
      .orderBy(round(col("score"), 6).desc, col("cand_id"))
    val ranked = run.withColumn("rank", row_number().over(wRun))
      .filter(col("rank") <= k)
    val lab = labels.select(col("query_id"), col("cand_id"),
      col("rel").cast("double").as("rel"))
    val dcg = ranked.join(lab, Seq("query_id", "cand_id"), "left")
      .groupBy("query_id")
      .agg(sum(coalesce(col("rel"), lit(0.0)) /
        log(2.0, col("rank") + 1)).as("_dcg"))
    val wLab = Window.partitionBy("query_id")
      .orderBy(col("rel").desc, col("cand_id"))
    val idcg = lab.filter(col("rel") > 0)
      .withColumn("j", row_number().over(wLab))
      .filter(col("j") <= k)
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_rel_topk"),
        sum(col("rel") / log(2.0, col("j") + 1)).as("_idcg"))
    val nRel = lab.filter(col("rel") > 0)
      .groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    dcg.join(idcg, Seq("query_id"), "left")
      .join(nRel, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        round(col("_dcg"), 6).as("dcg"),
        round(coalesce(col("_idcg"), lit(0.0)), 6).as("idcg"),
        round(when(coalesce(col("_idcg"), lit(0.0)) === 0.0, 0.0)
          .otherwise(col("_dcg") / col("_idcg")), 6).as("ndcg"))
  }

  /** MRR and MAP@k of a scored run against binary labels — the two
    * rank metrics nDCG (see [[ndcgAtK]]) doesn't cover: MRR reads
    * "where is the FIRST hit", AP averages precision over every hit.
    * Unlike the float-summed DCG, AP@k here is EXACT: precision@i
    * terms share the common denominator L = lcm(1..k), so each term
    * hits_i·(L/i) is an integer, the per-query sum is a long, and
    *
    *   AP@k = Σ_units / (L · min(n_rel, k)),  RR = 1 / first_rank
    *
    * are single IEEE divisions — no order-dependent float
    * accumulation anywhere. Queries with no top-k hit score 0.
    *
    * Scale shape: like nDCG — the run is query-bounded; one window
    * per query for ranks and running hit counts.
    *
    * @return (query_id, n_rel, first_rank, rr, ap) ; first_rank NULL
    *         on a hitless query
    */
  def mapMrrAtK(run: DataFrame, labels: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 20, s"k in [1,20], got $k")
    val L = (1 to k).foldLeft(1L)((a, i) =>
      a / BigInt(a).gcd(BigInt(i)).toLong * i) // lcm(1..k)
    val wRun = Window.partitionBy("query_id")
      .orderBy(round(col("score"), 6).desc, col("cand_id"))
    val ranked = run.withColumn("rank", row_number().over(wRun))
      .filter(col("rank") <= k)
    val lab = labels.filter(col("rel") > 0)
      .select(col("query_id"), col("cand_id"), lit(1L).as("hit"))
    val nRel = lab.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val wCum = Window.partitionBy("query_id").orderBy("rank")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val units = (1 to k).foldLeft(when(lit(false), lit(0L))) {
      (acc, i) => acc.when(col("rank") === i, lit(L / i)) }
    val scored = ranked.join(lab, Seq("query_id", "cand_id"), "left")
      .select(col("query_id"), col("rank"),
        coalesce(col("hit"), lit(0L)).as("hit"))
      .select(col("query_id"), col("rank"), col("hit"),
        sum("hit").over(wCum).as("cum_hits"))
      .groupBy("query_id")
      .agg(min(when(col("hit") === 1, col("rank"))).as("first_rank"),
        sum(when(col("hit") === 1, col("cum_hits") * units)
          .otherwise(0L)).as("ap_units"))
    scored.join(nRel, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        col("first_rank"),
        round(when(col("first_rank").isNull, lit(0.0))
          .otherwise(lit(1.0) / col("first_rank")), 6).as("rr"),
        round(when(coalesce(col("n_rel"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("ap_units").cast("double")
            / (lit(L) * least(col("n_rel"), lit(k.toLong))).cast("double")),
          6).as("ap"))
  }

  /** DuckDB replay of [[mapMrrAtK]] over the q170-shaped dense run
    * (brute cosine, `nQueries` query vectors) and same-source labels.
    */
  def mapMrrOracleSql(nQueries: Int, k: Int): String = {
    val L = (1 to k).foldLeft(1L)((a, i) =>
      a / BigInt(a).gcd(BigInt(i)).toLong * i)
    val units = (1 to k).map(i => s"WHEN $i THEN ${L / i}")
      .mkString(" ")
    s"""WITH run AS (
       | SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
       |  row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |                                 CAST(c.embedding AS DOUBLE[])), 6) DESC,
       |    c.vec_id) AS rank
       | FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
       | WHERE q.vec_id < $nQueries),
       |labels AS (
       | SELECT q.doc_id AS query_id, c.doc_id AS cand_id, 1 AS hit
       | FROM documents q JOIN documents c
       |   ON q.source = c.source AND q.doc_id <> c.doc_id
       | WHERE q.doc_id < $nQueries),
       |nrel AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
       |  FROM labels GROUP BY query_id),
       |sc AS (SELECT r.query_id, r.rank,
       |    coalesce(l.hit, 0) AS hit,
       |    sum(coalesce(l.hit, 0)) OVER (PARTITION BY r.query_id
       |      ORDER BY r.rank ROWS UNBOUNDED PRECEDING) AS cum_hits
       |  FROM run r LEFT JOIN labels l
       |    ON r.query_id = l.query_id AND r.cand_id = l.cand_id
       |  WHERE r.rank <= $k),
       |agg AS (SELECT query_id,
       |    min(CASE WHEN hit = 1 THEN rank END) AS first_rank,
       |    CAST(sum(CASE WHEN hit = 1
       |      THEN cum_hits * (CASE rank $units END)
       |      ELSE 0 END) AS BIGINT) AS ap_units
       |  FROM sc GROUP BY query_id)
       |SELECT a.query_id, coalesce(n.n_rel, 0) AS n_rel,
       |  CAST(a.first_rank AS INT) AS first_rank,
       |  round(CASE WHEN a.first_rank IS NULL THEN 0.0
       |    ELSE 1.0 / a.first_rank END, 6) AS rr,
       |  round(CASE WHEN coalesce(n.n_rel, 0) = 0 THEN 0.0
       |    ELSE CAST(a.ap_units AS DOUBLE)
       |      / CAST($L * least(n.n_rel, $k) AS DOUBLE) END, 6) AS ap
       |FROM agg a LEFT JOIN nrel n ON a.query_id = n.query_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // DuckDB oracle builders (replay the identical operation order).
  // ------------------------------------------------------------------

  /** Shared oracle CTE: the dense cosine run (q36's shape) as
    * (query_id, cand_id, rank ≤ k) for queries `vec_id < nQueries`.
    */
  private def denseRunSql(nQueries: Int, k: Int): String =
    s"""dense AS (
       | SELECT query_id, cand_id, rank FROM (
       |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
       |   row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |     round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |                                  CAST(c.embedding AS DOUBLE[])), 6) DESC,
       |     c.vec_id) AS rank
       |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
       |  WHERE q.vec_id < $nQueries) t
       | WHERE rank <= $k)""".stripMargin

  /** Shared oracle CTE: the lexical jaccard run ([[jaccardRun]]) as
    * (query_id, cand_id, rank ≤ k) for queries `doc_id < nQueries`.
    */
  private def lexicalRunSql(nQueries: Int, k: Int, n: Int): String = {
    val gram = (1 to n).map(j => s"w[i+${j - 1}]").mkString(" || ' ' || ")
    s"""sh AS (
       | SELECT id, len(g) AS n_sh, unnest(g) AS shingle FROM (
       |  SELECT doc_id AS id,
       |   list_distinct(CASE WHEN len(w) >= $n THEN
       |     list_transform(generate_series(1, len(w) - ${n - 1}), i -> $gram)
       |    ELSE [] END) AS g
       |  FROM (SELECT doc_id,
       |        string_split_regex(lower(text), '[ \\t\\n\\f\\r]+') AS w
       |        FROM documents) t0) t1),
       |lexjac AS (
       | SELECT q.id AS query_id, c.id AS cand_id,
       |  round(count(*)::DOUBLE /
       |    (any_value(q.n_sh) + any_value(c.n_sh) - count(*)), 6) AS jaccard
       | FROM sh q JOIN sh c ON q.shingle = c.shingle AND q.id <> c.id
       | WHERE q.id < $nQueries
       | GROUP BY q.id, c.id),
       |lexical AS (
       | SELECT query_id, cand_id, rank FROM (
       |  SELECT query_id, cand_id,
       |   row_number() OVER (PARTITION BY query_id
       |     ORDER BY jaccard DESC, cand_id) AS rank
       |  FROM lexjac) t
       | WHERE rank <= $k)""".stripMargin
  }

  /** Oracle for the hybrid fusion query: dense + lexical runs fused
    * with RRF (K = `kConst`), top `k` per query.
    */
  def rrfFusionOracleSql(nQueries: Int, runK: Int, k: Int,
      kConst: Int = 60, n: Int = 3): String =
    s"""WITH ${denseRunSql(nQueries, runK)},
       |${lexicalRunSql(nQueries, runK, n)},
       |uni AS (SELECT query_id, cand_id, rank FROM dense
       |        UNION ALL SELECT query_id, cand_id, rank FROM lexical),
       |fused AS (
       | SELECT query_id, cand_id,
       |  round(sum(1.0 / ($kConst + rank)), 6) AS rrf_score,
       |  count(*) AS n_runs
       | FROM uni GROUP BY query_id, cand_id)
       |SELECT query_id, cand_id, rrf_score, n_runs, fused_rank FROM (
       | SELECT *, row_number() OVER (PARTITION BY query_id
       |   ORDER BY rrf_score DESC, cand_id) AS fused_rank
       | FROM fused) t
       |WHERE fused_rank <= $k""".stripMargin

  /** Oracle for the nDCG query: dense run scored against same-source
    * relevance labels (rel = 1 when the candidate's source matches
    * the query document's source), nDCG@`k` per query.
    */
  def ndcgOracleSql(nQueries: Int, k: Int): String =
    s"""WITH run AS (
       | SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
       |  row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |                                 CAST(c.embedding AS DOUBLE[])), 6) DESC,
       |    c.vec_id) AS rank
       | FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
       | WHERE q.vec_id < $nQueries),
       |labels AS (
       | SELECT q.doc_id AS query_id, c.doc_id AS cand_id, 1.0 AS rel
       | FROM documents q JOIN documents c
       |   ON q.source = c.source AND q.doc_id <> c.doc_id
       | WHERE q.doc_id < $nQueries),
       |dcg AS (
       | SELECT r.query_id,
       |  sum(coalesce(l.rel, 0.0) / log2(r.rank + 1)) AS dcg
       | FROM run r LEFT JOIN labels l
       |   ON r.query_id = l.query_id AND r.cand_id = l.cand_id
       | WHERE r.rank <= $k
       | GROUP BY r.query_id),
       |ideal AS (
       | SELECT query_id, count(*) AS n_rel_topk,
       |  sum(rel / log2(j + 1)) AS idcg
       | FROM (SELECT query_id, rel,
       |       row_number() OVER (PARTITION BY query_id
       |         ORDER BY rel DESC, cand_id) AS j
       |       FROM labels WHERE rel > 0) t
       | WHERE j <= $k GROUP BY query_id),
       |nrel AS (
       | SELECT query_id, count(*) AS n_rel FROM labels
       | WHERE rel > 0 GROUP BY query_id)
       |SELECT d.query_id,
       | coalesce(n.n_rel, 0) AS n_rel,
       | round(d.dcg, 6) AS dcg,
       | round(coalesce(i.idcg, 0.0), 6) AS idcg,
       | round(CASE WHEN coalesce(i.idcg, 0.0) = 0.0 THEN 0.0
       |       ELSE d.dcg / i.idcg END, 6) AS ndcg
       |FROM dcg d LEFT JOIN ideal i ON d.query_id = i.query_id
       |LEFT JOIN nrel n ON d.query_id = n.query_id""".stripMargin

  /** Inverted-index sizing report: per term with df ≥ minDf, the
    * posting-list stats an index builder plans shards from — document
    * frequency, collection frequency, the largest doc-id delta, and
    * the EXACT byte cost of the delta-gap varint encoding (the
    * standard postings layout) vs raw 64-bit ids. Gap bytes are the
    * 7-bit-group count, an exact integer CASE both engines share.
    *
    * Scale shape: tokenize → (term, doc) tf aggregation (one shuffle
    * on the term-doc grid) → per-term lag window for gaps (shuffle on
    * term) → hash agg. No collect, no per-term list materialization —
    * the "posting list" is never built, only measured.
    */
  def postingsStats(docs: DataFrame, idCol: String, textCol: String,
      minDf: Long): DataFrame = {
    val tf = docs.select(col(idCol).cast("long").as("did"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy("term", "did").agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy("term").orderBy("did")
    val vb = "CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2" +
      " WHEN gap < 2097152 THEN 3 WHEN gap < 268435456 THEN 4" +
      " WHEN gap < 34359738368 THEN 5 WHEN gap < 4398046511104 THEN 6" +
      " WHEN gap < 562949953421312 THEN 7" +
      " WHEN gap < 72057594037927936 THEN 8 ELSE 9 END"
    tf.withColumn("gap",
        col("did") - coalesce(lag("did", 1).over(w), lit(0L)))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"),
        max("gap").as("max_gap"), sum(expr(vb)).as("bytes_delta"))
      .where(col("df") >= minDf)
      .select(col("term"), col("df"), col("cf"), col("max_gap"),
        col("bytes_delta"), (col("df") * 8).as("bytes_raw"),
        (expr("(2000000 * bytes_delta + 8 * df) div (16 * df)")
          .cast("double") / 1e6).as("ratio"))
  }

  /** DuckDB replay of [[postingsStats]]. */
  def postingsOracleSql(table: String, idCol: String, textCol: String,
      minDf: Long): String =
    s"""WITH t AS (SELECT CAST($idCol AS BIGINT) AS did,
       |    unnest(list_filter(string_split_regex(lower($textCol),
       |      '[ \\t\\n\\f\\r]+'), x -> x <> '')) AS term
       |  FROM $table),
       |tf AS (SELECT term, did, CAST(count(*) AS BIGINT) AS tf
       |  FROM t GROUP BY 1, 2),
       |g AS (SELECT term, tf, did - coalesce(lag(did)
       |    OVER (PARTITION BY term ORDER BY did), 0) AS gap FROM tf),
       |a AS (SELECT term, CAST(count(*) AS BIGINT) AS df,
       |    CAST(sum(tf) AS BIGINT) AS cf, max(gap) AS max_gap,
       |    CAST(sum(CASE WHEN gap < 128 THEN 1
       |      WHEN gap < 16384 THEN 2 WHEN gap < 2097152 THEN 3
       |      WHEN gap < 268435456 THEN 4 WHEN gap < 34359738368 THEN 5
       |      WHEN gap < 4398046511104 THEN 6
       |      WHEN gap < 562949953421312 THEN 7
       |      WHEN gap < 72057594037927936 THEN 8 ELSE 9 END)
       |      AS BIGINT) AS bytes_delta
       |  FROM g GROUP BY term)
       |SELECT term, df, cf, max_gap, bytes_delta, df * 8 AS bytes_raw,
       |  CAST((2000000 * bytes_delta + 8 * df) // (16 * df) AS DOUBLE)
       |    / 1e6 AS ratio
       |FROM a WHERE df >= $minDf""".stripMargin
}
