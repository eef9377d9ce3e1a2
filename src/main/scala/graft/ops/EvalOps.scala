package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generation-eval text metrics — ROUGE-N and corpus BLEU — computed
  * distributed over (candidate, reference) document pairs. This is
  * the eval half of an LLM data pipeline: scoring model outputs (or
  * paraphrase/augmentation candidates) against references at corpus
  * scale, where per-pair Python scorers don't parallelize.
  *
  * Reference has no counterpart (feldman.py is depth-series tooling);
  * this extends the text-analysis family (quality q31, novelty q116)
  * with the standard overlap metrics (Lin 2004 ROUGE; Papineni et al.
  * 2002 BLEU).
  *
  * Pairing is deterministic and engine-shared: the EVEN doc_id of
  * each (2k, 2k+1) pair is the reference, the ODD one the candidate
  * (`pid = doc_id div 2`); only complete pairs participate. Tokens
  * are the repo-wide convention: lowercase, split on the exact
  * whitespace class `[ \t\n\f\r]+`, empties dropped.
  *
  * Metrics are MICRO-averaged per reference-source: clipped overlap
  * counts, candidate-gram and reference-gram totals are summed as
  * exact longs per source, and every reported ratio is one IEEE
  * double division of two longs — bit-identical across engines and
  * partitionings, no float accumulation anywhere.
  *
  * Scale shape: grams shuffle once per order (groupBy (pid, gram)),
  * the overlap join is an equi-join on (pid, gram) between two
  * counted frames (never positional arrays), and everything after
  * the first aggregation is counts-only. Document text never crosses
  * a shuffle.
  */
object EvalOps {

  /** Repo-standard token array: lowercase, whitespace-class split. */
  private[ops] def tokens(text: Column): Column =
    filter(split(lower(text), "[ \\t\\n\\f\\r]+"), t => t =!= "")

  /** Adjacent-token bigrams as "a b" strings (empty below 2 tokens —
    * guarded: Spark's `sequence(1, 0)` would DESCEND, not empty). */
  private[ops] def bigrams(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** Per-source exact overlap sufficient statistics over the
    * deterministic pairs: clipped unigram/bigram overlap, candidate
    * and reference gram totals. Everything downstream (ROUGE, BLEU)
    * is a pure projection of this one frame.
    *
    * @return (source, n_pairs, ov1, c1, r1, ov2, c2, r2) — all longs
    */
  def pairOverlapTotals(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String): DataFrame = {
    val base = docs.select(
      (col(idCol) / 2).cast("long").as("pid"),
      (col(idCol) % 2 === 1).as("is_cand"),
      col(srcCol).as("source"),
      tokens(col(textCol)).as("ts"))

    // per-doc gram count frames, one per side and order
    def gramCounts(cand: Boolean, bi: Boolean): DataFrame = {
      val g = if (bi) bigrams(col("ts")) else col("ts")
      base.where(col("is_cand") === cand)
        .select(col("pid"), explode(g).as("g"))
        .groupBy("pid", "g").agg(count(lit(1)).as("c"))
    }
    def overlap(bi: Boolean): DataFrame =
      gramCounts(cand = true, bi).as("a")
        .join(gramCounts(cand = false, bi).as("b"), Seq("pid", "g"))
        .groupBy("pid")
        .agg(sum(least(col("a.c"), col("b.c"))).as(if (bi) "ov2" else "ov1"))

    // pair spine: totals from both sides (inner join = complete pairs
    // only), reference's source labels the pair
    val tot = base.select(col("pid"), col("is_cand"), col("source"),
      size(col("ts")).cast("long").as("n1"))
    val spine = tot.where(col("is_cand"))
      .select(col("pid"), col("n1").as("c1"),
        greatest(col("n1") - 1, lit(0L)).as("c2"))
      .join(tot.where(!col("is_cand"))
        .select(col("pid"), col("source"), col("n1").as("r1"),
          greatest(col("n1") - 1, lit(0L)).as("r2")), Seq("pid"))

    spine.join(overlap(bi = false), Seq("pid"), "left")
      .join(overlap(bi = true), Seq("pid"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_pairs"),
        coalesce(sum("ov1"), lit(0L)).as("ov1"), sum("c1").as("c1"),
        sum("r1").as("r1"),
        coalesce(sum("ov2"), lit(0L)).as("ov2"), sum("c2").as("c2"),
        sum("r2").as("r2"))
  }

  /** round(num/den, 6), NULL on a zero denominator (a source whose
    * candidates have no grams at this order) — spelled as the same
    * CASE in the oracles: Spark ANSI mode errors on x/0 while DuckDB
    * returns inf/NaN, so the degenerate case must branch explicitly.
    */
  private def ratio6(num: Column, den: Column): Column =
    when(den === 0, lit(null).cast("double"))
      .otherwise(round(num.cast("double") / den.cast("double"), 6))

  /** Micro-averaged ROUGE-1/ROUGE-2 precision, recall and F1 per
    * reference source. F1 of micro ratios reduces to 2·O/(C+R) — one
    * exact long ratio, not a float composition.
    *
    * @return (source, n_pairs, r1_p, r1_r, r1_f, r2_p, r2_r, r2_f)
    */
  def rouge(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String): DataFrame =
    pairOverlapTotals(docs, idCol, textCol, srcCol).select(
      col("source"), col("n_pairs"),
      ratio6(col("ov1"), col("c1")).as("r1_p"),
      ratio6(col("ov1"), col("r1")).as("r1_r"),
      ratio6(col("ov1") * 2, col("c1") + col("r1")).as("r1_f"),
      ratio6(col("ov2"), col("c2")).as("r2_p"),
      ratio6(col("ov2"), col("r2")).as("r2_r"),
      ratio6(col("ov2") * 2, col("c2") + col("r2")).as("r2_f"))

  /** Corpus-level BLEU-2 per reference source: modified n-gram
    * precisions p1/p2 (clipped overlap over candidate totals — the
    * same sufficient statistics as ROUGE precision), brevity penalty
    * from corpus token totals, geometric mean over orders 1..2. A
    * source with a zero overlap at either order scores 0 (no
    * smoothing), spelled as an explicit CASE in both engines.
    *
    * @return (source, n_pairs, p1, p2, bp, bleu2)
    */
  def bleu2(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String): DataFrame = {
    val t = pairOverlapTotals(docs, idCol, textCol, srcCol)
    val p1 = col("ov1").cast("double") / col("c1").cast("double")
    val p2 = col("ov2").cast("double") / col("c2").cast("double")
    val bp = when(col("c1") === 0, lit(null).cast("double"))
      .otherwise(least(lit(1.0),
        exp(lit(1.0) - col("r1").cast("double") / col("c1").cast("double"))))
    t.select(col("source"), col("n_pairs"),
      ratio6(col("ov1"), col("c1")).as("p1"),
      ratio6(col("ov2"), col("c2")).as("p2"),
      round(bp, 6).as("bp"),
      round(when(col("ov1") === 0 || col("ov2") === 0, lit(0.0))
        .otherwise(bp * exp((log(p1) + log(p2)) / 2)), 6).as("bleu2"))
  }

  /** Shared DuckDB CTE prefix replaying [[pairOverlapTotals]]. */
  private def totalsCte(table: String, idCol: String, textCol: String,
      srcCol: String): String =
    s"""WITH tok AS (SELECT $idCol // 2 AS pid, $idCol % 2 = 1 AS is_cand,
       |    $srcCol AS source,
       |    list_filter(string_split_regex(lower($textCol),
       |      '[ \\t\\n\\f\\r]+'), x -> x <> '') AS ts
       |  FROM $table),
       |big AS (SELECT pid, is_cand,
       |    list_transform(range(1, len(ts)),
       |      i -> ts[i] || ' ' || ts[i + 1]) AS bs
       |  FROM tok),
       |u_c AS (SELECT pid, g, count(*) AS c FROM (
       |    SELECT pid, unnest(ts) AS g FROM tok WHERE is_cand)
       |  GROUP BY 1, 2),
       |u_r AS (SELECT pid, g, count(*) AS c FROM (
       |    SELECT pid, unnest(ts) AS g FROM tok WHERE NOT is_cand)
       |  GROUP BY 1, 2),
       |b_c AS (SELECT pid, g, count(*) AS c FROM (
       |    SELECT pid, unnest(bs) AS g FROM big WHERE is_cand)
       |  GROUP BY 1, 2),
       |b_r AS (SELECT pid, g, count(*) AS c FROM (
       |    SELECT pid, unnest(bs) AS g FROM big WHERE NOT is_cand)
       |  GROUP BY 1, 2),
       |o1 AS (SELECT pid, sum(least(a.c, b.c)) AS ov1
       |  FROM u_c a JOIN u_r b USING (pid, g) GROUP BY pid),
       |o2 AS (SELECT pid, sum(least(a.c, b.c)) AS ov2
       |  FROM b_c a JOIN b_r b USING (pid, g) GROUP BY pid),
       |spine AS (SELECT c.pid, r.source,
       |    CAST(len(c.ts) AS BIGINT) AS c1,
       |    CAST(greatest(len(c.ts) - 1, 0) AS BIGINT) AS c2,
       |    CAST(len(r.ts) AS BIGINT) AS r1,
       |    CAST(greatest(len(r.ts) - 1, 0) AS BIGINT) AS r2
       |  FROM (SELECT * FROM tok WHERE is_cand) c
       |  JOIN (SELECT * FROM tok WHERE NOT is_cand) r USING (pid)),
       |tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_pairs,
       |    CAST(coalesce(sum(ov1), 0) AS BIGINT) AS ov1,
       |    CAST(sum(c1) AS BIGINT) AS c1, CAST(sum(r1) AS BIGINT) AS r1,
       |    CAST(coalesce(sum(ov2), 0) AS BIGINT) AS ov2,
       |    CAST(sum(c2) AS BIGINT) AS c2, CAST(sum(r2) AS BIGINT) AS r2
       |  FROM spine LEFT JOIN o1 USING (pid) LEFT JOIN o2 USING (pid)
       |  GROUP BY source)""".stripMargin

  /** DuckDB replay of [[rouge]]. */
  def rougeOracleSql(table: String, idCol: String, textCol: String,
      srcCol: String): String =
    totalsCte(table, idCol, textCol, srcCol) +
      """
        |SELECT source, n_pairs,
        |  CASE WHEN c1 = 0 THEN NULL ELSE
        |    round(CAST(ov1 AS DOUBLE) / CAST(c1 AS DOUBLE), 6) END AS r1_p,
        |  CASE WHEN r1 = 0 THEN NULL ELSE
        |    round(CAST(ov1 AS DOUBLE) / CAST(r1 AS DOUBLE), 6) END AS r1_r,
        |  CASE WHEN c1 + r1 = 0 THEN NULL ELSE
        |    round(CAST(ov1 * 2 AS DOUBLE) / CAST(c1 + r1 AS DOUBLE), 6) END AS r1_f,
        |  CASE WHEN c2 = 0 THEN NULL ELSE
        |    round(CAST(ov2 AS DOUBLE) / CAST(c2 AS DOUBLE), 6) END AS r2_p,
        |  CASE WHEN r2 = 0 THEN NULL ELSE
        |    round(CAST(ov2 AS DOUBLE) / CAST(r2 AS DOUBLE), 6) END AS r2_r,
        |  CASE WHEN c2 + r2 = 0 THEN NULL ELSE
        |    round(CAST(ov2 * 2 AS DOUBLE) / CAST(c2 + r2 AS DOUBLE), 6) END AS r2_f
        |FROM tot""".stripMargin

  /** DuckDB replay of [[bleu2]]. */
  def bleu2OracleSql(table: String, idCol: String, textCol: String,
      srcCol: String): String =
    totalsCte(table, idCol, textCol, srcCol) +
      """
        |SELECT source, n_pairs,
        |  CASE WHEN c1 = 0 THEN NULL ELSE
        |    round(CAST(ov1 AS DOUBLE) / CAST(c1 AS DOUBLE), 6) END AS p1,
        |  CASE WHEN c2 = 0 THEN NULL ELSE
        |    round(CAST(ov2 AS DOUBLE) / CAST(c2 AS DOUBLE), 6) END AS p2,
        |  CASE WHEN c1 = 0 THEN NULL ELSE
        |    round(least(1.0, exp(1.0 - CAST(r1 AS DOUBLE) / CAST(c1 AS DOUBLE))), 6)
        |    END AS bp,
        |  round(CASE WHEN ov1 = 0 OR ov2 = 0 THEN 0.0
        |    ELSE least(1.0, exp(1.0 - CAST(r1 AS DOUBLE) / CAST(c1 AS DOUBLE)))
        |      * exp((ln(CAST(ov1 AS DOUBLE) / CAST(c1 AS DOUBLE))
        |           + ln(CAST(ov2 AS DOUBLE) / CAST(c2 AS DOUBLE))) / 2)
        |    END, 6) AS bleu2
        |FROM tot""".stripMargin
}
