package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pairwise-preference operators — the RLHF/eval-data side of a
  * training pipeline: given corpus-scale "A beat B" comparison rows
  * (human prefs, LLM-judge calls, win/loss eval records), fit a
  * Bradley–Terry strength per item.
  *
  * Reference has no counterpart; LLM-pipeline surface per the builder
  * brief. Built on the repo's model-vs-data split discipline
  * (QualityFit, BPE): the DATA pass is one map-side-combined
  * aggregation of the comparison stream down to an items² count
  * table; the MODEL fit (MM iterations) runs on the driver over that
  * bounded table, with every iterate rounded to 6dp so the DuckDB
  * oracle can replay the identical trajectory bit-for-bit.
  */
object PreferenceOps {

  /** Iterations of the Hunter (2004) MM update. Fixed — part of the
    * cross-engine contract (the oracle unrolls exactly this many).
    */
  val Iterations = 20

  /** Laplace-style smoothing added to EVERY ordered item pair: keeps
    * the comparison graph connected (isolated or all-winning items
    * otherwise send the MLE to 0/∞) and makes the fit unique.
    */
  val Smoothing = 0.1

  private def r6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  /** Fit Bradley–Terry strengths from comparison rows
    * `(winnerCol, loserCol)` (one row per observed comparison; same-
    * item rows are ignored). Output: one row per item —
    * (item, wins, losses, strength, rank), strength normalized to
    * mean 1.0, rank by strength desc (item asc on ties).
    *
    * MM update (Hunter 2004), `Iterations` rounds from w = 1:
    *
    *   w_i ← W_i / Σ_{j≠i} (n_ij + n_ji) / (w_i + w_j)
    *
    * with n smoothed (+[[Smoothing]] on every ordered pair) and
    * W_i = Σ_j n_ij; after each round every iterate rounds to 6dp,
    * then normalizes by the mean (and rounds again) — the rounding is
    * what pins the trajectory across engines (sub-ulp sum-order
    * differences die at each 6dp gate instead of compounding).
    *
    * Scale shape: the comparison stream (corpus-scale — billions of
    * judge calls) collapses in ONE map-side-combined groupBy to at
    * most items² rows; only that model-scale table is collected
    * (guarded — items is label/model cardinality, not data
    * cardinality). The MM solve is O(iters · items²) on KBs.
    */
  def bradleyTerry(comparisons: DataFrame, winnerCol: String,
      loserCol: String, maxItems: Int = 10000): DataFrame = {
    val spark = comparisons.sparkSession
    import spark.implicits._
    val pairs = comparisons
      .filter(col(winnerCol) =!= col(loserCol))
      .select(col(winnerCol).cast("string").as("w"),
        col(loserCol).cast("string").as("l"))
    // ONE comparison-stream scan, bounded on the pathological path:
    // collect the grouped frame through limit(maxItems² + 1), then
    // guard cardinality DRIVER-SIDE over the collected rows. The cap
    // makes the shipment bounded regardless of input — a data-scale
    // item column (user ids instead of model labels) ships at most
    // maxItems²+1 model-scale rows, never the corpus. The cardinality
    // check is sound under the cap: k distinct items admit at most
    // k·(k−1) distinct ordered pairs, so ANY maxItems²+1 collected
    // pair rows contain > maxItems distinct items — a cap-hit can
    // only ever strengthen the failure, never mask a healthy input
    // (healthy frames have ≤ maxItems² rows and are collected whole,
    // so their counts are exact). This replaces the r13/r14 two-scan
    // form (countDistinct guard + collect) — same O(1)-vs-data
    // storage guarantee, one job on the healthy path (q171 doubled
    // under the two-scan form).
    val cap = maxItems.toLong * maxItems + 1
    val counts = pairs
      .groupBy($"w", $"l")
      .agg(count(lit(1)).as("n"))
      .limit(if (cap > Int.MaxValue) Int.MaxValue else cap.toInt)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nItems = counts.iterator.flatMap(c => Iterator(c._1, c._2))
      .toSet.size
    require(nItems >= 2, s"bradleyTerry needs >= 2 items, got $nItems")
    // When the cap was hit, nItems is a lower bound — still provably
    // > maxItems (see pair-count argument above), so the message is
    // conservative but the decision is exact.
    require(nItems <= maxItems,
      s"bradleyTerry found $nItems distinct items (> $maxItems): the item " +
        "column must be model-scale (labels), not data-scale (ids)")
    val items = counts.flatMap(c => Seq(c._1, c._2)).distinct.sorted
    val idx = items.zipWithIndex.toMap
    val m = items.length
    val raw = Array.ofDim[Double](m, m)
    for ((wi, li, n) <- counts) raw(idx(wi))(idx(li)) += n.toDouble
    // Smoothed counts + win totals (order-free: per-cell adds).
    val nS = Array.tabulate(m, m)((i, j) =>
      if (i == j) 0.0 else raw(i)(j) + Smoothing)
    val bigW = Array.tabulate(m)(i => (0 until m).map(nS(i)).sum)
    var w = Array.fill(m)(1.0)
    for (_ <- 1 to Iterations) {
      // Σ_j in ascending item order — the oracle's sum order can
      // differ sub-ulp; the 6dp gates below absorb that.
      val rawNext = Array.tabulate(m) { i =>
        val s = (0 until m).filter(_ != i)
          .map(j => (nS(i)(j) + nS(j)(i)) / (w(i) + w(j))).sum
        r6(bigW(i) / s)
      }
      val mean = rawNext.sum / m
      w = rawNext.map(x => r6(x / mean))
    }
    val order = (0 until m).sortBy(i => (-w(i), items(i)))
    val rank = Array.ofDim[Int](m)
    for ((i, r) <- order.zipWithIndex) rank(i) = r + 1
    items.indices.map { i =>
      (items(i),
        (0 until m).map(j => raw(i)(j)).sum.toLong,
        (0 until m).map(j => raw(j)(i)).sum.toLong,
        w(i), rank(i))
    }.toDF("item", "wins", "losses", "strength", "rank")
  }

  /** DuckDB oracle replaying [[bradleyTerry]] over comparison rows
    * produced by `comparisonsSql` (must yield columns `w`, `l` — one
    * row per comparison, same-item rows already excluded or not, they
    * are re-filtered here). Unrolls the exact MM trajectory with the
    * same 6dp gates.
    */
  def bradleyTerryOracleSql(comparisonsSql: String): String = {
    val iters = (1 to Iterations).map { t =>
      val prev = s"w${t - 1}"
      // MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and
      // each iteration references the previous one TWICE — inlined,
      // the expansion is 2^Iterations copies of the base scan.
      s"""raw$t AS MATERIALIZED (
         | SELECT s.i, round(tw.W / sum((s.nij + s.nji) / (wa.w + wb.w)), 6) AS w
         | FROM sym s
         | JOIN $prev wa ON wa.i = s.i
         | JOIN $prev wb ON wb.i = s.j
         | JOIN totw tw ON tw.i = s.i
         | GROUP BY s.i, tw.W),
         |w$t AS MATERIALIZED (
         | SELECT i, round(w / (SELECT sum(w) / count(*) FROM raw$t), 6) AS w
         | FROM raw$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH comps AS MATERIALIZED ($comparisonsSql),
       |cnt AS MATERIALIZED (SELECT w AS wi, l AS li, count(*)::DOUBLE AS c
       |        FROM comps WHERE w <> l GROUP BY w, l),
       |items AS MATERIALIZED (SELECT DISTINCT wi AS i FROM cnt
       |          UNION SELECT DISTINCT li FROM cnt),
       |pairs AS MATERIALIZED (
       | SELECT a.i, b.i AS j,
       |  coalesce(c.c, 0.0) + $Smoothing AS n,
       |  coalesce(c2.c, 0.0) AS rawn
       | FROM items a JOIN items b ON a.i <> b.i
       | LEFT JOIN cnt c ON c.wi = a.i AND c.li = b.i
       | LEFT JOIN cnt c2 ON c2.wi = a.i AND c2.li = b.i),
       |sym AS MATERIALIZED (
       | SELECT p.i, p.j, p.n AS nij, p2.n AS nji
       | FROM pairs p JOIN pairs p2 ON p.i = p2.j AND p.j = p2.i),
       |totw AS MATERIALIZED (SELECT i, sum(n) AS W FROM pairs GROUP BY i),
       |w0 AS (SELECT i, 1.0 AS w FROM items),
       |$iters
       |SELECT f.i AS item,
       | CAST(coalesce((SELECT sum(rawn) FROM pairs WHERE pairs.i = f.i), 0) AS BIGINT) AS wins,
       | CAST(coalesce((SELECT sum(rawn) FROM pairs WHERE pairs.j = f.i), 0) AS BIGINT) AS losses,
       | f.w AS strength,
       | CAST(row_number() OVER (ORDER BY f.w DESC, f.i) AS INTEGER) AS rank
       |FROM w$Iterations f""".stripMargin
  }

  /** DPO/RLHF preference-PAIR construction from a scored corpus: per
    * prompt group, the top- and bottom-scored responses (deterministic
    * id tie-breaks) become the (chosen, rejected) pair, kept only when
    * the score margin clears `minMargin` — low-margin pairs are label
    * noise in DPO training.
    *
    * Scale shape: two row_number windows partitioned by the group key
    * (one shuffle; groups process independently) and a group-keyed
    * self-join of two 1-row-per-group frames. Nothing global, nothing
    * quadratic.
    */
  def dpoPairs(scored: DataFrame, idCol: String, scoreCol: String,
      groupCol: org.apache.spark.sql.Column, minMargin: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = scored.select(col(idCol).as("id"), col(scoreCol).as("q"),
      groupCol.as("bucket"))
    val best = base.withColumn("rn", row_number().over(
        Window.partitionBy("bucket").orderBy(col("q").desc, col("id").asc)))
      .filter(col("rn") === 1)
      .select(col("bucket"), col("id").as("chosen_id"), col("q").as("cq"))
    val worst = base.withColumn("rn", row_number().over(
        Window.partitionBy("bucket").orderBy(col("q").asc, col("id").asc)))
      .filter(col("rn") === 1)
      .select(col("bucket"), col("id").as("rejected_id"), col("q").as("rq"))
    best.join(worst, "bucket")
      .filter(col("chosen_id") =!= col("rejected_id") &&
        col("cq") - col("rq") >= minMargin)
      .select(col("bucket"), col("chosen_id"), col("rejected_id"),
        round(col("cq") - col("rq"), 6).as("margin"))
  }

  /** DuckDB twin of [[dpoPairs]]: `scoredSql` must yield
    * (doc_id, quality) rows; the group key is doc_id % `bucketMod`.
    */
  def dpoOracleSql(scoredSql: String, bucketMod: Int,
      minMargin: String): String =
    s"""WITH q AS (__SCORED__),
       |b AS (SELECT doc_id AS id, quality AS q, doc_id % $bucketMod AS bucket
       |  FROM q),
       |ch AS (SELECT bucket, id AS chosen_id, q AS cq,
       |  row_number() OVER (PARTITION BY bucket ORDER BY q DESC, id) AS rn
       |  FROM b),
       |rj AS (SELECT bucket, id AS rejected_id, q AS rq,
       |  row_number() OVER (PARTITION BY bucket ORDER BY q ASC, id) AS rn
       |  FROM b)
       |SELECT ch.bucket, chosen_id, rejected_id, round(cq - rq, 6) AS margin
       |FROM ch JOIN rj ON ch.bucket = rj.bucket
       |WHERE ch.rn = 1 AND rj.rn = 1
       |  AND chosen_id <> rejected_id AND cq - rq >= $minMargin"""
      .stripMargin.replace("__SCORED__", scoredSql)
}
