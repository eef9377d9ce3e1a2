package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-selection operators that turn per-document quality signals
  * into training-set decisions: curriculum phase assignment and
  * token-budget-constrained greedy selection.
  */
object SelectionOps {

  /** Curriculum phase assignment (quality-quartile schedule, the
    * "easy→hard" data-ordering input to curriculum training).
    *
    * Scale shape: NO global sort. One exact-percentile aggregate
    * produces the three cutoffs (3 doubles, driver-held — the same
    * control-table discipline as the BPE vocab), then a single
    * broadcast-free comparison scan assigns phases, plus a per-doc
    * md5 schedule key for deterministic within-phase shuffling. The
    * exact `percentile` keeps DuckDB `quantile_cont` parity (q143
    * precedent); at 100 TB you would swap in `approx_percentile` and
    * lose only the oracle, not the shape.
    *
    * @return (id, quality, phase 1..4, sched_key) — phase 1 is the
    *         lowest-quality quartile
    */
  def curriculumPhases(docs: DataFrame, idCol: String, textCol: String,
      w: TextOps.QualityWeights = TextOps.TrainedQualityWeights): DataFrame = {
    val qual = TextOps.qualityScore(docs, idCol, textCol, w)
    val cuts = qual.agg(
      expr("percentile(quality, array(0.25D, 0.5D, 0.75D))").as("c")).collect()(0)
      .getSeq[Double](0)
    // HALF_UP to match Spark round() / DuckDB round() (math.rint is
    // half-even — would diverge from the oracle on exact .5 cutoffs)
    val Seq(c1, c2, c3) = cuts.map(c =>
      java.math.BigDecimal.valueOf(c).setScale(5, java.math.RoundingMode.HALF_UP).doubleValue)
    qual.select(col("id"), col("quality"),
      (lit(1) + (col("quality") > c1).cast("int") +
        (col("quality") > c2).cast("int") +
        (col("quality") > c3).cast("int")).as("phase"),
      substring(md5(concat(lit("sched:"), col("id").cast("string")).cast("binary")),
        1, 16).as("sched_key"))
  }

  /** DuckDB replay of [[curriculumPhases]]: quantile_cont cutoffs
    * rounded to 5dp, identical comparison cascade. `qualitySubquery`
    * must yield (doc_id, quality) — the shared qualityOracleSql. */
  def curriculumOracleSql(qualitySubquery: String): String =
    s"""WITH q AS ($qualitySubquery),
       |c AS (SELECT round(quantile_cont(quality, 0.25), 5) AS c1,
       |  round(quantile_cont(quality, 0.5), 5) AS c2,
       |  round(quantile_cont(quality, 0.75), 5) AS c3 FROM q)
       |SELECT q.doc_id AS id, q.quality,
       |  1 + CAST(q.quality > c.c1 AS INT) + CAST(q.quality > c.c2 AS INT)
       |    + CAST(q.quality > c.c3 AS INT) AS phase,
       |  substr(md5('sched:' || CAST(q.doc_id AS VARCHAR)), 1, 16) AS sched_key
       |FROM q, c""".stripMargin

  /** Token-budget greedy selection per group: order each group's docs
    * by quality (desc, id tiebreak) and keep documents while the
    * running token total stays within `budget` — the fixed-budget
    * mixture-shaping primitive ("give me the best N tokens per
    * source"). Returns the per-group selection summary.
    *
    * Scale shape: one window (sort within group — the shuffle is by
    * `groupCol`, which is exactly the partitioning the selection
    * semantics require) + one group agg. Long-exact cumulative sums;
    * quality ties at 5dp are broken by id, so selection is
    * deterministic and engine-portable.
    *
    * @return (group, n_total, n_kept, tokens_kept, cutoff_quality)
    */
  /** Largest-remainder (Hamilton) apportionment of an integer budget
    * across groups proportional to integer weights: alloc_i =
    * floor(B·w_i / W) plus one extra unit to the `B − Σfloor` groups
    * with the largest remainder (B·w_i mod W, group asc on ties).
    * EXACT integer arithmetic end to end — allocations sum to B on
    * every engine — which float proration cannot guarantee. The
    * mixture-design step that turns "sample sources ∝ weights" into
    * concrete per-source token budgets. Group-cardinality frames
    * only; one aggregation + one window over |groups| rows.
    */
  def largestRemainderAlloc(weights: DataFrame, groupCol: String,
      weightCol: String, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 0, s"budget must be >= 0, got $budget")
    // Weights must be non-negative INTEGERS with a positive total:
    // cast("long") silently truncates fractional weights, and W == 0
    // (empty input or all-zero weights) would otherwise floor-divide
    // into nulls and leave the budget silently unallocated. The frame
    // is group-cardinality by contract, so one eager driver-side
    // aggregate is cheap insurance.
    val chk = weights.agg(
      sum(col(weightCol).cast("long")).as("tw"),
      sum(when(col(weightCol).cast("double") =!=
        col(weightCol).cast("long").cast("double"), 1L).otherwise(0L))
        .as("nFrac"),
      min(col(weightCol).cast("double")).as("mnW")).head()
    require(!chk.isNullAt(0) && chk.getLong(0) > 0L,
      s"largestRemainderAlloc: sum($weightCol) must be > 0 " +
        "(empty input or all-zero weights)")
    require(chk.getLong(1) == 0L,
      s"largestRemainderAlloc: '$weightCol' has fractional values; " +
        "weights must be integral (cast would silently truncate)")
    require(chk.getDouble(2) >= 0.0,
      s"largestRemainderAlloc: '$weightCol' has negative weights")
    val g = weights.select(col(groupCol).as("grp"),
      col(weightCol).cast("long").as("w"))
    val tot = g.agg(sum("w").as("tw"))
    val base = g.crossJoin(broadcast(tot))
      .select(col("grp"), col("w"),
        // exact floor(B*w/W) via the pmod spelling (all < 2^53 for
        // realistic budgets × weights)
        (((col("w") * budget) - pmod(col("w") * budget, col("tw")))
          / col("tw")).cast("long").as("fl"),
        pmod(col("w") * budget, col("tw")).as("rem"))
    val short = base.agg((lit(budget) - sum("fl")).as("short"))
    val w = Window.orderBy(col("rem").desc, col("grp").asc)
    base.crossJoin(broadcast(short))
      .withColumn("rk", row_number().over(w))
      .select(col("grp"), col("w").as("weight"),
        (col("fl") + when(col("rk") <= col("short"), 1L).otherwise(0L))
          .as("alloc"))
  }

  /** DuckDB twin of [[largestRemainderAlloc]]; `weightsSql` yields
    * (grp, w) rows.
    */
  def largestRemainderOracleSql(weightsSql: String, budget: Long): String =
    s"""WITH g AS (__W__),
       |t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM g),
       |b AS (SELECT grp, CAST(w AS BIGINT) AS w,
       |    (CAST(w AS BIGINT) * $budget) // tw AS fl,
       |    (CAST(w AS BIGINT) * $budget) % tw AS rem
       |  FROM g CROSS JOIN t),
       |s AS (SELECT $budget - CAST(sum(fl) AS BIGINT) AS short FROM b),
       |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, grp ASC)
       |    AS rk FROM b)
       |SELECT grp, w AS weight,
       |  CAST(fl + CASE WHEN rk <= (SELECT short FROM s)
       |    THEN 1 ELSE 0 END AS BIGINT) AS alloc
       |FROM r""".stripMargin.replace("__W__", weightsSql)

  def tokenBudgetSelect(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, budget: Long,
      w: TextOps.QualityWeights = TextOps.TrainedQualityWeights): DataFrame = {
    val qual = TextOps.qualityScore(docs, idCol, textCol, w)
    val base = docs.select(col(idCol).as("id"), col(groupCol).as("grp"),
        coalesce(TextOps.tokenCount(col(textCol)).cast("long"), lit(0L)).as("toks"))
      .join(qual, Seq("id"))
    val win = Window.partitionBy("grp")
      .orderBy(col("quality").desc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.withColumn("cum", sum(col("toks")).over(win))
      .withColumn("kept", col("cum") <= budget)
      .groupBy(col("grp").as(groupCol))
      .agg(count(lit(1)).as("n_total"),
        sum(col("kept").cast("long")).as("n_kept"),
        coalesce(sum(when(col("kept"), col("toks"))), lit(0L)).as("tokens_kept"),
        min(when(col("kept"), col("quality"))).as("cutoff_quality"))
  }

  /** DuckDB replay of [[tokenBudgetSelect]]. */
  def tokenBudgetOracleSql(table: String, idCol: String, textCol: String,
      groupCol: String, budget: Long, qualitySubquery: String): String =
    s"""WITH q AS ($qualitySubquery),
       |b AS (SELECT d.$idCol AS id, d.$groupCol AS grp,
       |  CAST(coalesce(len(regexp_extract_all(d.$textCol, '\\S+')), 0) AS BIGINT)
       |    AS toks,
       |  q.quality
       | FROM $table d JOIN q ON d.$idCol = q.doc_id),
       |c AS (SELECT *, sum(toks) OVER (PARTITION BY grp
       |   ORDER BY quality DESC, id ASC
       |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM b)
       |SELECT grp AS $groupCol, count(*) AS n_total,
       |  CAST(sum(CASE WHEN cum <= $budget THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(coalesce(sum(CASE WHEN cum <= $budget THEN toks END), 0) AS BIGINT)
       |    AS tokens_kept,
       |  min(CASE WHEN cum <= $budget THEN quality END) AS cutoff_quality
       |FROM c GROUP BY grp""".stripMargin

  /** Exact stratified split allocation: WITHIN each stratum the
    * requested permille quotas (e.g. train 800 / val 100 / test 100)
    * are integerized by Hamilton largest-remainder — every stratum's
    * rows are fully allocated (Σ = n exactly) and no split is ever
    * more than one row from its ideal share, unlike hash-based
    * assignment (q69) whose per-stratum proportions only hold in
    * expectation. Deterministic tie-break: larger remainder first,
    * then split declaration order. All integer arithmetic.
    *
    * Scale shape: one stratum aggregation; everything after lives on
    * the (strata × splits) grid. Row-level assignment follows by
    * ranking within the stratum against the cumulative allocation —
    * left to the caller so the counts table stays the contract.
    *
    * @param splits (name, permille), must sum to 1000
    * @return per (stratum, split): strata cols + (split, n, n_alloc)
    */
  def stratifiedSplitCounts(df: DataFrame, strataCols: Seq[String],
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 1000,
      "split permilles must sum to 1000")
    require(strataCols.nonEmpty, "need at least one stratum column")
    val spark = df.sparkSession
    import spark.implicits._
    val n = df.groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
    val sp = splits.zipWithIndex
      .map { case ((nm, q), i) => (nm, q.toLong, i.toLong) }
      .toDF("split", "q", "ord")
    val strat = strataCols.map(col)
    val w = Window.partitionBy(strat: _*)
      .orderBy(col("rem").desc, col("ord").asc)
    n.crossJoin(broadcast(sp))
      .withColumn("base", expr("(n * q) div 1000"))
      .withColumn("rem", expr("(n * q) % 1000"))
      .withColumn("leftover",
        col("n") - sum("base").over(Window.partitionBy(strat: _*)))
      .withColumn("rk", row_number().over(w))
      .select(strat ++ Seq(col("split"), col("n"),
        (col("base") + when(col("rk") <= col("leftover"), 1L)
          .otherwise(0L)).as("n_alloc")): _*)
  }

  /** DuckDB replay of [[stratifiedSplitCounts]] for two stratum
    * columns named in `strataSql` (comma-separated select exprs).
    */
  def stratifiedSplitOracleSql(table: String, strataCols: Seq[String],
      splits: Seq[(String, Int)]): String = {
    val sc = strataCols.mkString(", ")
    val values = splits.zipWithIndex
      .map { case ((nm, q), i) => s"('$nm', $q, $i)" }.mkString(", ")
    s"""WITH n AS (SELECT $sc, CAST(count(*) AS BIGINT) AS n
       |  FROM $table GROUP BY $sc),
       |sp(split, q, ord) AS (VALUES $values),
       |g AS (SELECT $sc, split, n, ord,
       |    (n * q) // 1000 AS base, (n * q) % 1000 AS rem
       |  FROM n CROSS JOIN sp),
       |g2 AS (SELECT *,
       |    n - sum(base) OVER (PARTITION BY $sc) AS leftover,
       |    row_number() OVER (PARTITION BY $sc
       |      ORDER BY rem DESC, ord ASC) AS rk
       |  FROM g)
       |SELECT $sc, split, n,
       |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
       |    AS BIGINT) AS n_alloc
       |FROM g2""".stripMargin
  }
}
