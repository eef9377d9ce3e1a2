package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level data profiling — the guardrail a pipeline runs before
  * and after every large transform (schema drift, null regressions,
  * key-cardinality sanity; at 100 TB you profile a table, you don't
  * eyeball it).
  *
  * ONE scan for all columns: the null and distinct counts ride a
  * single aggregation (multi-column count-distinct plans as one
  * Expand — rows multiply by the column count map-side, but the input
  * is read once and the combine is map-side; the alternative, one
  * pass per column, re-reads the table N times). The wide one-row
  * result is then unpivoted driver-free into long form.
  */
object ProfileOps {

  /** (column, n_nulls, n_distinct) per requested column. Distinct
    * counts are EXACT (null excluded, matching COUNT(DISTINCT c));
    * swap countDistinct for approx_count_distinct when profiling at
    * full corpus scale and ±2% is acceptable.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // internal agg aliases are index-based so profiled column names
    // never leak into alias resolution. Inputs resolve via df.col
    // with backtick quoting, so a column literally named "a.b" is
    // profiled as itself, not parsed as struct-field access.
    def in(c: String) = df.col(s"`${c.replace("`", "``")}`")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(in(c)).as(s"_nn_$i"), countDistinct(in(c)).as(s"_nd_$i"))
    }
    val wide = df.agg(count(lit(1)).as("_n_rows"), aggs: _*)
    wide.select(explode(array(cols.zipWithIndex.map { case (c, i) =>
        struct(lit(c).as("column"),
          (col("_n_rows") - col(s"_nn_$i")).as("n_nulls"),
          col(s"_nd_$i").as("n_distinct"))
      }: _*)).as("p"))
      .select(col("p.column"), col("p.n_nulls"), col("p.n_distinct"))
  }

  /** Pairwise Pearson correlation matrix over numeric columns in ONE
    * corpus pass — the feature-redundancy probe a mixture/quality
    * designer runs before fitting weights (two signals correlated at
    * 0.98 are one signal).
    *
    * Determinism contract (the QualityFit discipline): every
    * aggregated term is a per-row IEEE double product CAST to
    * decimal(38,18) BEFORE the sum — products are row-local (order-
    * free) and decimal sums are associative, so the sums are
    * bit-identical under any partitioning; the closed-form corr is
    * then computed driver-side from the single aggregate row with a
    * fixed operation order (cast-to-double first, same order as the
    * oracle SQL). Casting the PRODUCT (not the factors) sidesteps
    * engine-specific decimal-multiply precision-loss rules.
    *
    * Scale: one map-side-combined aggregation to a single row of
    * 1 + k + k(k+1)/2 numbers; k(k-1)/2 output rows. Zero-variance
    * columns yield NULL corr (nothing to correlate).
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    val spark = df.sparkSession
    val D = "decimal(38,18)"
    val pairs = for { i <- cols.indices; j <- i until cols.size } yield (i, j)
    val aggs = (cols.zipWithIndex.map { case (c, i) =>
        sum(col(c).cast(D)).as(s"s_$i")
      } ++ pairs.map { case (i, j) =>
        sum((col(cols(i)) * col(cols(j))).cast(D)).as(s"p_${i}_$j")
      }).toSeq
    val r = df.agg(count(lit(1)).as("n"), aggs: _*).collect()(0)
    val n = r.getLong(0).toDouble
    def d(name: String): Double = {
      val v = r.getDecimal(r.fieldIndex(name))
      if (v == null) 0.0 else v.doubleValue
    }
    val out = for { i <- cols.indices; j <- (i + 1) until cols.size } yield {
      val num = n * d(s"p_${i}_$j") - d(s"s_$i") * d(s"s_$j")
      val den = math.sqrt(n * d(s"p_${i}_$i") - d(s"s_$i") * d(s"s_$i")) *
        math.sqrt(n * d(s"p_${j}_$j") - d(s"s_$j") * d(s"s_$j"))
      val corr: java.lang.Double =
        if (den == 0.0 || den.isNaN) null
        else java.math.BigDecimal.valueOf(num / den)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
      (cols(i), cols(j), r.getLong(0), corr)
    }
    import spark.implicits._
    out.toDF("col_a", "col_b", "n", "corr")
  }

  /** Fixed-point limb-sum variant of [[corrMatrix]]: bit-identical
    * results at ~10× the throughput (measured 0.35s vs 3.4s warm on
    * the q120 shape, DecimalScaleProbe), for columns whose values are
    * exact multiples of 10^-scale (money, quantities, rates — the
    * common profiling case).
    *
    * Mechanics: each value scales to an integer (`floor(x·10^s + 0.5)`
    * — pure codegen; the scaled value sits within ~1e-6 of the true
    * integer, far from the .5 boundary, so this equals the decimal
    * cast's HALF_UP for every in-contract input) and each moment sums
    * as TWO plain long limbs (`hi = x div 1e6`, `lo = pmod(x, 1e6)` —
    * both nonneg-remainder floor-division, order-independent, exact).
    * The driver reassembles hi·1e6 + lo as BigDecimal — the SAME
    * exact rational the decimal(38,18) path produces, so results (and
    * the q120 oracle) are unchanged while every aggregate stays in
    * whole-stage codegen with zero per-row allocation.
    *
    * Contract: |x|·10^(2·scale) < 2^52 per value (the product moment
    * must scale exactly into a double-representable integer), and
    * Σ|x·10^s| / 1e6 < 2^63 per partition-merged moment (hi-limb sum
    * fits a long — ~10^15 rows of money-sized values). Violations are
    * a caller error; [[corrMatrix]] remains the unconditional path.
    */
  def corrMatrixFixedPoint(df: DataFrame, cols: Seq[String],
      scale: Int): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    require(scale >= 0 && scale <= 6, s"scale must be in [0,6], got $scale")
    val spark = df.sparkSession
    val M = 1000000L
    val pairs = for { i <- cols.indices; j <- i until cols.size } yield (i, j)
    def scaled(c: org.apache.spark.sql.Column, s: Int) =
      floor(c * math.pow(10.0, s) + 0.5).cast("long")
    val moments = (cols.zipWithIndex.map { case (c, i) =>
        (s"s_$i", scaled(col(c), scale), scale)
      } ++ pairs.map { case (i, j) =>
        (s"p_${i}_$j", scaled(col(cols(i)) * col(cols(j)), 2 * scale), 2 * scale)
      }).toSeq
    val projected = df.select(moments.map { case (n, e, _) => e.as(n) }: _*)
    val limbAggs = moments.flatMap { case (n, _, _) =>
      Seq(sum(expr(s"($n - pmod($n, ${M}L)) div ${M}L")).as(s"hi_$n"),
        sum(pmod(col(n), lit(M))).as(s"lo_$n"))
    }
    val r = projected.agg(count(lit(1)).as("n"), limbAggs: _*).collect()(0)
    val n = r.getLong(0).toDouble
    val descale = moments.map { case (nm, _, s) => nm -> s }.toMap
    def d(name: String): Double = {
      val hiIdx = r.fieldIndex(s"hi_$name"); val loIdx = r.fieldIndex(s"lo_$name")
      if (r.isNullAt(hiIdx) && r.isNullAt(loIdx)) 0.0
      else {
        val hi = if (r.isNullAt(hiIdx)) 0L else r.getLong(hiIdx)
        val lo = if (r.isNullAt(loIdx)) 0L else r.getLong(loIdx)
        java.math.BigDecimal.valueOf(hi)
          .multiply(java.math.BigDecimal.valueOf(M))
          .add(java.math.BigDecimal.valueOf(lo))
          .movePointLeft(descale(name)).doubleValue
      }
    }
    val out = for { i <- cols.indices; j <- (i + 1) until cols.size } yield {
      val num = n * d(s"p_${i}_$j") - d(s"s_$i") * d(s"s_$j")
      val den = math.sqrt(n * d(s"p_${i}_$i") - d(s"s_$i") * d(s"s_$i")) *
        math.sqrt(n * d(s"p_${j}_$j") - d(s"s_$j") * d(s"s_$j"))
      val corr: java.lang.Double =
        if (den == 0.0 || den.isNaN) null
        else java.math.BigDecimal.valueOf(num / den)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
      (cols(i), cols(j), r.getLong(0), corr)
    }
    import spark.implicits._
    out.toDF("col_a", "col_b", "n", "corr")
  }

  /** Double-sum variant of [[corrMatrix]] for when bit-reproducibility
    * is not required: identical closed form and output shape, but the
    * moments accumulate as IEEE doubles — ~20× faster per row than the
    * decimal path (measured sf0.1, DecimalScaleProbe: 0.15s vs 3.4s;
    * the cost is Spark's decimal Sum itself, not the scale — 38,4
    * only bought ~10%), at the price of partition-order-dependent
    * last-ulp results. The 6dp rounding hides that in practice, but
    * "in practice" is not a reproducibility contract — anything that
    * feeds a frozen artifact (QualityFit, model cards) should stay on
    * [[corrMatrix]].
    */
  def corrMatrixApprox(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    val spark = df.sparkSession
    val pairs = for { i <- cols.indices; j <- i until cols.size } yield (i, j)
    val aggs = (cols.zipWithIndex.map { case (c, i) =>
        sum(col(c).cast("double")).as(s"s_$i")
      } ++ pairs.map { case (i, j) =>
        sum((col(cols(i)) * col(cols(j))).cast("double")).as(s"p_${i}_$j")
      }).toSeq
    val r = df.agg(count(lit(1)).as("n"), aggs: _*).collect()(0)
    val n = r.getLong(0).toDouble
    def d(name: String): Double = r.getDouble(r.fieldIndex(name))
    val out = for { i <- cols.indices; j <- (i + 1) until cols.size } yield {
      val num = n * d(s"p_${i}_$j") - d(s"s_$i") * d(s"s_$j")
      val den = math.sqrt(n * d(s"p_${i}_$i") - d(s"s_$i") * d(s"s_$i")) *
        math.sqrt(n * d(s"p_${j}_$j") - d(s"s_$j") * d(s"s_$j"))
      val corr: java.lang.Double =
        if (den == 0.0 || den.isNaN) null
        else java.math.BigDecimal.valueOf(num / den)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
      (cols(i), cols(j), r.getLong(0), corr)
    }
    import spark.implicits._
    out.toDF("col_a", "col_b", "n", "corr")
  }

  /** The q120 oracle for ANY column list — DuckDB SQL computing the
    * identical decimal sums and the identical double arithmetic in
    * the identical order as [[corrMatrix]].
    */
  def corrOracleSql(table: String, cols: Seq[String]): String = {
    val sums = (cols.zipWithIndex.map { case (c, i) =>
      s"sum(CAST($c AS DECIMAL(38,18))) AS s_$i"
    } ++ (for { i <- cols.indices; j <- i until cols.size } yield
      s"sum(CAST(${cols(i)} * ${cols(j)} AS DECIMAL(38,18))) AS p_${i}_$j"))
      .mkString(",\n  ")
    def dbl(x: String) = s"CAST($x AS DOUBLE)"
    val rows = (for { i <- cols.indices; j <- (i + 1) until cols.size } yield {
      val num = s"${dbl("n")} * ${dbl(s"p_${i}_$j")} " +
        s"- ${dbl(s"s_$i")} * ${dbl(s"s_$j")}"
      def varTerm(k: Int) =
        s"${dbl("n")} * ${dbl(s"p_${k}_$k")} - ${dbl(s"s_$k")} * ${dbl(s"s_$k")}"
      s"""SELECT '${cols(i)}' AS col_a, '${cols(j)}' AS col_b,
         | CAST(n AS BIGINT) AS n,
         | CASE WHEN sqrt(${varTerm(i)}) * sqrt(${varTerm(j)}) = 0 THEN NULL
         |   ELSE round(($num) / (sqrt(${varTerm(i)}) * sqrt(${varTerm(j)})), 6)
         |   END AS corr FROM a""".stripMargin
    }).mkString("\nUNION ALL\n")
    s"WITH a AS (SELECT count(*) AS n,\n  $sums\n FROM $table)\n$rows"
  }

  /** Pairwise token-distribution divergence between groups (sources,
    * languages, time slices): Jensen–Shannon divergence of the
    * unigram distributions for EVERY unordered group pair — the
    * "which sources look alike" matrix that seeds mixture design and
    * redundant-source pruning. Uses the entropy decomposition
    *
    *   JSD(P,Q) = G_P + G_Q + S_common − (H_P + H_Q)/2,
    *   H_P = −Σ p ln p,  G_P = −Σ (p/2) ln(p/2)  (per-group scalars),
    *   S_common = Σ_{common toks} [(p/2)ln(p/2) + (q/2)ln(q/2) − m ln m]
    *
    * so only COMMON tokens need the pairwise join — per-group
    * entropies are independent aggregates, and a token appearing in
    * one side only contributes through G alone (algebra pinned by the
    * JSD(P,P)=0 identity in the spec). Shape: one corpus scan to the
    * vocab-bounded (group, token, count) table; everything after is
    * vocab-sized (a token-keyed self-join + a |groups|² scalar
    * cross). Oracle replays term order; sums round to 6dp.
    */
  def tokenDistJsd(df: DataFrame, textCol: String,
      groupCol: String): DataFrame = {
    val c = df.select(col(groupCol).as("g"),
        explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy("g", "tok").agg(count(lit(1)).as("c"))
    val n = c.groupBy("g").agg(sum("c").as("n"))
    val dist = c.join(n, Seq("g"))
      .select(col("g"), col("tok"),
        (col("c").cast("double") / col("n")).as("p"))
    val scal = dist.groupBy("g").agg(
      (-sum(col("p") * log(col("p")))).as("h"),
      (-sum((col("p") / 2.0) * log(col("p") / 2.0))).as("gg"))
    val a = dist.select(col("g").as("ga"), col("tok"), col("p"))
    val b = dist.select(col("g").as("gb"), col("tok"), col("p").as("q"))
    val common = a.join(b, Seq("tok"))
      .where(col("ga") < col("gb"))
      .groupBy("ga", "gb").agg(
        count(lit(1)).as("n_common"),
        sum((col("p") / 2.0) * log(col("p") / 2.0)
          + (col("q") / 2.0) * log(col("q") / 2.0)
          - ((col("p") + col("q")) / 2.0) * log((col("p") + col("q")) / 2.0))
          .as("s_common"))
    val sa = scal.select(col("g").as("ga"), col("h").as("ha"), col("gg").as("gga"))
    val sb = scal.select(col("g").as("gb"), col("h").as("hb"), col("gg").as("ggb"))
    sa.crossJoin(sb).where(col("ga") < col("gb"))
      .join(common, Seq("ga", "gb"), "left")
      .select(col("ga").as("group_a"), col("gb").as("group_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        round(col("gga") + col("ggb") + coalesce(col("s_common"), lit(0.0))
          - (col("ha") + col("hb")) / 2.0, 6).as("jsd"))
  }

  /** DuckDB oracle replaying [[tokenDistJsd]]. */
  def tokenDistJsdOracleSql(table: String, textCol: String,
      groupCol: String): String =
    s"""WITH c AS (SELECT $groupCol AS g, unnest(list_filter(
       |    string_split_regex(lower($textCol), '[ \\t\\n\\f\\r]+'), x -> x <> '')) AS tok
       |  FROM $table),
       |cc AS (SELECT g, tok, count(*) AS c FROM c GROUP BY 1, 2),
       |nn AS (SELECT g, sum(c) AS n FROM cc GROUP BY g),
       |dist AS (SELECT cc.g, tok, CAST(c AS DOUBLE) / n AS p
       |         FROM cc JOIN nn ON cc.g = nn.g),
       |scal AS (SELECT g, -sum(p * ln(p)) AS h,
       |  -sum((p / 2.0) * ln(p / 2.0)) AS gg FROM dist GROUP BY g),
       |common AS (SELECT a.g AS ga, b.g AS gb, count(*) AS n_common,
       |  sum((a.p / 2.0) * ln(a.p / 2.0) + (b.p / 2.0) * ln(b.p / 2.0)
       |    - ((a.p + b.p) / 2.0) * ln((a.p + b.p) / 2.0)) AS s_common
       | FROM dist a JOIN dist b ON a.tok = b.tok AND a.g < b.g
       | GROUP BY 1, 2)
       |SELECT sa.g AS group_a, sb.g AS group_b,
       | coalesce(n_common, 0) AS n_common,
       | round(sa.gg + sb.gg + coalesce(s_common, 0.0)
       |   - (sa.h + sb.h) / 2.0, 6) AS jsd
       |FROM scal sa JOIN scal sb ON sa.g < sb.g
       |LEFT JOIN common ON common.ga = sa.g AND common.gb = sb.g""".stripMargin

  /** Heaps' law fit of vocabulary growth: OLS of ln(vocab) on
    * ln(tokens) across groups (sources/shards) — natural text sits
    * near V = k·N^β with β ≈ 0.4–0.6, so a materially different
    * exponent (or poor fit) flags template/synthetic/truncated
    * sources the same way q129's Zipf slope flags token
    * distributions. One scan to per-group (tokens, vocab) — both
    * map-side combined — then the q129 closed form over |groups|
    * points.
    */
  def heapsFit(df: DataFrame, textCol: String, groupCol: String): DataFrame = {
    val g = df.select(col(groupCol).as("g"),
        explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy("g").agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("tok")).as("vocab"))
      .select(log(col("n_tokens").cast("double")).as("x"),
        log(col("vocab").cast("double")).as("y"))
    val s = g.agg(count(lit(1)).cast("double").as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    val icept = (col("sy") - slope * col("sx")) / col("n")
    val r2 = ((col("n") * col("sxy") - col("sx") * col("sy")) *
        (col("n") * col("sxy") - col("sx") * col("sy"))) /
      ((col("n") * col("sxx") - col("sx") * col("sx")) *
        (col("n") * col("syy") - col("sy") * col("sy")))
    s.select(col("n").cast("long").as("n_groups"),
      round(slope, 5).as("heaps_beta"),
      round(exp(icept), 5).as("heaps_k"),
      round(r2, 5).as("r2"))
  }

  /** DuckDB oracle replaying [[heapsFit]]. */
  def heapsOracleSql(table: String, textCol: String,
      groupCol: String): String =
    s"""WITH t AS (SELECT $groupCol AS g, unnest(list_filter(
       |    string_split_regex(lower($textCol), '[ \\t\\n\\f\\r]+'), x -> x <> '')) AS tok
       |  FROM $table),
       |gv AS (SELECT g, ln(CAST(count(*) AS DOUBLE)) AS x,
       |  ln(CAST(count(DISTINCT tok) AS DOUBLE)) AS y FROM t GROUP BY g),
       |s AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
       |  sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy FROM gv)
       |SELECT CAST(n AS BIGINT) AS n_groups,
       | round((n * sxy - sx * sy) / (n * sxx - sx * sx), 5) AS heaps_beta,
       | round(exp((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n), 5)
       |   AS heaps_k,
       | round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
       |   / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 5) AS r2
       |FROM s""".stripMargin

  /** Log-normal fit of the document-length distribution — natural
    * text lengths are approximately log-normal, so (μ, σ) of
    * ln(tokens) plus the 3σ-outlier count is the one-row probe that
    * flags truncation pipelines, concatenation bugs, and
    * boilerplate floods (all of which bend the length distribution
    * before they show up anywhere else). Two passes: a scalar moment
    * aggregate, then the outlier count against the broadcast scalars
    * — both map-side combined; fixed double order mirrored by
    * [[lengthLogNormalOracleSql]].
    */
  def lengthLogNormal(df: DataFrame, textCol: String): DataFrame = {
    val base = df
      .select(size(TextOps.tokens(col(textCol))).cast("long").as("nt"))
      .where(col("nt") > 0)
      .select(log(col("nt").cast("double")).as("x"))
    val s = base.agg(count(lit(1)).as("n"), avg("x").as("mu"),
      avg(col("x") * col("x")).as("ex2"))
    base.crossJoin(broadcast(s))
      .select(col("n"), col("mu"),
        sqrt(col("ex2") - col("mu") * col("mu")).as("sigma"), col("x"))
      .groupBy("n", "mu", "sigma")
      .agg(sum((abs(col("x") - col("mu")) > lit(3.0) * col("sigma"))
        .cast("long")).as("n_outliers"))
      .select(col("n"), round(col("mu"), 6).as("mu"),
        round(col("sigma"), 6).as("sigma"), col("n_outliers"))
  }

  /** DuckDB oracle replaying [[lengthLogNormal]]. */
  def lengthLogNormalOracleSql(table: String, textCol: String): String =
    s"""WITH b AS (SELECT ln(CAST(len(list_filter(string_split_regex(
       |    lower($textCol), '[ \\t\\n\\f\\r]+'), x -> x <> '')) AS DOUBLE)) AS x
       |  FROM $table
       |  WHERE len(list_filter(string_split_regex(lower($textCol), '[ \\t\\n\\f\\r]+'),
       |    x -> x <> '')) > 0),
       |s AS (SELECT count(*) AS n, avg(x) AS mu, avg(x * x) AS ex2 FROM b)
       |SELECT CAST(n AS BIGINT) AS n, round(mu, 6) AS mu,
       | round(sqrt(ex2 - mu * mu), 6) AS sigma,
       | CAST(sum(CASE WHEN abs(x - mu) > 3.0 * sqrt(ex2 - mu * mu)
       |   THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
       |FROM b, s GROUP BY n, mu, ex2""".stripMargin

  /** Zipf power-law fit of the corpus token-frequency distribution:
    * OLS of ln(count) on ln(rank) over the full vocabulary — slope
    * ≈ −1 is the Zipf signature; a materially flatter or steeper
    * exponent (or low r²) is the one-row tell for synthetic/spammy/
    * truncated corpora. One corpus scan map-side combines to the
    * vocab-bounded count table; the rank is a TOTAL order
    * (count desc, token asc — deterministic under ties) via a single
    * window over the vocab table (single-partition but vocab-sized,
    * i.e. millions of rows at 100 TB, not corpus-sized — fine; swap
    * in a two-pass range-partitioned rank if the vocabulary itself
    * ever outgrows one partition). Closed-form OLS in a fixed
    * double-precision order, mirrored by [[zipfOracleSql]].
    */
  def zipfFit(df: DataFrame, textCol: String): DataFrame = {
    val tc = df.select(explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c").desc, col("tok"))
    val r = tc.select(row_number().over(w).cast("double").as("rank"),
      col("c").cast("double").as("cnt"))
    val s = r.agg(
      count(lit(1)).cast("double").as("n"),
      sum(log(col("rank"))).as("sx"),
      sum(log(col("cnt"))).as("sy"),
      sum(log(col("rank")) * log(col("cnt"))).as("sxy"),
      sum(log(col("rank")) * log(col("rank"))).as("sxx"),
      sum(log(col("cnt")) * log(col("cnt"))).as("syy"),
      sum(col("cnt")).cast("long").as("total_tokens"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    val icept = (col("sy") - slope * col("sx")) / col("n")
    val r2num = (col("n") * col("sxy") - col("sx") * col("sy")) *
      (col("n") * col("sxy") - col("sx") * col("sy"))
    val r2den = (col("n") * col("sxx") - col("sx") * col("sx")) *
      (col("n") * col("syy") - col("sy") * col("sy"))
    s.select(col("n").cast("long").as("vocab"), col("total_tokens"),
      round(slope, 5).as("zipf_slope"),
      round(icept, 5).as("intercept"),
      round(r2num / r2den, 5).as("r2"))
  }

  /** DuckDB oracle replaying [[zipfFit]]'s rank order and OLS math. */
  def zipfOracleSql(table: String, textCol: String): String =
    s"""WITH tok AS (SELECT unnest(list_filter(
       |    string_split_regex(lower($textCol), '[ \\t\\n\\f\\r]+'), x -> x <> '')) AS tok
       |  FROM $table),
       |tc AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
       |r AS (SELECT CAST(row_number() OVER (ORDER BY c DESC, tok) AS DOUBLE)
       |        AS rank, CAST(c AS DOUBLE) AS cnt FROM tc),
       |s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
       |  sum(ln(rank)) AS sx, sum(ln(cnt)) AS sy,
       |  sum(ln(rank) * ln(cnt)) AS sxy,
       |  sum(ln(rank) * ln(rank)) AS sxx,
       |  sum(ln(cnt) * ln(cnt)) AS syy,
       |  CAST(sum(cnt) AS BIGINT) AS total_tokens FROM r)
       |SELECT CAST(n AS BIGINT) AS vocab, total_tokens,
       | round((n * sxy - sx * sy) / (n * sxx - sx * sx), 5) AS zipf_slope,
       | round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 5)
       |   AS intercept,
       | round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
       |   / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 5) AS r2
       |FROM s""".stripMargin
  /** Cohen's kappa between two boolean "raters" over the same ids —
    * the scorer-agreement audit (rule-based vs trained quality, two
    * model generations, human-vs-model spot labels). kappa corrects
    * raw agreement for chance: 0 = no better than chance, 1 = perfect.
    *
    * One inner join + one 4-cell aggregate; every derived quantity is
    * a fixed arithmetic tree over the exact cell counts, so the
    * result is engine-portable to the last rounded digit. kappa is
    * NULL when chance agreement is 1 (degenerate single-cell table).
    *
    * @param a (id, flag) rater A   @param b (id, flag) rater B
    * @return one row (n, n11, n10, n01, n00, po, pe, kappa)
    */
  def cohenKappa(a: DataFrame, b: DataFrame): DataFrame = {
    val j = a.select(col("id"), col("flag").as("fa"))
      .join(b.select(col("id"), col("flag").as("fb")), Seq("id"))
    val cells = j.agg(
      count(lit(1)).as("n"),
      sum((col("fa") && col("fb")).cast("long")).as("n11"),
      sum((col("fa") && !col("fb")).cast("long")).as("n10"),
      sum((!col("fa") && col("fb")).cast("long")).as("n01"),
      sum((!col("fa") && !col("fb")).cast("long")).as("n00"))
    val n = col("n").cast("double")
    val po = (col("n11") + col("n00")).cast("double") / n
    val pe = ((col("n11") + col("n10")) * (col("n11") + col("n01"))).cast("double") / (n * n) +
      ((col("n01") + col("n00")) * (col("n10") + col("n00"))).cast("double") / (n * n)
    cells.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
      round(po, 6).as("po"), round(pe, 6).as("pe"),
      when(lit(1.0) - pe =!= 0.0, round((po - pe) / (lit(1.0) - pe), 6))
        .as("kappa"))
  }

  /** Classifier-vs-truth confusion report: Matthews correlation
    * coefficient, accuracy and macro-F1 from the same 4-cell exact
    * table as [[cohenKappa]] (pred = `a`, truth = `b`) — MCC is the
    * balance-robust single number (chance-level = 0 even at 99:1
    * class skew, where accuracy reads 0.99), macro-F1 the
    * per-class-averaged operating readout.
    *
    *   MCC = (TP·TN − FP·FN) / √((TP+FP)(TP+FN)(TN+FP)(TN+FN))
    *
    * Cells are exact longs; each reported metric is a fixed IEEE
    * tree over them. MCC NULL when any marginal is empty.
    *
    * @param a (id, flag) predictions   @param b (id, flag) truth
    * @return (n, tp, fp, fn, tn, accuracy, macro_f1, mcc)
    */
  def mccReport(a: DataFrame, b: DataFrame): DataFrame = {
    val j = a.select(col("id"), col("flag").as("fa"))
      .join(b.select(col("id"), col("flag").as("fb")), Seq("id"))
    val cells = j.agg(count(lit(1)).as("n"),
      sum((col("fa") && col("fb")).cast("long")).as("tp"),
      sum((col("fa") && !col("fb")).cast("long")).as("fp"),
      sum((!col("fa") && col("fb")).cast("long")).as("fn"),
      sum((!col("fa") && !col("fb")).cast("long")).as("tn"))
    val f1p = (col("tp") * 2).cast("double") /
      (col("tp") * 2 + col("fp") + col("fn")).cast("double")
    val f1n = (col("tn") * 2).cast("double") /
      (col("tn") * 2 + col("fn") + col("fp")).cast("double")
    val mccDen = (col("tp") + col("fp")).cast("double") *
      (col("tp") + col("fn")).cast("double") *
      (col("tn") + col("fp")).cast("double") *
      (col("tn") + col("fn")).cast("double")
    cells.select(col("n"), col("tp"), col("fp"), col("fn"), col("tn"),
      round((col("tp") + col("tn")).cast("double") / col("n").cast("double"),
        6).as("accuracy"),
      when(col("tp") * 2 + col("fp") + col("fn") === 0 ||
          col("tn") * 2 + col("fn") + col("fp") === 0,
          lit(null).cast("double"))
        .otherwise(round((f1p + f1n) / 2, 6)).as("macro_f1"),
      when(col("tp") + col("fp") === 0 || col("tp") + col("fn") === 0 ||
          col("tn") + col("fp") === 0 || col("tn") + col("fn") === 0,
          lit(null).cast("double"))
        .otherwise(round(
          ((col("tp").cast("double") * col("tn").cast("double"))
            - (col("fp").cast("double") * col("fn").cast("double")))
            / sqrt(mccDen), 6)).as("mcc"))
  }

  /** DuckDB replay of [[mccReport]]. */
  def mccOracleSql(aSub: String, bSub: String): String =
    s"""WITH cells AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CASE WHEN a.flag AND b.flag THEN 1 ELSE 0 END)
       |    AS BIGINT) AS tp,
       |  CAST(sum(CASE WHEN a.flag AND NOT b.flag THEN 1 ELSE 0 END)
       |    AS BIGINT) AS fp,
       |  CAST(sum(CASE WHEN NOT a.flag AND b.flag THEN 1 ELSE 0 END)
       |    AS BIGINT) AS fn,
       |  CAST(sum(CASE WHEN NOT a.flag AND NOT b.flag THEN 1 ELSE 0 END)
       |    AS BIGINT) AS tn
       | FROM ($aSub) a JOIN ($bSub) b ON a.id = b.id)
       |SELECT n, tp, fp, fn, tn,
       |  round(CAST(tp + tn AS DOUBLE) / CAST(n AS DOUBLE), 6)
       |    AS accuracy,
       |  CASE WHEN tp * 2 + fp + fn = 0 OR tn * 2 + fn + fp = 0
       |    THEN NULL ELSE
       |    round((CAST(tp * 2 AS DOUBLE) / CAST(tp * 2 + fp + fn AS DOUBLE)
       |      + CAST(tn * 2 AS DOUBLE) / CAST(tn * 2 + fn + fp AS DOUBLE))
       |      / 2, 6) END AS macro_f1,
       |  CASE WHEN tp + fp = 0 OR tp + fn = 0 OR tn + fp = 0
       |      OR tn + fn = 0 THEN NULL
       |    ELSE round((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
       |        - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
       |      / sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
       |        * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)), 6)
       |    END AS mcc
       |FROM cells""".stripMargin

  /** DuckDB replay of [[cohenKappa]]: `aSub`/`bSub` are subqueries
    * yielding (id, flag). */
  def cohenKappaOracleSql(aSub: String, bSub: String): String =
    s"""WITH cells AS (SELECT count(*) AS n,
       |  CAST(sum(CASE WHEN a.flag AND b.flag THEN 1 ELSE 0 END) AS BIGINT) AS n11,
       |  CAST(sum(CASE WHEN a.flag AND NOT b.flag THEN 1 ELSE 0 END) AS BIGINT) AS n10,
       |  CAST(sum(CASE WHEN NOT a.flag AND b.flag THEN 1 ELSE 0 END) AS BIGINT) AS n01,
       |  CAST(sum(CASE WHEN NOT a.flag AND NOT b.flag THEN 1 ELSE 0 END) AS BIGINT) AS n00
       | FROM ($aSub) a JOIN ($bSub) b ON a.id = b.id)
       |SELECT n, n11, n10, n01, n00,
       |  round((n11 + n00) * 1.0::DOUBLE / n, 6) AS po,
       |  round(((n11 + n10) * (n11 + n01)) * 1.0::DOUBLE / (n * 1.0::DOUBLE * n)
       |    + ((n01 + n00) * (n10 + n00)) * 1.0::DOUBLE / (n * 1.0::DOUBLE * n), 6) AS pe,
       |  CASE WHEN 1.0::DOUBLE - (((n11 + n10) * (n11 + n01)) * 1.0::DOUBLE / (n * 1.0::DOUBLE * n)
       |      + ((n01 + n00) * (n10 + n00)) * 1.0::DOUBLE / (n * 1.0::DOUBLE * n)) <> 0.0
       |    THEN round(((n11 + n00) * 1.0::DOUBLE / n
       |        - (((n11 + n10) * (n11 + n01)) * 1.0::DOUBLE / (n * 1.0::DOUBLE * n)
       |          + ((n01 + n00) * (n10 + n00)) * 1.0::DOUBLE / (n * 1.0::DOUBLE * n)))
       |      / (1.0::DOUBLE - (((n11 + n10) * (n11 + n01)) * 1.0::DOUBLE / (n * 1.0::DOUBLE * n)
       |          + ((n01 + n00) * (n10 + n00)) * 1.0::DOUBLE / (n * 1.0::DOUBLE * n))), 6)
       |    END AS kappa
       |FROM cells""".stripMargin

  /** k-anonymity audit over quasi-identifier expressions — the
    * privacy-risk probe a dataset release runs alongside the PII scrub
    * (q64 removes direct identifiers; this measures whether the
    * INDIRECT ones — source, language, length bucket, domain — still
    * isolate individual rows). A row is at risk when its equivalence
    * class under the quasi-identifiers holds fewer than `k` rows.
    *
    * `qi` maps output column name → quasi-identifier expression
    * (derived QIs like length buckets are expressions, not columns —
    * generalization IS the knob a release tunes).
    *
    * Output: one row per equivalence class — the QI values, class
    * size `n`, and `at_risk`. Scale shape: one map-side-combined
    * groupBy to class-cardinality rows; no joins, no collect. The
    * risky TAIL is the interesting part and it is small by definition
    * (classes with n < k); consumers filtering `at_risk` prune
    * everything else at the aggregate's output.
    */
  def kAnonymity(df: DataFrame, qi: Seq[(String, org.apache.spark.sql.Column)],
      k: Int): DataFrame = {
    require(qi.nonEmpty, "kAnonymity needs at least one quasi-identifier")
    require(k >= 2, s"kAnonymity needs k >= 2, got $k")
    df.groupBy(qi.map { case (n, c) => c.as(n) }: _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", col("n") < k)
  }

  /** l-diversity audit — [[kAnonymity]]'s companion: a class can be
    * k-anonymous yet leak a SENSITIVE attribute when every row in it
    * shares one value (homogeneity attack). Reports, per
    * quasi-identifier class, the class size, the number of DISTINCT
    * sensitive values (`l`), and `homogeneous` (l = 1 with n > 1 —
    * the attack case). Same one-aggregation scale shape; the exact
    * distinct is computed per class inside the single groupBy.
    */
  def lDiversity(df: DataFrame, qi: Seq[(String, org.apache.spark.sql.Column)],
      sensitive: org.apache.spark.sql.Column, l: Int): DataFrame = {
    require(qi.nonEmpty, "lDiversity needs at least one quasi-identifier")
    require(l >= 2, s"lDiversity needs l >= 2, got $l")
    df.groupBy(qi.map { case (n, c) => c.as(n) }: _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(sensitive).as("l"))
      .withColumn("below_l", col("l") < l)
      .withColumn("homogeneous", col("l") === 1 && col("n") > 1)
  }

  /** CATEGORICAL t-closeness (Li, Li & Venkatasubramanian 2007,
    * equal ground metric) — the unordered-attribute companion of the
    * ordered-bucket EMD gate below ([[tCloseness]], q294): languages
    * and sources have no order, so the paper's distance there is
    * total variation, not cumulative EMD. A class can be k-anonymous
    * AND l-diverse yet still leak when its sensitive distribution is
    * far from the corpus's (skewness attack: "90% of this class is
    * lang X" is a disclosure even with l > 1 values present). Per
    * quasi-identifier class: class size `n`, `tvd`, and `above_t`.
    * NULL sensitive values are excluded from the audit entirely
    * (from class sizes, the global distribution AND the grand total):
    * a null is "no recorded value", not a disclosure category. The
    * exclusion is an explicit `isNotNull` filter BEFORE any
    * aggregation — relying on equi-join null semantics alone would
    * drop null cells from the per-class terms while leaving their
    * mass in the grand total, inflating every class's TVD by the
    * null fraction (the r15 advisory bug).
    *
    * Exactness: TVD is computed from integer cross-multiplications —
    * |p_c(v) − p_g(v)| = |n_cv·N − n_v·n_c| / (n_c·N) — summed as
    * DECIMAL(38,0) (overflow-safe to ~10¹⁹ rows), and absent values
    * fold in closed form: Σ_{v∉class} p_g(v) = 1 − Σ_{v∈class}
    * p_g(v), so only PRESENT (class, value) cells are ever
    * materialized. The final double arithmetic is a fixed
    * left-to-right tree both engines evaluate identically; 6dp
    * report grid.
    *
    * Scale shape: one exchange to the (class, value) cell grain, a
    * broadcast of the per-value global counts (bounded by sensitive
    * cardinality), then a window + final aggregate that SHARE one
    * hash partitioning on the class key — and the cell subtree
    * appearing under both the probe and the global branch collapses
    * to a ReusedExchange at runtime, so the corpus is scanned once
    * (both verified: PlanProbeQ376). The only collect is the global
    * total — one scalar.
    */
  def tClosenessCategorical(df: DataFrame,
      qi: Seq[(String, org.apache.spark.sql.Column)],
      sensitive: org.apache.spark.sql.Column, t: Double): DataFrame = {
    require(qi.nonEmpty,
      "tClosenessCategorical needs at least one quasi-identifier")
    require(t > 0.0 && t < 1.0,
      s"tClosenessCategorical needs t in (0,1), got $t")
    val qiCols = qi.map { case (n, _) => col(n) }
    val cells = df.filter(sensitive.isNotNull)
      .groupBy(qi.map { case (n, c) => c.as(n) } :+ sensitive.as("_v"): _*)
      .agg(count(lit(1)).as("_ncv"))
    val glob = cells.groupBy(col("_v")).agg(sum("_ncv").as("_nv"))
    val totRow = glob.agg(sum("_nv")).head()
    require(!totRow.isNullAt(0) && totRow.getLong(0) > 0,
      "tCloseness needs a non-empty input (after null-sensitive exclusion)")
    val nTotal = totRow.getLong(0)
    val wn = org.apache.spark.sql.expressions.Window
      .partitionBy(qiCols: _*)
    val dec = "decimal(38,0)"
    cells.join(broadcast(glob), "_v")
      .withColumn("_nc", sum("_ncv").over(wn))
      .groupBy(qiCols: _*)
      .agg(max(col("_nc")).as("n"),
        sum(abs(col("_ncv").cast(dec) * lit(nTotal) -
          col("_nv").cast(dec) * col("_nc"))).as("_s1"),
        sum(col("_nv")).as("_s2"))
      .select(qiCols ++ Seq(col("n"),
        round(lit(0.5) * (col("_s1").cast("double") / col("n").cast("double")
            / lit(nTotal.toDouble) +
          (lit(1.0) - col("_s2").cast("double") / lit(nTotal.toDouble))), 6)
          .as("tvd")): _*)
      .withColumn("above_t", col("tvd") > t)
  }

  /** Calibration (reliability) buckets for a [0,1] score vs a 0/1
    * label: decile buckets (score·buckets floored, top-clamped), per
    * bucket n, positives, mean score, observed positive rate (6dp).
    * One aggregation; bucket count bounded by construction.
    */
  def calibrationBuckets(df: DataFrame, scoreCol: String, labelCol: String,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    df.withColumn("_b",
        least(floor(col(scoreCol) * buckets).cast("int"), lit(buckets - 1)))
      .groupBy(col("_b").as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col(labelCol).cast("int")).cast("long").as("n_pos"),
        round(avg(col(scoreCol)), 6).as("avg_score"),
        round(sum(col(labelCol).cast("int")).cast("double") / count(lit(1)), 6)
          .as("frac_pos"))
  }

  /** Exact tie-aware Mann–Whitney AUC of a score against a 0/1 label
    * via midranks. The global window runs over the DISTINCT-score
    * frame — for a d-decimal-rounded score that cardinality is
    * bounded (≤ 10^d + 1) regardless of corpus size, so the
    * single-partition window is model-scale, never data-scale.
    * Output: one row (n_pos, n_neg, auc 6dp; auc null when either
    * class is empty).
    */
  def rankAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val g = df.groupBy(col(scoreCol).as("_s"))
      .agg(count(lit(1)).as("cnt"),
        sum(col(labelCol).cast("int")).cast("long").as("npos"))
    val wdw = org.apache.spark.sql.expressions.Window.orderBy("_s")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val m = g.withColumn("below", coalesce(sum("cnt").over(wdw), lit(0L)))
      .withColumn("midrank", col("below") + (col("cnt") + 1) / lit(2.0))
    m.agg(sum("npos").as("p"), (sum("cnt") - sum("npos")).as("nn"),
        sum(col("npos") * col("midrank")).as("spr"))
      .select(col("p").cast("long").as("n_pos"),
        col("nn").cast("long").as("n_neg"),
        when(col("p") === 0 || col("nn") === 0, lit(null).cast("double"))
          .otherwise(round((col("spr") - col("p") * (col("p") + 1) / lit(2.0)) /
            (col("p") * lit(1.0) * col("nn")), 6)).as("auc"))
  }

  /** One-row release headline for [[kAnonymity]]: class counts, row
    * counts, and the risky-row fraction (6dp). Same single-aggregation
    * scale shape — the class table re-aggregates to one row.
    */
  def kAnonymitySummary(df: DataFrame,
      qi: Seq[(String, org.apache.spark.sql.Column)], k: Int): DataFrame =
    kAnonymity(df, qi, k).agg(
      count(lit(1)).as("n_classes"),
      count(when(col("at_risk"), 1)).as("n_risky_classes"),
      sum("n").as("n_rows"),
      coalesce(sum(when(col("at_risk"), col("n"))), lit(0L)).as("n_risky_rows"),
      round(coalesce(sum(when(col("at_risk"), col("n"))), lit(0L))
        .cast("double") / sum("n"), 6).as("risky_frac"))

  /** Robust per-group outlier summary: median + MAD (median absolute
    * deviation) of `valueCol` per `groupCol`, and how many rows sit
    * beyond `k`·MAD — the skew/corruption probe that, unlike mean±σ,
    * a handful of giant documents cannot drag.
    *
    * Three bounded aggregations (group medians are group-count-sized
    * frames, broadcast back); `median` here is Spark's EXACT
    * percentile — swap for approx_percentile at full corpus scale
    * when ±0.5% quantile error is acceptable. MAD = 0 (over half the
    * group identical) degrades to flagging any deviation, which is
    * the conventional and deterministic choice.
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 3.0): DataFrame = {
    val v = col(valueCol).cast("double")
    val med = df.groupBy(groupCol).agg(median(v).as("med"))
    val dev = df.join(broadcast(med), groupCol)
      .withColumn("dev", abs(v - col("med")))
    val mad = dev.groupBy(groupCol)
      .agg(min("med").as("med"), median(col("dev")).as("mad"))
    dev.drop("med").join(broadcast(mad), groupCol)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        min("med").as("med"), min("mad").as("mad"),
        sum(when(col("dev") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .withColumn("outlier_frac",
        round(col("n_outliers").cast("double") / col("n"), 6))
  }

  /** Declarative data-contract check (expectation-suite shape): each
    * check is (name, violation predicate); the report is one row per
    * check with its violation count and pass flag, plus an optional
    * key-uniqueness check (count vs exact distinct). ONE scan
    * computes every predicate as a conditional sum (+ the distinct
    * aggregate when requested); the wide one-row result unpivots
    * driver-free. The pre-publish gate a dataset release runs — at
    * 100 TB you assert a contract, you don't sample-and-eyeball.
    */
  def expectationReport(df: DataFrame,
      checks: Seq[(String, org.apache.spark.sql.Column)],
      uniqueKey: Option[String] = None): DataFrame = {
    require(checks.nonEmpty || uniqueKey.nonEmpty,
      "expectationReport needs at least one check")
    val sums = checks.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(pred, 1L).otherwise(0L)).as(s"_v$i")
    } ++ uniqueKey.map(k =>
      (count(lit(1)) - countDistinct(col(k))).as("_vu")).toSeq
    val wide = df.agg(sums.head, sums.tail: _*)
    val entries = checks.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("check"), col(s"_v$i").as("n_violations"))
    } ++ uniqueKey.map(k =>
      struct(lit(s"${k}_unique").as("check"), col("_vu").as("n_violations")))
    wide.select(explode(array(entries: _*)).as("e"))
      .select(col("e.check").as("check"),
        col("e.n_violations").as("n_violations"),
        (col("e.n_violations") === 0).cast("int").as("passed"))
  }

  /** Expectation-violation TREND: [[expectationReport]]'s checks
    * bucketed by event-time day — the "when did the contract start
    * failing" view that turns a red release gate into a root-cause
    * window. One scan, conditional sums per (day, check), unpivoted
    * like the one-shot report.
    */
  def expectationTrend(df: DataFrame, tsCol: String,
      checks: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(checks.nonEmpty, "expectationTrend needs at least one check")
    val day = (floor(col(tsCol).cast("double") / 86400).cast("long") * 86400)
      .as("day_s")
    val sums = checks.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(pred, 1L).otherwise(0L)).as(s"_v$i")
    }
    val wide = df.groupBy(day)
      .agg(count(lit(1)).as("_n"), sums: _*)
    val entries = checks.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("check"), col(s"_v$i").as("n_violations"))
    }
    wide.select(col("day_s"), col("_n").as("n_rows"),
        explode(array(entries: _*)).as("e"))
      .select(col("day_s"), col("n_rows"), col("e.check").as("check"),
        col("e.n_violations").as("n_violations"))
  }

  /** Per-group z-standardization of a 2dp-valued score (batch-effect
    * correction: each source's score distribution re-centered to its
    * own mean/sd before cross-source thresholds are applied). From
    * exact integer-cents moments: z = (c·n − s) / √(n·q − s²) — the
    * only float ops are one sqrt and one division, identical on
    * every engine; groups with zero variance yield NULL. One
    * moments aggregation (|groups| rows, broadcast back), one
    * corpus projection.
    */
  def zStandardize(df: DataFrame, idCol: String, groupCol: String,
      valueCol: String): DataFrame = {
    val c = round(col(valueCol).cast("double") * 100).cast("long")
    val m = df.select(col(groupCol).as("grp"), c.as("c"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("c").as("s"),
        sum(col("c") * col("c")).as("q"))
    df.select(col(idCol).as("id"), col(groupCol).as("grp"), c.as("c"))
      .join(broadcast(m), "grp")
      .select(col("id"), col("grp"),
        when(col("n") * col("q") - col("s") * col("s") > 0,
          round((col("c") * col("n") - col("s")).cast("double")
            / sqrt((col("n") * col("q") - col("s") * col("s"))
              .cast("double")), 4)).as("z"))
  }

  /** DuckDB twin of [[zStandardize]]; outputs (id, grp, z). */
  def zStandardizeOracleSql(table: String, idCol: String, groupCol: String,
      valueExpr: String): String =
    s"""WITH b AS (SELECT $idCol AS id, $groupCol AS grp,
       |    CAST(round(CAST($valueExpr AS DOUBLE) * 100) AS BIGINT) AS c
       |  FROM $table),
       |m AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS q
       |  FROM b GROUP BY grp)
       |SELECT id, b.grp,
       |  CASE WHEN n * q - s * s > 0
       |    THEN round(CAST(c * n - s AS DOUBLE)
       |      / sqrt(CAST(n * q - s * s AS DOUBLE)), 4) END AS z
       |FROM b JOIN m ON b.grp = m.grp""".stripMargin

  /** Expected calibration error from the reliability buckets
    * ([[calibrationBuckets]] output): Σ (n_b/N)·|frac_pos − avg_score|
    * folded in bucket order — the one-number calibration verdict.
    */
  def calibrationEce(buckets: DataFrame): DataFrame =
    buckets
      .select(struct(col("bucket"), col("n"), col("frac_pos"),
        col("avg_score")).as("s"))
      .agg(count(lit(1)).as("n_buckets"),
        array_sort(collect_list(col("s"))).as("l"))
      .select(col("n_buckets"),
        round(aggregate(col("l"), lit(0.0), (acc, x) =>
            acc + x.getField("n").cast("double") *
              abs(x.getField("frac_pos") - x.getField("avg_score")))
          / aggregate(col("l"), lit(0L), (acc, x) =>
            acc + x.getField("n")).cast("double"), 6).as("ece"))

  /** Mutual information between two categorical columns (nats): the
    * contingency table from one exact aggregation, each cell's
    * n/N·ln(n·N/(r·c)) term from exact integer inputs, and the cell
    * terms folded in (a, b)-sorted order — deterministic where a
    * plain double sum is partition-order-dependent. The categorical
    * dependency audit (ANOVA's sibling for label×label).
    */
  def mutualInformation(df: DataFrame, aCol: String, bCol: String)
      : DataFrame = {
    val cells = df.select(col(aCol).as("a"), col(bCol).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
    val ra = cells.groupBy("a").agg(sum("n").as("r"))
    val cb = cells.groupBy("b").agg(sum("n").as("c"))
    val tot = cells.agg(sum("n").as("nn"))
    val term = (col("n").cast("double") / col("nn")) *
      log((col("n") * col("nn")).cast("double")
        / (col("r") * col("c")).cast("double"))
    cells.join(broadcast(ra), "a").join(broadcast(cb), "b")
      .crossJoin(broadcast(tot))
      .select(struct(col("a"), col("b"), term.as("t")).as("s"))
      .agg(count(lit(1)).as("n_cells"),
        array_sort(collect_list(col("s"))).as("l"))
      .select(col("n_cells"),
        round(aggregate(col("l"), lit(0.0),
          (acc, x) => acc + x.getField("t")), 6).as("mi_nats"))
  }

  /** DuckDB twin of [[mutualInformation]]. */
  def mutualInformationOracleSql(table: String, aCol: String,
      bCol: String): String =
    s"""WITH cells AS (SELECT $aCol AS a, $bCol AS b,
       |    CAST(count(*) AS BIGINT) AS n FROM $table GROUP BY 1, 2),
       |ra AS (SELECT a, CAST(sum(n) AS BIGINT) AS r FROM cells GROUP BY a),
       |cb AS (SELECT b, CAST(sum(n) AS BIGINT) AS c FROM cells GROUP BY b),
       |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cells),
       |terms AS (SELECT cells.a, cells.b,
       |    (CAST(n AS DOUBLE) / nn) * ln(CAST(n * nn AS DOUBLE)
       |      / CAST(r * c AS DOUBLE)) AS tt
       |  FROM cells JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN t)
       |SELECT CAST(count(*) AS BIGINT) AS n_cells,
       |  round(list_sum(list(tt ORDER BY a, b)), 6) AS mi_nats
       |FROM terms""".stripMargin

  /** Simpson diversity per group: effective number of categories
    * N²/Σn_c² (the "how many languages is this source really"
    * number). Exact integer sums, one double division.
    */
  def simpsonDiversity(df: DataFrame, groupCol: String,
      catCol: String): DataFrame = {
    val g = df.select(col(groupCol).as("grp"), col(catCol).as("cat"))
      .groupBy("grp", "cat").agg(count(lit(1)).as("n"))
    g.groupBy("grp")
      .agg(sum("n").as("n_rows"), count(lit(1)).as("n_cats"),
        sum(col("n") * col("n")).as("q"))
      .select(col("grp"), col("n_rows"), col("n_cats"),
        round((col("n_rows") * col("n_rows")).cast("double")
          / col("q").cast("double"), 6).as("effective_cats"))
  }

  /** DuckDB twin of [[simpsonDiversity]]. */
  def simpsonOracleSql(table: String, groupCol: String,
      catCol: String): String =
    s"""WITH g AS (SELECT $groupCol AS grp, $catCol AS cat,
       |    CAST(count(*) AS BIGINT) AS n FROM $table GROUP BY 1, 2)
       |SELECT grp, CAST(sum(n) AS BIGINT) AS n_rows,
       |  CAST(count(*) AS BIGINT) AS n_cats,
       |  round(CAST(sum(n) * sum(n) AS DOUBLE)
       |    / CAST(sum(n * n) AS DOUBLE), 6) AS effective_cats
       |FROM g GROUP BY grp""".stripMargin

  /** One-way ANOVA of a numeric column across groups: between- and
    * within-group sums of squares from EXACT integer-cents sufficient
    * statistics (per-group n, Σc, Σc² of round(x·100) longs — the
    * QualityFit moment discipline), then the F statistic in one
    * fixed-order double expression. "Does source explain quality?"
    * with a number instead of a hunch. One map-side-combined
    * aggregation to |groups| rows; the F math runs on the group
    * table. Requires non-negative 2dp-valued inputs (cents cast).
    */
  def anovaF(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val c = round(col(valueCol).cast("double") * 100).cast("long")
    val g = df.select(col(groupCol).as("grp"), c.as("c"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("c").as("s"),
        sum(col("c") * col("c")).as("q"))
    // Σ s²/n folds in GROUP-ASC order on both engines (a plain double
    // sum would be partition-order-dependent); integer totals stay
    // plain exact sums.
    g.agg(count(lit(1)).as("k"), sum("n").as("n_total"),
        sum("s").as("ts"), sum("q").as("tq"),
        array_sort(collect_list(struct(col("grp"), col("n"), col("s"))))
          .as("a"))
      .select(col("k").cast("long").as("n_groups"), col("n_total"),
        col("ts"), col("tq"), col("k"),
        aggregate(col("a"), lit(0.0), (acc, x) =>
          acc + x.getField("s").cast("double") * x.getField("s")
            / x.getField("n")).as("sb"))
      .select(col("n_groups"), col("n_total"),
        round((
          ((col("sb") - col("ts").cast("double") * col("ts") / col("n_total"))
            / (col("k") - 1)) /
          ((col("tq").cast("double") - col("sb")) / (col("n_total") - col("k")))
        ) , 6).as("f_stat"))
  }

  /** DuckDB twin of [[anovaF]]. The per-group Σs²/n terms sum in
    * deterministic group order via an ordered list fold.
    */
  def anovaOracleSql(table: String, groupCol: String,
      valueCol: String): String =
    s"""WITH b AS (SELECT $groupCol AS grp,
       |    CAST(round(CAST($valueCol AS DOUBLE) * 100) AS BIGINT) AS c
       |  FROM $table),
       |g AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS q
       |  FROM b GROUP BY grp),
       |t AS (SELECT CAST(count(*) AS BIGINT) AS k,
       |    CAST(sum(n) AS BIGINT) AS n_total,
       |    CAST(sum(s) AS BIGINT) AS ts, CAST(sum(q) AS BIGINT) AS tq,
       |    list_sum(list(CAST(s AS DOUBLE) * s / n ORDER BY grp)) AS sb
       |  FROM g)
       |SELECT k AS n_groups, n_total,
       |  round((((sb - CAST(ts AS DOUBLE) * ts / n_total) / (k - 1))
       |    / ((CAST(tq AS DOUBLE) - sb) / (n_total - k))), 6) AS f_stat
       |FROM t""".stripMargin

  /** Referential-integrity audit across a FK chain: for each
    * (child, parent, key) triple, count child rows, orphans (no
    * parent), and exact ppm orphan rate. One anti-join + one count
    * per edge — at 100 TB each edge is a key-only shuffle (or a
    * broadcast when the parent key set fits); child payloads never
    * move. The join-contract check a warehouse runs before trusting
    * any downstream join.
    */
  def fkIntegrity(edges: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(edges.nonEmpty, "fkIntegrity needs at least one edge")
    edges.map { case (name, child, childKey, parent, parentKey) =>
      val orphan = child.select(col(childKey).as("k"))
        .join(parent.select(col(parentKey).as("k")), Seq("k"), "left_anti")
      val a = child.agg(count(lit(1)).as("n_child"))
      val b = orphan.agg(count(lit(1)).as("n_orphans"))
      val num = col("n_orphans") * 2000000L + col("n_child")
      val den = col("n_child") * 2
      a.crossJoin(broadcast(b))
        .select(lit(name).as("edge"), col("n_child"), col("n_orphans"),
          ((num - pmod(num, den)) / den).cast("long").as("orphan_ppm"))
    }.reduce(_ unionByName _)
  }

  /** Weight-of-evidence / information-value report of a categorical
    * bin column against a binary label — the feature-screening
    * summary a quality-model owner reads before adding a signal
    * (IV < 0.02 ⇒ useless, > 0.5 ⇒ suspicious). One aggregation to
    * bin-cardinality rows + broadcast totals; +0.5 smoothing keeps
    * empty cells finite. Natural log (ln) both engines.
    */
  def woeIv(df: DataFrame, binCol: org.apache.spark.sql.Column,
      labelCol: org.apache.spark.sql.Column): DataFrame = {
    val g = df.select(binCol.as("bin"), labelCol.cast("int").as("y"))
      .groupBy("bin")
      .agg(sum("y").cast("long").as("n_pos"),
        (count(lit(1)) - sum("y")).cast("long").as("n_neg"))
    val tot = g.agg(sum("n_pos").cast("double").as("pt"),
      sum("n_neg").cast("double").as("nt"))
    val p = (col("n_pos") + 0.5) / col("pt")
    val q = (col("n_neg") + 0.5) / col("nt")
    g.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_pos"), col("n_neg"),
        round(log(p / q), 6).as("woe"),
        round((p - q) * log(p / q), 6).as("iv_term"))
  }

  /** DuckDB twin of [[woeIv]]: `binExpr`/`labelExpr` are SQL snippets
    * over `table`.
    */
  def woeIvOracleSql(table: String, binExpr: String,
      labelExpr: String): String =
    s"""WITH b AS (SELECT $binExpr AS bin,
       |    CAST($labelExpr AS INT) AS y FROM $table),
       |g AS (SELECT bin, CAST(sum(y) AS BIGINT) AS n_pos,
       |    CAST(count(*) - sum(y) AS BIGINT) AS n_neg FROM b GROUP BY bin),
       |t AS (SELECT CAST(sum(n_pos) AS DOUBLE) AS pt,
       |    CAST(sum(n_neg) AS DOUBLE) AS nt FROM g)
       |SELECT bin, n_pos, n_neg,
       |  round(ln(((n_pos + 0.5) / pt) / ((n_neg + 0.5) / nt)), 6) AS woe,
       |  round(((n_pos + 0.5) / pt - (n_neg + 0.5) / nt)
       |    * ln(((n_pos + 0.5) / pt) / ((n_neg + 0.5) / nt)), 6) AS iv_term
       |FROM g CROSS JOIN t""".stripMargin

  /** Equi-width histogram of a numeric column: `nBins` bins over the
    * observed [min, max] (top edge closed). Two scans (bounds, then
    * one aggregation); bin edges are the identical double arithmetic
    * in the oracle, so no rounding gate is needed — the lo column is
    * bit-deterministic. A constant-valued column (mx == mn) is a
    * degenerate domain: the bin-width division would be 0/0 = NaN,
    * which Spark's int cast folds to 0 while DuckDB ERRORS on
    * CAST(NaN AS INT) — so both engines branch explicitly and put
    * every row in bin 0.
    */
  def histogram(df: DataFrame, valueCol: String, nBins: Int): DataFrame = {
    require(nBins >= 1, s"histogram needs nBins >= 1, got $nBins")
    val v = col(valueCol).cast("double")
    val bounds = df.agg(min(v).as("mn"), max(v).as("mx"))
    df.select(v.as("v")).crossJoin(broadcast(bounds))
      .select(when(col("mx") === col("mn"), lit(0))
        .otherwise(least(floor((col("v") - col("mn"))
            / ((col("mx") - col("mn")) / nBins)).cast("int"),
          lit(nBins - 1))).as("bin"), col("mn"), col("mx"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        (min("mn") + col("bin") * ((min("mx") - min("mn")) / nBins))
          .as("lo"))
  }

  /** DuckDB twin of [[histogram]]. */
  def histogramOracleSql(table: String, valueExpr: String,
      nBins: Int): String =
    s"""WITH t AS (SELECT CAST($valueExpr AS DOUBLE) AS v FROM $table),
       |b AS (SELECT min(v) AS mn, max(v) AS mx FROM t)
       |SELECT CASE WHEN mx = mn THEN 0
       |    ELSE least(CAST(floor((v - mn) / ((mx - mn) / $nBins)) AS INT),
       |      ${nBins - 1}) END AS bin,
       |  CAST(count(*) AS BIGINT) AS n,
       |  min(mn) + (CASE WHEN mx = mn THEN 0
       |    ELSE least(CAST(floor((v - mn) / ((mx - mn) / $nBins)) AS INT),
       |      ${nBins - 1}) END) * ((min(mx) - min(mn)) / $nBins) AS lo
       |FROM t CROSS JOIN b
       |GROUP BY 1""".stripMargin

  /** DuckDB twin of [[madOutliers]]. */
  def madOutliersOracleSql(table: String, groupCol: String,
      valueCol: String, k: Double = 3.0): String =
    s"""WITH base AS (SELECT $groupCol AS g,
       |    CAST($valueCol AS DOUBLE) AS v FROM $table),
       |med AS (SELECT g, median(v) AS med FROM base GROUP BY g),
       |dev AS (SELECT b.g, b.v, abs(b.v - m.med) AS dev, m.med
       |  FROM base b JOIN med m USING (g)),
       |mad AS (SELECT g, min(med) AS med, median(dev) AS mad
       |  FROM dev GROUP BY g)
       |SELECT d.g AS $groupCol, CAST(count(*) AS BIGINT) AS n,
       |  min(a.med) AS med, min(a.mad) AS mad,
       |  CAST(sum(CASE WHEN d.dev > $k * a.mad THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_outliers,
       |  round(sum(CASE WHEN d.dev > $k * a.mad THEN 1 ELSE 0 END)
       |    * 1.0::DOUBLE / count(*), 6) AS outlier_frac
       |FROM dev d JOIN mad a USING (g) GROUP BY d.g""".stripMargin

  /** Exact two-sample Kolmogorov–Smirnov statistic of each group's
    * value distribution against THE REST of the corpus — the
    * classical nonparametric "did this source drift" test
    * complementing the binned PSI/JSD ops (no binning choice, no
    * approximation). For group g with n_g values and rest with n_r:
    *
    *   D_g = max over values v of |F_g(v) − F_r(v)|
    *       = max |cum_g(v)·n_r − cum_r(v)·n_g| / (n_g·n_r)
    *
    * computed as EXACT integer arithmetic on a common denominator —
    * no floating ECDF, so the statistic (and its 6dp half-up
    * rounding via integer division) is bit-identical on any engine
    * or partitioning.
    *
    * Scale shape: one (group, value) count aggregation + one
    * value-count aggregation, a groups × distinct-values grid
    * (bounded: values sit on a finite measurement grid — here the
    * 5dp quality grid), and one window per group ordered by value
    * for the running sums. Corpus rows never shuffle wide — counts
    * do.
    *
    * @return (group, n_group, n_rest, d_num, d_den, ks round 6dp)
    */
  def ksAgainstRest(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(groupCol).as("g"),
      col(valueCol).cast("double").as("v"))
    val gv = base.groupBy("g", "v").agg(count(lit(1)).as("c"))
    val vall = base.groupBy("v").agg(count(lit(1)).as("ct"))
    val sizes = base.groupBy("g").agg(count(lit(1)).as("ng"))
    val tot = base.agg(count(lit(1)).as("nt"))
    // every group needs a step at EVERY corpus-distinct value (the
    // rest's ECDF jumps there even if the group's doesn't)
    val grid = sizes.select("g").crossJoin(vall)
      .join(gv, Seq("g", "v"), "left")
      .select(col("g"), col("v"), col("ct"),
        coalesce(col("c"), lit(0L)).as("c"))
    val w = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cums = grid.select(col("g"), col("v"),
      sum("c").over(w).as("cg"), sum("ct").over(w).as("call"))
    cums.join(broadcast(sizes), Seq("g")).crossJoin(broadcast(tot))
      .select(col("g"), col("ng"), (col("nt") - col("ng")).as("nr"),
        abs(col("cg") * (col("nt") - col("ng"))
          - (col("call") - col("cg")) * col("ng")).as("dn"))
      .groupBy("g", "ng", "nr")
      .agg(max("dn").as("d_num"))
      .select(col("g").as(groupCol), col("ng").as("n_group"),
        col("nr").as("n_rest"), col("d_num"),
        (col("ng") * col("nr")).as("d_den"),
        // 6dp half-up via exact integer division
        (expr("(2000000 * d_num + ng * nr) div (2 * ng * nr)")
          .cast("double") / 1e6).as("ks"))
  }

  /** Exact Mann–Whitney U of each group vs the rest — the rank-sum
    * location-shift test beside [[ksAgainstRest]]'s shape test. With
    * ties handled by midranks, 2·R_g is always an integer, so the
    * statistic is computed in EXACT integers:
    *
    *   2·U_g = 2·R_g − n_g(n_g+1),  R_g = Σ ranks of g's values
    *   2·R_g = Σ_v c_g(v) · (2·cum_before(v) + ct(v) + 1)
    *
    * (cum_before = count of strictly smaller corpus values; all values
    * tied at v share midrank cum_before + (ct+1)/2.) Emitted with the
    * AUC-style effect size U/(n_g·n_r) at exact-half-up 6dp — the
    * probability a random g value exceeds a random rest value (+½ per
    * tie).
    *
    * Same scale shape as the KS op: two count aggregations and a
    * groups × distinct-values grid; corpus rows never shuffle wide.
    *
    * @return (group, n_group, n_rest, u2 = 2·U_g, auc)
    */
  def mannWhitneyAgainstRest(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(groupCol).as("g"),
      col(valueCol).cast("double").as("v"))
    val gv = base.groupBy("g", "v").agg(count(lit(1)).as("c"))
    val vall = base.groupBy("v").agg(count(lit(1)).as("ct"))
    val sizes = base.groupBy("g").agg(count(lit(1)).as("ng"))
    val tot = base.agg(count(lit(1)).as("nt"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // cum_before via one GLOBAL cum over the distinct-value frame
    // (|V| rows — the measurement grid, not the corpus)
    val cums = vall.select(col("v"), col("ct"),
      (sum("ct").over(w) - col("ct")).as("cb"))
    val r2 = gv.join(cums, Seq("v"))
      .groupBy("g")
      .agg(sum(col("c") * (lit(2) * col("cb") + col("ct") + 1)).as("r2"))
    r2.join(sizes, Seq("g")).crossJoin(broadcast(tot))
      .select(col("g").as(groupCol), col("ng").as("n_group"),
        (col("nt") - col("ng")).as("n_rest"),
        (col("r2") - col("ng") * (col("ng") + 1)).as("u2"))
      .select(col(groupCol), col("n_group"), col("n_rest"), col("u2"),
        // auc = u2 / (2·ng·nr) at exact half-up 6dp
        (expr("(2000000 * u2 + 2 * n_group * n_rest)" +
          " div (4 * n_group * n_rest)").cast("double") / 1e6).as("auc"))
  }

  /** Multiple-testing correction over the per-group KS drift tests:
    * Benjamini–Hochberg (FDR, step-up) and Holm (FWER, step-down)
    * adjusted p-values for every group's [[ksAgainstRest]] statistic,
    * with the standard asymptotic two-sample p-value
    *
    *   p_g = min(1, 2·exp(−2·D_g²·n_g·n_r/(n_g+n_r)))
    *
    * This is the "I ran one drift test PER SOURCE, which rejections
    * survive?" readout a monitoring pipeline needs — per-test alpha
    * at 200 sources guarantees false alarms; BH/Holm are the standard
    * repairs. D enters as the exact integer ratio d_num/d_den (one
    * IEEE division), so p is bit-identical across engines.
    *
    * Scale shape: the KS machinery dominates; the correction itself
    * is three window passes over the GROUPS frame (one row per
    * source, never corpus rows).
    *
    * @return (group, n_group, ks, p_raw, p_bh, p_holm, rej_bh,
    *         rej_holm), p's rounded 6dp, rejections at `alpha`
    */
  def ksFdr(df: DataFrame, groupCol: String, valueCol: String,
      alpha: Double = 0.05): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ks = ksAgainstRest(df, groupCol, valueCol)
    val d = col("d_num").cast("double") / col("d_den").cast("double")
    val ne = (col("n_group") * col("n_rest")).cast("double") /
      (col("n_group") + col("n_rest")).cast("double")
    val withP = ks.select(col(groupCol), col("n_group"), col("ks"),
      least(lit(1.0), lit(2.0) * exp(lit(-2.0) * d * d * ne)).as("p"))
    val wUp = Window.orderBy(col("p").asc, col(groupCol).asc)
    val ranked = withP.select(col(groupCol), col("n_group"), col("ks"),
      col("p"), row_number().over(wUp).as("i"),
      count(lit(1)).over(Window.partitionBy()).as("m"))
    // BH: p·m/i, then running min from the LARGEST rank down
    val wDown = Window.orderBy(col("i").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Holm: p·(m−i+1), running max from the smallest rank up
    val wRun = Window.orderBy(col("i").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked.select(col(groupCol), col("n_group"), col("ks"), col("i"),
        round(col("p"), 6).as("p_raw"),
        round(least(lit(1.0), min(col("p") * col("m") / col("i"))
          .over(wDown)), 6).as("p_bh"),
        round(least(lit(1.0), max(col("p") * (col("m") - col("i") + 1))
          .over(wRun)), 6).as("p_holm"))
      .select(col(groupCol), col("n_group"), col("ks"), col("p_raw"),
        col("p_bh"), col("p_holm"),
        (col("p_bh") <= alpha).cast("int").as("rej_bh"),
        (col("p_holm") <= alpha).cast("int").as("rej_holm"))
  }

  /** DuckDB replay of [[ksFdr]] on top of [[ksAgainstRestOracleSql]]. */
  def ksFdrOracleSql(table: String, groupCol: String, valueExpr: String,
      alpha: Double = 0.05): String =
    s"""WITH ks AS (${ksAgainstRestOracleSql(table, groupCol, valueExpr)}),
       |p AS (SELECT $groupCol, n_group, ks,
       |    least(1.0, 2.0 * exp(-2.0
       |      * (CAST(d_num AS DOUBLE) / CAST(d_den AS DOUBLE))
       |      * (CAST(d_num AS DOUBLE) / CAST(d_den AS DOUBLE))
       |      * (CAST(n_group * n_rest AS DOUBLE)
       |         / CAST(n_group + n_rest AS DOUBLE)))) AS p
       |  FROM ks),
       |r AS (SELECT *,
       |    row_number() OVER (ORDER BY p ASC, $groupCol ASC) AS i,
       |    count(*) OVER () AS m
       |  FROM p),
       |adj AS (SELECT $groupCol, n_group, ks, p,
       |    least(1.0, min(p * m / i) OVER (ORDER BY i DESC
       |      ROWS UNBOUNDED PRECEDING)) AS bh,
       |    least(1.0, max(p * (m - i + 1)) OVER (ORDER BY i ASC
       |      ROWS UNBOUNDED PRECEDING)) AS holm
       |  FROM r)
       |SELECT $groupCol, n_group, ks, round(p, 6) AS p_raw,
       |  round(bh, 6) AS p_bh, round(holm, 6) AS p_holm,
       |  CAST(round(bh, 6) <= $alpha AS INT) AS rej_bh,
       |  CAST(round(holm, 6) <= $alpha AS INT) AS rej_holm
       |FROM adj""".stripMargin

  /** Exact 1-Wasserstein (earth-mover) distance of each group's value
    * distribution against the rest — the drift metric that weighs
    * HOW FAR mass moved, where KS only sees the single worst ECDF
    * gap (a small shift of all mass and a large shift of a sliver
    * can tie on KS; W1 separates them). Over the sorted distinct
    * value grid v_1<…<v_k:
    *
    *   W1_g = Σ_i |F_g(v_i) − F_r(v_i)| · (v_{i+1} − v_i)
    *        = Σ_i |cum_g·n_r − cum_r·n_g| · gap_i / (n_g·n_r)
    *
    * The numerator is summed as EXACT integers (DECIMAL(38,0): each
    * term is bounded by n²·range and the sum can pass 2^63); the one
    * division at the end is IEEE-identical across engines.
    *
    * Scale shape: identical to [[ksAgainstRest]] — count
    * aggregations, a groups × distinct-values grid, one window per
    * group. Values must sit on a finite grid (ints, fixed-dp).
    *
    * @return (group, n_group, n_rest, w1 round 6dp)
    */
  def wassersteinAgainstRest(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(groupCol).as("g"),
      col(valueCol).cast("double").as("v"))
    val gv = base.groupBy("g", "v").agg(count(lit(1)).as("c"))
    val vall = base.groupBy("v").agg(count(lit(1)).as("ct"))
    val sizes = base.groupBy("g").agg(count(lit(1)).as("ng"))
    val tot = base.agg(count(lit(1)).as("nt"))
    val grid = sizes.select("g").crossJoin(vall)
      .join(gv, Seq("g", "v"), "left")
      .select(col("g"), col("v"), col("ct"),
        coalesce(col("c"), lit(0L)).as("c"))
    val w = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLead = Window.partitionBy("g").orderBy("v")
    val cums = grid.select(col("g"), col("v"),
      sum("c").over(w).as("cg"), sum("ct").over(w).as("call"),
      lead("v", 1).over(wLead).as("vn"))
    cums.join(broadcast(sizes), Seq("g")).crossJoin(broadcast(tot))
      .where(col("vn").isNotNull)
      .select(col("g"), col("ng"), (col("nt") - col("ng")).as("nr"),
        // widths chosen so the product stays <= 38 digits on BOTH
        // engines (DuckDB errors past 38): |cum diff| <= n²/4 fits
        // 24 digits up to ~10^12 rows; grid gaps fit 10
        (abs(col("cg") * (col("nt") - col("ng"))
            - (col("call") - col("cg")) * col("ng"))
          .cast("decimal(24,0)")
          * (col("vn") - col("v")).cast("decimal(10,0)")).as("term"))
      .groupBy("g", "ng", "nr")
      .agg(sum("term").as("num"))
      .select(col("g").as(groupCol), col("ng").as("n_group"),
        col("nr").as("n_rest"),
        round(col("num").cast("double")
          / (col("ng").cast("double") * col("nr").cast("double")), 6)
          .as("w1"))
  }

  /** DuckDB replay of [[wassersteinAgainstRest]]. */
  def wassersteinOracleSql(table: String, groupCol: String,
      valueExpr: String): String =
    s"""WITH base AS (SELECT $groupCol AS g, CAST($valueExpr AS DOUBLE) AS v
       |  FROM $table),
       |gv AS (SELECT g, v, count(*) AS c FROM base GROUP BY g, v),
       |vall AS (SELECT v, count(*) AS ct FROM base GROUP BY v),
       |sizes AS (SELECT g, count(*) AS ng FROM base GROUP BY g),
       |tot AS (SELECT count(*) AS nt FROM base),
       |grid AS (SELECT s.g, a.v, a.ct, coalesce(gv.c, 0) AS c
       |  FROM sizes s CROSS JOIN vall a
       |  LEFT JOIN gv ON gv.g = s.g AND gv.v = a.v),
       |cums AS (SELECT g, v,
       |  sum(c) OVER (PARTITION BY g ORDER BY v
       |    ROWS UNBOUNDED PRECEDING) AS cg,
       |  sum(ct) OVER (PARTITION BY g ORDER BY v
       |    ROWS UNBOUNDED PRECEDING) AS call,
       |  lead(v) OVER (PARTITION BY g ORDER BY v) AS vn
       | FROM grid),
       |terms AS (SELECT c.g, s.ng, t.nt - s.ng AS nr,
       |  CAST(abs(c.cg * (t.nt - s.ng) - (c.call - c.cg) * s.ng)
       |    AS DECIMAL(24,0)) * CAST(c.vn - c.v AS DECIMAL(10,0)) AS term
       | FROM cums c JOIN sizes s USING (g) CROSS JOIN tot t
       | WHERE c.vn IS NOT NULL)
       |SELECT g AS $groupCol, CAST(ng AS BIGINT) AS n_group,
       |  CAST(nr AS BIGINT) AS n_rest,
       |  round(CAST(sum(term) AS DOUBLE)
       |    / (CAST(ng AS DOUBLE) * CAST(nr AS DOUBLE)), 6) AS w1
       |FROM terms GROUP BY g, ng, nr""".stripMargin

  /** Exact Gini concentration index of a non-negative integer value
    * per group — the inequality readout behind "how skewed is this
    * source's length/revenue distribution" (complement of q284's
    * Pareto crossing point). On values sorted ascending with ranks
    * 1..n (ties ranked deterministically by value order — the
    * mean-difference Gini over a fixed permutation):
    *
    *   G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx)
    *
    * Numerator/denominator are exact DECIMAL(38,0) products of
    * longs; the one division is IEEE on the decimal→double casts.
    *
    * Scale shape: one window sort WITHIN each group (the shuffle is
    * the group partitioning itself) + one aggregation. NULL gini for
    * a group with Σx = 0.
    *
    * @return (group, n, total, gini round 6dp)
    */
  def giniIndex(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val D = "decimal(38,0)"
    val w = Window.partitionBy("g").orderBy(col("x").asc)
    df.select(col(groupCol).as("g"), col(valueCol).cast("long").as("x"))
      .select(col("g"), col("x"), row_number().over(w).as("i"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum("x").as("total"),
        sum(col("i").cast(D) * col("x")).as("ixs"))
      .select(col("g").as(groupCol), col("n"), col("total"),
        when(col("total") === 0, lit(null).cast("double"))
          .otherwise(round(
            (lit(2).cast(D) * col("ixs") - (col("n") + 1).cast(D)
              * col("total")).cast("double")
              / (col("n").cast(D) * col("total")).cast("double"), 6))
          .as("gini"))
  }

  /** DuckDB replay of [[giniIndex]]. */
  def giniOracleSql(table: String, groupCol: String,
      valueExpr: String): String =
    s"""WITH b AS (SELECT $groupCol AS g, CAST($valueExpr AS BIGINT) AS x
       |  FROM $table),
       |r AS (SELECT g, x, row_number() OVER (PARTITION BY g
       |    ORDER BY x ASC) AS i FROM b),
       |agg AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS BIGINT) AS total,
       |    sum(CAST(i AS HUGEINT) * x) AS ixs FROM r GROUP BY g)
       |SELECT g AS $groupCol, n, total,
       |  CASE WHEN total = 0 THEN NULL ELSE
       |    round(CAST(2 * ixs - CAST(n + 1 AS HUGEINT) * total AS DOUBLE)
       |      / CAST(CAST(n AS HUGEINT) * total AS DOUBLE), 6) END AS gini
       |FROM agg""".stripMargin

  /** Herfindahl–Hirschman concentration index per market: HHI =
    * 10000·Σ share_i² over the members' integer weights — the
    * antitrust-style "is this market one supplier in a trenchcoat"
    * readout beside [[giniIndex]] (HHI weighs the TOP of the
    * distribution, Gini the whole shape). Exact: Σw_i² and (Σw)² in
    * DECIMAL(38,0), one IEEE division.
    *
    * @return (market, n_members, total, hhi round 2dp — the
    *         conventional 0..10000 points scale)
    */
  def hhiIndex(df: DataFrame, marketCol: String, memberCol: String,
      weightCol: String): DataFrame = {
    val D = "decimal(38,0)"
    df.groupBy(col(marketCol).as("mkt"), col(memberCol).as("mem"))
      .agg(sum(col(weightCol).cast("long")).as("w"))
      .groupBy("mkt")
      .agg(count(lit(1)).as("n_members"), sum("w").as("total"),
        sum(col("w").cast(D) * col("w")).as("sq"))
      .select(col("mkt").as(marketCol), col("n_members"), col("total"),
        when(col("total") === 0, lit(null).cast("double"))
          .otherwise(round(lit(10000.0) * col("sq").cast("double")
            / (col("total").cast(D) * col("total")).cast("double"), 2))
          .as("hhi"))
  }

  /** DuckDB replay of [[hhiIndex]]. */
  def hhiOracleSql(table: String, marketCol: String, memberCol: String,
      weightExpr: String): String =
    s"""WITH w AS (SELECT $marketCol AS mkt, $memberCol AS mem,
       |    CAST(sum($weightExpr) AS BIGINT) AS w
       |  FROM $table GROUP BY 1, 2),
       |agg AS (SELECT mkt, CAST(count(*) AS BIGINT) AS n_members,
       |    CAST(sum(w) AS BIGINT) AS total,
       |    sum(CAST(w AS HUGEINT) * w) AS sq FROM w GROUP BY mkt)
       |SELECT mkt AS $marketCol, n_members, total,
       |  CASE WHEN total = 0 THEN NULL ELSE
       |    round(10000.0 * CAST(sq AS DOUBLE)
       |      / CAST(CAST(total AS HUGEINT) * total AS DOUBLE), 2)
       |    END AS hhi
       |FROM agg""".stripMargin

  /** Mutual information (and entropies, all in nats) between two
    * categorical columns — the feature-relevance probe ("does source
    * predict the quality flag") beside the chi-squared test's pure
    * significance. DETERMINISTIC despite the float logs: every
    * cell/marginal term is one fixed IEEE expression tree over exact
    * counts, PRE-ROUNDED to a 1e-12 grid and summed as longs — a
    * bare float SUM over cells would be partition-order dependent.
    *
    *   MI = Σ_xy (c/N)·ln(c·N/(r_x·k_y)),  NMI = MI/√(H_x·H_y)
    *
    * One cell aggregation (|X|·|Y| cells), marginals by re-agg.
    *
    * @return one row (n, n_cells, h_x, h_y, mi, nmi) — 6dp
    */
  def normalizedMutualInfo(df: DataFrame, xCol: String,
      yCol: String): DataFrame = {
    def pico(term: Column): Column = // 1e-12 grid as exact longs
      round(term * 1e12, 0).cast("long")
    val cells = df.groupBy(col(xCol).cast("string").as("x"),
        col(yCol).cast("string").as("y"))
      .agg(count(lit(1)).as("c"))
    val rx = cells.groupBy("x").agg(sum("c").as("r"))
    val ky = cells.groupBy("y").agg(sum("c").as("k"))
    val tot = cells.agg(sum("c").as("nn"))
    val joined = cells.join(broadcast(rx), Seq("x"))
      .join(broadcast(ky), Seq("y")).crossJoin(broadcast(tot))
    val n = col("nn").cast("double")
    val mi = joined.agg(sum(pico((col("c") / n) *
        log((col("c") * col("nn")).cast("double")
          / (col("r").cast("double") * col("k").cast("double")))))
        .as("mi12"),
      count(lit(1)).as("n_cells"), max("nn").as("n"))
    def ent(m: DataFrame, cnt: String): Column =
      sum(pico(-(col(cnt) / col("nn").cast("double")) *
        log(col(cnt).cast("double") / col("nn").cast("double"))))
    val hx = rx.crossJoin(broadcast(tot)).agg(ent(rx, "r").as("hx12"))
    val hy = ky.crossJoin(broadcast(tot)).agg(ent(ky, "k").as("hy12"))
    mi.crossJoin(broadcast(hx)).crossJoin(broadcast(hy))
      .select(col("n"), col("n_cells"),
        round(col("hx12").cast("double") / 1e12, 6).as("h_x"),
        round(col("hy12").cast("double") / 1e12, 6).as("h_y"),
        round(col("mi12").cast("double") / 1e12, 6).as("mi"),
        when(col("hx12") <= 0 || col("hy12") <= 0,
            lit(null).cast("double"))
          .otherwise(round(col("mi12").cast("double")
            / sqrt(col("hx12").cast("double") * col("hy12").cast("double")),
            6)).as("nmi"))
  }

  /** DuckDB replay of [[normalizedMutualInfo]]. */
  def normalizedMutualInfoOracleSql(table: String, xExpr: String,
      yExpr: String): String =
    s"""WITH cells AS (SELECT CAST($xExpr AS VARCHAR) AS x,
       |    CAST($yExpr AS VARCHAR) AS y, count(*) AS c
       |  FROM $table GROUP BY 1, 2),
       |rx AS (SELECT x, CAST(sum(c) AS BIGINT) AS r FROM cells GROUP BY x),
       |ky AS (SELECT y, CAST(sum(c) AS BIGINT) AS k FROM cells GROUP BY y),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM cells),
       |mi AS (SELECT CAST(sum(CAST(round((c / CAST(nn AS DOUBLE))
       |      * ln(CAST(c * nn AS DOUBLE)
       |        / (CAST(r AS DOUBLE) * CAST(k AS DOUBLE))) * 1e12, 0)
       |      AS BIGINT)) AS BIGINT) AS mi12,
       |    CAST(count(*) AS BIGINT) AS n_cells, max(nn) AS n
       |  FROM cells JOIN rx USING (x) JOIN ky USING (y) CROSS JOIN tot),
       |hx AS (SELECT CAST(sum(CAST(round(-(r / CAST(nn AS DOUBLE))
       |      * ln(CAST(r AS DOUBLE) / CAST(nn AS DOUBLE)) * 1e12, 0)
       |      AS BIGINT)) AS BIGINT) AS hx12 FROM rx CROSS JOIN tot),
       |hy AS (SELECT CAST(sum(CAST(round(-(k / CAST(nn AS DOUBLE))
       |      * ln(CAST(k AS DOUBLE) / CAST(nn AS DOUBLE)) * 1e12, 0)
       |      AS BIGINT)) AS BIGINT) AS hy12 FROM ky CROSS JOIN tot)
       |SELECT CAST(n AS BIGINT) AS n, n_cells,
       |  round(CAST(hx12 AS DOUBLE) / 1e12, 6) AS h_x,
       |  round(CAST(hy12 AS DOUBLE) / 1e12, 6) AS h_y,
       |  round(CAST(mi12 AS DOUBLE) / 1e12, 6) AS mi,
       |  CASE WHEN hx12 <= 0 OR hy12 <= 0 THEN NULL ELSE
       |    round(CAST(mi12 AS DOUBLE)
       |      / sqrt(CAST(hx12 AS DOUBLE) * CAST(hy12 AS DOUBLE)), 6)
       |    END AS nmi
       |FROM mi CROSS JOIN hx CROSS JOIN hy""".stripMargin

  /** Hellinger distance of each group's binned value distribution
    * against the rest — the bounded [0,1] drift metric whose square
    * is additive over bins (PSI explodes on empty bins, KS ignores
    * mass, Hellinger does neither):
    *
    *   H = √(1 − Σ_b √(p_b·q_b))
    *
    * The affinity terms √(p·q) are pre-rounded to the 1e-12 grid and
    * summed as exact longs (same determinism discipline as
    * [[mutualInformation]] — a float sum over bins would be
    * partition-order dependent).
    *
    * @return (group, n_group, n_rest, hellinger round 6dp)
    */
  def hellingerAgainstRest(df: DataFrame, groupCol: String,
      binExpr: Column): DataFrame = {
    val base = df.select(col(groupCol).as("g"), binExpr.as("b"))
    val gb = base.groupBy("g", "b").agg(count(lit(1)).as("c"))
    val ab = base.groupBy("b").agg(count(lit(1)).as("ct"))
    val sizes = base.groupBy("g").agg(count(lit(1)).as("ng"))
    val tot = base.agg(count(lit(1)).as("nt"))
    val grid = sizes.select("g").crossJoin(ab)
      .join(gb, Seq("g", "b"), "left")
      .select(col("g"), col("b"), col("ct"),
        coalesce(col("c"), lit(0L)).as("c"))
    grid.join(broadcast(sizes), Seq("g")).crossJoin(broadcast(tot))
      .select(col("g"), col("ng"), (col("nt") - col("ng")).as("nr"),
        round(sqrt((col("c").cast("double") / col("ng").cast("double"))
            * ((col("ct") - col("c")).cast("double")
              / (col("nt") - col("ng")).cast("double"))) * 1e12, 0)
          .cast("long").as("aff12"))
      .groupBy("g", "ng", "nr")
      .agg(sum("aff12").as("s12"))
      .select(col("g").as(groupCol), col("ng").as("n_group"),
        col("nr").as("n_rest"),
        round(sqrt(greatest(lit(0.0),
          lit(1.0) - col("s12").cast("double") / 1e12)), 6)
          .as("hellinger"))
  }

  /** DuckDB replay of [[hellingerAgainstRest]]; `binSql` is the bin
    * expression over the table's columns. */
  def hellingerOracleSql(table: String, groupCol: String,
      binSql: String): String =
    s"""WITH base AS (SELECT $groupCol AS g, $binSql AS b FROM $table),
       |gb AS (SELECT g, b, count(*) AS c FROM base GROUP BY g, b),
       |ab AS (SELECT b, count(*) AS ct FROM base GROUP BY b),
       |sizes AS (SELECT g, count(*) AS ng FROM base GROUP BY g),
       |tot AS (SELECT count(*) AS nt FROM base),
       |grid AS (SELECT s.g, a.b, a.ct, coalesce(gb.c, 0) AS c
       |  FROM sizes s CROSS JOIN ab a
       |  LEFT JOIN gb ON gb.g = s.g AND gb.b = a.b),
       |terms AS (SELECT gr.g, s.ng, t.nt - s.ng AS nr,
       |    CAST(round(sqrt((gr.c / CAST(s.ng AS DOUBLE))
       |      * ((gr.ct - gr.c) / CAST(t.nt - s.ng AS DOUBLE))) * 1e12, 0)
       |      AS BIGINT) AS aff12
       |  FROM grid gr JOIN sizes s USING (g) CROSS JOIN tot t)
       |SELECT g AS $groupCol, CAST(ng AS BIGINT) AS n_group,
       |  CAST(nr AS BIGINT) AS n_rest,
       |  round(sqrt(greatest(0.0,
       |    1.0 - CAST(sum(aff12) AS DOUBLE) / 1e12)), 6) AS hellinger
       |FROM terms GROUP BY g, ng, nr""".stripMargin

  /** Empirical-Bayes (beta-binomial, method-of-moments) shrinkage of
    * per-group binary rates toward the corpus mean — the estimator
    * behind every "rank items by conversion rate without letting a
    * 1-of-1 item beat a 980-of-1000 one" readout. Prior strength M
    * is fitted from the data, not guessed:
    *
    *   p̄ = Σx/Σn,  v = Σn(r_g − p̄)²/Σn,  M = p̄(1−p̄)/v − 1
    *   shrunk_g = (x_g + M·p̄) / (n_g + M)
    *
    * All sufficient statistics are exact longs/decimals; v uses the
    * exact expansion Σn·r² = Σx²/n pre-rounded to the 1e-12 grid and
    * summed as longs (the usual determinism discipline), and M and
    * every shrunk rate are fixed IEEE trees over them. M (and the
    * shrunk column) is NULL when the between-group variance doesn't
    * exceed binomial noise (v ≤ 0 or M ≤ 0 — nothing to shrink
    * toward, report raw).
    *
    * @return per group: (group, n, x, raw_rate, shrunk_rate, m_prior)
    */
  def ebShrunkRates(df: DataFrame, groupCol: String,
      flagCol: Column): DataFrame = {
    val g = df.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(flagCol.cast("long")).as("x"))
    val tot = g.agg(sum("n").as("nn"), sum("x").as("xx"),
      sum(round((col("x") * col("x")).cast("double")
          / col("n").cast("double") * 1e12, 0).cast("decimal(38,0)"))
        .as("sq12"))
    val pbar = col("xx").cast("double") / col("nn").cast("double")
    // v = (Σ x²/n)/N − p̄²  (weighted between-group variance of rates)
    val v = col("sq12").cast("double") / 1e12 / col("nn").cast("double") -
      pbar * pbar
    val m = pbar * (lit(1.0) - pbar) / v - 1.0
    g.crossJoin(broadcast(tot))
      .select(col("grp").as(groupCol), col("n"), col("x"),
        round(col("x").cast("double") / col("n").cast("double"), 6)
          .as("raw_rate"),
        // nested guards: m divides by v, so v <= 0 must short-circuit
        // BEFORE m is evaluated (Spark ANSI errors on x/0)
        when(v <= 0.0, lit(null).cast("double"))
          .otherwise(when(m <= 0.0, lit(null).cast("double"))
            .otherwise(round((col("x").cast("double") + m * pbar)
              / (col("n").cast("double") + m), 6))).as("shrunk_rate"),
        when(v <= 0.0, lit(null).cast("double"))
          .otherwise(when(m <= 0.0, lit(null).cast("double"))
            .otherwise(round(m, 6))).as("m_prior"))
  }

  /** DuckDB replay of [[ebShrunkRates]]; `flagExpr` is 0/1. */
  def ebShrunkRatesOracleSql(table: String, groupCol: String,
      flagExpr: String): String =
    s"""WITH g AS (SELECT $groupCol AS grp,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum($flagExpr) AS BIGINT) AS x
       |  FROM $table GROUP BY 1),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
       |    CAST(sum(x) AS BIGINT) AS xx,
       |    sum(CAST(round(CAST(x * x AS DOUBLE) / CAST(n AS DOUBLE)
       |      * 1e12, 0) AS HUGEINT)) AS sq12
       |  FROM g),
       |f AS (SELECT nn, xx, sq12,
       |    CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE) AS pbar,
       |    CAST(sq12 AS DOUBLE) / 1e12 / CAST(nn AS DOUBLE)
       |      - (CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE))
       |        * (CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE)) AS v
       |  FROM tot),
       |f2 AS (SELECT *, pbar * (1.0 - pbar) / v - 1.0 AS m FROM f)
       |SELECT grp AS $groupCol, n, x,
       |  round(CAST(x AS DOUBLE) / CAST(n AS DOUBLE), 6) AS raw_rate,
       |  CASE WHEN v <= 0.0 OR m <= 0.0 THEN NULL ELSE
       |    round((CAST(x AS DOUBLE) + m * pbar)
       |      / (CAST(n AS DOUBLE) + m), 6) END AS shrunk_rate,
       |  CASE WHEN v <= 0.0 OR m <= 0.0 THEN NULL ELSE round(m, 6)
       |    END AS m_prior
       |FROM g CROSS JOIN f2""".stripMargin

  /** Spiegelhalter's calibration Z — the significance companion of
    * the reliability diagram (q181) and ECE (q232): a single test
    * statistic for "are these probabilities calibrated", computed
    * without any binning choice:
    *
    *   Z = Σ(y−p)(1−2p) / √(Σ(1−2p)²·p(1−p))
    *
    * Scores ride the 1e-5 probability grid so the numerator is an
    * exact long sum and the denominator an exact DECIMAL(38,0) sum —
    * the unit factors cancel in the ratio. |Z| > 1.96 rejects
    * calibration at 5%. One scan, one aggregate. NULL when every
    * p ∈ {0,1} (denominator 0 — the statistic is undefined).
    *
    * @param df (score in [0,1], label 0/1) columns by name
    * @return one row (n, z, reject_5pct)
    */
  def spiegelhalterZ(df: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val U = 100000L
    val p = round(col(scoreCol).cast("double") * U).cast("long")
    val y = col(labelCol).cast("long") * U
    val D = "decimal(38,0)"
    df.select(p.as("p"), y.as("y"))
      .agg(count(lit(1)).as("n"),
        sum((col("y") - col("p")) * (lit(U) - col("p") * 2)).as("num"),
        sum(((lit(U) - col("p") * 2) * (lit(U) - col("p") * 2)).cast(D)
          * (col("p") * (lit(U) - col("p"))).cast(D)).as("den"))
      .select(col("n"),
        when(col("den") === 0, lit(null).cast("double"))
          .otherwise(round(col("num").cast("double")
            / sqrt(col("den").cast("double")), 6)).as("z"),
        when(col("den") === 0, lit(null).cast("int"))
          .otherwise((abs(col("num").cast("double")
            / sqrt(col("den").cast("double"))) > 1.96).cast("int"))
          .as("reject_5pct"))
  }

  /** DuckDB replay of [[spiegelhalterZ]]; `scoreExpr` in [0,1],
    * `labelExpr` 0/1. */
  def spiegelhalterOracleSql(table: String, scoreExpr: String,
      labelExpr: String): String =
    s"""WITH b AS (SELECT
       |    CAST(round(CAST($scoreExpr AS DOUBLE) * 100000) AS BIGINT)
       |      AS p,
       |    CAST($labelExpr AS BIGINT) * 100000 AS y FROM $table),
       |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum((y - p) * (100000 - 2 * p)) AS BIGINT) AS num,
       |    sum(CAST((100000 - 2 * p) * (100000 - 2 * p) AS HUGEINT)
       |      * CAST(p * (100000 - p) AS HUGEINT)) AS den
       |  FROM b)
       |SELECT n,
       |  CASE WHEN den = 0 THEN NULL ELSE
       |    round(CAST(num AS DOUBLE) / sqrt(CAST(den AS DOUBLE)), 6)
       |    END AS z,
       |  CASE WHEN den = 0 THEN NULL ELSE
       |    CAST(abs(CAST(num AS DOUBLE) / sqrt(CAST(den AS DOUBLE)))
       |      > 1.96 AS INT) END AS reject_5pct
       |FROM agg""".stripMargin

  /** Split-conformal prediction interval for a 1-feature OLS
    * regression, with its coverage audit: fit on the calibration
    * half, take the ⌈0.9·(n+1)⌉-th smallest absolute residual as the
    * interval half-width q̂ (a finite-sample order statistic — the
    * conformal guarantee needs NO distributional assumption), then
    * MEASURE coverage on the held-out half. The distribution-free
    * uncertainty wrapper for any scorer a pipeline ships.
    *
    * Determinism: OLS moments are exact longs/decimals; slope,
    * intercept and each residual are fixed IEEE trees, residuals are
    * rounded onto the micro grid BEFORE ranking so the order
    * statistic and the coverage comparisons are exact long
    * comparisons in both engines.
    *
    * @param df (xCol long-valued, yMicroCol micro-grid long)
    * @return (n_cal, n_test, slope, intercept, qhat, coverage,
    *         target)
    */
  def splitConformal(df: DataFrame, xCol: String, yMicroCol: String,
      calPred: Column, targetPct: Int = 90): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(targetPct >= 50 && targetPct < 100,
      s"targetPct in [50,100), got $targetPct")
    val D = "decimal(38,0)"
    val base = df.select(col(xCol).cast("long").as("x"),
      col(yMicroCol).cast("long").as("y"), calPred.as("cal"))
      .localCheckpoint() // feeds fit, rank and audit
    val cal = base.where(col("cal"))
    val mom = cal.agg(count(lit(1)).as("n"), sum("x").as("sx"),
      sum("y").as("sy"), sum(col("x").cast(D) * col("y")).as("sxy"),
      sum(col("x").cast(D) * col("x")).as("sxx"))
    val fit = mom.select(col("n"), col("sx"), col("sy"),
        ((col("n").cast(D) * col("sxy") - col("sx").cast(D) * col("sy"))
          .cast("double")
          / (col("n").cast(D) * col("sxx") - col("sx").cast(D) * col("sx"))
            .cast("double")).as("slope"))
      .select(col("n").as("n_cal"), col("slope"),
        ((col("sy").cast("double") - col("slope") * col("sx").cast("double"))
          / col("n").cast("double")).as("icept"))
    val res = cal.crossJoin(broadcast(fit))
      .select(abs(round(col("y").cast("double")
        - (col("slope") * col("x").cast("double") + col("icept")), 0))
        .cast("long").as("r6"))
    val k = res.crossJoin(broadcast(fit))
      .select(col("r6"), col("n_cal"),
        row_number().over(Window.orderBy(col("r6").asc)).as("rk"))
      .where(col("rk") ===
        least(ceil((col("n_cal") + 1) * targetPct / 100.0).cast("long"),
          col("n_cal")))
      .select(col("r6").as("qhat6"))
    val audit = base.where(!col("cal"))
      .crossJoin(broadcast(fit)).crossJoin(broadcast(k))
      .agg(count(lit(1)).as("n_test"),
        sum((abs(round(col("y").cast("double")
          - (col("slope") * col("x").cast("double") + col("icept")), 0))
          .cast("long") <= col("qhat6")).cast("long")).as("n_in"))
    fit.crossJoin(broadcast(k)).crossJoin(broadcast(audit))
      .select(col("n_cal"), col("n_test"),
        round(col("slope"), 6).as("slope"),
        round(col("icept") / 1e6, 6).as("intercept"),
        (col("qhat6").cast("double") / 1e6).as("qhat"),
        round(col("n_in").cast("double") / col("n_test").cast("double"),
          6).as("coverage"),
        lit(targetPct / 100.0).as("target"))
  }

  /** DuckDB replay of [[splitConformal]]; `xExpr` integral,
    * `yMicroExpr` micro-grid, `calPredSql` the calibration filter. */
  def splitConformalOracleSql(table: String, xExpr: String,
      yMicroExpr: String, calPredSql: String,
      targetPct: Int = 90): String =
    s"""WITH base AS (SELECT CAST($xExpr AS BIGINT) AS x,
       |    CAST($yMicroExpr AS BIGINT) AS y, $calPredSql AS cal
       |  FROM $table),
       |mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    sum(CAST(x AS HUGEINT) * y) AS sxy,
       |    sum(CAST(x AS HUGEINT) * x) AS sxx
       |  FROM base WHERE cal),
       |fit AS (SELECT n AS n_cal,
       |    CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
       |      AS DOUBLE)
       |    / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
       |      AS DOUBLE) AS slope,
       |    0.0 AS _pad, sx, sy FROM mom),
       |fit2 AS (SELECT n_cal, slope,
       |    (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
       |      / CAST(n_cal AS DOUBLE) AS icept FROM fit),
       |res AS (SELECT CAST(abs(round(CAST(y AS DOUBLE)
       |      - (slope * CAST(x AS DOUBLE) + icept), 0)) AS BIGINT)
       |      AS r6
       |  FROM base CROSS JOIN fit2 WHERE cal),
       |k AS (SELECT r6 AS qhat6 FROM (SELECT r6, row_number()
       |      OVER (ORDER BY r6 ASC) AS rk FROM res) t
       |  CROSS JOIN fit2
       |  WHERE rk = least(CAST(ceil((n_cal + 1) * $targetPct / 100.0)
       |    AS BIGINT), n_cal)),
       |audit AS (SELECT CAST(count(*) AS BIGINT) AS n_test,
       |    CAST(sum(CASE WHEN CAST(abs(round(CAST(y AS DOUBLE)
       |        - (slope * CAST(x AS DOUBLE) + icept), 0)) AS BIGINT)
       |        <= qhat6 THEN 1 ELSE 0 END) AS BIGINT) AS n_in
       |  FROM base CROSS JOIN fit2 CROSS JOIN k WHERE NOT cal)
       |SELECT n_cal, n_test, round(slope, 6) AS slope,
       |  round(icept / 1e6, 6) AS intercept,
       |  CAST(qhat6 AS DOUBLE) / 1e6 AS qhat,
       |  round(CAST(n_in AS DOUBLE) / CAST(n_test AS DOUBLE), 6)
       |    AS coverage,
       |  ${targetPct / 100.0} AS target
       |FROM fit2 CROSS JOIN k CROSS JOIN audit""".stripMargin

  /** Differentially-private count release (Laplace mechanism) with
    * DETERMINISTIC noise: the per-group uniform comes from the md5
    * coordinate of (salt, group) — so the release is reproducible,
    * engine-portable and auditable in tests, while the mechanism's
    * shape (scale 1/ε, inverse-CDF transform, non-negative clamp)
    * is exactly what a production ε-DP count release runs with real
    * randomness. Completes the privacy family (k-anon q172, l-div
    * q176, t-closeness q294) with the release step itself.
    *
    *   noise = −(1/ε)·sign(u−½)·ln(1−2|u−½|),  u ~ md5-uniform
    *
    * @return (group, n, noise, released) — released ≥ 0 integer
    */
  def dpLaplaceCounts(df: DataFrame, groupCol: String, eps: Double,
      salt: String): DataFrame = {
    require(eps > 0, s"epsilon must be > 0, got $eps")
    val g = df.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n"))
    val u = (conv(SampleOps.hashCoord(col("grp"), salt), 16, 10)
      .cast("double") + 1) / 4.503599627370497e15 // 16^13 + 1
    val noise = (lit(-1.0) / eps) *
      when(u >= 0.5, lit(1.0)).otherwise(lit(-1.0)) *
      log(lit(1.0) - lit(2.0) * abs(u - 0.5))
    g.select(col("grp").as(groupCol), col("n"),
      round(noise, 6).as("noise"),
      greatest(lit(0L),
        round(col("n") + noise, 0).cast("long")).as("released"))
  }

  /** DuckDB replay of [[dpLaplaceCounts]]. */
  def dpLaplaceOracleSql(table: String, groupCol: String, eps: Double,
      salt: String): String = {
    // DuckDB lacks conv(hex, 16, 10); spell the 13-hex coordinate as
    // exact digitwise bigint arithmetic.
    val hexToInt = (1 to 13).map(i =>
      s"(CASE substring(h, $i, 1) WHEN 'a' THEN 10 WHEN 'b' THEN 11" +
        s" WHEN 'c' THEN 12 WHEN 'd' THEN 13 WHEN 'e' THEN 14" +
        s" WHEN 'f' THEN 15 ELSE CAST(substring(h, $i, 1) AS BIGINT)" +
        s" END) * ${BigInt(16).pow(13 - i)}").mkString(" + ")
    s"""WITH g AS (SELECT $groupCol AS grp,
       |    CAST(count(*) AS BIGINT) AS n FROM $table GROUP BY 1),
       |h AS (SELECT grp, n, substring(md5('$salt'
       |    || CAST(grp AS VARCHAR)), 1, 13) AS h FROM g),
       |v AS (SELECT grp, n,
       |    (CAST(($hexToInt) AS DOUBLE) + 1) / 4.503599627370497e15
       |      AS u
       |  FROM h),
       |nz AS (SELECT grp, n,
       |    (-1.0 / $eps) * (CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END)
       |      * ln(1.0 - 2.0 * abs(u - 0.5)) AS noise
       |  FROM v)
       |SELECT grp AS $groupCol, n, round(noise, 6) AS noise,
       |  greatest(CAST(0 AS BIGINT),
       |    CAST(round(n + noise, 0) AS BIGINT)) AS released
       |FROM nz""".stripMargin
  }

  /** Cumulative gains / lift table by score decile — the
    * model-triage readout ("the top 20% of scores captures X% of the
    * positives") that reliability diagrams don't give. Deciles are
    * deterministic ntile-by-(score desc, id asc); counts are exact
    * longs; cumulative shares and lift are single IEEE divisions.
    *
    * One window rank over the scored frame + one 10-row aggregation.
    *
    * @return per decile: (decile, n, n_pos, cum_pos, cum_share,
    *         cum_gain, lift)
    */
  def decileGains(df: DataFrame, idCol: String, scoreCol: String,
      labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = df.select(col(idCol).as("id"),
        col(scoreCol).as("s"), col(labelCol).cast("long").as("y"))
      .select(col("y"),
        ntile(10).over(Window.orderBy(col("s").desc, col("id").asc))
          .as("decile"))
    val g = ranked.groupBy("decile")
      .agg(count(lit(1)).as("n"), sum("y").as("n_pos"))
    gainsFromDecileCounts(g)
  }

  /** Gains/lift tail from per-decile (decile, n, n_pos) counts —
    * shared by [[decileGains]] and [[decileGainsFromHist]].
    */
  private def gainsFromDecileCounts(g: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = g.agg(sum("n").as("nt"), sum("n_pos").as("pt"))
    g.select(col("decile"), col("n"), col("n_pos"),
        sum("n_pos").over(w).as("cum_pos"),
        sum("n").over(w).as("cum_n"))
      .crossJoin(broadcast(tot))
      .select(col("decile"), col("n"), col("n_pos"), col("cum_pos"),
        round(col("cum_n").cast("double") / col("nt").cast("double"), 6)
          .as("cum_share"),
        when(col("pt") === 0, lit(null).cast("double"))
          .otherwise(round(col("cum_pos").cast("double")
            / col("pt").cast("double"), 6)).as("cum_gain"),
        when(col("pt") === 0 || col("cum_n") === 0,
            lit(null).cast("double"))
          .otherwise(round((col("cum_pos").cast("double")
              * col("nt").cast("double"))
            / (col("cum_n").cast("double") * col("pt").cast("double")),
            6)).as("lift"))
  }

  /** [[decileGains]] from a (p, y, c) score-grid HISTOGRAM instead of
    * row-level data — the streaming twin's finisher
    * ([[graft.streaming.StreamOps.decileHistStream]] maintains the
    * bounded histogram as complete-mode state; this derives the decile
    * table from it with NO global sort of the corpus, which is also
    * the right 100 TB batch shape when the score grid is coarse).
    *
    * Cells are laid out in (p desc, y desc) rank order — positives
    * before negatives within a tied score cell; on inputs with no
    * (score, label)-duplicate rank straddles (e.g. distinct scores)
    * this is EXACTLY [[decileGains]]'s (score desc, id asc) ntile.
    * Decile boundaries replicate ntile's size rule (first N mod 10
    * buckets one larger); each cell's rank interval is intersected
    * with each decile's interval analytically — 10 rows per cell,
    * histogram-scale work.
    */
  def decileGainsFromHist(hist: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = hist.sparkSession
    val wc = Window.orderBy(col("p").desc, col("y").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.select(col("p"), col("y").cast("long").as("y"),
        col("c").cast("long").as("c"))
      .withColumn("hi", sum("c").over(wc))
      .withColumn("lo", col("hi") - col("c") + 1)
    val tot = hist.agg(sum(col("c").cast("long")).as("nt"))
    val bounds = spark.range(1, 11).toDF("decile")
      .crossJoin(broadcast(tot))
      .select(col("decile").cast("int").as("decile"),
        ((col("decile") - 1) * expr("nt div 10") +
          least(col("decile") - 1, pmod(col("nt"), lit(10L))) + 1)
          .as("dlo"),
        ((col("decile") - 1) * expr("nt div 10") +
          least(col("decile") - 1, pmod(col("nt"), lit(10L))) +
          expr("nt div 10") +
          when(col("decile") <= pmod(col("nt"), lit(10L)), 1L)
            .otherwise(0L)).as("dhi"))
    val ov = cum.crossJoin(broadcast(bounds))
      .select(col("decile"), col("y"),
        greatest(lit(0L), least(col("hi"), col("dhi")) -
          greatest(col("lo"), col("dlo")) + 1).as("k"))
    val g = ov.groupBy("decile")
      .agg(sum("k").as("n"), sum(col("k") * col("y")).as("n_pos"))
    gainsFromDecileCounts(g)
  }

  /** [[brierDecomposition]] from the (p, nk, yk) score-grid cells —
    * the streaming twin's finisher. The per-row Brier sum is
    * recovered from the cells EXACTLY: every row in a cell shares
    * (p, y), so the batch's per-row pre-rounded pico terms sum to
    * count × the cell's term — yk·pico((p̄−1)²) + (nk−yk)·pico(p̄²).
    */
  def brierFromCells(cells: DataFrame): DataFrame = {
    val U = 100000L
    val tot = cells.agg(sum("nk").as("n"), sum("yk").as("yt"))
    def pico(c: Column): Column = round(c * 1e12, 0).cast("long")
    val pd = col("p").cast("double") / U
    val ybark = col("yk").cast("double") / col("nk").cast("double")
    val ybar = col("yt").cast("double") / col("n").cast("double")
    cells.crossJoin(broadcast(tot))
      .agg(max("n").as("n"), max("yt").as("yt"),
        sum(pico(col("nk") * (pd - ybark) * (pd - ybark))).as("rel12"),
        sum(pico(col("nk") * (ybark - ybar) * (ybark - ybar)))
          .as("res12"),
        sum(col("yk") * pico((pd - 1.0d) * (pd - 1.0d)) +
          (col("nk") - col("yk")) * pico(pd * pd)).as("b12"))
      .select(col("n"),
        round(col("b12").cast("double") / 1e12
          / col("n").cast("double"), 6).as("brier"),
        round(col("rel12").cast("double") / 1e12
          / col("n").cast("double"), 6).as("reliability"),
        round(col("res12").cast("double") / 1e12
          / col("n").cast("double"), 6).as("resolution"),
        round((col("yt").cast("double") / col("n").cast("double"))
          * (lit(1.0) - col("yt").cast("double") / col("n").cast("double")),
          6).as("uncertainty"))
  }

  /** Exact type-1 percentiles per key from a (key, v, c) value
    * HISTOGRAM: the p-th percentile is the smallest v whose
    * cumulative count reaches ceil(n·p/100) — identical to the
    * row-level rank-window spelling (q347), with work proportional
    * to the histogram, not the corpus. The streaming SLA twin's
    * finisher ([[graft.streaming.StreamOps.valueHistStream]]).
    * Output: (key, n, p\$p ...) one column per requested percent.
    */
  def percentilesFromHist(hist: DataFrame, keyCol: String,
      pcts: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(pcts.nonEmpty && pcts.forall(p => p > 0 && p <= 100),
      "percents must be in (0,100]")
    val wc = Window.partitionBy(keyCol).orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .select(col(keyCol), col("v"), col("c").cast("long").as("c"))
      .withColumn("cumc", sum("c").over(wc))
      .withColumn("n", sum("c").over(Window.partitionBy(keyCol)))
    val picks = pcts.map { p =>
      min(when(col("cumc") >=
        ceil(col("n") * p / 100.0).cast("long"), col("v"))).as(s"p$p")
    }
    val aggs = max("n").as("n") +: picks
    cum.groupBy(keyCol).agg(aggs.head, aggs.tail: _*)
  }

  /** DuckDB replay of [[decileGains]]. */
  def decileGainsOracleSql(table: String, idExpr: String,
      scoreExpr: String, labelExpr: String): String =
    s"""WITH r AS (SELECT CAST($labelExpr AS BIGINT) AS y,
       |    ntile(10) OVER (ORDER BY $scoreExpr DESC, $idExpr ASC)
       |      AS decile
       |  FROM $table),
       |g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(y) AS BIGINT) AS n_pos FROM r GROUP BY decile),
       |t AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
       |    CAST(sum(n_pos) AS BIGINT) AS pt FROM g),
       |c AS (SELECT decile, n, n_pos,
       |    CAST(sum(n_pos) OVER w AS BIGINT) AS cum_pos,
       |    CAST(sum(n) OVER w AS BIGINT) AS cum_n
       |  FROM g WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING))
       |SELECT decile, n, n_pos, cum_pos,
       |  round(CAST(cum_n AS DOUBLE) / CAST(nt AS DOUBLE), 6)
       |    AS cum_share,
       |  CASE WHEN pt = 0 THEN NULL ELSE
       |    round(CAST(cum_pos AS DOUBLE) / CAST(pt AS DOUBLE), 6)
       |    END AS cum_gain,
       |  CASE WHEN pt = 0 OR cum_n = 0 THEN NULL ELSE
       |    round((CAST(cum_pos AS DOUBLE) * CAST(nt AS DOUBLE))
       |      / (CAST(cum_n AS DOUBLE) * CAST(pt AS DOUBLE)), 6)
       |    END AS lift
       |FROM c CROSS JOIN t""".stripMargin

  /** Murphy decomposition of the Brier score over score-grid cells:
    *
    *   Brier = reliability − resolution + uncertainty
    *   REL = Σ n_k(p̄_k − ȳ_k)²/N,  RES = Σ n_k(ȳ_k − ȳ)²/N,
    *   UNC = ȳ(1 − ȳ)
    *
    * — splits "how wrong are the probabilities" into the fixable part
    * (reliability: calibration error per score cell) and the
    * earned part (resolution: how much the score separates outcomes),
    * the diagnosis ECE alone can't make. Cells are the exact 1e-5
    * score grid (p̄_k is exact BY construction — every row in a cell
    * shares the score), ȳ_k is an exact ratio; each cell term is
    * pre-rounded to the 1e-12 grid and summed as longs.
    *
    * @return one row (n, brier, reliability, resolution, uncertainty)
    */
  def brierDecomposition(df: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val U = 100000L
    val base = df.select(
      round(col(scoreCol).cast("double") * U).cast("long").as("p"),
      col(labelCol).cast("long").as("y"))
    val cells = base.groupBy("p")
      .agg(count(lit(1)).as("nk"), sum("y").as("yk"))
    val tot = cells.agg(sum("nk").as("n"), sum("yk").as("yt"))
    def pico(c: Column): Column = round(c * 1e12, 0).cast("long")
    val pd = col("p").cast("double") / U
    val ybark = col("yk").cast("double") / col("nk").cast("double")
    val ybar = col("yt").cast("double") / col("n").cast("double")
    val agg = cells.crossJoin(broadcast(tot))
      .agg(max("n").as("n"), max("yt").as("yt"),
        sum(pico(col("nk") * (pd - ybark) * (pd - ybark))).as("rel12"),
        sum(pico(col("nk") * (ybark - ybar) * (ybark - ybar)))
          .as("res12"))
    val brier = base.crossJoin(broadcast(tot))
      .agg(sum(pico((pd - col("y")) * (pd - col("y")))).as("b12"),
        max("n").as("nb"))
    agg.crossJoin(broadcast(brier))
      .select(col("n"),
        round(col("b12").cast("double") / 1e12
          / col("nb").cast("double"), 6).as("brier"),
        round(col("rel12").cast("double") / 1e12
          / col("n").cast("double"), 6).as("reliability"),
        round(col("res12").cast("double") / 1e12
          / col("n").cast("double"), 6).as("resolution"),
        round((col("yt").cast("double") / col("n").cast("double"))
          * (lit(1.0) - col("yt").cast("double") / col("n").cast("double")),
          6).as("uncertainty"))
  }

  /** DuckDB replay of [[brierDecomposition]]. */
  def brierDecompositionOracleSql(table: String, scoreExpr: String,
      labelExpr: String): String =
    s"""WITH base AS (SELECT
       |    CAST(round(CAST($scoreExpr AS DOUBLE) * 100000) AS BIGINT)
       |      AS p,
       |    CAST($labelExpr AS BIGINT) AS y FROM $table),
       |cells AS (SELECT p, CAST(count(*) AS BIGINT) AS nk,
       |    CAST(sum(y) AS BIGINT) AS yk FROM base GROUP BY p),
       |t AS (SELECT CAST(sum(nk) AS BIGINT) AS n,
       |    CAST(sum(yk) AS BIGINT) AS yt FROM cells),
       |a AS (SELECT
       |    CAST(sum(CAST(round(nk * (p / 100000.0 - yk * 1.0 / nk)
       |      * (p / 100000.0 - yk * 1.0 / nk) * 1e12, 0) AS BIGINT))
       |      AS BIGINT) AS rel12,
       |    CAST(sum(CAST(round(nk * (yk * 1.0 / nk - yt * 1.0 / n)
       |      * (yk * 1.0 / nk - yt * 1.0 / n) * 1e12, 0) AS BIGINT))
       |      AS BIGINT) AS res12,
       |    max(n) AS n, max(yt) AS yt
       |  FROM cells CROSS JOIN t),
       |b AS (SELECT CAST(sum(CAST(round((p / 100000.0 - y)
       |      * (p / 100000.0 - y) * 1e12, 0) AS BIGINT)) AS BIGINT)
       |      AS b12,
       |    max(n) AS nb
       |  FROM base CROSS JOIN t)
       |SELECT a.n,
       |  round(CAST(b12 AS DOUBLE) / 1e12 / CAST(nb AS DOUBLE), 6)
       |    AS brier,
       |  round(CAST(rel12 AS DOUBLE) / 1e12 / CAST(a.n AS DOUBLE), 6)
       |    AS reliability,
       |  round(CAST(res12 AS DOUBLE) / 1e12 / CAST(a.n AS DOUBLE), 6)
       |    AS resolution,
       |  round((CAST(yt AS DOUBLE) / CAST(a.n AS DOUBLE))
       |    * (1.0 - CAST(yt AS DOUBLE) / CAST(a.n AS DOUBLE)), 6)
       |    AS uncertainty
       |FROM a CROSS JOIN b""".stripMargin

  /** Exact Spearman rank correlation between two numeric columns —
    * the monotone-association probe beside [[corrMatrix]]'s linear
    * Pearson (a saturating quality-vs-length relation scores ~1 here
    * while Pearson under-reads it). Midrank ties make ranks
    * half-integers, so DOUBLED ranks (2r = 2·cum_before + ct + 1) are
    * exact integers; Spearman = Pearson of ranks is affine-invariant,
    * so the rho of the 2r values is identical — every moment is an
    * exact integer summed as decimal(38,0), and the closed form is
    * the corrMatrix double spelling at 6dp.
    *
    * Scale shape: two distinct-value aggregations (measurement-grid
    * sized), two value-keyed joins of the corpus against the
    * |V|-bounded rank tables, one final scalar aggregate. The rank
    * windows run over the value grid, never the corpus.
    *
    * @return one row: (x_col, y_col, n, rho)
    */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def rankTable(c: String) =
      base.groupBy(col(c).as("v")).agg(count(lit(1)).as("ct"))
        .select(col("v"),
          ((sum("ct").over(w) - col("ct")) * 2 + col("ct") + 1)
            .as(s"r2$c"))
    val ranked = base
      .join(rankTable("x"), col("x") === col("v")).drop("v")
      .join(rankTable("y"), col("y") === col("v")).drop("v")
    val D = "decimal(38,0)"
    val m = ranked.agg(count(lit(1)).as("n"),
      sum(col("r2x").cast(D)).as("s_x"), sum(col("r2y").cast(D)).as("s_y"),
      sum((col("r2x") * col("r2y")).cast(D)).as("p_xy"),
      sum((col("r2x") * col("r2x")).cast(D)).as("p_xx"),
      sum((col("r2y") * col("r2y")).cast(D)).as("p_yy"))
    def dbl(c: org.apache.spark.sql.Column) = c.cast("double")
    val num = dbl(col("n")) * dbl(col("p_xy")) -
      dbl(col("s_x")) * dbl(col("s_y"))
    val vx = dbl(col("n")) * dbl(col("p_xx")) -
      dbl(col("s_x")) * dbl(col("s_x"))
    val vy = dbl(col("n")) * dbl(col("p_yy")) -
      dbl(col("s_y")) * dbl(col("s_y"))
    m.select(lit(xCol).as("x_col"), lit(yCol).as("y_col"), col("n"),
      when(sqrt(vx) * sqrt(vy) === 0, lit(null).cast("double"))
        .otherwise(round(num / (sqrt(vx) * sqrt(vy)), 6)).as("rho"))
  }

  /** DuckDB replay of [[spearman]]; `srcSql` yields (x, y) rows. */
  def spearmanOracleSql(srcSql: String, xName: String,
      yName: String): String = {
    def dbl(x: String) = s"CAST($x AS DOUBLE)"
    val num = s"${dbl("n")} * ${dbl("p_xy")} - ${dbl("s_x")} * ${dbl("s_y")}"
    val vx = s"${dbl("n")} * ${dbl("p_xx")} - ${dbl("s_x")} * ${dbl("s_x")}"
    val vy = s"${dbl("n")} * ${dbl("p_yy")} - ${dbl("s_y")} * ${dbl("s_y")}"
    s"""WITH base AS ($srcSql),
       |rx AS (SELECT v, (sum(ct) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
       |    - ct) * 2 + ct + 1 AS r2x
       |  FROM (SELECT x AS v, count(*) AS ct FROM base GROUP BY x) t),
       |ry AS (SELECT v, (sum(ct) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
       |    - ct) * 2 + ct + 1 AS r2y
       |  FROM (SELECT y AS v, count(*) AS ct FROM base GROUP BY y) t),
       |rk AS (SELECT rx.r2x, ry.r2y FROM base
       |  JOIN rx ON base.x = rx.v JOIN ry ON base.y = ry.v),
       |m AS (SELECT count(*) AS n,
       |  sum(CAST(r2x AS DECIMAL(38,0))) AS s_x,
       |  sum(CAST(r2y AS DECIMAL(38,0))) AS s_y,
       |  sum(CAST(r2x * r2y AS DECIMAL(38,0))) AS p_xy,
       |  sum(CAST(r2x * r2x AS DECIMAL(38,0))) AS p_xx,
       |  sum(CAST(r2y * r2y AS DECIMAL(38,0))) AS p_yy
       | FROM rk)
       |SELECT '$xName' AS x_col, '$yName' AS y_col,
       |  CAST(n AS BIGINT) AS n,
       |  CASE WHEN sqrt($vx) * sqrt($vy) = 0 THEN NULL
       |    ELSE round(($num) / (sqrt($vx) * sqrt($vy)), 6) END AS rho
       |FROM m""".stripMargin
  }

  /** DuckDB replay of [[mannWhitneyAgainstRest]]. */
  def mannWhitneyOracleSql(table: String, groupCol: String,
      valueExpr: String): String =
    s"""WITH base AS (SELECT $groupCol AS g, CAST($valueExpr AS DOUBLE) AS v
       |  FROM $table),
       |gv AS (SELECT g, v, count(*) AS c FROM base GROUP BY g, v),
       |vall AS (SELECT v, count(*) AS ct FROM base GROUP BY v),
       |sizes AS (SELECT g, count(*) AS ng FROM base GROUP BY g),
       |tot AS (SELECT count(*) AS nt FROM base),
       |cums AS (SELECT v, ct,
       |  sum(ct) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - ct AS cb
       | FROM vall),
       |r2 AS (SELECT g, sum(c * (2 * cb + ct + 1)) AS r2
       | FROM gv JOIN cums USING (v) GROUP BY g)
       |SELECT r2.g AS $groupCol, CAST(s.ng AS BIGINT) AS n_group,
       |  CAST(t.nt - s.ng AS BIGINT) AS n_rest,
       |  CAST(r2.r2 - s.ng * (s.ng + 1) AS BIGINT) AS u2,
       |  ((2000000 * (r2.r2 - s.ng * (s.ng + 1))
       |    + 2 * s.ng * (t.nt - s.ng))
       |   // (4 * s.ng * (t.nt - s.ng))) / 1e6 AS auc
       |FROM r2 JOIN sizes s USING (g) CROSS JOIN tot t""".stripMargin

  /** Chi-squared categorical drift per group vs rest — the
    * categorical sibling of [[ksAgainstRest]] (numeric KS) and
    * [[mannWhitneyAgainstRest]] (numeric rank shift): for each group
    * g the 2×K contingency table (g vs everything else, over the
    * categories of `catCol`) is tested for independence. With row
    * totals ng and nt−ng the 2×K statistic collapses to
    * χ²_g = Σ_k d_k² / (ng·(nt−ng)·ct_k) where d_k = o_k·nt − ng·ct_k
    * (o_k = group count in category k, ct_k = global category count):
    * every d_k is an EXACT integer from one pass of counts, so both
    * engines evaluate identical double divisions. Cell terms fold in
    * category-sorted order (the [[mutualInformation]] discipline) —
    * a plain double sum is partition-order-dependent. Cramér's V =
    * sqrt(χ²/nt) (2×K ⇒ min(r−1,c−1)=1) normalizes for table size.
    *
    * Scale shape: three count aggregations (cells |G|·K, categories
    * K, sizes |G|) off one scan; the grid join broadcasts the
    * K-bounded category table. Nothing row-scale ever shuffles twice.
    * Zero-count cells enter through the grid (their term is
    * ng·ct/(nt−ng)/nt-shaped, not zero), dof = K−1.
    *
    * @return per group: (groupCol, n_group, dof, chi2, cramers_v);
    *         chi2 is null when the group IS the whole table.
    */
  def chiSquaredAgainstRest(df: DataFrame, groupCol: String,
      catCol: String): DataFrame = {
    val D = "decimal(38,0)"
    val base = df.select(col(groupCol).as("g"), col(catCol).as("k"))
    val cells = base.groupBy("g", "k").agg(count(lit(1)).as("o"))
    val cats = base.groupBy("k").agg(count(lit(1)).as("ct"))
    val sizes = base.groupBy("g").agg(count(lit(1)).as("ng"))
    val tot = base.agg(count(lit(1)).as("nt"))
    val d = col("o") * col("nt") - col("ng") * col("ct")
    // ANSI division guard: when the group IS the table (nt = ng) the
    // denominator is 0 — emit 0 here; the final projection nulls the
    // whole statistic for that group.
    val term = when(col("nt") === col("ng"), lit(0.0)).otherwise(
      (d.cast(D) * d.cast(D)).cast("double") /
        (col("ng").cast(D) * (col("nt") - col("ng")) * col("ct"))
          .cast("double"))
    val chi2 = aggregate(col("l"), lit(0.0),
      (acc, x) => acc + x.getField("t"))
    sizes.crossJoin(broadcast(tot)).crossJoin(broadcast(cats))
      .join(cells, Seq("g", "k"), "left").na.fill(0L, Seq("o"))
      .select(col("g"), col("ng"), col("nt"),
        struct(col("k"), term.as("t")).as("s"))
      .groupBy("g", "ng", "nt")
      .agg(count(lit(1)).as("n_cats"),
        array_sort(collect_list(col("s"))).as("l"))
      .select(col("g").as(groupCol), col("ng").as("n_group"),
        (col("n_cats") - 1).as("dof"),
        when(col("ng") === col("nt"), lit(null).cast("double"))
          .otherwise(round(chi2, 6)).as("chi2"),
        when(col("ng") === col("nt"), lit(null).cast("double"))
          .otherwise(round(sqrt(chi2 / col("nt")), 6)).as("cramers_v"))
  }

  /** DuckDB replay of [[chiSquaredAgainstRest]]. */
  def chiSquaredOracleSql(table: String, groupCol: String,
      catCol: String): String =
    s"""WITH base AS (SELECT $groupCol AS g, $catCol AS k FROM $table),
       |cells AS (SELECT g, k, CAST(count(*) AS BIGINT) AS o
       |  FROM base GROUP BY 1, 2),
       |cats AS (SELECT k, CAST(count(*) AS BIGINT) AS ct
       |  FROM base GROUP BY k),
       |sizes AS (SELECT g, CAST(count(*) AS BIGINT) AS ng
       |  FROM base GROUP BY g),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM base),
       |grid AS (SELECT s.g, s.ng, t.nt, c.k, c.ct,
       |    coalesce(cells.o, 0) AS o
       |  FROM sizes s CROSS JOIN tot t CROSS JOIN cats c
       |  LEFT JOIN cells ON cells.g = s.g AND cells.k = c.k),
       |terms AS (SELECT g, ng, nt, k,
       |    CAST(CAST(o * nt - ng * ct AS HUGEINT)
       |         * (o * nt - ng * ct) AS DOUBLE)
       |    / CAST(CAST(ng AS HUGEINT) * (nt - ng) * ct AS DOUBLE) AS t
       |  FROM grid),
       |agg AS (SELECT g, ng, nt, count(*) AS n_cats,
       |    list_sum(list(t ORDER BY k)) AS chi2
       |  FROM terms GROUP BY g, ng, nt)
       |SELECT g AS $groupCol, ng AS n_group,
       |  CAST(n_cats - 1 AS BIGINT) AS dof,
       |  CASE WHEN ng = nt THEN NULL ELSE round(chi2, 6) END AS chi2,
       |  CASE WHEN ng = nt THEN NULL
       |    ELSE round(sqrt(chi2 / nt), 6) END AS cramers_v
       |FROM agg""".stripMargin

  /** Exact Kendall tau-b between two INTEGER-VALUED columns, computed
    * on the joint histogram: concordant-minus-discordant
    * S = Σ_{cells a<b in x} sign(y_b − y_a)·c_a·c_b needs only one
    * cell-pair pass, and with u = n(n−1) − Σ_x t_x(t_x−1),
    * v = n(n−1) − Σ_y t_y(t_y−1) (tie corrections from the marginals)
    * tau_b = 2S / (√u·√v). S, u, v are exact integers — the only
    * doubles are the two square roots, evaluated identically by both
    * engines (the [[spearman]] closed-form discipline).
    *
    * Scale shape: this is a CONTINGENCY method — the cell-pair join is
    * O(m²) over m = |distinct (x,y) cells|, broadcast on one side, so
    * callers must bucket continuous signals first (m ≪ n, e.g.
    * hour×value-decade below ≤ 24·50 cells); the corpus itself is
    * touched once for the histogram. Exact tau on UNBUCKETED
    * continuous data needs an order-statistics merge that has no
    * shuffle-free Spark form — bucket instead, as any 100 TB
    * contingency analysis would.
    *
    * @return one row: (x_col, y_col, n, n_cells, s, tau_b)
    */
  def kendallTau(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val base = df.select(col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))
    val cells = base.groupBy("x", "y").agg(count(lit(1)).as("c"))
    val a = cells.select(col("x").as("xa"), col("y").as("ya"),
      col("c").as("ca"))
    val b = cells.select(col("x").as("xb"), col("y").as("yb"),
      col("c").as("cb"))
    val sRow = a.join(broadcast(b),
        col("xa") < col("xb") && col("ya") =!= col("yb"))
      .agg(coalesce(sum(when(col("yb") > col("ya"), col("ca") * col("cb"))
        .otherwise(-col("ca") * col("cb"))), lit(0L)).as("s"))
    val nCells = cells.agg(count(lit(1)).as("n_cells"))
    val tx = base.groupBy("x").agg(count(lit(1)).as("cx"))
      .agg(coalesce(sum(col("cx") * (col("cx") - 1)), lit(0L)).as("t2x"))
    val ty = base.groupBy("y").agg(count(lit(1)).as("cy"))
      .agg(coalesce(sum(col("cy") * (col("cy") - 1)), lit(0L)).as("t2y"))
    val n = base.agg(count(lit(1)).as("n"))
    val u = col("n") * (col("n") - 1) - col("t2x")
    val v = col("n") * (col("n") - 1) - col("t2y")
    n.crossJoin(nCells).crossJoin(sRow).crossJoin(tx).crossJoin(ty)
      .select(lit(xCol).as("x_col"), lit(yCol).as("y_col"), col("n"),
        col("n_cells"), col("s"),
        when(u <= 0 || v <= 0, lit(null).cast("double"))
          .otherwise(round(lit(2).cast("double") * col("s")
            / (sqrt(u.cast("double")) * sqrt(v.cast("double"))), 6))
          .as("tau_b"))
  }

  /** DuckDB replay of [[kendallTau]]; `srcSql` yields (x, y) rows. */
  def kendallTauOracleSql(srcSql: String, xName: String,
      yName: String): String =
    s"""WITH base AS (SELECT CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y
       |  FROM ($srcSql) src),
       |cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c
       |  FROM base GROUP BY 1, 2),
       |sp AS (SELECT coalesce(sum(CASE WHEN b.y > a.y THEN a.c * b.c
       |    ELSE -a.c * b.c END), 0) AS s
       |  FROM cells a JOIN cells b ON a.x < b.x AND a.y <> b.y),
       |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cells FROM cells),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
       |tx AS (SELECT coalesce(sum(cx * (cx - 1)), 0) AS t2x
       |  FROM (SELECT CAST(count(*) AS BIGINT) AS cx
       |        FROM base GROUP BY x) t),
       |ty AS (SELECT coalesce(sum(cy * (cy - 1)), 0) AS t2y
       |  FROM (SELECT CAST(count(*) AS BIGINT) AS cy
       |        FROM base GROUP BY y) t)
       |SELECT '$xName' AS x_col, '$yName' AS y_col, n, n_cells,
       |  CAST(s AS BIGINT) AS s,
       |  CASE WHEN n * (n - 1) - t2x <= 0 OR n * (n - 1) - t2y <= 0
       |    THEN NULL
       |    ELSE round(2.0 * s / (sqrt(CAST(n * (n - 1) - t2x AS DOUBLE))
       |      * sqrt(CAST(n * (n - 1) - t2y AS DOUBLE))), 6) END AS tau_b
       |FROM m CROSS JOIN nc CROSS JOIN sp CROSS JOIN tx CROSS JOIN ty""".stripMargin

  /** Isotonic (PAV) calibration over score buckets — the monotone
    * repair of a raw calibration curve (q181's buckets can zig-zag on
    * thin bins; downstream threshold picking wants a non-decreasing
    * score→rate map). Computed by the minimax characterization of
    * pool-adjacent-violators: fitted_i = max_{j≤i} min_{k≥i}
    * weightedRate(j..k) — closed-form over segments, no iterative
    * pooling, so it is expressible identically in both engines.
    * Segment rates are exact-integer sums divided once.
    *
    * Scale shape: everything after the first aggregation is
    * bucket-grid-sized (B buckets → B² segments → B³ join rows,
    * B ≤ ~100), all broadcast; the corpus is touched once.
    *
    * @param df one row per example with an integer bucket column and
    *           a 0/1 outcome column
    * @return per bucket: (bucket, n, n_pos, raw_rate, iso_rate) with
    *         iso_rate non-decreasing in bucket
    */
  def isotonicCalibration(df: DataFrame, bucketCol: String,
      posCol: String): DataFrame = {
    val bins = df.select(col(bucketCol).cast("long").as("b"),
        col(posCol).cast("long").as("pos"))
      .groupBy("b").agg(count(lit(1)).as("w"), sum("pos").as("p"))
    val segs = bins.select(col("b").as("j"))
      .join(broadcast(bins.select(col("b").as("k"))), col("j") <= col("k"))
      .join(broadcast(bins.select(col("b").as("t"), col("w").as("tw"),
        col("p").as("tp"))), col("t") >= col("j") && col("t") <= col("k"))
      .groupBy("j", "k")
      .agg((sum("tp").cast("double") / sum("tw")).as("seg_rate"))
    bins.join(broadcast(segs), col("j") <= col("b") && col("k") >= col("b"))
      .groupBy("b", "w", "p", "j").agg(min("seg_rate").as("mn"))
      .groupBy("b", "w", "p").agg(max("mn").as("fit"))
      .select(col("b").as("bucket"), col("w").as("n"), col("p").as("n_pos"),
        round(col("p").cast("double") / col("w"), 6).as("raw_rate"),
        round(col("fit"), 6).as("iso_rate"))
  }

  /** DuckDB replay of [[isotonicCalibration]]; `srcSql` yields
    * (bucket, pos) rows.
    */
  def isotonicOracleSql(srcSql: String): String =
    s"""WITH src AS ($srcSql),
       |bins AS (SELECT CAST(bucket AS BIGINT) AS b,
       |    CAST(count(*) AS BIGINT) AS w,
       |    CAST(sum(pos) AS BIGINT) AS p FROM src GROUP BY 1),
       |segs AS (SELECT j.b AS j, k.b AS k,
       |    CAST(sum(t.p) AS DOUBLE) / sum(t.w) AS seg_rate
       |  FROM bins j JOIN bins k ON j.b <= k.b
       |  JOIN bins t ON t.b BETWEEN j.b AND k.b GROUP BY 1, 2),
       |mn AS (SELECT i.b, i.w, i.p, s.j, min(s.seg_rate) AS mn
       |  FROM bins i JOIN segs s ON s.j <= i.b AND s.k >= i.b
       |  GROUP BY 1, 2, 3, 4),
       |f AS (SELECT b, w, p, max(mn) AS fit FROM mn GROUP BY 1, 2, 3)
       |SELECT b AS bucket, w AS n, p AS n_pos,
       |  round(CAST(p AS DOUBLE) / w, 6) AS raw_rate,
       |  round(fit, 6) AS iso_rate FROM f""".stripMargin

  /** Theil's uncertainty coefficient U — the NORMALIZED, asymmetric
    * companion of [[mutualInformation]]: U(a|b) = MI/H(a) is the
    * fraction of a's entropy explained by knowing b (1 = b determines
    * a; 0 = independent), which unlike raw MI is comparable across
    * tables of different entropy. Both directions are emitted —
    * asymmetry is the point (source may determine lang far more than
    * lang determines source).
    *
    * Same exact-count + sorted-fold discipline as mutualInformation:
    * every probability is an exact integer ratio, entropy/MI terms
    * fold in category-sorted order so double addition is
    * deterministic, one corpus scan feeds all three aggregates.
    *
    * @return one row: (n_cells, mi_nats, h_a, h_b, u_a_given_b,
    *         u_b_given_a), rounded at 6dp; U is null when the
    *         corresponding entropy is 0 (constant column).
    */
  def theilsU(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.select(col(aCol).as("a"), col(bCol).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
    val ra = cells.groupBy("a").agg(sum("n").as("r"))
    val cb = cells.groupBy("b").agg(sum("n").as("c"))
    val tot = cells.agg(sum("n").as("nn"))
    def foldSum(l: Column) =
      aggregate(l, lit(0.0), (acc, x) => acc + x.getField("t"))
    val miTerm = (col("n").cast("double") / col("nn")) *
      log((col("n") * col("nn")).cast("double")
        / (col("r") * col("c")).cast("double"))
    val mi = cells.join(broadcast(ra), "a").join(broadcast(cb), "b")
      .crossJoin(broadcast(tot))
      .select(struct(col("a"), col("b"), miTerm.as("t")).as("s"))
      .agg(count(lit(1)).as("n_cells"),
        array_sort(collect_list(col("s"))).as("l"))
      .select(col("n_cells"), foldSum(col("l")).as("mi"))
    def entropy(marg: DataFrame, key: String, cnt: String) =
      marg.crossJoin(broadcast(tot))
        .select(struct(col(key),
          (col(cnt).cast("double") / col("nn") *
            log(col("nn").cast("double") / col(cnt))).as("t")).as("s"))
        .agg(array_sort(collect_list(col("s"))).as("l"))
        .select(foldSum(col("l")).as(s"h_$key"))
    def u(h: Column) =
      when(h <= 0, lit(null).cast("double"))
        .otherwise(round(col("mi") / h, 6))
    mi.crossJoin(entropy(ra, "a", "r")).crossJoin(entropy(cb, "b", "c"))
      .select(col("n_cells"), round(col("mi"), 6).as("mi_nats"),
        round(col("h_a"), 6).as("h_a"), round(col("h_b"), 6).as("h_b"),
        u(col("h_a")).as("u_a_given_b"), u(col("h_b")).as("u_b_given_a"))
  }

  /** DuckDB replay of [[theilsU]]. */
  def theilsUOracleSql(table: String, aCol: String, bCol: String): String =
    s"""WITH cells AS (SELECT $aCol AS a, $bCol AS b,
       |    CAST(count(*) AS BIGINT) AS n FROM $table GROUP BY 1, 2),
       |ra AS (SELECT a, CAST(sum(n) AS BIGINT) AS r FROM cells GROUP BY a),
       |cb AS (SELECT b, CAST(sum(n) AS BIGINT) AS c FROM cells GROUP BY b),
       |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cells),
       |mi AS (SELECT count(*) AS n_cells,
       |    list_sum(list((CAST(n AS DOUBLE) / nn)
       |      * ln(CAST(n * nn AS DOUBLE) / CAST(r * c AS DOUBLE))
       |      ORDER BY cells.a, cells.b)) AS mi
       |  FROM cells JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN t),
       |ha AS (SELECT list_sum(list(CAST(r AS DOUBLE) / nn
       |    * ln(CAST(nn AS DOUBLE) / r) ORDER BY a)) AS h_a
       |  FROM ra CROSS JOIN t),
       |hb AS (SELECT list_sum(list(CAST(c AS DOUBLE) / nn
       |    * ln(CAST(nn AS DOUBLE) / c) ORDER BY b)) AS h_b
       |  FROM cb CROSS JOIN t)
       |SELECT CAST(n_cells AS BIGINT) AS n_cells,
       |  round(mi, 6) AS mi_nats, round(h_a, 6) AS h_a,
       |  round(h_b, 6) AS h_b,
       |  CASE WHEN h_a <= 0 THEN NULL ELSE round(mi / h_a, 6) END
       |    AS u_a_given_b,
       |  CASE WHEN h_b <= 0 THEN NULL ELSE round(mi / h_b, 6) END
       |    AS u_b_given_a
       |FROM mi CROSS JOIN ha CROSS JOIN hb""".stripMargin

  /** Quantile normalization of an integral signal across groups: each
    * value is mapped through its within-group ECDF onto the GLOBAL
    * quantile function, so every group ends up with the same marginal
    * distribution (the batch-effect repair for per-source score
    * drift — a "long for src3" document becomes "long for the
    * corpus"). Entirely integer arithmetic: within-group rank r (# of
    * values ≤ v), grid position k = ⌈r·G/ng⌉, global position
    * p = ⌈k·N/G⌉, normalized value = p-th smallest global value — no
    * doubles anywhere, so both engines agree bit-for-bit.
    *
    * Scale shape: the two rank windows run over VALUE GRIDS ((group ×
    * |V_g|) and |V| rows — the [[spearman]] trick), never the corpus;
    * the G-row position table broadcasts; the corpus is touched by
    * one aggregation and one grid-keyed join each side. Ties share a
    * rank, hence a normalized value — deterministic under reordering.
    *
    * @return one row per input row: (idCol, groupCol, valueCol,
    *         grid_pos, norm_v)
    */
  def quantileNormalize(df: DataFrame, idCol: String, groupCol: String,
      valueCol: String, grid: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(grid >= 2, s"grid must be >= 2, got $grid")
    val base = df.select(col(idCol).as("id"), col(groupCol).as("g"),
      col(valueCol).cast("long").as("v"))
    val wg = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gv = base.groupBy("g", "v").agg(count(lit(1)).as("c"))
      .select(col("g"), col("v"), sum("c").over(wg).as("r"))
    val sizes = base.groupBy("g").agg(count(lit(1)).as("ng"))
    val kk = gv.join(broadcast(sizes), "g")
      .select(col("g"), col("v"),
        expr(s"(r * $grid + ng - 1) div ng").as("k"))
    val wAll = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val allv = base.groupBy("v").agg(count(lit(1)).as("ct"))
      .select(col("v").as("norm_v"),
        (sum("ct").over(wAll) - col("ct")).as("cb"), col("ct"))
    val nt = base.agg(count(lit(1)).as("nt"))
    val pos = df.sparkSession.range(1, grid + 1).toDF("k")
      .crossJoin(nt)
      .select(col("k"), expr(s"(k * nt + $grid - 1) div $grid").as("pos"))
    val gridVal = allv.join(broadcast(pos),
        col("cb") < col("pos") && col("pos") <= col("cb") + col("ct"))
      .select(col("k"), col("norm_v"))
    base.join(kk, Seq("g", "v")).join(broadcast(gridVal), "k")
      .select(col("id").as(idCol), col("g").as(groupCol),
        col("v").as(valueCol), col("k").as("grid_pos"), col("norm_v"))
  }

  /** DuckDB replay of [[quantileNormalize]]; `srcSql` yields
    * (id, g, v) rows.
    */
  def quantileNormalizeOracleSql(srcSql: String, idName: String,
      groupName: String, valueName: String, grid: Int = 1000): String =
    s"""WITH base AS (SELECT id, g, CAST(v AS BIGINT) AS v
       |  FROM ($srcSql) src),
       |gv AS (SELECT g, v, sum(c) OVER (PARTITION BY g ORDER BY v
       |    ROWS UNBOUNDED PRECEDING) AS r
       |  FROM (SELECT g, v, CAST(count(*) AS BIGINT) AS c
       |        FROM base GROUP BY 1, 2) t),
       |sizes AS (SELECT g, CAST(count(*) AS BIGINT) AS ng
       |  FROM base GROUP BY g),
       |kk AS (SELECT g, v, (r * $grid + ng - 1) // ng AS k
       |  FROM gv JOIN sizes USING (g)),
       |allv AS (SELECT v AS norm_v,
       |    sum(ct) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - ct AS cb,
       |    ct
       |  FROM (SELECT v, CAST(count(*) AS BIGINT) AS ct
       |        FROM base GROUP BY v) t),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM base),
       |pos AS (SELECT k, (k * nt + $grid - 1) // $grid AS pos
       |  FROM (SELECT unnest(generate_series(1, $grid)) AS k) ks, tot),
       |gval AS (SELECT k, norm_v FROM pos JOIN allv
       |  ON cb < pos AND pos <= cb + ct)
       |SELECT base.id AS $idName, base.g AS $groupName,
       |  base.v AS $valueName, CAST(kk.k AS BIGINT) AS grid_pos,
       |  gval.norm_v
       |FROM base JOIN kk USING (g, v) JOIN gval USING (k)""".stripMargin

  private val benfordDigitP: Seq[(Int, String)] =
    (1 to 9).map(d => d -> BigDecimal(math.log10(1 + 1.0 / d))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toString)

  /** Benford first-significant-digit audit — the data-forensics check
    * on a positive integral column (price cents, token counts):
    * fabricated or truncated numeric columns drift from the
    * log10(1+1/d) law. The first digit comes from the value's DECIMAL
    * STRING, not log10 — libm log implementations differ in the last
    * ulp across engines, string conversion of an integer never does.
    * Expected probabilities are compile-time 6dp literals injected
    * into BOTH engines; observed fractions use the exact half-up
    * integer-division grid. One scan, digit-grid aggregates only.
    *
    * @return per digit 1-9 present: (digit, n, frac, benford_p,
    *         delta)
    */
  def benfordFirstDigit(df: DataFrame, valueCol: String): DataFrame = {
    val base = df.select(col(valueCol).cast("long").as("v"))
      .where(col("v") > 0)
    val pExpr = benfordDigitP.foldLeft(lit(null).cast("double")) {
      case (acc, (d, p)) => when(col("digit") === d, lit(p.toDouble))
        .otherwise(acc)
    }
    base.select(substring(col("v").cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
      .crossJoin(base.agg(count(lit(1)).as("nt")))
      .select(col("digit"), col("n"),
        (expr("(2000000 * n + nt) div (2 * nt)").cast("double") / 1e6)
          .as("frac"),
        pExpr.as("benford_p"))
      .withColumn("delta", col("frac") - col("benford_p"))
  }

  /** DuckDB replay of [[benfordFirstDigit]]; `valueExpr` must be a
    * positive integral expression (same cents-grid as the Spark call).
    */
  def benfordOracleSql(table: String, valueExpr: String): String = {
    val cases = benfordDigitP
      .map { case (d, p) => s"WHEN $d THEN $p" }.mkString(" ")
    s"""WITH base AS (SELECT CAST($valueExpr AS BIGINT) AS v FROM $table
       |  WHERE CAST($valueExpr AS BIGINT) > 0),
       |c AS (SELECT CAST(substring(CAST(v AS VARCHAR), 1, 1) AS INTEGER)
       |    AS digit, CAST(count(*) AS BIGINT) AS n
       |  FROM base GROUP BY 1),
       |t AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM base)
       |SELECT digit, n,
       |  CAST((2000000 * n + nt) // (2 * nt) AS DOUBLE) / 1e6 AS frac,
       |  CASE digit $cases END AS benford_p,
       |  CAST((2000000 * n + nt) // (2 * nt) AS DOUBLE) / 1e6
       |    - CASE digit $cases END AS delta
       |FROM c CROSS JOIN t""".stripMargin
  }

  /** Mergeable per-group sufficient statistics (n, Σx, Σx²) for an
    * integral signal — the incremental-maintenance primitive: batch
    * sketches are plain additive rows, so a stats store is updated by
    * union + re-sum (never re-scanning history), mirroring the
    * digest-store discipline of cross-batch dedup. Sums ride
    * decimal(38,0), exact at any corpus size.
    */
  def statsSketch(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val D = "decimal(38,0)"
    df.select(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
      .groupBy("g").agg(count(lit(1)).as("n"),
        sum(col("v").cast(D)).as("s1"),
        sum((col("v").cast(D) * col("v")).cast(D)).as("s2"))
  }

  /** Merge any number of [[statsSketch]] frames — pure additive
    * re-aggregation (the Chan/parallel-variance merge is trivial in
    * sufficient-statistic space; no center shifts, no doubles).
    */
  def mergeStatsSketches(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy("g").agg(sum("n").as("n"), sum("s1").as("s1"),
        sum("s2").as("s2"))
  }

  /** Derive (mean, sample variance, std) from a [[statsSketch]] —
    * numerators stay exact decimal integers (n·Σx² − (Σx)²), with ONE
    * double division at the end, so a merged store derives the exact
    * same report as a full recompute (that identity is what the
    * DuckDB oracle checks).
    *
    * @return per group: (groupCol, n, mean, var_samp, std)
    */
  def deriveStats(sketch: DataFrame, groupCol: String): DataFrame = {
    // mean/var are quotients of exact integers, which CAN terminate
    // exactly on the 6dp half-grid — so they round by exact half-up
    // INTEGER division (the BENCHNOTES idiv discipline), never by
    // round() on a double quotient. std is irrational, plain round.
    val num = expr("n * s2 - s1 * s1")
    sketch.select(col("g").as(groupCol), col("n"),
      (expr("(2000000 * s1 + n) div (2 * n)").cast("double") / 1e6)
        .as("mean"),
      when(col("n") < 2, lit(null).cast("double"))
        .otherwise(expr("((2000000 * (n * s2 - s1 * s1)" +
          " + n * (n - 1)) div (2 * n * (n - 1)))").cast("double") / 1e6)
        .as("var_samp"),
      when(col("n") < 2, lit(null).cast("double"))
        .otherwise(round(sqrt(num.cast("double")
          / (col("n") * (col("n") - 1)).cast("double")), 6)).as("std"))
  }

  /** DuckDB replay of derive∘merge∘sketch: the same formulas computed
    * directly over the FULL table — equality proves sketch
    * additivity end-to-end.
    */
  def mergedStatsOracleSql(table: String, groupCol: String,
      valueExpr: String): String =
    s"""WITH s AS (SELECT $groupCol AS g,
       |    CAST(count(*) AS BIGINT) AS n,
       |    sum(CAST($valueExpr AS HUGEINT)) AS s1,
       |    sum(CAST($valueExpr AS HUGEINT) * ($valueExpr)) AS s2
       |  FROM $table GROUP BY 1)
       |SELECT g AS $groupCol, n,
       |  CAST((2000000 * s1 + n) // (2 * n) AS DOUBLE) / 1e6 AS mean,
       |  CASE WHEN n < 2 THEN NULL
       |    ELSE CAST((2000000 * (n * s2 - s1 * s1) + n * (n - 1))
       |      // (2 * n * (n - 1)) AS DOUBLE) / 1e6 END AS var_samp,
       |  CASE WHEN n < 2 THEN NULL
       |    ELSE round(sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)
       |      / CAST(n * (n - 1) AS DOUBLE)), 6) END AS std
       |FROM s""".stripMargin

  /** Exact weighted percentiles per group (lower weighted quantile:
    * the smallest value whose cumulative weight reaches q·W), with
    * integral weights so every comparison is integer (2·cum ≥ W for
    * the median, 10·cum ≥ 9·W for p90 — no double quantile
    * interpolation to disagree on).
    *
    * Scale shape: one weight aggregation onto the (group × value)
    * grid, one grid window, one scan of the grid with both thresholds
    * answered from the same cumulative — the corpus is read once. The
    * grid is value-cardinality-bounded; at full corpus scale swap in
    * approx_percentile and keep the threshold algebra.
    *
    * @return per group: (groupCol, total_w, w_median, w_p90)
    */
  def weightedPercentiles(df: DataFrame, groupCol: String,
      valueCol: String, weightCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(groupCol).as("g"),
      col(valueCol).as("v"), col(weightCol).cast("long").as("w"))
    val win = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = base.groupBy("g", "v").agg(sum("w").as("cw"))
      .select(col("g"), col("v"), sum("cw").over(win).as("cum"))
    val tot = base.groupBy("g").agg(sum("w").as("total_w"))
    cum.join(broadcast(tot), "g")
      .groupBy("g", "total_w")
      .agg(min(when(col("cum") * 2 >= col("total_w"), col("v")))
          .as("w_median"),
        min(when(col("cum") * 10 >= col("total_w") * 9, col("v")))
          .as("w_p90"))
      .select(col("g").as(groupCol), col("total_w"),
        col("w_median"), col("w_p90"))
  }

  /** DuckDB replay of [[weightedPercentiles]]. */
  def weightedPercentilesOracleSql(table: String, groupCol: String,
      valueCol: String, weightExpr: String): String =
    s"""WITH base AS (SELECT $groupCol AS g, $valueCol AS v,
       |    CAST($weightExpr AS BIGINT) AS w FROM $table),
       |cum AS (SELECT g, v, sum(cw) OVER (PARTITION BY g ORDER BY v
       |    ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM (SELECT g, v, CAST(sum(w) AS BIGINT) AS cw
       |        FROM base GROUP BY 1, 2) t),
       |tot AS (SELECT g, CAST(sum(w) AS BIGINT) AS total_w
       |  FROM base GROUP BY g)
       |SELECT cum.g AS $groupCol, total_w,
       |  min(CASE WHEN cum * 2 >= total_w THEN v END) AS w_median,
       |  min(CASE WHEN cum * 10 >= total_w * 9 THEN v END) AS w_p90
       |FROM cum JOIN tot ON cum.g = tot.g
       |GROUP BY 1, 2""".stripMargin

  /** Best-F1 operating point: sweep every distinct score as the
    * "predict positive if score ≥ t" threshold, pick the threshold
    * maximizing F1 — the number a quality-gate deployment actually
    * sets. One cumulative window over the DISTINCT-SCORE grid (the
    * q182 rank-AUC discipline — the corpus never sorts) gives TP and
    * predicted-positive counts at every threshold; F1 = 2TP/(PP+P) is
    * quantized on the exact half-up micro grid, so the argmax
    * compares integers (ties break to the LOWEST threshold — the most
    * permissive gate among equals).
    *
    * @return one row: (threshold, tp, fp, fn, precision, recall, f1)
    */
  def bestF1Threshold(df: DataFrame, scoreCol: String,
      posCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(scoreCol).as("s"),
      col(posCol).cast("long").as("pos"))
    val grid = base.groupBy("s")
      .agg(count(lit(1)).as("n"), sum("pos").as("np"))
    val wDesc = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = base.agg(sum("pos").as("p_all"))
    val cum = grid
      .withColumn("tp", sum("np").over(wDesc))
      .withColumn("pp", sum("n").over(wDesc))
      .crossJoin(broadcast(tot))
      .withColumn("f1m",
        expr("(2000000 * 2 * tp + (pp + p_all)) div (2 * (pp + p_all))"))
    val pick = Window.orderBy(col("f1m").desc, col("s").asc)
    cum.withColumn("rn", row_number().over(pick)).where(col("rn") === 1)
      .select(col("s").as("threshold"), col("tp"),
        (col("pp") - col("tp")).as("fp"),
        (col("p_all") - col("tp")).as("fn"),
        (expr("(2000000 * tp + pp) div (2 * pp)")
          .cast("double") / 1e6).as("precision"),
        (expr("(2000000 * tp + p_all) div (2 * p_all)")
          .cast("double") / 1e6).as("recall"),
        (col("f1m").cast("double") / 1e6).as("f1"))
  }

  /** DuckDB replay of [[bestF1Threshold]]; `srcSql` yields (s, pos). */
  def bestF1OracleSql(srcSql: String): String =
    s"""WITH base AS (SELECT s, CAST(pos AS BIGINT) AS pos
       |  FROM ($srcSql) src),
       |grid AS (SELECT s, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(pos) AS BIGINT) AS np FROM base GROUP BY s),
       |tot AS (SELECT CAST(sum(pos) AS BIGINT) AS p_all FROM base),
       |cum AS (SELECT s,
       |    sum(np) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING)
       |      AS tp,
       |    sum(n) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING)
       |      AS pp
       |  FROM grid),
       |f AS (SELECT s, tp, pp, p_all,
       |    (2000000 * 2 * tp + (pp + p_all)) // (2 * (pp + p_all))
       |      AS f1m
       |  FROM cum CROSS JOIN tot),
       |pick AS (SELECT *, row_number()
       |    OVER (ORDER BY f1m DESC, s ASC) AS rn FROM f)
       |SELECT s AS threshold, CAST(tp AS BIGINT) AS tp,
       |  CAST(pp - tp AS BIGINT) AS fp,
       |  CAST(p_all - tp AS BIGINT) AS fn,
       |  CAST((2000000 * tp + pp) // (2 * pp) AS DOUBLE) / 1e6
       |    AS precision,
       |  CAST((2000000 * tp + p_all) // (2 * p_all) AS DOUBLE) / 1e6
       |    AS recall,
       |  CAST(f1m AS DOUBLE) / 1e6 AS f1
       |FROM pick WHERE rn = 1""".stripMargin

  /** Approximate-percentile accuracy gate: Spark's approx_percentile
    * (Greenwald–Khanna) guarantees rank error ≤ n/accuracy; this op
    * measures the EXACT rank of each returned value with a second
    * scan and emits booleans the DuckDB oracle pins to TRUE — a
    * sketch-quality collapse turns the driver row red instead of
    * passing silently (the q51/q83 floor discipline, but fully
    * oracle-gated). Bound checks are pure integer comparisons at 2×
    * the guarantee (duplicate-value slack).
    *
    * @return one row: (n, p50_ok, p90_ok)
    */
  def approxPercentileGate(df: DataFrame, valueCol: String,
      accuracy: Int = 1000): DataFrame = {
    val base = df.select(col(valueCol).as("v"))
    val ap = base.agg(
        expr(s"approx_percentile(v, array(0.5D, 0.9D), $accuracy)")
          .as("ap"))
      .select(col("ap")(0).as("a50"), col("ap")(1).as("a90"))
    val slack = 2000000L / accuracy // 2·ε·n in "per-million of n" units
    base.crossJoin(broadcast(ap))
      .agg(count(lit(1)).as("n"),
        sum((col("v") <= col("a50")).cast("long")).as("le50"),
        sum((col("v") <= col("a90")).cast("long")).as("le90"))
      .select(col("n"),
        (abs(col("le50") * 2000000L - col("n") * 1000000L) <=
          col("n") * 2 * slack).as("p50_ok"),
        (abs(col("le90") * 2000000L - col("n") * 1800000L) <=
          col("n") * 2 * slack).as("p90_ok"))
  }

  /** Exact trimmed mean per group over an INTEGRAL value grid (cents,
    * token counts): drop the lowest and highest ⌊pct·n⌋ observations
    * BY RANK and average the middle — the robust location estimate
    * that, unlike the median, still uses 90% of the data. Every
    * retained observation is found by intersecting each distinct
    * value's rank span [cumBefore+1, cumBefore+ct] with (lo, hi] —
    * pure integer interval algebra, no sort of the corpus (the value
    * grid sorts; the corpus aggregates onto it once). The mean rounds
    * by exact half-up integer division.
    *
    * @param trimPermille per-side trim in 1/1000 units (50 = 5%)
    * @return per group: (groupCol, n, n_used, trimmed_mean)
    */
  def trimmedMean(df: DataFrame, groupCol: String, valueCol: String,
      trimPermille: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(trimPermille >= 0 && trimPermille < 500,
      s"per-side trim must be in [0, 500) permille, got $trimPermille")
    val base = df.select(col(groupCol).as("g"),
      col(valueCol).cast("long").as("v"))
    val w = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gv = base.groupBy("g", "v").agg(count(lit(1)).as("ct"))
      .select(col("g"), col("v"), col("ct"),
        (sum("ct").over(w) - col("ct")).as("cb"))
    val tot = base.groupBy("g").agg(count(lit(1)).as("n"))
    val D = "decimal(38,0)"
    gv.join(broadcast(tot), "g")
      .withColumn("lo", expr(s"(n * $trimPermille) div 1000"))
      .withColumn("hi", col("n") - col("lo"))
      .withColumn("take",
        greatest(lit(0L), least(col("cb") + col("ct"), col("hi")) -
          greatest(col("cb"), col("lo"))))
      .where(col("take") > 0)
      .groupBy("g", "n")
      .agg(sum("take").as("n_used"),
        sum((col("take").cast(D) * col("v"))).as("s"))
      .select(col("g").as(groupCol), col("n"), col("n_used"),
        (expr("(2000000 * s + n_used) div (2 * n_used)")
          .cast("double") / 1e6).as("trimmed_mean"))
  }

  /** DuckDB replay of [[trimmedMean]]; `valueExpr` must be integral. */
  def trimmedMeanOracleSql(table: String, groupCol: String,
      valueExpr: String, trimPermille: Int = 50): String =
    s"""WITH base AS (SELECT $groupCol AS g,
       |    CAST($valueExpr AS BIGINT) AS v FROM $table),
       |gv AS (SELECT g, v, ct,
       |    sum(ct) OVER (PARTITION BY g ORDER BY v
       |      ROWS UNBOUNDED PRECEDING) - ct AS cb
       |  FROM (SELECT g, v, CAST(count(*) AS BIGINT) AS ct
       |        FROM base GROUP BY 1, 2) t),
       |tot AS (SELECT g, CAST(count(*) AS BIGINT) AS n
       |  FROM base GROUP BY g),
       |tk AS (SELECT g, n, v,
       |    greatest(0, least(cb + ct, n - (n * $trimPermille) // 1000)
       |      - greatest(cb, (n * $trimPermille) // 1000)) AS take
       |  FROM gv JOIN tot USING (g)),
       |agg AS (SELECT g, n, CAST(sum(take) AS BIGINT) AS n_used,
       |    sum(CAST(take AS HUGEINT) * v) AS s
       |  FROM tk WHERE take > 0 GROUP BY g, n)
       |SELECT g AS $groupCol, n, n_used,
       |  CAST((2000000 * s + n_used) // (2 * n_used) AS DOUBLE) / 1e6
       |    AS trimmed_mean
       |FROM agg""".stripMargin

  /** Exact winsorized mean per group over an INTEGRAL value grid —
    * [[trimmedMean]]'s sibling that CLAMPS the tails to the boundary
    * order statistics instead of dropping them (the estimator that
    * keeps n constant, standard for metric capping): the lowest
    * ⌊pct·n⌋ observations are replaced by the (⌊pct·n⌋+1)-th order
    * statistic and the highest by the (n−⌊pct·n⌋)-th. Same
    * interval-algebra shape as trimmedMean: the corpus aggregates
    * onto the value grid once, the boundary statistics come from the
    * same cumulative frame (no second scan), the mean is one half-up
    * integer division.
    *
    * @param trimPermille per-side winsorization in 1/1000 units
    * @return per group: (groupCol, n, v_low, v_high, win_mean)
    */
  def winsorizedMean(df: DataFrame, groupCol: String, valueCol: String,
      trimPermille: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(trimPermille >= 0 && trimPermille < 500,
      s"per-side trim must be in [0, 500) permille, got $trimPermille")
    val base = df.select(col(groupCol).as("g"),
      col(valueCol).cast("long").as("v"))
    val w = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gv = base.groupBy("g", "v").agg(count(lit(1)).as("ct"))
      .select(col("g"), col("v"), col("ct"),
        (sum("ct").over(w) - col("ct")).as("cb"))
    val tot = base.groupBy("g").agg(count(lit(1)).as("n"))
    val D = "decimal(38,0)"
    gv.join(broadcast(tot), "g")
      .withColumn("lo", expr(s"(n * $trimPermille) div 1000"))
      .withColumn("hi", col("n") - col("lo"))
      .withColumn("take",
        greatest(lit(0L), least(col("cb") + col("ct"), col("hi")) -
          greatest(col("cb"), col("lo"))))
      .groupBy("g", "n", "lo")
      .agg(
        sum(when(col("take") > 0, col("take").cast(D) * col("v"))
          .otherwise(lit(0L).cast(D))).as("s"),
        max(when(col("cb") < col("lo") + 1 &&
          col("lo") + 1 <= col("cb") + col("ct"), col("v")))
          .as("v_low"),
        max(when(col("cb") < col("hi") &&
          col("hi") <= col("cb") + col("ct"), col("v"))).as("v_high"))
      .select(col("g").as(groupCol), col("n"), col("v_low"),
        col("v_high"),
        (expr("(2000000 * (s + lo * (v_low + v_high)) + n)" +
          " div (2 * n)").cast("double") / 1e6).as("win_mean"))
  }

  /** DuckDB replay of [[winsorizedMean]]; `valueExpr` integral. */
  def winsorizedMeanOracleSql(table: String, groupCol: String,
      valueExpr: String, trimPermille: Int = 50): String =
    s"""WITH base AS (SELECT $groupCol AS g,
       |    CAST($valueExpr AS BIGINT) AS v FROM $table),
       |gv AS (SELECT g, v, ct,
       |    sum(ct) OVER (PARTITION BY g ORDER BY v
       |      ROWS UNBOUNDED PRECEDING) - ct AS cb
       |  FROM (SELECT g, v, CAST(count(*) AS BIGINT) AS ct
       |        FROM base GROUP BY 1, 2) t),
       |tot AS (SELECT g, CAST(count(*) AS BIGINT) AS n
       |  FROM base GROUP BY g),
       |tk AS (SELECT g, n, v, ct, cb,
       |    (n * $trimPermille) // 1000 AS lo,
       |    n - (n * $trimPermille) // 1000 AS hi,
       |    greatest(0, least(cb + ct, n - (n * $trimPermille) // 1000)
       |      - greatest(cb, (n * $trimPermille) // 1000)) AS take
       |  FROM gv JOIN tot USING (g)),
       |agg AS (SELECT g, n, any_value(lo) AS lo,
       |    sum(CASE WHEN take > 0 THEN CAST(take AS HUGEINT) * v
       |      ELSE 0 END) AS s,
       |    max(CASE WHEN cb < lo + 1 AND lo + 1 <= cb + ct THEN v
       |      END) AS v_low,
       |    max(CASE WHEN cb < hi AND hi <= cb + ct THEN v END)
       |      AS v_high
       |  FROM tk GROUP BY g, n)
       |SELECT g AS $groupCol, n, v_low, v_high,
       |  CAST((2000000 * (s + lo * (v_low + v_high)) + n) // (2 * n)
       |    AS DOUBLE) / 1e6 AS win_mean
       |FROM agg""".stripMargin

  /** Per-group simple OLS (y = a + b·x) over INTEGRAL columns — the
    * grouped-regression primitive (per-source quality-vs-length
    * slope, per-cohort spend-vs-tenure, …): closed-form from
    * decimal(38,0)-exact moments gathered in ONE pass, b and r² as
    * single double divisions of exact integers (r² squared by
    * multiplication, not pow — libm pow paths differ across engines).
    * Callers with gridded doubles pass them as micro-unit integers.
    *
    * @return per group: (groupCol, n, slope, intercept, r2); null
    *         slope/r2 on a degenerate (constant-x or n<2) group
    */
  def groupedOls(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val D = "decimal(38,0)"
    val m = df.select(col(groupCol).as("g"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .groupBy("g").agg(count(lit(1)).as("n"),
        sum(col("x").cast(D)).as("sx"), sum(col("y").cast(D)).as("sy"),
        sum((col("x").cast(D) * col("x")).cast(D)).as("sxx"),
        sum((col("y").cast(D) * col("y")).cast(D)).as("syy"),
        sum((col("x").cast(D) * col("y")).cast(D)).as("sxy"))
    val covN = col("n") * col("sxy") - col("sx") * col("sy")
    val varXN = col("n") * col("sxx") - col("sx") * col("sx")
    val varYN = col("n") * col("syy") - col("sy") * col("sy")
    val b = covN.cast("double") / varXN.cast("double")
    val rho = covN.cast("double") /
      (sqrt(varXN.cast("double")) * sqrt(varYN.cast("double")))
    m.select(col("g").as(groupCol), col("n"),
      when(col("n") < 2 || varXN <= 0, lit(null).cast("double"))
        .otherwise(round(b, 6)).as("slope"),
      when(col("n") < 2 || varXN <= 0, lit(null).cast("double"))
        .otherwise(round((col("sy").cast("double") -
          b * col("sx").cast("double")) / col("n").cast("double"), 6))
        .as("intercept"),
      when(col("n") < 2 || varXN <= 0 || varYN <= 0,
        lit(null).cast("double"))
        .otherwise(round(rho * rho, 6)).as("r2"))
  }

  /** DuckDB replay of [[groupedOls]]; x/y exprs must be integral. */
  def groupedOlsOracleSql(table: String, groupCol: String,
      xExpr: String, yExpr: String): String = {
    val b = "CAST(n * sxy - sx * sy AS DOUBLE)" +
      " / CAST(n * sxx - sx * sx AS DOUBLE)"
    val rho = "CAST(n * sxy - sx * sy AS DOUBLE)" +
      " / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))" +
      " * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))"
    s"""WITH m AS (SELECT $groupCol AS g,
       |    CAST(count(*) AS HUGEINT) AS n,
       |    sum(CAST($xExpr AS HUGEINT)) AS sx,
       |    sum(CAST($yExpr AS HUGEINT)) AS sy,
       |    sum(CAST($xExpr AS HUGEINT) * ($xExpr)) AS sxx,
       |    sum(CAST($yExpr AS HUGEINT) * ($yExpr)) AS syy,
       |    sum(CAST($xExpr AS HUGEINT) * ($yExpr)) AS sxy
       |  FROM $table GROUP BY 1)
       |SELECT g AS $groupCol, CAST(n AS BIGINT) AS n,
       |  CASE WHEN n < 2 OR n * sxx - sx * sx <= 0 THEN NULL
       |    ELSE round($b, 6) END AS slope,
       |  CASE WHEN n < 2 OR n * sxx - sx * sx <= 0 THEN NULL
       |    ELSE round((CAST(sy AS DOUBLE) - ($b) * CAST(sx AS DOUBLE))
       |      / CAST(n AS DOUBLE), 6) END AS intercept,
       |  CASE WHEN n < 2 OR n * sxx - sx * sx <= 0
       |      OR n * syy - sy * sy <= 0 THEN NULL
       |    ELSE round(($rho) * ($rho), 6) END AS r2
       |FROM m""".stripMargin
  }

  /** Welch's unequal-variance t-test between every group and the rest
    * — the parametric mean-shift companion of the rank-based
    * [[mannWhitneyAgainstRest]]: t = (x̄_g − x̄_r)/√(s²_g/n_g +
    * s²_r/n_r) with Welch–Satterthwaite df, all from the SAME
    * decimal-exact sufficient statistics in one pass (rest moments =
    * total − group, the against-rest identity). Only the final t/df
    * are doubles, from identical exact-integer inputs.
    *
    * @return per group: (groupCol, n_group, n_rest, t, df); null on
    *         degenerate sides (n<2 or zero variance both sides)
    */
  def welchTAgainstRest(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val D = "decimal(38,0)"
    val g = df.select(col(groupCol).as("g"),
        col(valueCol).cast("long").as("v"))
      .groupBy("g").agg(count(lit(1)).as("ng"),
        sum(col("v").cast(D)).as("s1"),
        sum((col("v").cast(D) * col("v")).cast(D)).as("s2"))
    val tot = g.agg(sum("ng").as("nt"), sum("s1").as("t1"),
      sum("s2").as("t2"))
    val j = g.crossJoin(broadcast(tot))
      .withColumn("nr", col("nt") - col("ng"))
      .withColumn("r1", col("t1") - col("s1"))
      .withColumn("r2", col("t2") - col("s2"))
    // per-side mean and sample-variance-over-n as doubles of exact ints
    def m(s: Column, n: Column) = s.cast("double") / n.cast("double")
    def vOverN(s2c: Column, s1c: Column, n: Column) =
      (n.cast(D) * s2c - s1c * s1c).cast("double") /
        ((n * (n - 1)).cast("double") * n.cast("double"))
    val vg = vOverN(col("s2"), col("s1"), col("ng"))
    val vr = vOverN(col("r2"), col("r1"), col("nr"))
    val se2 = vg + vr
    val t = (m(col("s1"), col("ng")) - m(col("r1"), col("nr"))) /
      sqrt(se2)
    val dfw = se2 * se2 /
      (vg * vg / (col("ng") - 1).cast("double") +
        vr * vr / (col("nr") - 1).cast("double"))
    val bad = col("ng") < 2 || col("nr") < 2
    j.select(col("g").as(groupCol), col("ng").as("n_group"),
      col("nr").as("n_rest"),
      when(bad, lit(null).cast("double"))
        .otherwise(round(t, 6)).as("t"),
      when(bad, lit(null).cast("double"))
        .otherwise(round(dfw, 6)).as("df"))
  }

  /** DuckDB replay of [[welchTAgainstRest]]; `valueExpr` integral. */
  def welchTOracleSql(table: String, groupCol: String,
      valueExpr: String): String = {
    def vOverN(s2: String, s1: String, n: String) =
      s"CAST($n * $s2 - $s1 * $s1 AS DOUBLE)" +
        s" / (CAST($n * ($n - 1) AS DOUBLE) * CAST($n AS DOUBLE))"
    val vg = vOverN("s2", "s1", "ng")
    val vr = vOverN("r2", "r1", "nr")
    s"""WITH g AS (SELECT $groupCol AS g,
       |    CAST(count(*) AS HUGEINT) AS ng,
       |    sum(CAST($valueExpr AS HUGEINT)) AS s1,
       |    sum(CAST($valueExpr AS HUGEINT) * ($valueExpr)) AS s2
       |  FROM $table GROUP BY 1),
       |tot AS (SELECT sum(ng) AS nt, sum(s1) AS t1, sum(s2) AS t2
       |  FROM g),
       |j AS (SELECT g.g, ng, s1, s2, nt - ng AS nr, t1 - s1 AS r1,
       |    t2 - s2 AS r2
       |  FROM g CROSS JOIN tot)
       |SELECT g AS $groupCol, CAST(ng AS BIGINT) AS n_group,
       |  CAST(nr AS BIGINT) AS n_rest,
       |  CASE WHEN ng < 2 OR nr < 2 THEN NULL
       |    ELSE round((CAST(s1 AS DOUBLE) / CAST(ng AS DOUBLE)
       |        - CAST(r1 AS DOUBLE) / CAST(nr AS DOUBLE))
       |      / sqrt(($vg) + ($vr)), 6) END AS t,
       |  CASE WHEN ng < 2 OR nr < 2 THEN NULL
       |    ELSE round((($vg) + ($vr)) * (($vg) + ($vr))
       |      / (($vg) * ($vg) / CAST(ng - 1 AS DOUBLE)
       |        + ($vr) * ($vr) / CAST(nr - 1 AS DOUBLE)), 6) END AS df
       |FROM j""".stripMargin
  }

  /** DuckDB replay of [[ksAgainstRest]]. */
  def ksAgainstRestOracleSql(table: String, groupCol: String,
      valueExpr: String): String =
    s"""WITH base AS (SELECT $groupCol AS g, CAST($valueExpr AS DOUBLE) AS v
       |  FROM $table),
       |gv AS (SELECT g, v, count(*) AS c FROM base GROUP BY g, v),
       |vall AS (SELECT v, count(*) AS ct FROM base GROUP BY v),
       |sizes AS (SELECT g, count(*) AS ng FROM base GROUP BY g),
       |tot AS (SELECT count(*) AS nt FROM base),
       |grid AS (SELECT s.g, a.v, a.ct, coalesce(gv.c, 0) AS c
       |  FROM sizes s CROSS JOIN vall a
       |  LEFT JOIN gv ON gv.g = s.g AND gv.v = a.v),
       |cums AS (SELECT g, v,
       |  sum(c) OVER (PARTITION BY g ORDER BY v
       |    ROWS UNBOUNDED PRECEDING) AS cg,
       |  sum(ct) OVER (PARTITION BY g ORDER BY v
       |    ROWS UNBOUNDED PRECEDING) AS call
       | FROM grid),
       |dn AS (SELECT c.g, s.ng, t.nt - s.ng AS nr,
       |  abs(c.cg * (t.nt - s.ng) - (c.call - c.cg) * s.ng) AS d
       | FROM cums c JOIN sizes s USING (g) CROSS JOIN tot t),
       |mx AS (SELECT g, ng, nr, CAST(max(d) AS BIGINT) AS d_num
       | FROM dn GROUP BY g, ng, nr)
       |SELECT g AS $groupCol, CAST(ng AS BIGINT) AS n_group,
       |  CAST(nr AS BIGINT) AS n_rest, d_num,
       |  CAST(ng * nr AS BIGINT) AS d_den,
       |  ((2000000 * d_num + ng * nr) // (2 * ng * nr)) / 1e6 AS ks
       |FROM mx""".stripMargin

  /** Functional-dependency audit (the Tane/Metanome g3 measure) over
    * a candidate list: for each A→B candidate, how many A-groups see
    * more than one B, and what minimal row fraction would have to be
    * removed for the FD to hold exactly (g3 = 1 − Σ_A max_b
    * cnt(A,b) / N). The schema-inference signal a profiler feeds a
    * data contract from.
    *
    * Scale shape: ALL candidates share ONE scan — each row explodes
    * into |pairs| (lhs, rhs, a, b) tuples (an Expand, no shuffle),
    * then two hash aggregations (cand × A × B, then cand × A). No
    * per-candidate rescan, no distinct-heavy subquery per pair.
    * Values are compared via their string cast (injective for the
    * int/string/date columns this is meant for; avoid raw doubles).
    *
    * @return per candidate: (lhs, rhs, n_groups, viol_groups,
    *         rows_total, rows_keep, g3_err)
    */
  def fdAudit(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one A->B candidate")
    // Values ride in TYPED slots (integral types keep their native
    // long; everything else casts to string as before): grouping
    // equivalence is unchanged — each candidate uses a fixed slot per
    // side and (lhs, rhs) is in every key — but integral candidates
    // skip the per-value decimal-string rendering entirely, which was
    // most of the explode stage's CPU (the group keys never escape:
    // the operator returns only per-candidate counts).
    def slots(c: String) = df.schema(c).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType =>
        (col(c).cast("long"), lit(null).cast("string"))
      case _ => (lit(null).cast("long"), col(c).cast("string"))
    }
    // candidates travel as a 1-byte ordinal, not the (lhs, rhs) name
    // strings — the names re-attach to the final per-candidate rows
    // (4 rows here) via array-literal indexing, so the 4x-exploded
    // shuffle rows stay ~20 bytes narrower each (guide §2.3)
    val cands = array(pairs.zipWithIndex.map { case ((a, b), i) =>
      val (al, as_) = slots(a); val (bl, bs) = slots(b)
      struct(lit(i).cast("int").as("ci"),
        al.as("avl"), as_.as("avs"), bl.as("bvl"), bs.as("bvs"))
    }: _*)
    val lhsNames = array(pairs.map(p => lit(p._1)): _*)
    val rhsNames = array(pairs.map(p => lit(p._2)): _*)
    // ONE hash exchange on the (candidate, A-value) prefix serves BOTH
    // aggregation levels below (hash partitioning on a subset of the
    // grouping keys satisfies the clustered distribution), so the
    // heavy distinct work runs at full shuffle parallelism in one
    // stage instead of being confined to the scan's split count (a
    // 10 MB parquet = 3 splits ran 2.4M-row hash aggregation on 3
    // cores). Scale note: FD candidate keys are near-unique, so the
    // map-side partial aggregation this forgoes would not have shrunk
    // the exchange; the shuffle ships the same ~one-row-per-input
    // either way, and AQE remains free to coalesce the
    // repartition-by-expression output.
    val ab = df.select(explode(cands).as("c"))
      .select(col("c.ci").as("ci"),
        col("c.avl").as("avl"), col("c.avs").as("avs"),
        col("c.bvl").as("bvl"), col("c.bvs").as("bvs"))
      .repartition(col("ci"), col("avl"), col("avs"))
      .groupBy("ci", "avl", "avs", "bvl", "bvs")
      .agg(count(lit(1)).as("cnt"))
    val pa = ab.groupBy("ci", "avl", "avs")
      .agg(count(lit(1)).as("nb"), max("cnt").as("mx"),
        sum("cnt").as("nr"))
    pa.groupBy("ci")
      .agg(count(lit(1)).as("n_groups"),
        sum((col("nb") > 1).cast("long")).as("viol_groups"),
        sum("nr").as("rows_total"), sum("mx").as("rows_keep"))
      .select(element_at(lhsNames, col("ci") + 1).as("lhs"),
        element_at(rhsNames, col("ci") + 1).as("rhs"), col("n_groups"),
        col("viol_groups"), col("rows_total"), col("rows_keep"),
        (expr("(2000000 * (rows_total - rows_keep) + rows_total)" +
          " div (2 * rows_total)").cast("double") / 1e6).as("g3_err"))
  }

  /** t-closeness audit (Li et al., ICDE'07), completing the
    * k-anonymity / l-diversity release-gate family: per
    * quasi-identifier group, the Earth Mover's Distance between the
    * group's distribution over an ORDERED sensitive bucket and the
    * global distribution — EMD over ordered buckets is the mean
    * |cumulative difference|, and with integer counts every
    * cumulative term is the exact integer c_b·N − C_b·n over the
    * implicit denominator n·N, so the whole statistic is integer
    * until one final half-up division:
    * t = Σ_b |cum_b| / ((m−1)·n·N).
    *
    * Scale shape: two hash aggs (QI × bucket, bucket), the dense
    * m-bucket grid per group via explode(sequence) (m rows/group),
    * a per-group cumulative window over m rows, global totals
    * broadcast. EXACTNESS: the c·N − C_b·n products, their
    * cumulative sums and the final half-up division all run in
    * decimal(38,0) — exact to ~10^38, i.e. far past any corpus (a
    * long spelling would overflow at n·N ~ 2^63, reachable at
    * 100 TB); overflow past decimal(38) errors loudly under ANSI
    * instead of drifting.
    *
    * @return per QI group: (qi..., n, t_emd)
    */
  def tCloseness(df: DataFrame, qi: Seq[(String, Column)],
      sensBucket: Column, nBuckets: Int): DataFrame = {
    require(qi.nonEmpty, "tCloseness needs at least one QI column")
    require(nBuckets >= 2, s"need >= 2 buckets, got $nBuckets")
    val names = qi.map(_._1)
    val base = df.select(
      qi.map { case (n, c) => c.as(n) } :+
        sensBucket.cast("long").as("b"): _*)
    val cell = base.groupBy(names.map(col) :+ col("b"): _*)
      .agg(count(lit(1)).as("c"))
    val glob = cell.groupBy("b").agg(sum("c").as("cb"))
    val tot = cell.agg(sum("c").as("n_all"))
    val grp = cell.groupBy(names.map(col): _*).agg(sum("c").as("n"))
    val dense = grp.select(names.map(col) :+ col("n") :+
      explode(sequence(lit(0L), lit(nBuckets - 1L))).as("b"): _*)
    val j = dense.join(cell, names :+ "b", "left")
      .join(broadcast(glob), Seq("b"), "left")
      .crossJoin(broadcast(tot))
      .select(names.map(col) ++ Seq(col("n"), col("b"),
        coalesce(col("c"), lit(0L)).as("c"),
        coalesce(col("cb"), lit(0L)).as("cb"), col("n_all")): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(names.map(col): _*).orderBy("b")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val cum = col("c").cast("decimal(20,0)") *
      col("n_all").cast("decimal(18,0)") -
      col("cb").cast("decimal(20,0)") * col("n").cast("decimal(18,0)")
    // half-up((1e6·sa) / D) with D = (m−1)·n·N, all decimal(38,0):
    // (2·1e6·sa + D) floor-div (2·D), floor spelled with pmod so the
    // decimal division has an exact integral quotient.
    val dD = lit(nBuckets - 1L).cast("decimal(10,0)") *
      col("n").cast("decimal(20,0)") * col("na").cast("decimal(18,0)")
    val num2 = lit(2000000L).cast("decimal(10,0)") * col("sa") + dD
    j.withColumn("s", sum(cum).over(w))
      .groupBy(names.map(col): _*)
      .agg(first("n").as("n"), sum(abs(col("s"))).as("sa"),
        first("n_all").as("na"))
      .select(names.map(col) ++ Seq(col("n"),
        (((num2 - pmod(num2, dD * 2)) / (dD * 2)).cast("long")
          .cast("double") / 1e6).as("t_emd")): _*)
  }

  /** DuckDB replay of [[fdAudit]] — one UNION ALL branch per
    * candidate (the oracle need not share scans).
    */
  def fdAuditOracleSql(table: String,
      pairs: Seq[(String, String)]): String =
    pairs.map { case (a, b) =>
      s"""SELECT '$a' AS lhs, '$b' AS rhs,
         |  CAST(count(*) AS BIGINT) AS n_groups,
         |  CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS viol_groups,
         |  CAST(sum(nr) AS BIGINT) AS rows_total,
         |  CAST(sum(mx) AS BIGINT) AS rows_keep,
         |  CAST((2000000 * (sum(nr) - sum(mx)) + sum(nr))
         |    // (2 * sum(nr)) AS DOUBLE) / 1e6 AS g3_err
         |FROM (SELECT av, CAST(count(*) AS BIGINT) AS nb,
         |    max(cnt) AS mx, CAST(sum(cnt) AS BIGINT) AS nr
         |  FROM (SELECT CAST($a AS VARCHAR) AS av,
         |      CAST($b AS VARCHAR) AS bv,
         |      CAST(count(*) AS BIGINT) AS cnt
         |    FROM $table GROUP BY 1, 2) g
         |  GROUP BY av) p""".stripMargin
    }.mkString("\nUNION ALL\n")

  // ----------------------------------------------------------------
  // KMV (k-minimum-values) distinct sketch
  // ----------------------------------------------------------------

  /** Per-group KMV sketch: the `k` lexicographically-smallest md5
    * coordinates (SampleOps.hashCoord, 13 hex chars = 2^52 space) of
    * the group's DISTINCT values — the deterministic, oracle-
    * replayable member of the sketch family (HLL/approx_count_distinct
    * is engine-internal-seeded and can never hash-match an oracle —
    * which is why q51 runs on THIS sketch, with HLL's error bound
    * pinned in OpsSpec; KMV's estimate is a pure function of md5
    * coordinates, so DuckDB replays it bit-for-bit).
    *
    * Scale shape: one narrow dedup shuffle on (group, coord) with
    * map-side combine, one rank window keyed by the group (k rows
    * survive per group). The sketch is bounded state — k coords per
    * group — and MERGEABLE: k-min of a union is the k-min of the
    * per-batch k-mins' union ([[kmvMerge]]), which is what lets
    * per-batch sketches persist and fold like the q351/q365 stores.
    */
  /** The (grp, h) k-min reduction shared by sketch/merge/store-read:
    * ONE map-side-combined bounded aggregate
    * ([[graft.functions.KMinDistinct]]) — each partition ships at
    * most k coordinates per group and no sort exchange exists. The
    * earlier composed form (`distinct()` + rank window) shuffled the
    * FULL distinct coordinate set and whole-group-sorted it to keep k
    * rows — the difference between k rows/group/partition and the
    * entire column through one exchange at 100 TB. Bit-identical
    * result: the k-min distinct set is partition-invariant.
    */
  private def kminReduce(pts: DataFrame, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(pts.sparkSession)
    pts.where(col("h").isNotNull)
      .groupBy("grp")
      .agg(call_function("graft_kmin_distinct", col("h"), lit(k)).as("ks"))
      .select(col("grp"), explode(col("ks")).as("h"))
  }

  def kmvSketch(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64, salt: String = "kmv"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    // NULL values hash to a NULL coordinate, which would sort FIRST
    // and poison the k-min set — a null row is "no value", not the
    // smallest value, so kminReduce drops it
    kminReduce(df.select(col(groupCol).as("grp"),
      SampleOps.hashCoord(col(valueCol), salt + ":").as("h")), k)
  }

  /** Merge two KMV sketch frames: bounded k-min union — exactly the
    * from-scratch sketch of the concatenated inputs (a value seen in
    * both batches lands its coordinate once, by set semantics).
    */
  def kmvMerge(a: DataFrame, b: DataFrame, k: Int = 64): DataFrame =
    kminReduce(a.unionByName(b), k)

  /** Distinct-count estimate from a sketch frame: groups holding
    * fewer than k coords report their EXACT distinct count (the
    * sketch IS the value set there); saturated groups estimate
    * (k-1) / u_k with u_k = (kth-smallest coordinate + 1) / 16^13.
    */
  def kmvEstimate(sketch: DataFrame, k: Int = 64): DataFrame = {
    // conv(hex,16,10).cast(double) is EXACT only while the coordinate
    // stays <= 13 hex digits (< 2^52, inside double's integer range);
    // a wider coordinate would silently round in the mantissa and
    // de-sync from the DuckDB oracle — fail loudly instead.
    val widthGuard = when(length(col("kth")) > 13,
      raise_error(concat(lit("kmvEstimate: coordinate wider than 13 hex "
        + "digits (exactness bound of the double conversion): "),
        col("kth"))))
    sketch.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_coords"), max(col("h")).as("kth"))
      .select(col("grp"), col("n_coords"),
        when(col("n_coords") < k, col("n_coords").cast("double"))
          .otherwise(coalesce(widthGuard.cast("double"),
            round(lit((k - 1).toDouble) /
              ((conv(col("kth"), 16, 10).cast("double") + 1)
                / 4.503599627370497e15), 4))).as("est_distinct"))
  }

  /** Append one batch's KMV sketch frame to an append-only parquet
    * store ([[IndexStore]] discipline — the sketch is bounded state,
    * k coords per group per batch, so the store stays model-scale
    * however many batches land). (k, salt) are sidecar-pinned
    * ([[IndexStore.checkParams]]): merging k-min sets taken at
    * different k (or over different hash salts) estimates nothing, so
    * a mismatched append fails loudly.
    */
  def kmvAppend(sketch: DataFrame, path: String, k: Int = 64,
      salt: String = "kmv"): Unit = {
    IndexStore.checkParams(sketch.sparkSession, path, "KMV sketch",
      Map("k" -> k.toString, "salt" -> salt), writeIfAbsent = true)
    IndexStore.append(sketch, path)
  }

  /** Re-derive the merged sketch from an appended store: union of all
    * batch sketches, dedup (a value seen in many batches lands its
    * coord once), re-top-k — equal to the from-scratch sketch of the
    * concatenated inputs by the k-min union property, and idempotent
    * under batch replays.
    */
  def kmvFromStore(spark: org.apache.spark.sql.SparkSession,
      path: String, k: Int = 64): DataFrame = {
    IndexStore.checkParams(spark, path, "KMV sketch",
      Map("k" -> k.toString), writeIfAbsent = false)
    kminReduce(spark.read.parquet(path), k)
  }

  /** DuckDB replay of sketch → estimate over the distinct word tokens
    * of `textCol` per `groupCol` — from scratch, which against a
    * batch-merged Spark sketch also proves [[kmvMerge]]'s union
    * property by oracle hash.
    */
  /** DuckDB replay of [[kmvSketch]]+[[kmvEstimate]] over a plain value
    * column (the q51 shape): k-min md5 coordinates per group, exact
    * count below saturation, (k-1)/u_k above. Emits (grp, n_coords,
    * est_distinct) — same hex→int CASE ladder as the tokens twin.
    */
  def kmvColumnOracleSql(table: String, groupCol: String,
      valueCol: String, k: Int, salt: String): String = {
    val hexToInt = hexToIntSql("kth")
    s"""SELECT grp, n_coords,
       |  CASE WHEN n_coords < $k THEN CAST(n_coords AS DOUBLE)
       |    ELSE round(${k - 1} / ((CAST(($hexToInt) AS DOUBLE) + 1)
       |      / 4.503599627370497e15), 4) END AS est_distinct
       |FROM (SELECT grp, CAST(count(*) AS BIGINT) AS n_coords,
       |    max(h) AS kth
       |  FROM (SELECT grp, h,
       |      row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
       |    FROM (SELECT DISTINCT $groupCol AS grp,
       |        substring(md5('$salt:' || CAST($valueCol AS VARCHAR)), 1, 13) AS h
       |      FROM $table WHERE $valueCol IS NOT NULL))
       |  WHERE rn <= $k GROUP BY grp)""".stripMargin
  }

  /** The 13-hex-digit → BIGINT CASE ladder (DuckDB has no conv()). */
  private def hexToIntSql(col: String): String =
    (1 to 13).map(i =>
      s"(CASE substring($col, $i, 1) WHEN 'a' THEN 10 WHEN 'b' THEN 11" +
        s" WHEN 'c' THEN 12 WHEN 'd' THEN 13 WHEN 'e' THEN 14" +
        s" WHEN 'f' THEN 15 ELSE CAST(substring($col, $i, 1) AS BIGINT)" +
        s" END) * ${BigInt(16).pow(13 - i)}").mkString(" + ")

  def kmvTokensOracleSql(table: String, groupCol: String,
      textCol: String, k: Int = 64, salt: String = "kmv"): String = {
    val hexToInt = hexToIntSql("kth")
    s"""WITH tok AS (SELECT $groupCol AS grp,
       |    unnest(list_filter(string_split_regex(lower($textCol),
       |      '[ \\t\\n\\f\\r]+'), x -> x <> '')) AS t
       |  FROM $table),
       |pts AS (SELECT DISTINCT grp,
       |    substring(md5('$salt:' || t), 1, 13) AS h FROM tok),
       |r AS (SELECT grp, h,
       |    row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
       |  FROM pts),
       |agg AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_coords,
       |    max(h) AS kth FROM r WHERE rn <= $k GROUP BY grp)
       |SELECT grp, n_coords,
       |  CASE WHEN n_coords < $k THEN CAST(n_coords AS DOUBLE)
       |    ELSE round(${k - 1} / ((CAST(($hexToInt) AS DOUBLE) + 1)
       |      / 4.503599627370497e15), 4) END AS est_distinct
       |FROM agg""".stripMargin
  }
}
