package graft.ops

import org.apache.spark.sql.DataFrame
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
}
