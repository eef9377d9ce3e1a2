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
}
