package graft.core.export

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P4: measurement-data row selection variants — range, range+core,
  * range+core+sections, full identity, identity-only, per-core,
  * per-hole. (reference: /root/reference/coring/measurement.py:20-56)
  *
  * All are simple conjunctive predicates: Catalyst pushes them into
  * the parquet/CSV scan (verify via PushedFilters), so each variant is
  * a single filtered scan at any scale. Ranges are inclusive on both
  * ends, matching the reference.
  */
object MeasurementOps {

  private def d(depthColumn: String): Column = col(depthColumn).cast("double")

  def byRange(md: DataFrame, depthColumn: String, min: Double, max: Double): DataFrame =
    md.filter(d(depthColumn) >= min && d(depthColumn) <= max)

  def byRangeAndCore(md: DataFrame, depthColumn: String, min: Double, max: Double,
      core: String): DataFrame =
    byRange(md, depthColumn, min, max).filter(col("Core") === core)

  def byRangeCoreSections(md: DataFrame, depthColumn: String, min: Double, max: Double,
      core: String, sections: Seq[String]): DataFrame =
    byRangeAndCore(md, depthColumn, min, max, core)
      .filter(col("Section").isin(sections: _*))

  def byRangeFullID(md: DataFrame, depthColumn: String, min: Double, max: Double,
      site: String, hole: String, core: String, sections: Seq[String]): DataFrame =
    byRange(md, depthColumn, min, max)
      .filter(col("Site") === site && col("Hole") === hole && col("Core") === core &&
        col("Section").isin(sections: _*))

  def byFullID(md: DataFrame, site: String, hole: String, core: String,
      sections: Seq[String]): DataFrame =
    md.filter(col("Site") === site && col("Hole") === hole && col("Core") === core &&
      col("Section").isin(sections: _*))

  def byCore(md: DataFrame, core: String): DataFrame = md.filter(col("Core") === core)

  def byHole(md: DataFrame, hole: String): DataFrame = md.filter(col("Hole") === hole)
}
