package graft.core.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Section-summary aggregations and maintenance utilities.
  * A1, P3, P6, P7, A3, O4 of SURVEY §2.
  */
object SectionSummaryOps {

  /** A1: per-core depth range — min section top / max section bottom,
    * 'CC' sections excluded, rounded to 3 decimals like every summary
    * lookup. (reference: coring/sectionSummary.py:78-85)
    *
    * One hash aggregation on the core key; map-side combine keeps the
    * shuffle narrow at any row count.
    */
  def coreRanges(secsumm: DataFrame): DataFrame =
    secsumm.filter(col("Section") =!= "CC")
      .groupBy("Site", "Hole", "Core")
      .agg(round(min("TopDepth"), 3).as("coreMin"),
        round(max("BottomDepth"), 3).as("coreMax"))

  /** P3: section containing a depth (interval containment). */
  def sectionAtDepth(secsumm: DataFrame, site: String, hole: String, core: String,
      depth: Double): DataFrame =
    secsumm.filter(col("Site") === site && col("Hole") === hole &&
      col("Core") === core &&
      lit(depth) >= col("TopDepth") && lit(depth) <= col("BottomDepth"))

  /** P6/P7: one row per core (its first section). */
  def cores(secsumm: DataFrame): DataFrame = secsumm.filter(col("Section") === "1")

  /** A3: duplicate-identity probe — keys appearing more than once. */
  def duplicateSections(secsumm: DataFrame): DataFrame =
    secsumm.groupBy("Site", "Hole", "Core", "Section")
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)

  /** O4: consolidate LacCore-DB per-gap columns (`Gap 1 T`, `Gap 1 B`,
    * … `Gap N T`, `Gap N B`) into the single space-delimited `Gaps`
    * payload the Section Summary format uses.
    * (reference: coring/sectionSummary.py:190-203)
    *
    * Pure projection: pair columns → struct array → filter nulls →
    * concat — no shuffle, stays in codegen.
    */
  def consolidateGapColumns(df: DataFrame, maxGapCols: Int): DataFrame = {
    val pairs = (1 to maxGapCols).map { i =>
      struct(col(s"Gap $i T").cast("double").as("t"), col(s"Gap $i B").cast("double").as("b"))
    }
    val gapsArr = filter(array(pairs: _*), p => p.getField("t").isNotNull && p.getField("b").isNotNull)
    val gapStrs = transform(gapsArr,
      p => concat(p.getField("t").cast("string"), lit("-"), p.getField("b").cast("string")))
    df.withColumn("Gaps", concat_ws(" ", gapStrs))
  }
}
