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

  // ---- Scalar accessor surface (sectionSummary.py:39-157) ----
  // The reference exposes per-section lookups a host application calls
  // interactively; here they are driver-side probes over the (small,
  // usually localized) section-summary table. First-match semantics
  // (`iloc[0]`) follow file order via `_seq` when the loader attached
  // it.

  private def firstMatch(secsumm: DataFrame, site: String, hole: String,
      core: String, section: Option[String]): Option[org.apache.spark.sql.Row] = {
    var df = secsumm.filter(col("Site") === site && col("Hole") === hole &&
      col("Core") === core)
    section.foreach(s => df = df.filter(col("Section") === s))
    if (df.columns.contains(graft.core.format.CsvIO.SeqCol))
      df = df.orderBy(graft.core.format.CsvIO.SeqCol)
    df.limit(1).collect().headOption
  }

  /** containsCore (sectionSummary.py:39-41). */
  def containsCore(secsumm: DataFrame, site: String, hole: String, core: String): Boolean =
    firstMatch(secsumm, site, hole, core, None).nonEmpty

  /** getSites (sectionSummary.py:48-51): distinct site values. */
  def sites(secsumm: DataFrame): Seq[String] =
    secsumm.select(col("Site").cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq

  private def r3(v: Double): Double =
    BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def numValue(secsumm: DataFrame, site: String, hole: String, core: String,
      section: String, colName: String): Option[Double] =
    firstMatch(secsumm, site, hole, core, Some(section))
      .flatMap(r => Option(r.getAs[Any](colName)))
      .map(v => r3(v.toString.toDouble))

  /** getSectionTop / getSectionBot / scaled variants / getSectionLength —
    * all rounded to 3 decimals like every summary lookup
    * (sectionSummary.py:105-123).
    */
  def sectionTop(ss: DataFrame, s: String, h: String, c: String, sec: String): Option[Double] =
    numValue(ss, s, h, c, sec, "TopDepth")
  def sectionBot(ss: DataFrame, s: String, h: String, c: String, sec: String): Option[Double] =
    numValue(ss, s, h, c, sec, "BottomDepth")
  def scaledSectionTop(ss: DataFrame, s: String, h: String, c: String, sec: String): Option[Double] =
    numValue(ss, s, h, c, sec, "TopDepthScaled")
  def scaledSectionBot(ss: DataFrame, s: String, h: String, c: String, sec: String): Option[Double] =
    numValue(ss, s, h, c, sec, "BottomDepthScaled")
  def sectionLength(ss: DataFrame, s: String, h: String, c: String, sec: String): Option[Double] =
    numValue(ss, s, h, c, sec, "CuratedLength")

  /** getSectionTool (sectionSummary.py:125-126) — unrounded string. */
  def sectionTool(ss: DataFrame, s: String, h: String, c: String, sec: String): Option[String] =
    firstMatch(ss, s, h, c, Some(sec)).flatMap(r => Option(r.getAs[Any]("Tool"))).map(_.toString)

  /** getCoreTop = top of section '1' (sectionSummary.py:102-103). */
  def coreTop(ss: DataFrame, s: String, h: String, c: String): Option[Double] =
    sectionTop(ss, s, h, c, "1")

  /** sectionDepthToTotal (sectionSummary.py:152-155): rounded section
    * top + cm→m offset — deliberately WITHOUT gap subtraction, unlike
    * the full offsetDepth mapping.
    */
  def sectionDepthToTotal(ss: DataFrame, s: String, h: String, c: String,
      sec: String, secDepthCm: Double): Option[Double] =
    sectionTop(ss, s, h, c, sec).map(_ + secDepthCm / 100.0)

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
