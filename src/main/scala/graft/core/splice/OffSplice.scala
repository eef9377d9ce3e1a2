package graft.core.splice

import graft.core.format.CsvIO
import graft.core.model.CoringFormats._
import graft.core.ops.DepthOps
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J2/J5/J6 + A2: affine shifts for cores NOT in the splice.
  * (reference: /root/reference/feldman.py:398-495,
  *  coring/sectionSummary.py:88-100, coring/manualCorrelation.py:39-122)
  *
  * Fallback precedence per off-splice core:
  *   1. manual correlation TIE (only if its on-splice partner is in the
  *      SIT) — offset from aligned section depths;
  *   2. manual SET offset;
  *   3. default: offset of the on-splice core whose top depth is
  *      closest (first-wins on ties, section-summary file order).
  *
  * Plan shape: the SIT/manual tables are tiny → broadcast joins; the
  * closest-top search is a small-dims cross product + one rank window.
  * At scale (millions of cores) the nearest-top search becomes a 1-D
  * as-of join: sort both sides by top depth and merge — no change to
  * the semantics, only to the physical pick.
  */
object OffSplice {

  /** Per-core SIT offset: round3(topCCSF) − round3(topCSF) of the
    * core's FIRST SIT row, matching the reference's load-from-file
    * rounding + `.iloc[0]` (spliceInterval.py:85-101). Expects the SIT
    * as re-loaded by CsvIO (so depths already 3-decimal).
    */
  def sitCoreOffsets(sit: DataFrame): DataFrame = {
    val w = Window.partitionBy("Site", "Hole", "Core").orderBy(CsvIO.SeqCol)
    sit.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col("Site"), col("Hole"), col("Core"),
        (col(TopDepthCCSF.name) - col(TopDepthCSF.name)).as("sitOffset"))
  }

  private def odExpr(prefix: String, offCol: String): Column =
    DepthOps.offsetDepth(col(s"${prefix}_td"), col(s"${prefix}_bd"),
      col(s"${prefix}_cl"), col(s"${prefix}_gaps"), col(offCol), scaled = false)

  private def secFor(secsumm: DataFrame, prefix: String): DataFrame =
    broadcast(secsumm.select(
      col("Site").as(s"${prefix}_site"), col("Hole").as(s"${prefix}_hole"),
      col("Core").as(s"${prefix}_core"), col("Section").as(s"${prefix}_sec"),
      col("TopDepth").as(s"${prefix}_td"), col("BottomDepth").as(s"${prefix}_bd"),
      col("CuratedLength").as(s"${prefix}_cl"), col("Gaps").as(s"${prefix}_gaps")))

  /** Build off-splice AffineEmit rows.
    *
    * @param secsumm  section summary (with `_seq`)
    * @param sit      SIT as re-loaded from its CSV (with `_seq`)
    * @param mancorr  manual correlation tie table, offset table, or none
    */
  def gather(spark: SparkSession, secsumm: DataFrame, sit: DataFrame,
      mancorr: Option[ManualCorrelation]): Dataset[AffineEmit] = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark) // graft_offset_depth

    val ssCores = secsumm.filter(col("Section") === "1")
      .select(col(CsvIO.SeqCol).as("ss_seq"), col("Site"), col("Hole"),
        col("Core"), col("Tool"), DepthOps.r3(col("TopDepth")).as("coreTop"),
        col("TopDepth").as("rawTop"))
    val sitOffsets = broadcast(sitCoreOffsets(sit))

    val offCores = ssCores.join(sitOffsets, Seq("Site", "Hole", "Core"), "left_anti")
    val onCores = ssCores.join(sitOffsets, Seq("Site", "Hole", "Core"))

    // J5/A2 default: on-splice core with top depth closest to this
    // core's (rounded) top; first-wins tie-break on section-summary
    // order. Note the reference compares the candidate's RAW TopDepth
    // to the search core's ROUNDED top (sectionSummary.py:88-100).
    val cand = offCores.select(col("ss_seq"), col("coreTop"))
      .join(onCores.select(col("rawTop").as("on_top"), col("ss_seq").as("on_seq"),
        col("sitOffset")))
    val w = Window.partitionBy("ss_seq")
      .orderBy(abs(col("on_top") - col("coreTop")).asc, col("on_seq").asc)
    val defaults = cand.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col("ss_seq"), col("sitOffset").as("defOffset"))

    var resolved = offCores.join(broadcast(defaults), Seq("ss_seq"), "left")

    // J6 manual-correlation overrides
    resolved = mancorr match {
      case Some(ManualTies(ties)) =>
        // first tie per off-splice core (file order), like iloc[0]
        val tw = Window.partitionBy("Site1", "Hole1", "Core1").orderBy(CsvIO.SeqCol)
        val firstTies = ties.withColumn("_rn", row_number().over(tw)).filter(col("_rn") === 1)
        // resolve both tie-point depths against the section summary
        val t = firstTies
          .join(secFor(secsumm, "m1"),
            col("Site1") === col("m1_site") && col("Hole1") === col("m1_hole") &&
              col("Core1") === col("m1_core") && col("Section1") === col("m1_sec"), "left")
          .join(secFor(secsumm, "m2"),
            col("Site2") === col("m2_site") && col("Hole2") === col("m2_hole") &&
              col("Core2") === col("m2_core") && col("Section2") === col("m2_sec"), "left")
          .join(sitOffsets.select(col("Site").as("Site2"), col("Hole").as("Hole2"),
            col("Core").as("Core2"), col("sitOffset").as("tieSitOffset")),
            Seq("Site2", "Hole2", "Core2"), "left")
          .select(
            col("Site1").as("Site"), col("Hole1").as("Hole"), col("Core1").as("Core"),
            odExpr("m1", "SectionDepth1").as("offSpliceMbsf"),
            odExpr("m2", "SectionDepth2").as("onSpliceMbsf"),
            col("tieSitOffset"),
            concat(col("Hole2"), col("Core2")).as("tieFixedCore"))
        resolved.join(broadcast(t), Seq("Site", "Hole", "Core"), "left")
          .withColumn("tieOffset",
            when(col("tieSitOffset").isNotNull,
              col("onSpliceMbsf") + col("tieSitOffset") - col("offSpliceMbsf")))
      case Some(ManualOffsets(offs)) =>
        val ow = Window.partitionBy("Site", "Hole", "Core").orderBy(CsvIO.SeqCol)
        val firstOffs = offs.withColumn("_rn", row_number().over(ow)).filter(col("_rn") === 1)
          .select(col("Site"), col("Hole"), col("Core"), col("Offset").as("setOffset"))
        resolved.join(broadcast(firstOffs), Seq("Site", "Hole", "Core"), "left")
          .withColumn("tieOffset", lit(null).cast("double"))
          .withColumn("onSpliceMbsf", lit(null).cast("double"))
          .withColumn("offSpliceMbsf", lit(null).cast("double"))
          .withColumn("tieFixedCore", lit(null).cast("string"))
      case None =>
        resolved.withColumn("tieOffset", lit(null).cast("double"))
          .withColumn("setOffset", lit(null).cast("double"))
          .withColumn("onSpliceMbsf", lit(null).cast("double"))
          .withColumn("offSpliceMbsf", lit(null).cast("double"))
          .withColumn("tieFixedCore", lit(null).cast("string"))
    }
    if (!resolved.columns.contains("setOffset"))
      resolved = resolved.withColumn("setOffset", lit(null).cast("double"))

    val offset = coalesce(col("tieOffset"), col("setOffset"), col("defOffset"))
    val shiftType = when(col("tieOffset").isNotNull, "TIE")
      .when(col("setOffset").isNotNull, "SET")
      .otherwise("REL")

    resolved.select(
      col("ss_seq").as("seq"), col("Site").as("site"), col("Hole").as("hole"),
      col("Core").as("core"), col("Tool").as("tool"),
      col("coreTop").as("csf"), (col("coreTop") + offset).as("ccsf"),
      offset.as("offset"), shiftType.as("shiftType"),
      when(col("tieOffset").isNotNull, col("tieFixedCore")).otherwise(lit("")).as("fixedCore"),
      when(col("tieOffset").isNotNull, col("onSpliceMbsf")).as("fixedTieCsf"),
      when(col("tieOffset").isNotNull, col("offSpliceMbsf")).as("shiftedTieCsf"),
      lit("off-splice").as("comment"))
      .as[AffineEmit]
  }
}

/** Manual-correlation input, dispatched by header sniffing (S4,
  * manualCorrelation.py:39-45). */
/** Manual-correlation input with the reference's scalar accessor
  * surface (manualCorrelation.py:60-117): first-match (`iloc[0]`)
  * probes in file order, and the two flavors differ on which side
  * they can answer for — ties know their on-splice partner, offsets
  * carry a SET distance.
  */
sealed trait ManualCorrelation {
  def df: DataFrame

  protected def firstMatch(siteCol: String, holeCol: String, coreCol: String,
      site: String, hole: String, core: String): Option[org.apache.spark.sql.Row] =
    df.filter(col(siteCol) === site && col(holeCol) === hole && col(coreCol) === core)
      .orderBy(CsvIO.SeqCol).limit(1).collect().headOption

  def hasOffSpliceCore(site: String, hole: String, core: String): Boolean =
    findByOffSpliceCore(site, hole, core).nonEmpty
  def findByOffSpliceCore(site: String, hole: String, core: String): Option[org.apache.spark.sql.Row]
  def includesOnSpliceCore: Boolean
}

final case class ManualTies(df: DataFrame) extends ManualCorrelation {
  override def findByOffSpliceCore(site: String, hole: String, core: String): Option[org.apache.spark.sql.Row] =
    firstMatch("Site1", "Hole1", "Core1", site, hole, core)
  def findByOnSpliceCore(site: String, hole: String, core: String): Option[org.apache.spark.sql.Row] =
    firstMatch("Site2", "Hole2", "Core2", site, hole, core)
  override def includesOnSpliceCore: Boolean = true
}

final case class ManualOffsets(df: DataFrame) extends ManualCorrelation {
  override def findByOffSpliceCore(site: String, hole: String, core: String): Option[org.apache.spark.sql.Row] =
    firstMatch("Site", "Hole", "Core", site, hole, core)
  override def includesOnSpliceCore: Boolean = false
  /** getOffset (manualCorrelation.py:112-113). */
  def offset(site: String, hole: String, core: String): Option[Double] =
    findByOffSpliceCore(site, hole, core).map(_.getAs[Double]("Offset"))
}

object ManualCorrelation {
  /** Load the appropriate manual-correlation flavor, or None if the
    * file matches neither format. (manualCorrelation.py:39-45)
    */
  def load(spark: SparkSession, path: String): Option[ManualCorrelation] =
    if (CsvIO.canLoad(spark, path, ManualCorrelationFormat))
      Some(ManualTies(CsvIO.load(spark, path, ManualCorrelationFormat, withSeq = true)))
    else if (CsvIO.canLoad(spark, path, ManualOffsetFormat))
      Some(ManualOffsets(CsvIO.load(spark, path, ManualOffsetFormat, withSeq = true)))
    else None
}
