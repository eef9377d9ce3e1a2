package graft.core.ops

import graft.core.format.CsvIO
import graft.core.model.CoringFormats._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Scalar accessor surfaces of the SIT and affine tables, mirroring
  * the reference's host-application API (coring/spliceInterval.py:
  * 52-101, coring/affine.py:40-61). Like the SectionSummary accessors
  * these are driver-side probes over small control tables;
  * first-match (`iloc[0]`) follows file order via `_seq` when present.
  */
private[ops] object TableAccessors {
  def firstMatch(df: DataFrame, conds: Seq[(String, String)]): Option[Row] = {
    var f = df
    conds.foreach { case (c, v) => f = f.filter(col(c) === v) }
    if (f.columns.contains(CsvIO.SeqCol)) f = f.orderBy(CsvIO.SeqCol)
    f.limit(1).collect().headOption
  }

  def sites(df: DataFrame): Seq[String] =
    df.select(col("Site").cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq
}

/** One SIT interval in API form (spliceInterval.py:22-51). */
case class SpliceIntervalRow(site: String, hole: String, core: String,
    tool: String, topSection: String, topOffset: Double,
    topCSF: Double, topCCSF: Double, botSection: String, botOffset: Double,
    botCSF: Double, botCCSF: Double, spliceType: String,
    dataUsed: String, comment: String)

object SitOps {

  /** getSites (spliceInterval.py:62-64). */
  def sites(sit: DataFrame): Seq[String] = TableAccessors.sites(sit)

  /** containsCore (spliceInterval.py:80-87). */
  def containsCore(sit: DataFrame, site: String, hole: String, core: String): Boolean =
    TableAccessors.firstMatch(sit,
      Seq("Site" -> site, "Hole" -> hole, "Core" -> core)).nonEmpty

  /** getCoreOffset (spliceInterval.py:73-77): CCSF − CSF of the core's
    * FIRST SIT row (file order) — the same quantity OffSplice computes
    * distributively for every core at once (sitCoreOffsets).
    */
  def coreOffset(sit: DataFrame, site: String, hole: String, core: String): Option[Double] =
    TableAccessors.firstMatch(sit,
      Seq("Site" -> site, "Hole" -> hole, "Core" -> core))
      .map(r => r.getAs[Double](TopDepthCCSF.name) - r.getAs[Double](TopDepthCSF.name))

  /** getIntervals (spliceInterval.py:66-71): file-order typed rows. */
  def intervals(sit: DataFrame): Seq[SpliceIntervalRow] = {
    val ordered =
      if (sit.columns.contains(CsvIO.SeqCol)) sit.orderBy(CsvIO.SeqCol) else sit
    ordered.collect().toSeq.map { r =>
      def s(c: String) = Option(r.getAs[Any](c)).map(_.toString).getOrElse("")
      def d(c: String) = r.getAs[Double](c)
      SpliceIntervalRow(s("Site"), s("Hole"), s("Core"), s("Tool"),
        s("TopSection"), d("TopOffset"), d(TopDepthCSF.name), d(TopDepthCCSF.name),
        s("BottomSection"), d("BottomOffset"), d(BottomDepthCSF.name), d(BottomDepthCCSF.name),
        s("SpliceType"), s("DataUsed"), s("Comment"))
    }
  }
}

object AffineOps {

  /** getSites (affine.py:44-45). */
  def sites(aff: DataFrame): Seq[String] = TableAccessors.sites(aff)

  /** getOffset (affine.py:47-54): cumulative offset of the first
    * matching (site, hole, core, tool) row; None where the reference
    * would raise on the empty iloc[0].
    */
  def offset(aff: DataFrame, site: String, hole: String, core: String,
      tool: String): Option[Double] =
    TableAccessors.firstMatch(aff,
      Seq("Site" -> site, "Hole" -> hole, "Core" -> core, "Tool" -> tool))
      .map(_.getAs[Double](Offset.name))
}
