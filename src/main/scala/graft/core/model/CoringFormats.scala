package graft.core.model

import graft.core.format.{ColId, ColType, FormatSpec}

/** The five closed tabular formats of the coring domain plus shared
  * identity columns. Faithful to the reference's column definitions:
  *  - identity columns:      /root/reference/coring/columns.py:11-24
  *  - section summary:       /root/reference/coring/sectionSummary.py:17-26
  *  - sparse splice:         /root/reference/coring/sparseSplice.py:16-21
  *  - affine:                /root/reference/coring/affine.py:17-30
  *  - splice interval table: /root/reference/coring/spliceInterval.py:15-27
  *  - measurement data:      /root/reference/coring/measurement.py:17-18
  *  - manual correlation:    /root/reference/coring/manualCorrelation.py:17-36
  */
object CoringFormats {
  import ColType.{Num, Str}

  // ---- shared identity columns (coring/columns.py) ----
  val Project = ColId("Project", Seq("Exp", "Name", "Expedition", "Proj", "Cruise"))
  val Site = ColId("Site", Seq("Location"))
  val Hole = ColId("Hole", Seq("Track"))
  val Core = ColId("Core", Seq("Drive"))
  val Tool = ColId("Tool", Seq("Core Type", "Type"),
    orgNames = Map("IODP" -> "Core type", "LacCore" -> "Tool"))
  val Section = ColId("Section")
  val TopSection = ColId("TopSection")
  val BottomSection = ColId("BottomSection")
  val TopOffset = ColId("TopOffset", datatype = Num, unit = "cm")
  val BottomOffset = ColId("BottomOffset", datatype = Num, unit = "cm")
  val Comment = ColId("Comment",
    Seq("Quality Comment", "Quality Comments", "Comments", "Notes", "Remarks"),
    orgNames = Map("IODP" -> "Quality comment"), optional = true)
  val DataUsed = ColId("DataUsed", Seq("Data"),
    orgNames = Map("IODP" -> "Data used"), optional = true)

  val CoreIdentityCols: Seq[ColId] = Seq(Site, Hole, Core, Tool)
  val SectionIdentityCols: Seq[ColId] = Seq(Site, Hole, Core, Tool, Section)

  // ---- Section Summary (sectionSummary.py:17-26) ----
  val TopDepth = ColId("TopDepth", Seq("TopDepthUnscaled", "Top Depth CSF-A"),
    datatype = Num, unit = "m")
  val BottomDepth = ColId("BottomDepth", Seq("BottomDepthUnscaled", "Bottom Depth CSF-A"),
    datatype = Num, unit = "m")
  val TopDepthScaled = ColId("TopDepthScaled", Seq("Top Depth CSF-B"),
    datatype = Num, unit = "m")
  val BottomDepthScaled = ColId("BottomDepthScaled", Seq("Bottom Depth CSF-B"),
    datatype = Num, unit = "m")
  val CuratedLength = ColId("CuratedLength", Seq("Length"), datatype = Num, unit = "m")
  val Gaps = ColId("Gaps", unit = "cm", optional = true)

  val SectionSummaryFormat: FormatSpec = FormatSpec("Section Summary",
    SectionIdentityCols ++ Seq(TopDepth, BottomDepth, TopDepthScaled,
      BottomDepthScaled, CuratedLength, Gaps))

  // ---- Sparse Splice (sparseSplice.py:16-21) ----
  val Gap = ColId("Gap", datatype = Num, unit = "m", optional = true)
  val SpliceType = ColId("SpliceType")

  val SparseSpliceFormat: FormatSpec = FormatSpec("Sparse Splice",
    CoreIdentityCols ++ Seq(TopSection, TopOffset, BottomSection, BottomOffset,
      SpliceType, Gap, DataUsed, Comment))

  // ---- Affine Table (affine.py:17-30) ----
  val DepthCSF = ColId("DepthCSF",
    Seq("Depth CSF-A", "Depth MBSF", "Depth MBLF", "Core top depth CSF-A"),
    orgNames = Map("IODP" -> "Core top depth CSF-A (m)"), datatype = Num, unit = "m")
  val DepthCCSF = ColId("DepthCCSF",
    Seq("Depth CCSF-A", "Depth MCD", "Core top depth CCSF"),
    orgNames = Map("IODP" -> "Core top depth CCSF (m)"), datatype = Num, unit = "m")
  val Offset = ColId("Offset", Seq("Cumulative Offset", "Total Offset"),
    orgNames = Map("IODP" -> "Cumulative offset (m)"), datatype = Num, unit = "m")
  val DifferentialOffset = ColId("DifferentialOffset",
    orgNames = Map("IODP" -> "Differential offset (m)"), datatype = Num, unit = "m",
    optional = true)
  val GrowthRate = ColId("GrowthRate", orgNames = Map("IODP" -> "Growth rate"),
    datatype = Num, optional = true)
  val ShiftType = ColId("ShiftType", Seq("Affine Type", "Shift", "Shift type"),
    orgNames = Map("IODP" -> "Shift type"))
  val FixedCore = ColId("FixedCore", Seq("Reference Core"),
    orgNames = Map("IODP" -> "Reference core"), optional = true)
  val FixedTieCSF = ColId("FixedTieCSF",
    Seq("Fixed Tie CSF-A", "Reference tie point CSF-A"),
    orgNames = Map("IODP" -> "Reference tie point CSF-A (m)"), datatype = Num,
    unit = "m", optional = true)
  val ShiftedTieCSF = ColId("ShiftedTieCSF",
    Seq("Shifted Tie CSF-A", "Shift tie point CSF-A"),
    orgNames = Map("IODP" -> "Shift tie point CSF-A (m)"), datatype = Num,
    unit = "m", optional = true)

  val AffineFormat: FormatSpec = FormatSpec("Affine Table",
    CoreIdentityCols ++ Seq(DepthCSF, DepthCCSF, Offset, DifferentialOffset,
      GrowthRate, ShiftType, FixedCore, FixedTieCSF, ShiftedTieCSF,
      DataUsed, Comment))

  // ---- Splice Interval Table (spliceInterval.py:15-27) ----
  val TopDepthCSF = ColId("TopDepthCSF", Seq("Top Depth CSF-A"),
    orgNames = Map("IODP" -> "Top Depth CSF-A"), datatype = Num, unit = "m")
  val TopDepthCCSF = ColId("TopDepthCCSF", Seq("Top Depth CCSF-A"),
    orgNames = Map("IODP" -> "Top Depth CCSF-A"), datatype = Num, unit = "m")
  val BottomDepthCSF = ColId("BottomDepthCSF", Seq("Bottom Depth CSF-A"),
    orgNames = Map("IODP" -> "Bottom Depth CSF-A"), datatype = Num, unit = "m")
  val BottomDepthCCSF = ColId("BottomDepthCCSF", Seq("Bottom Depth CCSF-A"),
    orgNames = Map("IODP" -> "Bottom Depth CCSF-A"), datatype = Num, unit = "m")

  val SITFormat: FormatSpec = FormatSpec("Splice Interval Table",
    CoreIdentityCols ++ Seq(TopSection, TopOffset, TopDepthCSF, TopDepthCCSF,
      BottomSection, BottomOffset, BottomDepthCSF, BottomDepthCCSF,
      SpliceType, Gap, DataUsed, Comment))

  // ---- Measurement Data (measurement.py:17-18): identity only; the
  // depth column is named by the caller, everything else passes through.
  val MeasurementFormat: FormatSpec = FormatSpec("Measurement Data", SectionIdentityCols)

  // ---- Manual correlation (manualCorrelation.py:17-36) ----
  private def mc(n: String) = ColId(n)
  val ManualCorrelationFormat: FormatSpec = FormatSpec("Manual Correlation Tie Table",
    Seq(mc("Site1"), mc("Hole1"), mc("Core1"), mc("Tool1"), mc("Section1"),
      ColId("SectionDepth1", datatype = Num, unit = "cm"),
      mc("Site2"), mc("Hole2"), mc("Core2"), mc("Tool2"), mc("Section2"),
      ColId("SectionDepth2", datatype = Num, unit = "cm")))

  val ManualOffsetFormat: FormatSpec = FormatSpec("Manual Offset Table",
    Seq(Site, Hole, Core,
      ColId("Offset", Seq("Cumulative Offset", "Shift Distance"), datatype = Num)))
}
