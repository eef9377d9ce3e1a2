package graft.core

import java.nio.file.Files

import graft.core.splice.{Convert, SpliceOptions}
import graft.core.export.{MeasurementExport, MeasurementOps}
import graft.core.format.CsvIO
import graft.core.model.CoringFormats._
import org.apache.spark.sql.functions._

/** End-to-end golden tests against outputs produced by running the
  * reference implementation itself on its GLAD9 field data (see
  * src/test/resources/golden/README.md). Mirrors
  * feldman.py:549-566 (Test.test_sparse_to_sit / test_splice_measurement)
  * but diffs FULL file contents, not just row counts.
  */
class SpliceGoldenSpec extends SparkSpec {

  private lazy val outDir = Files.createTempDirectory("graft_golden").toString
  private lazy val affinePath = s"$outDir/TestAffine.csv"
  private lazy val sitPath = s"$outDir/TestSIT.csv"

  private lazy val converted: Unit = Convert.convertSparseSplice(spark,
    s"$RefData/GLAD9_SectionSummary.csv",
    s"$RefData/GLAD9_Site1_SparseSplice.csv",
    affinePath, sitPath, SpliceOptions())

  test("SIT/affine scalar accessors mirror the reference API (spliceInterval.py, affine.py)") {
    converted
    import graft.core.ops.{AffineOps, SitOps}
    val sit = CsvIO.load(spark, sitPath, SITFormat, withSeq = true)
    val aff = CsvIO.load(spark, affinePath, AffineFormat, withSeq = true)
    assert(SitOps.sites(sit) == Seq("1"))
    assert(SitOps.containsCore(sit, "1", "C", "1"))
    assert(!SitOps.containsCore(sit, "1", "Z", "1"))
    // first interval anchors the splice: zero offset
    assert(SitOps.coreOffset(sit, "1", "C", "1").contains(0.0))
    val ivs = SitOps.intervals(sit)
    assert(ivs.length == 58)
    assert(ivs.head.site == "1" && ivs.head.hole == "C" && ivs.head.core == "1")
    // per-interval affine is constant pre-rounding; the 3-decimal file
    // values agree only to a rounding ulp
    assert(ivs.forall(iv =>
      math.abs((iv.topCCSF - iv.topCSF) - (iv.botCCSF - iv.botCSF)) < 0.0011))
    // golden affine: 1A-1H cumulative offset 0.19
    assert(AffineOps.offset(aff, "1", "A", "1", "H").contains(0.19))
    assert(AffineOps.offset(aff, "1", "Z", "1", "H").isEmpty)
    assert(AffineOps.sites(aff).toSet.size == 7)
  }

  test("sparse splice → SIT matches reference output (58 rows)") {
    converted
    val diffs = CsvCompare.diff(sitPath, golden("GLAD9_Site1_TestSIT.csv"))
    assert(diffs.isEmpty, diffs.mkString("\n"))
  }

  test("sparse splice → affine matches reference output (509 cores, 7 sites)") {
    converted
    val diffs = CsvCompare.diff(affinePath, golden("GLAD9_Site1_TestAffine.csv"))
    assert(diffs.isEmpty, diffs.mkString("\n"))
    val aff = CsvIO.load(spark, affinePath, AffineFormat)
    assert(aff.select("Site").distinct().count() == 7)
  }

  test("measurement export matches reference output (6411 spliced rows)") {
    converted
    val exportPath = s"$outDir/XRF_spliced.csv"
    MeasurementExport.exportMeasurementData(spark, affinePath, sitPath,
      s"$RefData/GLAD9_Site1_XRF.csv", exportPath,
      depthColumn = "Sediment Depth, unscaled (MBS / CSF-A)")
    val diffs = CsvCompare.diff(exportPath, golden("GLAD9_Site1_XRF_test-spliced.csv"))
    assert(diffs.isEmpty, diffs.mkString("\n"))
  }

  test("partitioned export reproduces the single-file export's row order across part files") {
    converted
    val singlePath = s"$outDir/XRF_single.csv"
    MeasurementExport.exportMeasurementData(spark, affinePath, sitPath,
      s"$RefData/GLAD9_Site1_XRF.csv", singlePath,
      depthColumn = "Sediment Depth, unscaled (MBS / CSF-A)")
    val partDir = s"$outDir/XRF_parts"
    MeasurementExport.exportMeasurementDataPartitioned(spark, affinePath, sitPath,
      s"$RefData/GLAD9_Site1_XRF.csv", partDir,
      depthColumn = "Sediment Depth, unscaled (MBS / CSF-A)", numFiles = 7)
    // concatenate part files in filename order (range partitioning is
    // monotone in the sort key), dropping the per-file headers
    val partFiles = new java.io.File(partDir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
      .sortBy(_.getName)
    assert(partFiles.length > 1, "expected a multi-file export")
    val concat = partFiles.toSeq.flatMap(f =>
      scala.io.Source.fromFile(f).getLines().drop(1).toSeq)
    val single = scala.io.Source.fromFile(singlePath).getLines().toSeq
    assert(concat.length == single.length - 1)
    assert(concat == single.drop(1))
  }

  test("measurement range predicates: golden counts") {
    val md = CsvIO.load(spark, s"$RefData/GLAD9_Site1_XRF.csv", MeasurementFormat)
    val dc = "Sediment Depth, scaled (MBS / CSF-B)"
    assert(MeasurementOps.byRange(md, dc, 74.0, 75.0).count() == 185)
    assert(MeasurementOps.byRangeAndCore(md, dc, 74.0, 75.0, "25").count() == 84)
    assert(MeasurementOps.byRangeFullID(md, dc, 74.0, 76.0, "1", "A", "25", Seq("1")).count() == 148)
    assert(MeasurementOps.byRangeFullID(md, dc, 74.0, 78.0, "1", "A", "25", Seq("2", "3")).count() == 141)
    assert(MeasurementOps.byRangeFullID(md, dc, 74.0, 78.0, "1", "A", "25", Seq("1", "2", "3")).count() == 289)
    assert(MeasurementOps.byFullID(md, "1", "A", "25", Seq("1", "2", "3")).count() == 289)
    assert(MeasurementOps.byCore(md, "25").count() == 643)
  }

  test("manual correlation TIE/SET chain matches reference output") {
    val aPath = s"$outDir/ManCorrAffine.csv"
    Convert.convertSparseSplice(spark,
      s"$RefData/GLAD9_SectionSummary.csv",
      s"$RefData/GLAD9_Site1_SparseSplice.csv",
      aPath, s"$outDir/ManCorrSIT.csv", SpliceOptions(),
      Some(s"$RefData/ManualCorrelationTable.csv"))
    val diffs = CsvCompare.diff(aPath, golden("GLAD9_Site1_ManCorrAffine.csv"))
    assert(diffs.isEmpty, diffs.mkString("\n"))
  }

  test("sparse splice load semantics (sparseSplice.py Tests)") {
    val sp = CsvIO.load(spark, s"$RefData/GLAD9_Site1_SparseSplice.csv", SparseSpliceFormat)
    assert(sp.count() == 58)
    assert(sp.filter(col("Gap").isNotNull).count() == 0) // optional, absent → null
    assert(sp.select("Site").distinct().collect().map(_.getString(0)).contains("1"))
    assert(sp.select("Hole").distinct().count() == 3)
  }
}
