package graft.core

import java.nio.file.Files

import graft.core.export.MeasurementExport
import graft.core.splice.{Convert, SpliceOptions}

/** Option-coverage golden tests: each pipeline option compared against
  * a reference run with the same flags (see golden/README.md).
  * Covers useScaledDepths (CSF-B space + compression quirk),
  * lazyAppend (cross-hole APPEND inherits the previous affine),
  * spliceStartDepth (first interval anchored at a chosen depth),
  * wholeSpliceSection and includeOffSplice=false on export.
  */
class SpliceOptionsSpec extends SparkSpec {

  private lazy val outDir = Files.createTempDirectory("graft_opts").toString

  private def convert(opts: SpliceOptions, tag: String): (String, String) = {
    val a = s"$outDir/${tag}_Affine.csv"
    val s = s"$outDir/${tag}_SIT.csv"
    Convert.convertSparseSplice(spark,
      s"$RefData/GLAD9_SectionSummary.csv",
      s"$RefData/GLAD9_Site1_SparseSplice.csv", a, s, opts)
    (a, s)
  }

  private def assertGolden(actual: String, goldenName: String): Unit = {
    val diffs = CsvCompare.diff(actual, golden(goldenName))
    assert(diffs.isEmpty, diffs.mkString("\n"))
  }

  test("LacCore vocab + progress listener surface (qtmain.py:56-58, feldman.py:28-39)") {
    val events = scala.collection.mutable.ArrayBuffer.empty[(Double, String)]
    var cleared = false
    graft.core.Progress.setProgressListener(new graft.core.Progress.Listener {
      override def setValueAndText(value: Double, text: String): Unit =
        events += ((value, text))
      override def clear(): Unit = cleared = true
    })
    try {
      val a = s"$outDir/Vocab_Affine.csv"
      val s = s"$outDir/Vocab_SIT.csv"
      // fresh input copies: a memoized conversion legitimately skips
      // the pipeline (and its progress reports) for already-seen inputs
      val secCopy = s"$outDir/Vocab_sec.csv"
      val spCopy = s"$outDir/Vocab_sparse.csv"
      Files.copy(java.nio.file.Paths.get(s"$RefData/GLAD9_SectionSummary.csv"),
        java.nio.file.Paths.get(secCopy))
      Files.copy(java.nio.file.Paths.get(s"$RefData/GLAD9_Site1_SparseSplice.csv"),
        java.nio.file.Paths.get(spCopy))
      Convert.convertSparseSplice(spark, secCopy, spCopy, a, s, SpliceOptions(),
        manualCorrelationPath = None, org = "LacCore")
      // LacCore vocabulary: the Tool column keeps its LacCore name in
      // both outputs; IODP-only names fall back unchanged
      val affHeader = scala.io.Source.fromFile(a).getLines().next()
      assert(affHeader.contains("Tool") && !affHeader.contains("Core type"), affHeader)
      assert(affHeader.contains("Core top depth CSF-A (m)"), affHeader)
      // progress shim: cleared on registration, monotone 0→100 reports
      assert(cleared)
      val values = events.map(_._1)
      assert(values.nonEmpty && values.head == 0.0 && values.last == 100.0, values)
      assert(values == values.sorted, values)
    } finally graft.core.Progress.clearProgressListener()
  }

  test("convertInMemory is stable under concurrent callers (memo races resolve to one result)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // fresh copies → fresh memo key, so this test really races the build
    val secCopy = s"$outDir/Conc_sec.csv"
    val spCopy = s"$outDir/Conc_sparse.csv"
    Files.copy(java.nio.file.Paths.get(s"$RefData/GLAD9_SectionSummary.csv"),
      java.nio.file.Paths.get(secCopy))
    Files.copy(java.nio.file.Paths.get(s"$RefData/GLAD9_Site1_SparseSplice.csv"),
      java.nio.file.Paths.get(spCopy))
    val futures = (1 to 4).map(_ => Future {
      val (sit, aff) = Convert.convertInMemory(spark, secCopy, spCopy)
      (sit.count(), aff.count())
    })
    val results = Await.result(Future.sequence(futures), 120.seconds)
    assert(results.toSet == Set((58L, 509L)))
  }

  test("useScaledDepths: CSF-B depth space") {
    val (a, s) = convert(SpliceOptions(useScaledDepths = true), "Scaled")
    assertGolden(s, "Scaled_SIT.csv")
    assertGolden(a, "Scaled_Affine.csv")
  }

  test("lazyAppend: cross-hole APPEND inherits previous affine") {
    val (a, s) = convert(SpliceOptions(lazyAppend = true), "Lazy")
    assertGolden(s, "Lazy_SIT.csv")
    assertGolden(a, "Lazy_Affine.csv")
  }

  test("spliceStartDepth: first interval anchored at 5.0 m") {
    val (a, s) = convert(SpliceOptions(spliceStartDepth = Some(5.0)), "Start5")
    assertGolden(s, "Start5_SIT.csv")
    assertGolden(a, "Start5_Affine.csv")
  }

  test("export: wholeSpliceSection without off-splice rows") {
    val exportPath = s"$outDir/XRF_whole.csv"
    MeasurementExport.exportMeasurementData(spark,
      golden("GLAD9_Site1_TestAffine.csv"), golden("GLAD9_Site1_TestSIT.csv"),
      s"$RefData/GLAD9_Site1_XRF.csv", exportPath,
      depthColumn = "Sediment Depth, unscaled (MBS / CSF-A)",
      includeOffSplice = false, wholeSpliceSection = true)
    assertGolden(exportPath, "XRF_whole.csv")
  }
}
