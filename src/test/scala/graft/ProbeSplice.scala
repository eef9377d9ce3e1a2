package graft
import org.apache.spark.sql.SparkSession
import graft.core.splice.{Convert, SpliceOptions, SpliceError}
import graft.core.export.MeasurementExport
import graft.core.format.FormatError

/** Scratch probe main (test scope): drive the feldman pipeline
  * end-to-end through the public API + error paths. */
object ProbeSplice {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").config("spark.sql.shuffle.partitions","4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ref = "/root/reference/testdata"
    val out = java.nio.file.Files.createTempDirectory("probe").toString
    Convert.convertSparseSplice(spark, s"$ref/GLAD9_SectionSummary.csv",
      s"$ref/GLAD9_Site1_SparseSplice.csv", s"$out/aff.csv", s"$out/sit.csv")
    println("SIT_LINES=" + scala.io.Source.fromFile(s"$out/sit.csv").getLines().size)
    println("AFF_LINES=" + scala.io.Source.fromFile(s"$out/aff.csv").getLines().size)
    println("SIT_ROW2=" + scala.io.Source.fromFile(s"$out/sit.csv").getLines().slice(1,3).mkString(" | "))
    MeasurementExport.exportMeasurementData(spark, s"$out/aff.csv", s"$out/sit.csv",
      s"$ref/GLAD9_Site1_XRF.csv", s"$out/spliced.csv", "Sediment Depth, unscaled (MBS / CSF-A)")
    println("SPLICED_LINES=" + scala.io.Source.fromFile(s"$out/spliced.csv").getLines().size)
    // probe 1: bad section column -> FormatError
    val badDir = java.nio.file.Files.createTempDirectory("bad").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$badDir/bad_sparse.csv"),
      "Site,Hole,Core,Type,TopSection,TopOffset,BottomSection,BottomOffset,SpliceType\n1,A,1,H,xx,0,1,84,TIE\n")
    try { Convert.convertSparseSplice(spark, s"$ref/GLAD9_SectionSummary.csv",
        s"$badDir/bad_sparse.csv", s"$out/a2.csv", s"$out/s2.csv") }
    catch { case e: FormatError => println("PROBE_BADSECTION_OK: " + e.getMessage) }
    // probe 2: unknown splice type mid-file -> SpliceError
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$badDir/badtype.csv"),
      "Site,Hole,Core,Type,TopSection,TopOffset,BottomSection,BottomOffset,SpliceType\n1,A,1,H,1,0,1,84,SPLORT\n1,A,2,H,1,0,1,50,TIE\n")
    try { Convert.convertSparseSplice(spark, s"$ref/GLAD9_SectionSummary.csv",
        s"$badDir/badtype.csv", s"$out/a3.csv", s"$out/s3.csv") }
    catch { case e: Exception =>
      val root = { var c: Throwable = e; while (c.getCause != null) c = c.getCause; c }
      println("PROBE_BADTYPE_OK: " + root.getClass.getSimpleName + ": " + root.getMessage.take(80)) }
    // probe 3: manual correlation file that is neither format -> FormatError
    try { Convert.convertSparseSplice(spark, s"$ref/GLAD9_SectionSummary.csv",
        s"$ref/GLAD9_Site1_SparseSplice.csv", s"$out/a4.csv", s"$out/s4.csv",
        SpliceOptions(), Some(s"$ref/utf8err.csv")) }
    catch { case e: FormatError => println("PROBE_BADMANCORR_OK: " + e.getMessage.take(80)) }
    // probe 4: with the real manual correlation table (ties reference holes not in splice)
    Convert.convertSparseSplice(spark, s"$ref/GLAD9_SectionSummary.csv",
      s"$ref/GLAD9_Site1_SparseSplice.csv", s"$out/a5.csv", s"$out/s5.csv",
      SpliceOptions(), Some(s"$ref/ManualCorrelationTable.csv"))
    val a5 = scala.io.Source.fromFile(s"$out/a5.csv").getLines().toSeq
    println("PROBE_MANCORR_LINES=" + a5.size + " TIE_ROWS=" + a5.count(_.contains(",TIE,")))
    println("OUT=" + out)
    spark.stop()
  }
}
