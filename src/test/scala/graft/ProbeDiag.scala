package graft
import org.apache.spark.sql.SparkSession
import graft.core.format.CsvIO
import graft.core.model.CoringFormats._
import graft.core.splice.{Convert, SpliceDiagnostics, SpliceOptions}
object ProbeDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ref = "/root/reference/testdata"
    val ss = CsvIO.load(spark, s"$ref/GLAD9_SectionSummary.csv", SectionSummaryFormat, withSeq = true)
    val sp = CsvIO.load(spark, s"$ref/GLAD9_Site1_SparseSplice.csv", SparseSpliceFormat, withSeq = true)
    println("--- input diagnostics ---")
    SpliceDiagnostics.inputDiagnostics(spark, sp, ss).collect().foreach(r => println("DIAG " + r.mkString(" | ")))
    val out = java.nio.file.Files.createTempDirectory("diag").toString
    Convert.convertSparseSplice(spark, s"$ref/GLAD9_SectionSummary.csv",
      s"$ref/GLAD9_Site1_SparseSplice.csv", s"$out/a.csv", s"$out/s.csv", SpliceOptions())
    val sit = CsvIO.load(spark, s"$out/s.csv", SITFormat, withSeq = true)
    println("--- SIT overlap diagnostics: " + SpliceDiagnostics.sitOverlaps(sit).count() + " rows")
    spark.stop()
  }
}
