package graft

import graft.core.format.CsvIO
import graft.core.model.CoringFormats._
import graft.core.splice._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of the splice conversion pipeline. */
object ProbeSpliceTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val Ref = "/root/reference/testdata"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    // warmup pass
    t("warmup(full)") {
      val (sit, aff) = Convert.convertInMemory(spark,
        s"$Ref/GLAD9_SectionSummary.csv", s"$Ref/GLAD9_Site1_SparseSplice.csv")
      sit.write.format("noop").mode("overwrite").save()
      aff.write.format("noop").mode("overwrite").save()
    }
    val secsumm = t("load secsumm") {
      val d = CsvIO.load(spark, s"$Ref/GLAD9_SectionSummary.csv", SectionSummaryFormat, withSeq = true)
      d.count(); d
    }
    val sparse = t("load sparse") {
      val d = CsvIO.load(spark, s"$Ref/GLAD9_Site1_SparseSplice.csv", SparseSpliceFormat, withSeq = true)
      d.count(); d
    }
    t("validate x3") {
      Convert.validateSectionColumn(sparse, "TopSection", "Sparse Splice")
      Convert.validateSectionColumn(sparse, "BottomSection", "Sparse Splice")
      Convert.validateSectionColumn(secsumm, "Section", "Section Summary")
    }
    val (sitDf, onAff) = t("fold+sit build") {
      val r = SpliceBuilder.sparseSpliceToSIT(spark, sparse, secsumm)
      r._1.write.format("noop").mode("overwrite").save(); r
    }
    val sitRounded = CsvIO.roundNumeric(sitDf, SITFormat)
    val offAff = t("offsplice") {
      val d = OffSplice.gather(spark, secsumm, sitRounded, None)
      d.write.format("noop").mode("overwrite").save(); d
    }
    t("affine finish") {
      CsvIO.roundNumeric(AffineFinish.finish(onAff.unionByName(offAff)), AffineFormat)
        .write.format("noop").mode("overwrite").save()
    }
    t("full convert again") {
      val (sit, aff) = Convert.convertInMemory(spark,
        s"$Ref/GLAD9_SectionSummary.csv", s"$Ref/GLAD9_Site1_SparseSplice.csv")
      sit.write.format("noop").mode("overwrite").save()
      aff.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
