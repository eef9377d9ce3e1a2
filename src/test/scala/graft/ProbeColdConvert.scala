package graft

import graft.core.format.CsvIO
import graft.core.model.CoringFormats._
import graft.core.splice._
import org.apache.spark.sql.SparkSession

/** Cold-JVM phase attribution of the splice conversion (no warmup):
  * where does the first-plan cost actually go?
  */
object ProbeColdConvert {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.wholeStage", "false")
      .config("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val Ref = "/root/reference/testdata"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    t("first job (1 row)") { spark.range(1).count() }
    val secsumm = t("load secsumm") {
      val d = CsvIO.load(spark, s"$Ref/GLAD9_SectionSummary.csv", SectionSummaryFormat, withSeq = true).cache()
      d.count(); d
    }
    val sparse = t("load sparse") {
      val d = CsvIO.load(spark, s"$Ref/GLAD9_Site1_SparseSplice.csv", SparseSpliceFormat, withSeq = true).cache()
      d.count(); d
    }
    t("validate") {
      Convert.validateSectionColumns(sparse, Seq("TopSection", "BottomSection"), "Sparse Splice")
      Convert.validateSectionColumn(secsumm, "Section", "Section Summary")
    }
    val resolved = t("resolve plan") {
      val r = SpliceBuilder.resolve(spark, sparse, secsumm)
      r.queryExecution.executedPlan // force analysis+optimization+planning
      r
    }
    t("resolve exec") { resolved.write.format("noop").mode("overwrite").save() }
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
    spark.stop()
  }
}
