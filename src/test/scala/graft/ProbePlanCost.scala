package graft

import graft.core.format.CsvIO
import graft.core.model.CoringFormats._
import graft.core.splice._
import org.apache.spark.sql.SparkSession

/** Is the remaining convert cost Catalyst planning or execution? */
object ProbePlanCost {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.sql.codegen.wholeStage", "false")
      .config("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val Ref = "/root/reference/testdata"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    t("warm: generic job") { spark.range(10).count() }
    t("warm: second job") { spark.range(10).count() }
    t("warm: third job") { spark.range(10).count() }
    t("warm: csv init") { CsvIO.readRaw(spark, s"$Ref/GLAD9_SectionSummary.csv").limit(1).count() }

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
    })

    val secsumm = t("load secsumm (lazy+cache)") {
      CsvIO.load(spark, s"$Ref/GLAD9_SectionSummary.csv", SectionSummaryFormat, withSeq = true).cache()
    }
    val sparse = t("load sparse (lazy+cache)") {
      CsvIO.load(spark, s"$Ref/GLAD9_Site1_SparseSplice.csv", SparseSpliceFormat, withSeq = true).cache()
    }
    t("validate") {
      Convert.validateSectionColumns(sparse, Seq("TopSection", "BottomSection"), "Sparse Splice")
      Convert.validateSectionColumn(secsumm, "Section", "Section Summary")
    }
    val (sitDf, onAff) = t("build plans (sit)") {
      SpliceBuilder.sparseSpliceToSIT(spark, sparse, secsumm)
    }
    val sitRounded = CsvIO.roundNumeric(sitDf, SITFormat)
    val affDf = t("build plans (aff)") {
      CsvIO.roundNumeric(
        AffineFinish.finish(onAff.unionByName(
          OffSplice.gather(spark, secsumm, sitRounded, None))), AffineFormat)
    }
    val sitOut = sitRounded.cache()
    val affOut = affDf.cache()
    t("aff: plan only") { affOut.queryExecution.executedPlan }
    jobs.set(0); stages.set(0)
    t("aff: execute (count)") { affOut.count() }
    println(s"JOBS ${jobs.get} STAGES ${stages.get}")
    t("sit: execute (count)") { sitOut.count() }
    spark.stop()
  }
}
