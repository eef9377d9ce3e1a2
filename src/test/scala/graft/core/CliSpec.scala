package graft.core

import java.nio.file.Files

/** The spark-submit CLI must drive both reference pipelines end-to-end
  * and produce golden-identical files — and it must NOT stop a session
  * it borrowed from the host application (here: the test harness).
  */
class CliSpec extends SparkSpec {

  private val golden = "/root/repo/src/test/resources/golden"

  test("convert + export via the CLI reproduce the reference goldens; borrowed session survives") {
    val dir = Files.createTempDirectory("graft_cli").toString
    graft.Main.main(Array("convert",
      s"$RefData/GLAD9_SectionSummary.csv",
      s"$RefData/GLAD9_Site1_SparseSplice.csv",
      s"$dir/Affine.csv", s"$dir/SIT.csv"))
    assert(!spark.sparkContext.isStopped, "CLI stopped the borrowed session")
    val affDiff = CsvCompare.diff(s"$dir/Affine.csv", s"$golden/GLAD9_Site1_TestAffine.csv")
    assert(affDiff.isEmpty, affDiff.mkString("\n"))
    val sitDiff = CsvCompare.diff(s"$dir/SIT.csv", s"$golden/GLAD9_Site1_TestSIT.csv")
    assert(sitDiff.isEmpty, sitDiff.mkString("\n"))

    graft.Main.main(Array("export",
      s"$dir/Affine.csv", s"$dir/SIT.csv",
      s"$RefData/GLAD9_Site1_XRF.csv", s"$dir/XRF-spliced.csv",
      "--depth-column", "Sediment Depth, unscaled (MBS / CSF-A)"))
    assert(!spark.sparkContext.isStopped)
    val expDiff = CsvCompare.diff(s"$dir/XRF-spliced.csv",
      s"$golden/GLAD9_Site1_XRF_test-spliced.csv")
    assert(expDiff.isEmpty, expDiff.mkString("\n"))

    // the session is still fully usable afterwards
    assert(spark.range(3).count() == 3)
  }

  test("curate via the CLI matches the library pipeline") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cli_curate")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.filter(org.apache.spark.sql.functions.col("doc_id") % 97 =!= 0)
      .write.parquet(s"$dir/docs")
    docs.filter(org.apache.spark.sql.functions.col("doc_id") % 97 === 0)
      .write.parquet(s"$dir/bench")
    graft.Main.main(Array("curate", s"$dir/docs", s"$dir/bench", s"$dir/out"))
    assert(!spark.sparkContext.isStopped)
    val survivors = spark.read.parquet(s"$dir/out/survivors")
      .select("id").as[Long].collect().toSet
    val expected = graft.ops.CurationPipeline.curate(
        spark.read.parquet(s"$dir/docs"), spark.read.parquet(s"$dir/bench"),
        "doc_id", "text")
      .select("id").as[Long].collect().toSet
    assert(survivors == expected && survivors.nonEmpty)
    val funnel = spark.read.parquet(s"$dir/out/funnel").head()
    assert(funnel.getLong(0) > 0) // n_total
  }
}
