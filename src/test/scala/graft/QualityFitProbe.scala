package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Derives TextOps.TrainedQualityWeights: deterministic IRLS fit on
  * the sf0.01 documents corpus, positive class = target language.
  * Paste the printed values into TextOps.TrainedQualityWeights.
  */
object QualityFitProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables(spark, "/root/testdata/sf0.01", "documents")
    val w = graft.ops.QualityFit.fit(docs, "text", col("lang") === "en")
    println(s"WEIGHTS $w")
    // reproducibility probe: same fit under a different partitioning
    val w2 = graft.ops.QualityFit.fit(docs.repartition(13), "text",
      col("lang") === "en")
    println(s"REPART  $w2")
    println(s"STABLE ${w == w2}")
    spark.stop()
  }
}
