package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch plan probe: does InferWindowGroupLimit bound the
  * stratifiedTake rank-window map-side? (r15 k-min inventory) */
object PlanProbeQ73 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.ops.SampleOps.stratifiedTake(
      graft.Tables(spark, "/root/testdata/sf0.1", "documents")
        .select(col("doc_id"), col("source")),
      "doc_id", "source", n = 20, salt = "strat1")
    df.explain("formatted")
    spark.stop()
  }
}
