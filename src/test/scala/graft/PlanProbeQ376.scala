package graft
import org.apache.spark.sql.SparkSession
/** Scratch plan probe (r15): tCloseness — one exchange feeds both the
  * window and the final class aggregate (verified in the formatted
  * plan), and the duplicated cells subtree collapses to a
  * ReusedExchange at runtime so the corpus is scanned once. */
object PlanProbeQ376 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.queries.PipelineQueries.queries("q376_t_closeness")(
      spark, "/root/testdata/sf0.01")
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    println("REUSED_EXCHANGE=" + executed.contains("ReusedExchange"))
    val scans = "Scan parquet".r.findAllIn(executed).size
    println("PARQUET_SCAN_NODES=" + scans)
    spark.stop()
  }
}
