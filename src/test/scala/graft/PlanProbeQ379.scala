package graft
object PlanProbeQ379 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (q <- Seq("q379_shipmode_priority", "q380_parts_supplier_cnt")) {
      println(s"===== $q")
      println(SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
