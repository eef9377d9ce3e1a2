package graft
object PlanProbeQ385 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val p = SparkEntry.queries("q385_frequent_journeys")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    println("HAS_WGL=" + p.contains("WindowGroupLimit"))
    println("N_EXCHANGES=" + "Exchange".r.findAllIn(p).size)
    println(p.take(3000))
    spark.stop()
  }
}
