package graft
import org.apache.spark.sql.SparkSession
object ProbeExtensions {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SQL surface via extensions config — no programmatic registration
    val r = spark.sql("SELECT round(graft_cosine(array(3.0d,4.0d), array(4.0d,3.0d)), 4) AS c").head().getDouble(0)
    println("EXT_COSINE=" + r + " (expect 0.96)")
    // confirm the expression sits inside a codegen'd span
    val df = spark.sql("SELECT graft_cosine(array(1.0d), array(1.0d)) AS c")
    val plan = df.queryExecution.executedPlan.toString
    println("CODEGEN=" + plan.contains("*"))
    // probe: wrong arity
    try spark.sql("SELECT graft_cosine(array(1.0d))").collect()
    catch { case e: Exception => println("ARITY_ERR=" + e.getMessage.take(60)) }
    spark.stop()
  }
}
