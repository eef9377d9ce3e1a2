package graft
import org.apache.spark.sql.SparkSession
/** Scratch probe: time selected queries at a given SF dir. */
object ProbeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"$n%-22s ${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    spark.stop()
  }
}
