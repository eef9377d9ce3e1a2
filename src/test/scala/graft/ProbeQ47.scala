package graft
import org.apache.spark.sql.SparkSession
object ProbeQ47 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("Q47_ROWS=" + SparkEntry.queries("q47_embedding_neardup")(spark, "/root/testdata/sf0.01").count())
    spark.stop()
  }
}
