package graft
import org.apache.spark.sql.SparkSession

object TrainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables(spark, "/root/testdata/sf0.01", "documents")
    val m = graft.ops.BpeOps.trainBpe(docs, "text", numMerges = 1000)
    println("NMERGES " + m.size)
    println(m.map { case (a, b) => s"""("$a", "$b")""" }.grouped(5)
      .map(_.mkString(", ")).mkString("MERGES_BEGIN\n    ", ",\n    ", "\nMERGES_END"))
    spark.stop()
  }
}
