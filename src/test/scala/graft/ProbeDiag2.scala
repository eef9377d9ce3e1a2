package graft
import org.apache.spark.sql.SparkSession
import graft.core.splice.SpliceDiagnostics
object ProbeDiag2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // interval 1 bottom CCSF (5.0) overlaps interval 2 top CCSF (4.5)
    val sit = Seq((0L, 0.0, 5.0), (1L, 4.5, 9.0), (2L, 9.0, 12.0))
      .toDF("_seq", "TopDepthCCSF", "BottomDepthCCSF")
    SpliceDiagnostics.sitOverlaps(sit).collect().foreach(r => println("OVERLAP " + r.mkString(" | ")))
    spark.stop()
  }
}
