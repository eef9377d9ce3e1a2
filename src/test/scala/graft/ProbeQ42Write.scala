package graft
import graft.core.splice.Convert
import org.apache.spark.sql.SparkSession
object ProbeQ42Write {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val Ref = "/root/reference/testdata"
    println("MARK convert (internal counts)"); Console.flush()
    val (sit, aff) = Convert.convertInMemory(spark,
      s"$Ref/GLAD9_SectionSummary.csv", s"$Ref/GLAD9_Site1_SparseSplice.csv")
    println("MARK noop write sit"); Console.flush()
    sit.write.format("noop").mode("overwrite").save()
    println("MARK parquet write sit (no coalesce)"); Console.flush()
    sit.write.mode("overwrite").parquet("/tmp/probe42w/sit_nc")
    println("MARK parquet write sit coalesce(1)"); Console.flush()
    sit.coalesce(1).write.mode("overwrite").parquet("/tmp/probe42w/sit_c1")
    println("MARK parquet write aff coalesce(1)"); Console.flush()
    aff.coalesce(1).write.mode("overwrite").parquet("/tmp/probe42w/aff_c1")
    println("MARK done"); Console.flush()
    spark.stop()
  }
}
