package graft

import org.apache.spark.sql.SparkSession

/** Dump q43_affine_assembly (and q42) to /tmp for exact oracle diffing. */
object ProbeQ43 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.01"
    for (name <- Seq("q42_splice_sit", "q43_affine_assembly")) {
      SparkEntry.queries(name)(spark, sf).coalesce(1)
        .write.mode("overwrite").parquet(s"/tmp/probe43/$name")
    }
    spark.stop()
  }
}
