package graft
import org.apache.spark.sql.SparkSession
import graft.ops.BucketOps
object ProbeBucket {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("probe_wh").toString
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold","-1")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val li = spark.read.parquet(s"$sf/lineitem.parquet").withColumnRenamed("l_orderkey","o_orderkey")
    def time[A](n: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"$n ${(System.nanoTime()-t0)/1e9}%.2fs"); r }
    BucketOps.writeBucketed(orders, "p_orders", "o_orderkey", 8, sortTableBy = Some("o_orderkey"))
    BucketOps.writeBucketed(li, "p_lineitem", "o_orderkey", 8, sortTableBy = Some("o_orderkey"))
    val j = BucketOps.bucketedJoin(spark, "p_orders", "p_lineitem", "o_orderkey")
    val plan = j.queryExecution.executedPlan.toString
    println("SHUFFLE_FREE=" + !plan.contains("Exchange hashpartitioning"))
    println("BUCKETED_SCAN=" + plan.contains("SelectedBucketsCount"))
    val n1 = time("bucketed_join")(j.count())
    val n2 = time("plain_join")(orders.join(li, Seq("o_orderkey")).count())
    println(s"ROWS=$n1 EQUAL=${n1 == n2}")
    spark.stop()
  }
}
