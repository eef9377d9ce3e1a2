package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.SkewOps

/** Scratch probe: salted join on a genuinely skewed workload — one key
  * holding 2M of 2.5M rows — comparing straggler behavior and results. */
object ProbeSkew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.adaptive.enabled","false") // isolate manual salting from AQE skew handling
      .config("spark.sql.autoBroadcastJoinThreshold","-1") // force shuffle joins
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val big = spark.range(2500000).select(
      when(col("id") < 2000000, 0L).otherwise(col("id")).as("k"), col("id").as("payload"))
    val dim = spark.range(600000).select(col("id").as("k"), concat(lit("d"), col("id")).as("label"))
    def time[A](n: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"$n ${(System.nanoTime()-t0)/1e9}%.2fs"); r }
    val plainN = time("plain_join")(big.join(dim, Seq("k")).count())
    val saltN = time("salted_join")(SkewOps.saltedJoin(big, dim, "k", 8).count())
    println(s"PLAIN=$plainN SALTED=$saltN EQUAL=${plainN == saltN}")
    val hot = SkewOps.hotKeys(big, "k", 100000).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    println("HOT=" + hot)
    val hcN = time("hotcold_join")(SkewOps.hotColdJoin(big, dim, "k", Seq(0L)).count())
    println(s"HOTCOLD=$hcN EQUAL=${hcN == plainN}")
    // probe: buckets=0 rejected
    try SkewOps.saltedJoin(big, dim, "k", 0)
    catch { case e: IllegalArgumentException => println("BUCKETS0_ERR=" + e.getMessage) }
    spark.stop()
  }
}
