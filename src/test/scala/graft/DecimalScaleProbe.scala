package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: is the q120 cost the decimal(38,18) sum's BigDecimal
  * path? Same 14-aggregate corrMatrix shape at scale 18 vs scale 4.
  */
object DecimalScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables(spark, "/root/testdata/sf0.1", "lineitem")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val pairs = for { i <- cols.indices; j <- i until cols.size } yield (i, j)
    def run(d: String): Double = {
      val aggs = (cols.zipWithIndex.map { case (c, i) =>
          sum(col(c).cast(d)).as(s"s_$i")
        } ++ pairs.map { case (i, j) =>
          sum((col(cols(i)) * col(cols(j))).cast(d)).as(s"p_${i}_$j")
        }).toSeq
      val t0 = System.nanoTime()
      li.agg(count(lit(1)).as("n"), aggs: _*).collect()
      (System.nanoTime() - t0) / 1e9
    }
    for (rep <- 1 to 4)
      println(f"rep $rep: scale18=${run("decimal(38,18)")}%.3f  scale4=${run("decimal(38,4)")}%.3f  long_double=${run("double")}%.3f")
    spark.stop()
  }
}
