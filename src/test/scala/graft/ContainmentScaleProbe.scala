package graft

import org.apache.spark.sql.functions._

/** Scale probe for q159's underlying op: times a FRESH
  * WinnowOps.containmentPairs build (the q159 %211/%223 injection)
  * per run — the registered query memoizes the pair frame per
  * application, so its warm serve is a ms-scale filter at any SF and
  * says nothing about how the funnel itself scales. This probe is
  * the honest sf1/sf10 datapoint for BENCHNOTES.
  */
object ContainmentScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    def run(): (Double, Long) = {
      val t0 = System.nanoTime()
      val p = "the quarterly compliance digest reproduces member submissions verbatim in the appendix section for archival reference purposes"
      val t = when(col("doc_id") % 211 === 0, lit(p))
        .when(col("doc_id") % 223 === 0, concat(lit(p), lit(" "), col("text")))
        .otherwise(col("text"))
      val df = graft.ops.WinnowOps.containmentPairs(
        Tables(spark, dir, "documents").withColumn("text", t),
        "doc_id", "text")
      val n = df.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val warmRuns = if (args.length > 1) args(1).toInt else 2
    val (cold, n1) = run()
    val warms = (0 until warmRuns).map(_ => run()._1)
    val wmin = if (warms.nonEmpty) warms.min else cold
    println(f"""{"probe":"containment_scale","dir":"$dir","cold":$cold%.3f,"warm_min":$wmin%.3f,"pairs":$n1}""")
  }
}
