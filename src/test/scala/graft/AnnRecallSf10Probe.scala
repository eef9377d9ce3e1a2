package graft

import org.apache.spark.sql.functions._

/** q83's recall scoreboard at sf10 with its documented at-scale knob:
  * the exact baselines are O(n²) in the corpus BY DESIGN (they exist
  * to measure recall, not to serve queries), so past bench scale the
  * scoreboard runs on a deterministic corpus sample — recall on a
  * uniform sample is an unbiased estimate of full-corpus recall, and
  * the quadratic baseline cost drops by fraction². This probe is the
  * honest sf10 datapoint for BENCHNOTES (the unsampled run is
  * quadratic and was killed at 30 min — the knob, not the wait, is
  * the production answer, exactly like r12's q47 nbits adjudication).
  */
object AnnRecallSf10Probe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val fraction = if (args.length > 1) args(1).toDouble else 0.1
    def run(): (Double, Array[String]) = {
      val t0 = System.nanoTime()
      // vec_id < 50: ~5 query vectors SURVIVE the 10% sample (the
      // registered < 5 set would be sampled away, leaving the knn
      // recall rows empty)
      val df = graft.ops.SimilarityOps.annRecallReport(spark,
        Tables(spark, dir, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 50, k = 10, nbitsKnn = 4, probes = 2,
        minCosine = 0.35, nbitsPairs = 4, sampleFraction = fraction)
      val rows = df.collect().map(_.toString)
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    val (cold, rows) = run()
    val (warm, _) = run()
    println(f"""{"probe":"ann_recall_sf10","dir":"$dir","fraction":$fraction,"cold":$cold%.3f,"warm":$warm%.3f,"rows":"${rows.mkString(";")}"}""")
  }
}
