package graft

/** One-off: q47's embeddingNearDupPairs at sf10 with a scale-
  * appropriate bucket count (nbits=8 -> 256 buckets ~ 780 vecs each,
  * under the 4096 cap) — the honest sf10 datapoint for BENCHNOTES
  * (at nbits=4 the 200k corpus blows every bucket past the cap and
  * the drop guard empties the run).
  */
object NearDupSf10Probe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val nbits = if (args.length > 1) args(1).toInt else 8
    def run(): (Double, Long) = {
      val t0 = System.nanoTime()
      val df = graft.ops.SimilarityOps.embeddingNearDupPairs(
        Tables(spark, dir, "embeddings"), "vec_id", "embedding",
        minCosine = 0.35, nbits = nbits)
      val n = df.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val (cold, n1) = run()
    val (w1, _) = run()
    val (w2, _) = run()
    println(f"""{"probe":"neardup_sf10","nbits":$nbits,"cold":$cold%.3f,"warm_min":${math.min(w1, w2)}%.3f,"pairs":$n1}""")
  }
}
