package graft

import org.apache.spark.sql.functions._

/** q138's at-scale story, exercised at 100×: the exact all-pairs
  * margin miner is O(|src|·|tgt|) BY DESIGN (it is the recall
  * yardstick) — at sf10's 100k × 100k split that is 10^10 cosines and
  * was never going to run. The production path is q382's
  * marginMiningLsh: one bucket-keyed shuffle whose pair count is
  * ~|src|·|tgt| / 2^nbits · probes. This probe is the honest sf10
  * datapoint for BENCHNOTES — nbits is the knob that prices candidate
  * volume against recall, exactly like the q47 nbits adjudication.
  */
object MarginMiningSf10Probe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val nbits = if (args.length > 1) args(1).toInt else 12
    def run(): (Double, Long) = {
      val t0 = System.nanoTime()
      val emb = Tables(spark, dir, "embeddings")
      val out = graft.ops.SimilarityOps.marginMiningLsh(
        emb.where(col("label") % 2 === 0),
        emb.where(col("label") % 2 === 1),
        "vec_id", "embedding", col("vec_id") % 1000 === 0, k = 4,
        nbits = nbits, probes = 2,
        bucketExpr = graft.ops.SimilarityOps.lshBucketMd5(_, _, d = 64))
      val n = out.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val (cold, n1) = run()
    val (warm, n2) = run()
    require(n1 == n2, s"nondeterministic probe: $n1 vs $n2")
    println(f"""{"probe":"margin_mining_sf10","dir":"$dir","nbits":$nbits,"cold":$cold%.3f,"warm":$warm%.3f,"mined":$n1}""")
    spark.stop()
  }
}
