package graft

import org.apache.spark.sql.functions._

/** q383's at-scale evidence, closing the candidate-path family
  * symmetrically with [[MarginMiningSf10Probe]] (r16 VERDICT ask #7):
  * the exact hard-negative miner broadcasts the query side and scans
  * |corpus|·|queries| cosines; the production path is q383's
  * hardNegativesLsh — one bucket-keyed shuffle, label filter riding
  * the join, candidate volume ~|corpus|·|queries| / 2^nbits · probes.
  * Same corpus, same nbits/probes knobs as the margin probe; records
  * warm runtime + mined-pair count for BENCHNOTES.
  */
object HardNegativesSf10Probe {
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
      val out = graft.ops.SimilarityOps.hardNegativesLsh(
        emb, "vec_id", "embedding", "label",
        col("vec_id") % 1000 === 0, k = 8,
        nbits = nbits, probes = 2,
        bucketExpr = graft.ops.SimilarityOps.lshBucketMd5(_, _, d = 64))
      val n = out.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val (cold, n1) = run()
    val (warm, n2) = run()
    require(n1 == n2, s"nondeterministic probe: $n1 vs $n2")
    println(f"""{"probe":"hard_negatives_sf10","dir":"$dir","nbits":$nbits,"cold":$cold%.3f,"warm":$warm%.3f,"mined":$n1}""")
    spark.stop()
  }
}
