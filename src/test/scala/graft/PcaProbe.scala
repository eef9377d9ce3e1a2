package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe: time PcaOps.fit/varianceReport at d=64 on sf0.01. */
object PcaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("pca-probe").getOrCreate()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val emb = Tables(spark, dir, "embeddings")
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val rep64 = graft.ops.PcaOps.varianceReport(emb, "embedding", 64)
      val n = rep64.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"rep $rep: varianceReport d=64 rows=$n in $dt%.2fs")
    }
    val m = graft.ops.PcaOps.fit(emb, "embedding", 64)
    println("top eigenvalues: " + m.eigenvalues.take(8).map(x => f"$x%.6f").mkString(", "))
    val proj = graft.ops.PcaOps.project(emb, "vec_id", "embedding", m, 8)
    val t1 = System.nanoTime()
    println("proj rows: " + proj.count() + f" in ${(System.nanoTime() - t1) / 1e9}%.2fs")
    proj.show(3)
    spark.stop()
  }
}
