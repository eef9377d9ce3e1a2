package graft

import graft.ops.DedupOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for q40 minhash+LSH at sf0.1. */
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, "/root/testdata/sf0.1", "documents")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-18s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    t("warmup") { docs.count() }
    val sh = DedupOps.wordShingles(docs, "doc_id", "text", 3)
    t("shingles") { sh.write.format("noop").mode("overwrite").save() }
    val sig = DedupOps.minHash(sh, 32)
    t("sig agg") { sig.write.format("noop").mode("overwrite").save() }
    val bands = DedupOps.lshBands(sig, 32, 8)
    t("bands") { bands.write.format("noop").mode("overwrite").save() }
    t("full pairs") {
      DedupOps.minHashLshPairs(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    t("full pairs 2nd") {
      DedupOps.minHashLshPairs(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
