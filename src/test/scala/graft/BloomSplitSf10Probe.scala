package graft

import org.apache.spark.sql.functions._

/** q377's shuffle-economics at 100×, in an environment-independent
  * unit: SHUFFLE BYTES, not seconds (the session box is degraded;
  * bytes are deterministic). Corpus = sf10 documents keyed by text
  * md5 (500k rows); reference = every 20th doc's key (~5% true
  * overlap — the cross-crawl shape). Broadcast is disabled to model
  * the regime the operator exists for: a reference too large to
  * broadcast, where the plain anti join sort-merges the ENTIRE
  * corpus through the exchange and the bloom split ships only
  * probable hits.
  */
object BloomSplitSf10Probe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), md5(to_binary(coalesce(col("text"), lit("")),
        lit("utf-8"))).as("k"))
      .localCheckpoint()
    val ref = docs.where(col("doc_id") % 20 === 0).select(col("k").as("rk"))
      .localCheckpoint()
    val plainRows = docs.join(ref, col("k") === col("rk"), "left_anti").count()
    val plain = graft.ops.PlanProbe.shuffleBytesWritten(
      docs.join(ref, col("k") === col("rk"), "left_anti"))
    val split = graft.ops.PlanProbe.shuffleBytesWritten(
      graft.ops.BloomOps.bloomAntiJoin(docs, ref, "k", "rk", fpp = 0.01))
    val splitRows = graft.ops.BloomOps
      .bloomAntiJoin(docs, ref, "k", "rk", fpp = 0.01).count()
    require(plainRows == splitRows, s"split != plain: $splitRows vs $plainRows")
    println(s"""{"probe":"bloom_split_sf10","dir":"$dir","rows":$plainRows,"plain_shuffle_bytes":$plain,"split_shuffle_bytes":$split,"ratio":${split.toDouble / plain}}""")
    spark.stop()
  }
}
