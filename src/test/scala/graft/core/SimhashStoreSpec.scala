package graft.core

import graft.ops.{DedupOps, IndexStore}
import org.apache.spark.sql.functions._

/** Durable SimHash band store invariants (q366): the persisted store
  * serves pairs bit-identical to the live simHashPairs pipeline (the
  * xxhash64 family has no SQL oracle, so this spec IS the correctness
  * guarantee), from a fresh session, and batch replays are no-ops.
  */
class SimhashStoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.select("a_id", "b_id", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("batch-appended store serves pairs identical to live simHashPairs, " +
      "from a FRESH session") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_simhash_spec").toString + "/bands"
    val rows = DedupOps.simHashBands(docs, "doc_id", "text")
      .localCheckpoint()
    (0 until 3).foreach { b =>
      IndexStore.appendSimHashBands(
        rows.where(pmod(col("id"), lit(3)) === b), path)
    }
    val live = pairSet(DedupOps.simHashPairs(docs, "doc_id", "text"))
    val s2 = spark.newSession()
    val served = pairSet(IndexStore.serveSimHashPairs(s2, path))
    assert(served == live, "stored serve must equal the live pipeline")
    assert(served.nonEmpty, "sf0.001 documents must yield simhash pairs")
    assert(served.forall { case (a, b, h) => a < b && h <= 3 })
  }

  test("replaying a batch append is a no-op") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_simhash_spec2").toString + "/bands"
    val rows = DedupOps.simHashBands(docs.limit(120), "doc_id", "text")
      .localCheckpoint()
    IndexStore.appendSimHashBands(rows, path)
    val once = pairSet(IndexStore.serveSimHashPairs(spark, path))
    IndexStore.appendSimHashBands(rows, path)
    val twice = pairSet(IndexStore.serveSimHashPairs(spark, path))
    assert(twice == once)
    assert(IndexStore.readSimHashBands(spark, path).count() == rows.count())
  }
}
