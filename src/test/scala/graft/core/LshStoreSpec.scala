package graft.core

import graft.ops.{DedupOps, IndexStore}
import org.apache.spark.sql.functions._

/** Durable banded-LSH (md5-MinHash) store invariants (q365): a
  * batch-appended store serves pairs identical to the live pipeline,
  * a FRESH session serves from the path alone, and replaying a batch
  * append is a no-op (merge-on-read full-row dedup).
  */
class LshStoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select("a_id", "b_id", "est_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("batch-appended store serves pairs identical to the live pipeline, " +
      "from a FRESH session") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_lsh_spec").toString + "/bands"
    val rows = DedupOps.minHashMd5Bands(docs, "doc_id", "text")
      .localCheckpoint()
    // three-way batch split: band rows carry no cross-doc state, so
    // any split must merge to the from-scratch frame
    (0 until 3).foreach { b =>
      IndexStore.appendLshBands(
        rows.where(pmod(col("id"), lit(3)) === b), path)
    }
    val live = pairSet(DedupOps.lshBandPairs(rows, numHashes = 16,
      minEstJaccard = 0.5))
    val s2 = spark.newSession() // no lineage, no memoized frames
    val served = pairSet(IndexStore.serveLshPairs(s2, path))
    assert(served == live, "stored serve must equal the live pipeline")
    assert(served.nonEmpty, "sf0.001 documents must yield near-dup pairs")
    assert(served.forall { case (a, b, _) => a < b }, "pair order contract")
  }

  test("replaying a batch append is a no-op (merge-on-read dedup)") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_lsh_spec2").toString + "/bands"
    val rows = DedupOps.minHashMd5Bands(docs.limit(120), "doc_id", "text")
      .localCheckpoint()
    IndexStore.appendLshBands(rows, path)
    val once = pairSet(IndexStore.serveLshPairs(spark, path))
    IndexStore.appendLshBands(rows, path) // replay the same batch
    val twice = pairSet(IndexStore.serveLshPairs(spark, path))
    assert(twice == once, "replaying a batch must not change the serve")
    val nRows = IndexStore.readLshBands(spark, path).count()
    assert(nRows == rows.count(),
      "merge-on-read must collapse full-row duplicates")
  }
}
