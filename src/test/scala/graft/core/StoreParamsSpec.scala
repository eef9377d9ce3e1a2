package graft.core

import graft.ops.{DedupOps, IndexStore, ProfileOps}
import org.apache.spark.sql.functions._

/** Enforced single-parameterization contract for the durable stores
  * (r13 ask #3): the first append sidecar-pins the parameters; a
  * mixed-parameterization append or serve must fail LOUDLY — before
  * this round the docstring carried the contract and a violation
  * produced silently ill-defined pair agreement.
  */
class StoreParamsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  private def tmp(tag: String) = java.nio.file.Files
    .createTempDirectory(s"graft_params_$tag").toString + "/store"

  test("LSH band store refuses a mixed-parameterization append and a " +
      "mismatched serve") {
    val path = tmp("lsh")
    val d60 = docs.limit(60)
    IndexStore.appendLshBands(
      DedupOps.minHashMd5Bands(d60, "doc_id", "text"), path)
    // same corpus banded at 32/8 — the silent-corruption case
    val e1 = intercept[IllegalArgumentException] {
      IndexStore.appendLshBands(
        DedupOps.minHashMd5Bands(d60, "doc_id", "text",
          numHashes = 32, bands = 8), path,
        numHashes = 32, bandCount = 8)
    }
    assert(e1.getMessage.contains("parameterized"))
    val e2 = intercept[IllegalArgumentException] {
      IndexStore.serveLshPairs(spark, path, numHashes = 32).collect()
    }
    assert(e2.getMessage.contains("parameterized"))
    // matching serve still works
    assert(IndexStore.serveLshPairs(spark, path).columns
      .contains("est_jaccard"))
  }

  test("SimHash band store refuses a mixed token-hash FAMILY append " +
      "(codes are opaque longs — exactly the silent case)") {
    val path = tmp("simhash")
    val d60 = docs.limit(60)
    IndexStore.appendSimHashBands(
      DedupOps.simHashBands(d60, "doc_id", "text",
        tokenHash = DedupOps.md5Long64), path, family = "md5")
    val e = intercept[IllegalArgumentException] {
      IndexStore.appendSimHashBands(
        DedupOps.simHashBands(d60, "doc_id", "text"), path)
    }
    assert(e.getMessage.contains("parameterized"))
    val e2 = intercept[IllegalArgumentException] {
      IndexStore.serveSimHashPairs(spark, path, bands = 8).collect()
    }
    assert(e2.getMessage.contains("parameterized"))
  }

  test("IVF/PQ stats stores refuse mixed k / (m, nCodes)") {
    import spark.implicits._
    val e4 = Seq((1L, Seq(0.0, 1.0)), (2L, Seq(5.0, 9.0)))
      .toDF("vec_id", "embedding")
    val cells = tmp("ivf")
    val centers = Seq(Seq(0.0, 1.0), Seq(5.0, 9.0))
    val stats = graft.ops.IvfIndexOps.cellStats(spark, e4, "vec_id",
      "embedding", centers)
    IndexStore.appendIvfStats(stats, cells, k = 2)
    intercept[IllegalArgumentException] {
      IndexStore.appendIvfStats(stats, cells, k = 3)
    }
    intercept[IllegalArgumentException] {
      IndexStore.readIvfStats(spark, cells, expectK = 3).collect()
    }
    assert(IndexStore.readIvfStats(spark, cells, expectK = 2)
      .count() > 0)
  }

  test("KMV store refuses mixed k and mixed salt") {
    import spark.implicits._
    val df = (0 until 200).map(i => ("g", s"v$i")).toDF("grp", "v")
    val path = tmp("kmv")
    ProfileOps.kmvAppend(ProfileOps.kmvSketch(df, "grp", "v", k = 16),
      path, k = 16)
    intercept[IllegalArgumentException] {
      ProfileOps.kmvAppend(ProfileOps.kmvSketch(df, "grp", "v", k = 64),
        path, k = 64)
    }
    intercept[IllegalArgumentException] {
      ProfileOps.kmvAppend(
        ProfileOps.kmvSketch(df, "grp", "v", k = 16, salt = "other"),
        path, k = 16, salt = "other")
    }
    intercept[IllegalArgumentException] {
      ProfileOps.kmvFromStore(spark, path, k = 64).collect()
    }
    assert(ProfileOps.kmvFromStore(spark, path, k = 16).count() == 16)
  }

  test("sidecar survives a fresh session and pre-sidecar stores still " +
      "serve (absent sidecar = no check, not a crash)") {
    val path = tmp("fresh")
    IndexStore.appendLshBands(
      DedupOps.minHashMd5Bands(docs.limit(30), "doc_id", "text"), path)
    val s2 = spark.newSession()
    intercept[IllegalArgumentException] {
      IndexStore.serveLshPairs(s2, path, numHashes = 32).collect()
    }
    // legacy store without a sidecar: plain parquet dir
    val legacy = tmp("legacy")
    DedupOps.minHashMd5Bands(docs.limit(30), "doc_id", "text")
      .write.mode("append").parquet(legacy)
    assert(IndexStore.serveLshPairs(spark, legacy).columns
      .contains("est_jaccard"))
  }
}
