package graft.core

import graft.ops.SimilarityOps
import org.apache.spark.sql.functions._

/** Volume stress for the bucketed embedding near-dup path: 100k
  * synthetic vectors through the native `graft_lsh_bits` bucketing.
  * Pins two contracts the toy fixtures can't: (1) identical vectors
  * ALWAYS share a bucket, so planted duplicate pairs are found at any
  * nbits; (2) the whole pass (two bucket-hash scans + grouped pair
  * generation) stays near-linear — a broken per-task plane-matrix
  * cache (rebuilt per row) or an uncapped hot bucket would blow the
  * generous time bound, not just slow it.
  */
class SimilarityScaleSpec extends SparkSpec {

  test("100k-vector near-dup pass: planted dup pairs found, bounded wall-clock") {
    val n = 100000L
    val dims = 32
    // deterministic pseudo-random unit-free vectors from xxhash64 of
    // (id / 2, dim): consecutive ids (2k, 2k+1) get IDENTICAL vectors
    // -> 50k planted exact-duplicate pairs with cosine 1.0
    val vec = transform(sequence(lit(0), lit(dims - 1)),
      j => xxhash64((col("id") / 2).cast("long"), j).cast("double") /
        lit(Long.MaxValue.toDouble))
    val emb = spark.range(0, n).select(col("id"), vec.as("v"))
    val t0 = System.nanoTime()
    val pairs = SimilarityOps.embeddingNearDupPairs(emb, "id", "v",
        minCosine = 0.999, nbits = 12)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val secs = (System.nanoTime() - t0) / 1e9
    val planted = (0L until n by 2).map(k => (k, k + 1)).toSet
    assert((planted -- pairs).isEmpty,
      s"${(planted -- pairs).size} planted dup pairs missed")
    // at cos >= 0.999 random 32-dim vectors essentially never collide,
    // so the found set should be exactly the planted one (allow a
    // handful of hash coincidences)
    assert(pairs.size <= planted.size + 10, s"unexpected pairs: ${pairs.size}")
    // near-linear budget on a shared box (measured ~5-10s at 4 cores);
    // only a per-row plane-matrix rebuild or an O(n²) bucket fails it
    assert(secs < 90.0, s"near-dup pass took ${secs}s")
  }

  test("50k-doc minhash LSH pass: planted duplicate docs found, bounded wall-clock") {
    // deterministic word-soup text: 40 tokens drawn by hashing
    // (id / 2, position) into a 1000-word vocabulary — consecutive ids
    // (2k, 2k+1) share text exactly -> identical minhash signatures ->
    // banded together with est_jaccard 1.0 at every band
    val n = 50000L
    val text = array_join(
      transform(sequence(lit(0), lit(39)),
        p => concat(lit("w"),
          pmod(xxhash64((col("id") / 2).cast("long"), p), lit(1000)))),
      " ")
    val docs = spark.range(0, n).select(col("id"), text.as("text"))
    val t0 = System.nanoTime()
    val pairs = graft.ops.DedupOps.minHashLshPairs(docs, "id", "text",
        minEstJaccard = 0.99)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val secs = (System.nanoTime() - t0) / 1e9
    val planted = (0L until n by 2).map(k => (k, k + 1)).toSet
    assert((planted -- pairs).isEmpty,
      s"${(planted -- pairs).size} planted dup docs missed")
    // distinct 1000-word-vocab 40-token docs rarely reach est 0.99,
    // but hash-identical shingle SETS across different (id/2) seeds
    // can — require the planted pairs dominate rather than exactness
    assert(pairs.size <= planted.size * 1.01 + 10, s"unexpected pairs: ${pairs.size}")
    assert(secs < 120.0, s"minhash pass took ${secs}s")
  }
}
