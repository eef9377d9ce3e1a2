package graft.core

import graft.ops.{DedupOps, IndexStore, SimilarityOps}
import org.apache.spark.sql.functions._

/** Twin ≡ production pins for the md5 oracle families (r13 ask #1):
  * the md5-oracled registrations (q38/q40/q41/q47/q86/q111/q366) run
  * the PRODUCTION pipelines with only the hash/plane expression
  * injected, so these pins plus the SQL oracles jointly cover both
  * family members — the oracle proves the pipeline arithmetic, the
  * pins prove the xxhash production member computes the same
  * semantics over it.
  */
class Md5TwinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")
  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("md5Long64 is the first 16 md5 hex chars as a two's-complement long") {
    import spark.implicits._
    // md5("hello") = 5d41402abc4b2a76b9719d911017c592 → 0x5d41402abc4b2a76
    val got = Seq("hello", "", "a")
      .toDF("s").select(DedupOps.md5Long64(col("s")))
      .collect().map(_.getLong(0))
    val want = Seq("hello", "", "a").map { s =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.nio.ByteBuffer.wrap(h, 0, 8).getLong // big-endian = hex order
    }
    assert(got.toSeq == want)
  }

  test("simHash twin and production share the pipeline: identical schema, " +
      "and identical codes for exact-duplicate docs under BOTH families") {
    import spark.implicits._
    val d2 = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta")).toDF("doc_id", "text")
    for (f <- Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column](
        xxhash64(_), DedupOps.md5Long64)) {
      val codes = DedupOps.simHashWith(d2, "doc_id", "text", f)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(codes(1L) == codes(2L), "exact dups must share a code")
      assert(codes(1L) != codes(3L), "distinct docs must differ (toy corpus)")
    }
    assert(DedupOps.simHashMd5(docs, "doc_id", "text").schema ==
      DedupOps.simHash(docs, "doc_id", "text").schema)
  }

  test("simHashPairs under both families finds the planted near-identical " +
      "pair; banded md5 path equals brute-force Hamming (pigeonhole)") {
    import spark.implicits._
    val base = docs.select(col("doc_id"), col("text")).limit(60)
    val planted = base.unionByName(
      base.where(col("doc_id") === base.select(min("doc_id")).head().getLong(0))
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    for (f <- Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column](
        xxhash64(_), DedupOps.md5Long64)) {
      val pairs = DedupOps.simHashPairs(planted, "doc_id", "text",
        maxHamming = 3, tokenHash = f)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.exists { case (a, b) => b - a == 1000000L },
        s"planted exact dup must surface as a hamming-0 pair ($f)")
    }
    // banded == brute force for the md5 family (the oracle's argument)
    val codes = DedupOps.simHashMd5(planted, "doc_id", "text")
    val brute = codes.as("a").join(codes.as("b"),
        col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        DedupOps.hamming(col("a.simhash"), col("b.simhash")).as("hamming"))
      .where(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val banded = DedupOps.simHashPairs(planted, "doc_id", "text",
      maxHamming = 3, tokenHash = DedupOps.md5Long64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute)
  }

  test("lshBucketMd5 replays the documented micro-grid sign arithmetic " +
      "and the shared knnLsh pipeline serves both plane families") {
    import spark.implicits._
    val v = Seq((1L, Seq(0.5, -0.25, 0.125, 1.0))).toDF("id", "v")
    val got = v.select(SimilarityOps.lshBucketMd5(col("v"), 3, 4))
      .head().getLong(0)
    val planes = SimilarityOps.lshPlaneSigns(4, 3)
    val want = (0 until 3).map { p =>
      val micro = Seq(0.5, -0.25, 0.125, 1.0).zip(planes(p))
        .map { case (x, s) => math.rint(x * s * 1e6).toLong }.sum
      if (micro >= 0) 1L << p else 0L
    }.sum
    assert(got == want)
    for (b <- Seq[(org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column](
        SimilarityOps.lshBucket, SimilarityOps.lshBucketMd5(_, _, d = 64))) {
      val knn = SimilarityOps.knnLsh(emb, "vec_id", "embedding",
        col("vec_id") < 3, 5, nbits = 4, probes = 2, bucketExpr = b)
      val perQ = knn.groupBy("query_id").count()
        .collect().map(_.getLong(1))
      assert(perQ.nonEmpty && perQ.forall(_ <= 5))
    }
  }

  test("md5-family simhash store serve == live md5 pipeline (q366 family " +
      "twin of SimhashStoreSpec's xxhash pin)") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_md5twin_store").toString + "/bands"
    val rows = DedupOps.simHashBands(docs, "doc_id", "text",
      tokenHash = DedupOps.md5Long64).localCheckpoint()
    (0 until 3).foreach { b =>
      IndexStore.appendSimHashBands(
        rows.where(pmod(col("id"), lit(3)) === b), path, family = "md5")
    }
    def pset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val live = pset(DedupOps.simHashPairs(docs, "doc_id", "text",
      maxHamming = 3, tokenHash = DedupOps.md5Long64))
    val served = pset(IndexStore.serveSimHashPairs(spark, path))
    assert(served == live && served.nonEmpty)
  }

  test("dedupRecallReport md5 family clears the production floors") {
    val rep = DedupOps.dedupRecallReport(spark, docs, "doc_id", "text",
        md5Family = true)
      .collect().map(r => r.getString(0) -> ((r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(rep("minhash_lsh")._1 >= 0.9 && rep("minhash_lsh")._2 >= 0.9)
    assert(rep("simhash")._1 >= 0.7 && rep("simhash")._2 >= 0.45)
  }

  test("annRecallReport: md5 plane family (the q83 registration) and " +
      "xxhash production planes share shape and clear the same floors") {
    def rep(md5: Boolean) = {
      val fams =
        if (md5) Some(SimilarityOps.lshBucketMd5(_: org.apache.spark.sql.Column,
          _: Int, d = 64)) else None
      (fams match {
        case Some(f) => SimilarityOps.annRecallReport(spark, emb, "vec_id",
          "embedding", col("vec_id") < 5, k = 10, nbitsKnn = 4, probes = 2,
          minCosine = 0.35, nbitsPairs = 4,
          bucketExprKnn = f, bucketExprPairs = f)
        case None => SimilarityOps.annRecallReport(spark, emb, "vec_id",
          "embedding", col("vec_id") < 5, k = 10, nbitsKnn = 4, probes = 2,
          minCosine = 0.35, nbitsPairs = 4)
      }).collect().map(r => r.getString(0) ->
        (if (r.isNullAt(4)) Double.NaN else r.getDouble(4))).toMap
    }
    val (m, x) = (rep(md5 = true), rep(md5 = false))
    assert(m.keySet == x.keySet && m.size == 4)
    val floors = Map("knn_ivf" -> 0.4, "knn_lsh" -> 0.1,
      "knn_ivfpq" -> 0.4, "neardup_pairs" -> 0.1)
    floors.foreach { case (k0, f) =>
      assert(m(k0) >= f, s"md5 family $k0 ${m(k0)} < floor $f")
      assert(x(k0) >= f, s"xxhash family $k0 ${x(k0)} < floor $f")
    }
    // the IVF rows don't depend on the plane family at all — same
    // deterministic fit, so same recall on both scoreboard variants
    assert(m("knn_ivf") == x("knn_ivf") && m("knn_ivfpq") == x("knn_ivfpq"))
  }
}
