package graft.core

import graft.ops.{MultimodalOps, SimilarityOps}
import org.apache.spark.sql.functions._

/** Structural + recall specs for the approximate similarity paths
  * (which have no SQL oracle) against the exact brute-force baseline,
  * and determinism specs for the multimodal plumbing.
  */
class SimilaritySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet").cache()
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("knnIvf returns k candidates per query with usable recall vs brute force") {
    val exact = pairsOf(SimilarityOps.knnBrute(emb, "vec_id", "embedding", col("vec_id") < 5, 10))
    val ivf = SimilarityOps.knnIvf(spark, emb, "vec_id", "embedding", col("vec_id") < 5, 10)
    val approx = pairsOf(ivf)
    val perQuery = ivf.groupBy("query_id").count().collect().map(_.getLong(1))
    assert(perQuery.forall(_ == 10), perQuery.mkString(","))
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall $recall")
    // determinism: fixed seed ⇒ identical result on re-run
    assert(pairsOf(SimilarityOps.knnIvf(spark, emb, "vec_id", "embedding",
      col("vec_id") < 5, 10)) == approx)
  }

  test("knnLsh recall vs brute force") {
    val exact = pairsOf(SimilarityOps.knnBrute(emb, "vec_id", "embedding", col("vec_id") < 5, 10))
    val approx = pairsOf(SimilarityOps.knnLsh(emb, "vec_id", "embedding", col("vec_id") < 5, 10, nbits = 2))
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.2, s"LSH recall $recall")
  }

  test("embedding near-dup pairs are ordered, thresholded, self-consistent") {
    val pairs = SimilarityOps.embeddingNearDupPairs(emb, "vec_id", "embedding",
      minCosine = 0.5, nbits = 2)
    val rows = pairs.collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(_.getDouble(2) >= 0.5))
  }

  test("frame sampling: deterministic windows, correct shape") {
    val bin = MultimodalOps.withBinaryPayload(docs, "doc_id", "text")
    val f1 = MultimodalOps.sampleFrames(spark, bin, 4)
    assert(f1.count() == docs.count() * 4)
    val first = f1.filter(col("frame_idx") === 0).select(min(col("offset"))).head().getInt(0)
    assert(first == 0)
    val f2 = MultimodalOps.sampleFrames(spark, bin, 4)
    assert(f1.exceptAll(f2).isEmpty)
  }

  test("native graft_cosine: SQL-registered, bit-identical to composed form, null-safe") {
    graft.functions.GraftFunctions.register(spark)
    // SQL surface
    val one = spark.sql("SELECT graft_cosine(array(1.0d, 2.0d), array(1.0d, 2.0d)) AS c")
      .head().getDouble(0)
    assert(math.abs(one - 1.0) < 1e-12) // sqrt(5)² ≠ 5 exactly; both forms agree
    // bit-identical to the composed built-ins form over real data
    val base = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val both = base.as("a").join(base.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(500)
      .select(
        SimilarityOps.cosine(col("a.v"), col("b.v")).as("composed"),
        expr("graft_cosine(a.v, b.v)").as("native"))
    assert(both.filter(col("composed") =!= col("native")).count() == 0)
    // null propagation
    assert(spark.sql("SELECT graft_cosine(NULL, array(1.0d)) AS c").head().isNullAt(0))
    // type check rejects non-array args at analysis
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_cosine('a', 'b')").collect()
    }
  }

  test("resize feature: fixed width, deterministic, bounded values") {
    val bin = MultimodalOps.withBinaryPayload(docs, "doc_id", "text")
    val r = MultimodalOps.resizeFeature(spark, bin, 8)
    val widths = r.select(size(col("feature"))).distinct().collect().map(_.getInt(0))
    assert(widths.toSeq == Seq(8))
    val bounds = r.select(explode(col("feature")).as("v"))
      .agg(min("v"), max("v")).head()
    assert(bounds.getDouble(0) >= 0.0 && bounds.getDouble(1) <= 255.0)
  }
}
