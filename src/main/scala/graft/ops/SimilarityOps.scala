package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale notes (100 TB design):
  *  - brute-force top-k broadcasts the (small) query set against the
  *    candidate corpus — one scan, no shuffle for the dot products, a
  *    single top-k-per-query window at the end (partial top-k happens
  *    map-side via the rank window's sort within partitions after a
  *    shuffle keyed by query — at 1000 executors the corpus scan is the
  *    dominant, perfectly parallel cost).
  *  - the LSH variant buckets the corpus by deterministic random-
  *    hyperplane sign bits so each query only meets its bucket; recall
  *    is tuned by `nbits` (fewer bits = bigger buckets = higher recall).
  *  - all math is done in double (exact float->double widening) so
  *    results are reproducible across engines.
  */
object SimilarityOps {

  /** Dot product of two array<double> columns (sequential fold — the
    * same associativity every engine's simple loop uses).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0d), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact brute-force cosine top-k: for each query vector, the k most
    * similar corpus vectors (excluding itself). Ties broken by id.
    */
  def knnBrute(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int): DataFrame = {
    val base = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val q = base.filter(queryPred).select(col("id").as("query_id"), col("v").as("qv"))
    // Rank on the ROUNDED similarity (ties broken by id) so sub-ulp
    // engine differences in the dot-product fold can't flip the top-k
    // membership vs the oracle.
    val sims = base.join(broadcast(q), col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("cand_id"),
        round(cosine(col("qv"), col("v")), 6).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
    sims.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * xxhash64 mapped to [-1, 1]. No RNG state — same planes everywhere.
    */
  private def planeComponent(p: Int, d: Column): Column =
    (xxhash64(lit(p), d).cast("double") / lit(Long.MaxValue.toDouble))

  /** Sign-bit bucket key from `nbits` hyperplanes. */
  def lshBucket(vec: Column, nbits: Int): Column = {
    val dims = sequence(lit(0), size(vec) - 1)
    (0 until nbits).map { p =>
      val proj = aggregate(
        zip_with(vec, dims, (x, i) => x * planeComponent(p, i)),
        lit(0.0d), _ + _)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket.
    * Bucketing the corpus is one projection; the join is an equi-join on
    * the bucket key (hash-partitioned, no broadcast of the corpus).
    */
  def knnLsh(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, nbits: Int = 8): DataFrame = {
    val base = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("bucket", lshBucket(col("v"), nbits))
    val q = base.filter(queryPred)
      .select(col("id").as("query_id"), col("v").as("qv"), col("bucket"))
    val sims = base.join(broadcast(q), Seq("bucket"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("cand_id"),
        round(cosine(col("qv"), col("v")), 6).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
    sims.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"))
  }
}
