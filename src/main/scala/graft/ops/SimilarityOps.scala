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

  /** Composed-built-ins cosine (reference form; bit-identical to the
    * native expression below, which fuses the three passes).
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Native fused cosine (graft.functions.CosineSimilarity, codegen'd):
    * no intermediate array allocation, one pass per input. Registered
    * on demand in the DataFrame's session.
    */
  private def nativeCosine(df: DataFrame)(a: Column, b: Column): Column = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    call_function("graft_cosine", a, b)
  }

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
        round(nativeCosine(emb)(col("qv"), col("v")), 6).as("sim"))
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

  /** Embedding-cosine near-duplicate pairs: bucket by hyperplane sign
    * bits, generate pairs only within a bucket, keep pairs above the
    * cosine threshold. The bucket equi-join replaces the all-pairs
    * cross product; recall is tuned by nbits (fewer bits → bigger
    * buckets → higher recall, more work).
    */
  def embeddingNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, nbits: Int = 8): DataFrame = {
    val base = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("bucket", lshBucket(col("v"), nbits))
    base.as("x").join(base.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        round(nativeCosine(emb)(col("x.v"), col("y.v")), 6).as("cos"))
      .filter(col("cos") >= minCosine)
  }

  /** IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
    * partitions the corpus into cells; each query searches only its
    * `nprobe` nearest cells. The scale path for billion-row corpora:
    * train on a sample, assign once (narrow map), and the query join
    * touches nprobe/k of the data. Deterministic via fixed seed.
    */
  def knnIvf(spark: org.apache.spark.sql.SparkSession, emb: DataFrame,
      idCol: String, vecCol: String, queryPred: Column, k: Int,
      nCells: Int = 16, nprobe: Int = 4, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val base = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val feat = base.withColumn("features", array_to_vector(col("v")))
    val model = new KMeans().setK(nCells).setSeed(seed).setMaxIter(10).fit(feat)
    val centers: Array[(Int, Array[Double])] =
      model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }

    // cell assignment + per-query probe list, both as broadcast-joined
    // literal center arrays (no per-row model invocation: the distance
    // expressions stay in codegen)
    def dist2(vec: Column, center: Array[Double]): Column = {
      val c = array(center.map(lit): _*)
      aggregate(zip_with(vec, c, (a, b) => (a - b) * (a - b)), lit(0.0d), _ + _)
    }
    val cellOf = centers.map { case (i, c) => struct(dist2(col("v"), c).as("d"), lit(i).as("i")) }
    val assigned = base.withColumn("cell", array_min(array(cellOf: _*)).getField("i"))
    val probeCells = explode(slice(
      array_sort(array(cellOf: _*)), 1, nprobe)).as("probe")
    val q = assigned.filter(queryPred)
      .select(col("id").as("query_id"), col("v").as("qv"), probeCells)
      .select(col("query_id"), col("qv"), col("probe.i").as("cell"))

    val sims = assigned.join(broadcast(q), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("cand_id"),
        round(nativeCosine(emb)(col("qv"), col("v")), 6).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
    sims.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"))
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
        round(nativeCosine(emb)(col("qv"), col("v")), 6).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
    sims.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"))
  }
}
