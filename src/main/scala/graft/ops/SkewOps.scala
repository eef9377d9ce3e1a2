package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins — the manual complement to AQE's
  * runtime skew-join splitting, for when a handful of hot keys are
  * known or detectable up front (e.g. a null-ish default key, a
  * celebrity user, a stopword shingle).
  *
  * Salted join: the skewed (large) side gets a random salt in
  * [0, buckets); the small-or-replicated side is exploded once per
  * salt value. The hot key's rows then spread across `buckets`
  * reducers instead of one straggler. Join results are identical to
  * the unsalted equi-join.
  */
object SkewOps {

  /** Equi-join `big ⋈ dim` on `key`, salting the big side into
    * `buckets` sub-keys and replicating the dim side `buckets`×.
    * Use when `dim` is small enough to replicate but too big (or the
    * planner too conservative) to broadcast outright.
    */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String, buckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val saltedBig = big.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)).cast("int"))
    val saltedDim = dim.withColumn("_salt", explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(saltedDim, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Detect hot keys: keys whose row count exceeds `threshold` — the
    * usual pre-flight for choosing salting / broadcast isolation.
    * One narrow map-side-combined aggregation.
    */
  def hotKeys(df: DataFrame, key: String, threshold: Long): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n")).filter(col("n") > threshold)

  /** Guarded parallelism floor for compute-heavy narrow passes over
    * under-split inputs (guide §2.5 "input skew ... repartition
    * immediately after the read"): a small single-file / single-row-
    * group table scans as ONE split, which serializes tokenization /
    * shingling / decode passes onto one core while the rest idle.
    * Repartition up to defaultParallelism ONLY when the input has
    * fewer partitions — at real scale the scan already has >= cores
    * splits and this is a no-op (no exchange is added), so it can
    * never collapse a large scan to the core count. Round-robin,
    * so ONLY for order-free consumers (aggregations, joins,
    * per-row maps).
    */
  def parallelismFloor(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** Split-path join for known-hot keys: hot keys join via broadcast
    * (dim side filtered to the hot set is tiny by definition), the
    * long tail joins normally — no salt overhead on the tail, no
    * straggler on the hot keys.
    */
  def hotColdJoin(big: DataFrame, dim: DataFrame, key: String,
      hot: Seq[Any]): DataFrame = {
    val hotCond = col(key).isin(hot: _*)
    val hotPart = big.filter(hotCond).join(broadcast(dim.filter(hotCond)), Seq(key))
    val coldPart = big.filter(!hotCond).join(dim.filter(!hotCond), Seq(key))
    hotPart.unionByName(coldPart)
  }
}
