package graft.core

import graft.ops.ProfileOps
import org.apache.spark.sql.functions._

/** KMV distinct-sketch invariants (q375): merge == from-scratch
  * (the k-min union property), exact reporting below saturation, and
  * estimator accuracy on a known-cardinality set.
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("NULL values are dropped, not sorted into the k-min set") {
    val df = Seq(("g", Option("a")), ("g", Option("b")), ("g", None))
      .toDF("grp", "v")
    val got = ProfileOps.kmvEstimate(
        ProfileOps.kmvSketch(df, "grp", "v", k = 8), k = 8)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(got.sameElements(Array((2L, 2.0))),
      s"null must not count as a value: ${got.mkString}")
  }

  test("kmvMerge of batch sketches equals the from-scratch sketch") {
    val vals = (0 until 5000).map(i => ("g", s"v$i"))
    val df = vals.toDF("grp", "v")
    val whole = ProfileOps.kmvSketch(df, "grp", "v", k = 64)
      .collect().map(_.getString(1)).sorted
    val merged = ProfileOps.kmvMerge(
        ProfileOps.kmvSketch(df.where(xxhash64(col("v")) % 2 === 0), "grp", "v", k = 64),
        ProfileOps.kmvSketch(df.where(xxhash64(col("v")) % 2 =!= 0), "grp", "v", k = 64),
        k = 64)
      .collect().map(_.getString(1)).sorted
    assert(merged.sameElements(whole), "k-min of union == k-min of k-min unions")
  }

  test("durable KMV store: appended batch sketches re-derive the " +
      "from-scratch sketch in a fresh session; replay is a no-op") {
    val vals = (0 until 3000).map(i => ("g", s"v$i"))
    val df = vals.toDF("grp", "v")
    val path = java.nio.file.Files
      .createTempDirectory("graft_kmv_spec").toString + "/kmv"
    val b1 = ProfileOps.kmvSketch(
      df.where(xxhash64(col("v")) % 2 === 0), "grp", "v", k = 64)
    val b2 = ProfileOps.kmvSketch(
      df.where(xxhash64(col("v")) % 2 =!= 0), "grp", "v", k = 64)
    ProfileOps.kmvAppend(b1, path)
    ProfileOps.kmvAppend(b2, path)
    ProfileOps.kmvAppend(b2, path) // replay must be a no-op
    val stored = ProfileOps.kmvFromStore(spark.newSession(), path, k = 64)
      .collect().map(_.getString(1)).sorted
    val whole = ProfileOps.kmvSketch(df, "grp", "v", k = 64)
      .collect().map(_.getString(1)).sorted
    assert(stored.sameElements(whole),
      "store-derived sketch must equal from-scratch")
  }

  test("below saturation the estimate IS the exact distinct count; " +
      "saturated groups estimate within 25%") {
    val small = (0 until 40).map(i => ("s", s"x$i"))
    val big = (0 until 20000).map(i => ("b", s"y$i"))
    val est = ProfileOps.kmvEstimate(
        ProfileOps.kmvSketch((small ++ big).toDF("grp", "v"), "grp", "v", k = 64))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(est("s") == ((40L, 40.0)), s"sub-k group must be exact: ${est("s")}")
    val (nc, e) = est("b")
    assert(nc == 64L)
    assert(math.abs(e - 20000.0) / 20000.0 < 0.25,
      s"k=64 estimate off by >25%: $e")
  }

  test("graft_kmin_distinct == the composed distinct+window form " +
      "(bit-identity differential, duplicates + eviction + repartition)") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    // duplicate-heavy input; k far below the distinct count so the
    // bounded buffer's eviction path runs on every partition
    val rows = (0 until 3000).map(i => ("g" + (i % 3), f"v${i % 700}%04d"))
    val df = rows.toDF("grp", "h").repartition(13)
    val agg = df.groupBy("grp")
      .agg(call_function("graft_kmin_distinct", col("h"), lit(16)).as("ks"))
      .select(col("grp"), explode(col("ks")).as("h"))
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("h")
    val composed = df.distinct()
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 16)
      .select("grp", "h")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(agg.sameElements(composed),
      s"agg=${agg.take(5).mkString(",")} composed=${composed.take(5).mkString(",")}")
  }

  test("q51 shape: k=256 KMV per-flag part estimates land within 20% " +
      "of exact (the accuracy evidence the HLL variant carried)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val exact = li.groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.countDistinct(
        org.apache.spark.sql.functions.col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = ProfileOps.kmvEstimate(
        ProfileOps.kmvSketch(li, "l_returnflag", "l_partkey",
          k = 256, salt = "q51"), k = 256)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    exact.foreach { case (flag, n) =>
      val e = est(flag)
      assert(math.abs(e - n) / n < 0.20, s"$flag: kmv $e vs exact $n")
    }
  }
}
